"""The MobileNetV1 model family (models/mobilenet.py).

Third backbone family: depthwise-separable convolutions — the one op
class neither the VGG nor the ResNet family exercises. Tests mirror
tests/test_resnet.py at the tiny mntest64 scale: preset/anchor
contracts, forward/scores paths, training convergence, 8-way DP
parity, the family gates (VGG-structured int8/QAT/Pallas-stem must
refuse loudly) and a slow CLI-chain run.
"""

import dataclasses
import json
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_model,
    apply_result,
    apply_scores,
    init_params,
    map_channels,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.presets import (
    get_preset_by_name,
    preset_from_dict,
    preset_to_dict,
)

K = 3


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        preset_name="mntest64", num_classes=K, compute_dtype="float32"
    )


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))


class TestPresets:
    def test_anchor_counts_match_generator(self):
        for name in ("mobilenet320", "mntest64"):
            p = get_preset_by_name(name)
            assert p.backbone == "mobilenetv1"
            assert anchors_for_preset(p).shape == (p.num_anchors, 4)

    def test_serialization_roundtrip_carries_backbone(self):
        p = get_preset_by_name("mobilenet320")
        assert preset_from_dict(preset_to_dict(p)) == p

    def test_map_channels(self):
        assert map_channels(get_preset_by_name("mobilenet320")) == (
            512, 1024, 512, 256, 256, 128,
        )
        assert map_channels(get_preset_by_name("mntest64")) == (
            512, 1024, 512,
        )
        # the other families are untouched by the dispatch
        assert map_channels(get_preset_by_name("vgg300"))[0] == 512
        assert map_channels(get_preset_by_name("rtest64"))[0] == 128


class TestForward:
    def test_shapes_and_anchor_count(self, cfg, params, images):
        logits, locs = apply_model(params, images, cfg)
        assert logits.shape == (2, 116, K + 1)
        assert locs.shape == (2, 116, 4)
        assert logits.dtype == jnp.float32

    def test_scores_path_matches_result_path(self, cfg, params, images):
        logits, locs = apply_model(params, images, cfg, inference=True)
        sm = jax.nn.softmax(logits, axis=-1)
        conf, cls, locs2 = apply_scores(params, images, cfg)
        np.testing.assert_allclose(
            np.asarray(jnp.max(sm[:, :, :K], axis=-1)), np.asarray(conf),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(sm[:, :, :K], axis=-1)), np.asarray(cls)
        )
        np.testing.assert_allclose(
            np.asarray(locs), np.asarray(locs2), atol=1e-5
        )
        r = apply_result(params, images, cfg)
        assert r.shape == (2, 116, K + 5)

    def test_bf16_compute_path(self, params, images):
        cfg16 = ModelConfig(
            preset_name="mntest64", num_classes=K, compute_dtype="bfloat16"
        )
        logits, locs = apply_model(params, images, cfg16)
        assert logits.dtype == jnp.float32  # f32 outputs either way
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_relu6_is_bounded(self):
        from ssd_tensorflow_tpu.models.mobilenet import relu6

        x = jnp.asarray([-3.0, 0.0, 2.5, 6.0, 99.0])
        np.testing.assert_array_equal(
            np.asarray(relu6(x)), [0.0, 0.0, 2.5, 6.0, 6.0]
        )

    def test_depthwise_matches_per_channel_conv(self):
        """depthwise_conv2d == C independent single-channel convs."""
        from ssd_tensorflow_tpu.models.layers import conv2d, depthwise_conv2d

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 1, 4)).astype(np.float32))
        y = depthwise_conv2d(x, w, stride=2)
        for c in range(4):
            yc = conv2d(x[..., c : c + 1], w[..., c : c + 1], stride=2)
            np.testing.assert_allclose(
                np.asarray(y[..., c]), np.asarray(yc[..., 0]),
                rtol=1e-5, atol=1e-5,
            )

    def test_full_res_mobilenet320_shapes(self):
        # init-only at full res (forward at 320px costs minutes on CPU);
        # shape correctness at full res is covered by the asserts inside
        # apply_feature_maps, exercised at 64px above
        cfg = ModelConfig(
            preset_name="mobilenet320", num_classes=20, compute_dtype="float32"
        )
        p = init_params(jax.random.PRNGKey(0), cfg)
        assert p["classifier0"]["w"].shape == (3, 3, 512, 4 * 25)
        assert p["classifier1"]["w"].shape == (3, 3, 1024, 6 * 25)
        # depthwise filters are HWIO with I=1, O=Cin
        assert p["b2_dw"]["w"].shape == (3, 3, 1, 64)
        assert p["b13_pw"]["w"].shape == (1, 1, 1024, 1024)


class TestTraining:
    def test_loss_decreases_and_params_update(self, cfg):
        from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
        from ssd_tensorflow_tpu.parallel.train_step import (
            TrainConfig,
            make_train_state,
            make_train_step,
        )
        from reference_impl import random_boxes

        tcfg = TrainConfig(
            model=cfg, detect=DetectionConfig(top_k=32, confidence_threshold=0.5)
        )
        params = init_params(jax.random.PRNGKey(1), cfg)
        anchors = anchors_for_preset(cfg.preset)
        step = make_train_step(tcfg, anchors, donate=False)
        state = make_train_state(params, tcfg)
        rng = np.random.default_rng(0)
        gt = np.stack([random_boxes(rng, 8, tight=True) for _ in range(2)])
        batch = {
            "images": rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32),
            "gt_boxes": gt.astype(np.float32),
            "gt_labels": rng.integers(0, K, (2, 8)).astype(np.int32),
            "gt_mask": np.ones((2, 8), dtype=bool),
        }
        w0 = np.asarray(state.params["b1_dw"]["w"]).copy()
        hist = []
        for _ in range(3):
            state, losses, _ = step(state, batch)
            hist.append(float(losses["total"]))
        assert all(np.isfinite(hist))
        assert hist[-1] < hist[0]
        assert not np.allclose(w0, np.asarray(state.params["b1_dw"]["w"]))


class TestDataParallel:
    def test_sharded_step_matches_single_device(self, cfg):
        """GroupNorm is per-sample, so 8-way DP must be numerically
        identical to single-device — same contract as the other
        families (tests/test_train_step.py, tests/test_resnet.py)."""
        from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
        from ssd_tensorflow_tpu.parallel.mesh import make_mesh
        from ssd_tensorflow_tpu.parallel.train_step import (
            TrainConfig,
            make_train_state,
            make_train_step,
            shard_batch,
            shard_state,
        )
        from reference_impl import random_boxes

        assert jax.device_count() == 8
        tcfg = TrainConfig(
            model=cfg, detect=DetectionConfig(top_k=32, confidence_threshold=0.5)
        )
        params = init_params(jax.random.PRNGKey(2), cfg)
        anchors = anchors_for_preset(cfg.preset)
        step = make_train_step(tcfg, anchors, donate=False)
        rng = np.random.default_rng(3)
        gt = np.stack([random_boxes(rng, 8, tight=True) for _ in range(8)])
        batch = {
            "images": rng.uniform(0, 255, (8, 64, 64, 3)).astype(np.float32),
            "gt_boxes": gt.astype(np.float32),
            "gt_labels": rng.integers(0, K, (8, 8)).astype(np.int32),
            "gt_mask": np.ones((8, 8), dtype=bool),
        }

        mesh = make_mesh()
        state_sh = shard_state(make_train_state(params, tcfg), mesh)
        state_sh, losses_sh, _ = step(state_sh, shard_batch(batch, mesh))

        state_1 = make_train_state(params, tcfg)
        state_1, losses_1, _ = step(state_1, batch)

        np.testing.assert_allclose(
            float(losses_sh["total"]), float(losses_1["total"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(state_sh.params["b2_pw"]["w"]),
            np.asarray(state_1.params["b2_pw"]["w"]),
            rtol=1e-4, atol=1e-6,
        )


class TestFamilyGates:
    def test_pallas_stem_refused(self):
        with pytest.raises(ValueError, match="VGG conv1-block"):
            ModelConfig(preset_name="mntest64", num_classes=K,
                        pallas_stem=True, compute_dtype="bfloat16")

    # int8 PTQ deploys for this family since round 4 — positive
    # coverage lives in tests/test_quantized_families.py

    # QAT covers this family since round 4 (per-channel folded
    # quantizer) — positive coverage lives in
    # tests/test_qat.py::TestFamilyQAT


def _make_tiny_dataset(tmp_path, cv2):
    """8 synthetic bright-square images + an mntest64 training-data dir."""
    from ssd_tensorflow_tpu.types import Box, Point, Sample, Size

    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(8):
        img = rng.integers(0, 40, (96, 96, 3), dtype=np.uint8)
        cx, cy, s = rng.uniform(0.35, 0.65), rng.uniform(0.35, 0.65), 0.4
        x0, y0 = int((cx - s / 2) * 96), int((cy - s / 2) * 96)
        x1, y1 = int((cx + s / 2) * 96), int((cy + s / 2) * 96)
        img[y0:y1, x0:x1] = (200, 220, 240)
        path = str(img_dir / f"img{i:03d}.jpg")
        cv2.imwrite(path, img)
        samples.append(
            Sample(path, [Box("square", 0, Point(cx, cy), Size(s, s))],
                   Size(96, 96))
        )

    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    preset = get_preset_by_name("mntest64")
    with open(data_dir / "train-samples.pkl", "wb") as f:
        pickle.dump(samples[:6], f)
    with open(data_dir / "valid-samples.pkl", "wb") as f:
        pickle.dump(samples[6:], f)
    with open(data_dir / "training-data.json", "w") as f:
        json.dump(
            {
                "preset": preset_to_dict(preset),
                "num-classes": 1,
                "colors": {"square": [0, 0, 255]},
                "lid2name": {"0": "square"},
                "lname2id": {"square": 0},
                "augmentation": {"sampler_trials": 3,
                                 "expand_probability": 0.3},
            },
            f,
        )
    return data_dir, samples


@pytest.mark.e2e
@pytest.mark.slow
def test_mobilenet_cli_chain(tmp_path):
    """train -> infer -> export -> detect with --preset mntest64 through
    the real CLIs: the third model family rides the unchanged artifact
    chain."""
    cv2 = pytest.importorskip("cv2")
    from ssd_tensorflow_tpu.cli.detect import main as detect_main
    from ssd_tensorflow_tpu.cli.export_model import main as export_main
    from ssd_tensorflow_tpu.cli.infer import main as infer_main
    from ssd_tensorflow_tpu.cli.train import main as train_main

    data_dir, samples = _make_tiny_dataset(tmp_path, cv2)

    name = str(tmp_path / "proj")
    rc = train_main(
        [
            "--name", name,
            "--data-dir", str(data_dir),
            "--epochs", "2",
            "--batch-size", "4",
            "--tensorboard-dir", str(tmp_path / "tb"),
            "--checkpoint-interval", "2",
            "--num-workers", "0",
            "--compute-dtype", "float32",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(name, "final.ckpt.npz"))

    out_dir = str(tmp_path / "out")
    rc = infer_main(
        [
            *[s.filename for s in samples[6:]],
            "--name", name,
            "--training-data", str(data_dir / "training-data.json"),
            "--output-dir", out_dir,
            "--annotate", "yes",
            "--batch-size", "4",
            "--threshold", "0.01",
            "--compute-stats", "no",
        ]
    )
    assert rc == 0
    assert len([f for f in os.listdir(out_dir) if f.endswith(".jpg")]) == 2

    bundle = str(tmp_path / "model.ssdtpu.npz")
    rc = export_main(
        [
            "--checkpoint-file", os.path.join(name, "final.ckpt.npz"),
            "--output-file", bundle,
        ]
    )
    assert rc == 0
    det_dir = str(tmp_path / "det")
    rc = detect_main(
        [
            samples[6].filename,
            "--model", bundle,
            "--output-dir", det_dir,
            "--batch-size", "2",
            "--threshold", "0.01",
        ]
    )
    assert rc == 0
    base = os.path.basename(samples[6].filename)
    assert os.path.exists(os.path.join(det_dir, base))
    assert os.path.exists(os.path.join(det_dir, base + ".txt"))


@pytest.mark.e2e
@pytest.mark.slow
def test_mobilenet_qat_chain(tmp_path):
    """Family QAT through the real CLIs: train --qat calibrates
    per-input-channel amax grids, checkpoints carry them under
    qat_act_amax, resume keeps them, and export --quantize deploys those
    exact grids through quantize_weights_folded (no recalibration)."""
    cv2 = pytest.importorskip("cv2")
    from ssd_tensorflow_tpu.cli.export_model import main as export_main
    from ssd_tensorflow_tpu.cli.train import main as train_main
    from ssd_tensorflow_tpu.inference import (
        InferenceModel,
        load_bundle,
        load_params_from_train_checkpoint,
    )
    from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

    data_dir, samples = _make_tiny_dataset(tmp_path, cv2)
    name = str(tmp_path / "proj-qat")
    common = [
        "--name", name,
        "--data-dir", str(data_dir),
        "--batch-size", "4",
        "--tensorboard-dir", str(tmp_path / "tb-qat"),
        "--num-workers", "0",
        "--compute-dtype", "float32",
        "--qat", "yes",
    ]
    rc = train_main(common + ["--epochs", "2", "--checkpoint-interval", "2"])
    assert rc == 0
    ckpt = os.path.join(name, "final.ckpt.npz")

    # per-input-channel grids, stored as JSON lists keyed by conv name
    amax = checkpoint_config(ckpt).get("qat_act_amax")
    assert amax and "classifier0" in amax
    assert checkpoint_config(ckpt).get("qat_act_scales") is None
    assert not any(k.endswith("_dw") for k in amax)
    params, _, _ = load_params_from_train_checkpoint(ckpt)
    assert len(amax["stem_conv"]) == np.asarray(
        params["stem_conv"]["w"]
    ).shape[2]

    # --quantize deploys the trained grids without calibration images
    bundle = str(tmp_path / "qat-int8.ssdtpu.npz")
    rc = export_main(
        ["--checkpoint-file", ckpt, "--output-file", bundle, "--quantize"]
    )
    assert rc == 0
    qp, cfg2, _, act_scales = load_bundle(bundle)
    assert act_scales == {} and cfg2.preset_name == "mntest64"
    # the deployed int8 grid IS the trained one: a_scale == amax/127
    got = np.asarray(qp["stem_conv"]["a_scale"])
    want = np.maximum(np.asarray(amax["stem_conv"], np.float32) / 127.0,
                      1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    model = InferenceModel.from_bundle(bundle)
    imgs, _ = model.preprocess_files([s.filename for s in samples[6:]])
    result, _ = model.run(imgs)
    r = np.asarray(result)
    assert r.shape[0] == 2 and np.isfinite(r).all()

    # resume trains against the SAME quantizer (no recalibration drift)
    rc = train_main(
        common + ["--epochs", "3", "--checkpoint-interval", "3",
                  "--continue-training", "yes"]
    )
    assert rc == 0
    resumed = checkpoint_config(os.path.join(name, "final.ckpt.npz"))
    assert resumed.get("qat_act_amax") == amax
