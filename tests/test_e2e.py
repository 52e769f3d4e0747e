"""End-to-end slice: process_dataset -> train -> infer -> export -> detect.

Runs the five CLI drivers in-process on a tiny synthetic dataset (CPU),
verifying the full artifact chain: JSON/pkl training data, npz
checkpoints, mAP computation, inference bundle, standalone detection.
"""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_tensorflow_tpu.presets import get_preset_by_name, preset_to_dict
from ssd_tensorflow_tpu.types import Box, Point, Sample, Size


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """A synthetic 'VOC-like' prepared dataset: bright squares on dark
    backgrounds, one class."""
    root = tmp_path_factory.mktemp("e2e")
    img_dir = root / "images"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(12):
        img = rng.integers(0, 40, (160, 160, 3), dtype=np.uint8)
        # a bright square at a random position
        cx, cy, s = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7), 0.3
        x0, y0 = int((cx - s / 2) * 160), int((cy - s / 2) * 160)
        x1, y1 = int((cx + s / 2) * 160), int((cy + s / 2) * 160)
        img[y0:y1, x0:x1] = (200, 220, 240)
        path = str(img_dir / f"img{i:03d}.jpg")
        cv2.imwrite(path, img)
        samples.append(
            Sample(
                path,
                [Box("square", 0, Point(cx, cy), Size(s, s))],
                Size(160, 160),
            )
        )

    data_dir = root / "data"
    os.makedirs(data_dir)
    preset = get_preset_by_name("test64")
    with open(data_dir / "train-samples.pkl", "wb") as f:
        pickle.dump(samples[:8], f)
    with open(data_dir / "valid-samples.pkl", "wb") as f:
        pickle.dump(samples[8:], f)
    with open(data_dir / "training-data.json", "w") as f:
        json.dump(
            {
                "preset": preset_to_dict(preset),
                "num-classes": 1,
                "colors": {"square": [0, 0, 255]},
                "lid2name": {"0": "square"},
                "lname2id": {"square": 0},
                "augmentation": {"sampler_trials": 3, "expand_probability": 0.3},
            },
            f,
        )
    return root, str(data_dir), samples


@pytest.mark.e2e
def test_full_pipeline(dataset, tmp_path):
    root, data_dir, samples = dataset
    name = str(tmp_path / "proj")
    tb_dir = str(tmp_path / "tb")

    # ---- train 2 epochs ------------------------------------------------
    from ssd_tensorflow_tpu.cli.train import main as train_main

    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", "2",
            "--batch-size", "4",
            "--tensorboard-dir", tb_dir,
            "--checkpoint-interval", "1",
            "--num-workers", "0",
            "--compute-dtype", "float32",
            "--lr-values", "0.0001;0.00001",
            "--lr-boundaries", "100",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(name, "e1.ckpt.npz"))
    assert os.path.exists(os.path.join(name, "final.ckpt.npz"))
    assert os.listdir(tb_dir)

    # ---- resume for 1 more epoch ---------------------------------------
    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", "3",
            "--batch-size", "4",
            "--tensorboard-dir", tb_dir,
            "--checkpoint-interval", "1",
            "--num-workers", "0",
            "--compute-dtype", "float32",
            "--continue-training", "yes",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(name, "e3.ckpt.npz"))

    # ---- infer over explicit files --------------------------------------
    from ssd_tensorflow_tpu.cli.infer import main as infer_main

    out_dir = str(tmp_path / "infer-out")
    files = [s.filename for s in samples[8:]]
    rc = infer_main(
        [
            *files,
            "--name", name,
            "--training-data", os.path.join(data_dir, "training-data.json"),
            "--output-dir", out_dir,
            "--annotate", "yes",
            "--dump-predictions", "yes",
            "--batch-size", "4",
            "--threshold", "0.01",
            "--compute-stats", "no",
        ]
    )
    assert rc == 0
    dumped = [f for f in os.listdir(out_dir) if f.endswith(".npy")]
    assert len(dumped) == len(files)
    pred = np.load(os.path.join(out_dir, dumped[0]))
    assert pred.shape == (372, 1 + 1 + 4)  # (A, K+5) with K=1

    # ---- export ----------------------------------------------------------
    from ssd_tensorflow_tpu.cli.export_model import main as export_main

    bundle = str(tmp_path / "model.ssdtpu.npz")
    rc = export_main(
        [
            "--checkpoint-file", os.path.join(name, "final.ckpt.npz"),
            "--output-file", bundle,
        ]
    )
    assert rc == 0
    assert os.path.exists(bundle)

    # ---- infer straight from the exported bundle -------------------------
    bundle_out = str(tmp_path / "infer-bundle-out")
    rc = infer_main(
        [
            files[0],
            "--bundle", bundle,
            "--training-data", os.path.join(data_dir, "training-data.json"),
            "--output-dir", bundle_out,
            "--batch-size", "2",
            "--threshold", "0.01",
            "--compute-stats", "no",
            "--annotate", "yes",
        ]
    )
    assert rc == 0
    assert os.path.exists(
        os.path.join(bundle_out, os.path.basename(files[0]))
    )

    # ---- detect standalone ----------------------------------------------
    from ssd_tensorflow_tpu.cli.detect import main as detect_main

    det_dir = str(tmp_path / "detect-out")
    rc = detect_main(
        [
            files[0],
            "--model", bundle,
            "--output-dir", det_dir,
            "--batch-size", "2",
            "--threshold", "0.01",
        ]
    )
    assert rc == 0
    base = os.path.basename(files[0])
    assert os.path.exists(os.path.join(det_dir, base))
    assert os.path.exists(os.path.join(det_dir, base + ".txt"))


@pytest.mark.e2e
def test_stablehlo_export_roundtrip():
    """jax.export serialization of the fused inference fn round-trips."""
    import jax
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.models.ssd_vgg import (
        ModelConfig,
        apply_result,
        init_params,
    )

    cfg = ModelConfig(
        preset_name="test64", num_classes=3, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    def fn(images):
        return apply_result(params, images, cfg)

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.uint8)
    )
    blob = exported.serialize()
    assert len(blob) > 1_000_000  # params are baked in
    re = jax.export.deserialize(blob)
    out = re.call(np.zeros((1, 64, 64, 3), np.uint8))
    assert out.shape == (1, 372, 8)
    want = np.asarray(fn(jnp.zeros((1, 64, 64, 3), jnp.uint8)))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


@pytest.mark.e2e
def test_train_with_device_augment(dataset, tmp_path):
    """The train CLI with --device-augment: host stages, TPU augments."""
    root, data_dir, samples = dataset
    name = str(tmp_path / "proj-da")
    tb_dir = str(tmp_path / "tb-da")

    from ssd_tensorflow_tpu.cli.train import main as train_main

    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", "2",
            "--batch-size", "4",
            "--tensorboard-dir", tb_dir,
            "--checkpoint-interval", "2",
            "--num-workers", "0",
            "--compute-dtype", "float32",
            "--device-augment", "yes",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(name, "final.ckpt.npz"))


@pytest.mark.e2e
def test_train_graceful_shutdown(dataset, tmp_path):
    """SIGTERM/SIGUSR1 mid-run: the trainer finishes the current epoch,
    writes final.ckpt.npz stamped with the reached epoch, and exits 0 —
    a preempted run loses nothing (cli/train.py graceful-shutdown
    handler)."""
    import signal
    import threading

    root, data_dir, samples = dataset
    name = str(tmp_path / "proj-sig")

    # deliver the signal once the first epoch checkpoint lands; the loop
    # must then stop at the next epoch boundary, far before epoch 40
    first_ckpt = os.path.join(name, "e1.ckpt.npz")
    stop_watcher = threading.Event()

    def fire_when_training_started():
        while not stop_watcher.wait(0.05):
            if os.path.exists(first_ckpt):
                os.kill(os.getpid(), signal.SIGUSR1)
                return

    watcher = threading.Thread(target=fire_when_training_started)
    watcher.start()
    from ssd_tensorflow_tpu.cli.train import main as train_main

    try:
        rc = train_main(
            [
                "--name", name,
                "--data-dir", data_dir,
                "--epochs", "40",
                "--batch-size", "4",
                "--tensorboard-dir", str(tmp_path / "tb-sig"),
                "--checkpoint-interval", "1",
                "--num-workers", "0",
                "--compute-dtype", "float32",
            ]
        )
    finally:
        stop_watcher.set()
        watcher.join()
        signal.signal(signal.SIGUSR1, signal.SIG_DFL)
    assert rc == 0

    from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

    final = os.path.join(name, "final.ckpt.npz")
    assert os.path.exists(final)
    reached = checkpoint_config(final).get("epoch")
    assert reached is not None and 1 <= reached < 40

    # and --continue-training resumes from the interrupted epoch
    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", str(reached + 1),
            "--batch-size", "4",
            "--tensorboard-dir", str(tmp_path / "tb-sig"),
            "--checkpoint-interval", "5",
            "--num-workers", "0",
            "--compute-dtype", "float32",
            "--continue-training", "yes",
        ]
    )
    assert rc == 0
    assert checkpoint_config(final).get("epoch") == reached + 1


@pytest.mark.e2e
def test_train_epochs_per_run(dataset, tmp_path):
    """--epochs-per-run caps one process's epochs with a resumable final
    checkpoint — the restart-resume loop for leaky-runtime hosts
    (tools/leak_probe.py)."""
    root, data_dir, samples = dataset
    name = str(tmp_path / "proj-seg")
    from ssd_tensorflow_tpu.cli.train import main as train_main
    from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

    common = [
        "--name", name,
        "--data-dir", data_dir,
        "--epochs", "3",
        "--batch-size", "4",
        "--tensorboard-dir", str(tmp_path / "tb-seg"),
        "--checkpoint-interval", "10",
        "--num-workers", "0",
        "--compute-dtype", "float32",
    ]
    rc = train_main(common + ["--epochs-per-run", "2"])
    assert rc == 0
    final = os.path.join(name, "final.ckpt.npz")
    assert checkpoint_config(final).get("epoch") == 2

    # second run of the loop finishes the job
    rc = train_main(
        common + ["--epochs-per-run", "2", "--continue-training", "yes"]
    )
    assert rc == 0
    assert checkpoint_config(final).get("epoch") == 3


@pytest.mark.e2e
@pytest.mark.slow
def test_train_with_qat(dataset, tmp_path):
    """The train CLI with --qat: calibrates, then trains through the
    int8 fake-quantizer."""
    root, data_dir, samples = dataset
    name = str(tmp_path / "proj-qat")

    from ssd_tensorflow_tpu.cli.train import main as train_main

    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", "2",
            "--batch-size", "4",
            "--tensorboard-dir", str(tmp_path / "tb-qat"),
            "--checkpoint-interval", "2",
            "--num-workers", "0",
            "--qat", "yes",
        ]
    )
    assert rc == 0
    ckpt = os.path.join(name, "final.ckpt.npz")
    assert os.path.exists(ckpt)

    # the checkpoint carries the trained activation scales...
    from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

    scales = checkpoint_config(ckpt).get("qat_act_scales")
    assert scales and "conv1_1" in scales

    # ...and --quantize export deploys them without recalibration
    # (no --calibration-images / --allow-noise-calibration needed)
    from ssd_tensorflow_tpu.cli.export_model import main as export_main
    from ssd_tensorflow_tpu.inference import load_bundle

    bundle = str(tmp_path / "qat-int8.ssdtpu.npz")
    rc = export_main(
        ["--checkpoint-file", ckpt, "--output-file", bundle, "--quantize"]
    )
    assert rc == 0
    _, _, _, act_scales = load_bundle(bundle)
    assert act_scales == scales

    # ...and resuming --qat keeps training against the SAME scales
    # instead of recalibrating on the finetuned weights (the quantizer
    # must not change mid-run)
    rc = train_main(
        [
            "--name", name,
            "--data-dir", data_dir,
            "--epochs", "3",
            "--batch-size", "4",
            "--tensorboard-dir", str(tmp_path / "tb-qat"),
            "--checkpoint-interval", "3",
            "--num-workers", "0",
            "--qat", "yes",
            "--continue-training", "yes",
        ]
    )
    assert rc == 0
    resumed = checkpoint_config(os.path.join(name, "final.ckpt.npz"))
    assert resumed.get("qat_act_scales") == scales


@pytest.mark.e2e
def test_train_orbax_backend(dataset, tmp_path):
    """--checkpoint-backend orbax: epoch checkpoints in orbax layout,
    resume from the latest orbax step, final state mirrored to
    final.ckpt.npz for the deploy chain (VERDICT r3 item 5)."""
    pytest.importorskip("orbax.checkpoint")
    root, data_dir, samples = dataset
    name = str(tmp_path / "proj-orbax")

    from ssd_tensorflow_tpu.cli.train import main as train_main
    from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

    common = [
        "--name", name,
        "--data-dir", data_dir,
        "--batch-size", "4",
        "--tensorboard-dir", str(tmp_path / "tb-orbax"),
        "--checkpoint-interval", "1",
        "--num-workers", "0",
        "--compute-dtype", "float32",
        "--checkpoint-backend", "orbax",
    ]
    rc = train_main(common + ["--epochs", "2"])
    assert rc == 0
    # orbax step directories, not e{N}.ckpt.npz archives
    assert os.path.isdir(os.path.join(name, "1"))
    assert os.path.isdir(os.path.join(name, "2"))
    assert not os.path.exists(os.path.join(name, "e1.ckpt.npz"))
    # ...but the final state is mirrored as npz for infer/export
    final = os.path.join(name, "final.ckpt.npz")
    assert os.path.exists(final)
    assert checkpoint_config(final).get("epoch") == 2

    # resume picks up the latest orbax step
    rc = train_main(
        common + ["--epochs", "3", "--continue-training", "yes"]
    )
    assert rc == 0
    assert os.path.isdir(os.path.join(name, "3"))
    assert checkpoint_config(final).get("epoch") == 3

    # the mirrored npz drives inference end-to-end
    from ssd_tensorflow_tpu.cli.infer import main as infer_main

    rc = infer_main(
        [
            samples[8].filename,
            "--name", name,
            "--training-data", os.path.join(data_dir, "training-data.json"),
            "--output-dir", str(tmp_path / "orbax-infer-out"),
            "--batch-size", "1",
            "--threshold", "0.01",
            "--compute-stats", "no",
        ]
    )
    assert rc == 0


@pytest.mark.e2e
def test_infer_annotate_uses_training_data_colors(dataset, tmp_path, monkeypatch):
    """Without --data-source, annotation colors come from the
    training-data artifact (reference infer.py:131-142), not the green
    fallback (VERDICT r3 item 3)."""
    import jax

    root, data_dir, samples = dataset

    # an untrained checkpoint is enough — we only check the color path
    from ssd_tensorflow_tpu.inference import model_config_to_dict
    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_train_state,
    )
    from ssd_tensorflow_tpu.utils.checkpoint import save_checkpoint

    cfg = ModelConfig(
        preset_name="test64", num_classes=1, compute_dtype="float32"
    )
    state = make_train_state(
        init_params(jax.random.PRNGKey(0), cfg), TrainConfig(model=cfg)
    )
    name = str(tmp_path / "proj-colors")
    os.makedirs(name)
    save_checkpoint(
        os.path.join(name, "final.ckpt.npz"),
        jax.tree_util.tree_map(np.asarray, state),
        {
            "model": model_config_to_dict(cfg),
            "lid2name": {"0": "square"},
            "epoch": 0,
        },
    )

    drawn_colors = []
    from ssd_tensorflow_tpu.utils import summaries

    real_draw_box = summaries.draw_box

    def spy_draw_box(img, box, color):
        drawn_colors.append(tuple(color))
        return real_draw_box(img, box, color)

    monkeypatch.setattr(summaries, "draw_box", spy_draw_box)

    from ssd_tensorflow_tpu.cli.infer import main as infer_main

    rc = infer_main(
        [
            samples[0].filename,
            "--name", name,
            "--training-data", os.path.join(data_dir, "training-data.json"),
            "--output-dir", str(tmp_path / "colors-out"),
            "--annotate", "yes",
            "--batch-size", "1",
            "--threshold", "0.001",
            "--compute-stats", "no",
        ]
    )
    assert rc == 0
    # the untrained net at threshold 0.001 emits detections; every drawn
    # box must use the artifact's color for 'square', not fallback green
    assert drawn_colors, "no detections drawn — threshold too high?"
    assert set(drawn_colors) == {(0, 0, 255)}
