"""Data-parallel (sharded) inference: mesh run == single-device run.

InferenceModel(mesh=...) replicates params and shards each batch's
leading dim over the mesh's 'data' axis. The fused program (preprocess
+ forward + decode + NMS) is per-image, so XLA partitions it without
collectives and every detection must match the unsharded run exactly.
Runs on the conftest-forced 8-virtual-CPU-device backend — the standard
fake multi-chip backend (SURVEY.md §4).
"""

import os

import numpy as np
import pytest

import jax

from ssd_tensorflow_tpu.inference import InferenceModel
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
from ssd_tensorflow_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        preset_name="test64", num_classes=3, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    detection = DetectionConfig(top_k=16, confidence_threshold=0.01)
    return cfg, params, images, detection


class TestShardedInference:
    def test_detections_match_single_device(self, setup):
        cfg, params, images, detection = setup
        base = InferenceModel(params, cfg, detection=detection)
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        sharded = InferenceModel(params, cfg, detection=detection, mesh=mesh)

        ref = base.run(images)[1]
        got = sharded.run(images)[1]
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_scores_path_matches_single_device(self, setup):
        cfg, params, images, detection = setup
        base = InferenceModel(params, cfg, detection=detection)
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        sharded = InferenceModel(params, cfg, detection=detection, mesh=mesh)

        ref = base.detect_boxes(images)
        got = sharded.detect_boxes(images)
        assert len(ref) == len(got) == 8
        for rb, gb in zip(ref, got):
            assert len(rb) == len(gb)
            for (rc, rbox), (gc, gbox) in zip(rb, gb):
                assert abs(rc - gc) < 1e-5
                assert rbox.labelid == gbox.labelid

    def test_batch_actually_sharded(self, setup):
        cfg, params, images, detection = setup
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        model = InferenceModel(params, cfg, detection=detection, mesh=mesh)
        x = model._to_device(images)
        assert len(x.sharding.device_set) == 4
        # leading dim split 4 ways: each shard holds 2 of the 8 images
        assert x.addressable_shards[0].data.shape[0] == 2

    def test_indivisible_batch_rejected(self, setup):
        cfg, params, images, detection = setup
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        model = InferenceModel(params, cfg, detection=detection, mesh=mesh)
        with pytest.raises(ValueError, match="not divisible"):
            model.run(images[:6])


@pytest.mark.slow
class TestShardedInt8Inference:
    def test_int8_detections_match_single_device(self, setup):
        """The deploy (int8 W8A8) program partitions over the mesh too —
        int8 matmuls are per-image, so shards must agree exactly."""
        cfg, params, images, detection = setup
        from ssd_tensorflow_tpu.models.quantized import (
            calibrate_activation_scales,
            quantize_weights,
        )

        act_scales = calibrate_activation_scales(
            params, images[:2], cfg, percentile=99.9
        )
        qparams = quantize_weights(params)
        base = InferenceModel(
            qparams, cfg, detection=detection, act_scales=act_scales
        )
        mesh = make_mesh(data=4, devices=jax.devices()[:4])
        sharded = InferenceModel(
            qparams, cfg, detection=detection, act_scales=act_scales,
            mesh=mesh,
        )
        ref = base.run(images)[1]
        got = sharded.run(images)[1]
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


class TestDetectCLIDataParallel:
    def test_detect_runs_sharded(self, setup, tmp_path):
        cv2 = pytest.importorskip("cv2")
        cfg, params, images, _ = setup
        from ssd_tensorflow_tpu.cli.detect import main as detect_main
        from ssd_tensorflow_tpu.inference import save_bundle

        bundle = str(tmp_path / "m.ssdtpu.npz")
        save_bundle(bundle, params, cfg, {0: "a", 1: "b", 2: "c"})
        f = str(tmp_path / "in.jpg")
        cv2.imwrite(f, images[0])

        rc = detect_main(
            [
                f,
                "--model", bundle,
                "--output-dir", str(tmp_path / "out"),
                "--batch-size", "2",
                "--threshold", "0.01",
                "--data-parallel", "2",
            ]
        )
        assert rc == 0
        assert os.path.exists(tmp_path / "out" / "in.jpg.txt")

    def test_detect_rejects_indivisible_batch(self, setup, tmp_path):
        cfg, params, images, _ = setup
        from ssd_tensorflow_tpu.cli.detect import main as detect_main

        rc = detect_main(
            [
                "whatever.jpg",
                "--batch-size", "3",
                "--data-parallel", "2",
            ]
        )
        assert rc == 1
