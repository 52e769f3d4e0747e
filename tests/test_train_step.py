"""Train/eval step tests, including 8-virtual-device data parallelism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
from ssd_tensorflow_tpu.parallel.mesh import make_mesh
from ssd_tensorflow_tpu.parallel.train_step import (
    TrainConfig,
    lr_schedule,
    make_eval_step,
    make_train_state,
    make_train_step,
    shard_batch,
    shard_state,
)
from ssd_tensorflow_tpu.presets import get_preset_by_name

from reference_impl import random_boxes

# The tiny test64 preset (64x64, 4 maps, 372 anchors) exercises the
# same step/sharding contracts as vgg300 at a fraction of the CPU cost;
# full-resolution training is covered by the slow e2e smoke test.
K = 20


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(
        model=ModelConfig(
            preset_name="test64", num_classes=K, compute_dtype="float32"
        ),
        detect=DetectionConfig(top_k=32, confidence_threshold=0.5),
    )
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    anchors = anchors_for_preset(get_preset_by_name("test64"))
    return cfg, params, anchors


def _batch(rng, b, g=8, size=64):
    gt = np.stack([random_boxes(rng, g, tight=True) for _ in range(b)])
    return {
        "images": rng.uniform(0, 255, (b, size, size, 3)).astype(np.float32),
        "gt_boxes": gt.astype(np.float32),
        "gt_labels": rng.integers(0, K, (b, g)).astype(np.int32),
        "gt_mask": np.ones((b, g), dtype=bool),
    }


class TestLRSchedule:
    def test_piecewise_boundaries(self):
        sched = lr_schedule((0.1, 0.01, 0.001), (100, 200))
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(100)) == pytest.approx(0.1)
        assert float(sched(101)) == pytest.approx(0.01)
        assert float(sched(200)) == pytest.approx(0.01)
        assert float(sched(201)) == pytest.approx(0.001)


class TestTrainStep:
    def test_loss_decreases_and_params_update(self, setup):
        cfg, params, anchors = setup
        rng = np.random.default_rng(0)
        step = make_train_step(cfg, anchors, donate=False)
        state = make_train_state(params, cfg)
        batch = _batch(rng, 2)

        w0 = np.asarray(state.params["conv8_1"]["w"]).copy()
        losses_hist = []
        for _ in range(3):
            state, losses, dets = step(state, batch)
            losses_hist.append(float(losses["total"]))
        assert int(state.step) == 3
        assert all(np.isfinite(losses_hist))
        # same batch repeated -> SGD must reduce the loss
        assert losses_hist[-1] < losses_hist[0]
        w1 = np.asarray(state.params["conv8_1"]["w"])
        assert np.abs(w1 - w0).max() > 0
        assert dets.boxes.shape == (2, 32, 4)

    def test_eval_step(self, setup):
        cfg, params, anchors = setup
        rng = np.random.default_rng(1)
        eval_step = make_eval_step(cfg, anchors)
        losses, dets = eval_step(params, _batch(rng, 2))
        assert np.isfinite(float(losses["total"]))
        assert dets.scores.shape == (2, 32)


class TestDataParallel:
    def test_sharded_step_matches_single_device(self, setup):
        cfg, params, anchors = setup
        rng = np.random.default_rng(2)
        assert jax.device_count() == 8

        mesh = make_mesh()  # 8-way data parallel
        step = make_train_step(cfg, anchors, donate=False)
        batch = _batch(rng, 8)

        # sharded run
        state_sh = shard_state(make_train_state(params, cfg), mesh)
        batch_sh = shard_batch(batch, mesh)
        state_sh, losses_sh, _ = step(state_sh, batch_sh)

        # single-device run
        state_1 = make_train_state(params, cfg)
        state_1, losses_1, _ = step(state_1, batch)

        np.testing.assert_allclose(
            float(losses_sh["total"]), float(losses_1["total"]), rtol=1e-5
        )
        w_sh = np.asarray(state_sh.params["conv9_1"]["w"])
        w_1 = np.asarray(state_1.params["conv9_1"]["w"])
        np.testing.assert_allclose(w_sh, w_1, rtol=1e-4, atol=1e-6)

    def test_tensor_parallel_shards_conv6(self, setup):
        cfg, params, anchors = setup
        mesh = make_mesh(data=4, model=2)
        state = shard_state(
            make_train_state(params, cfg), mesh, tensor_parallel=True
        )
        shardings = state.params["mod_conv6"]["w"].sharding
        spec = shardings.spec
        assert "model" in str(spec)

        # the TP-sharded state must still train
        rng = np.random.default_rng(3)
        step = make_train_step(cfg, anchors, donate=False)
        batch = shard_batch(_batch(rng, 4), mesh)
        state, losses, _ = step(state, batch)
        assert np.isfinite(float(losses["total"]))


class TestRemat:
    def test_remat_matches_baseline(self, setup):
        cfg, params, anchors = setup
        import dataclasses

        rng = np.random.default_rng(9)
        batch = _batch(rng, 1)
        cfg_remat = dataclasses.replace(cfg, remat=True)

        s0 = make_train_state(params, cfg)
        s1 = make_train_state(params, cfg_remat)
        step0 = make_train_step(cfg, anchors, donate=False)
        step1 = make_train_step(cfg_remat, anchors, donate=False)
        s0, l0, _ = step0(s0, batch)
        s1, l1, _ = step1(s1, batch)
        np.testing.assert_allclose(
            float(l0["total"]), float(l1["total"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s0.params["conv9_1"]["w"]),
            np.asarray(s1.params["conv9_1"]["w"]),
            rtol=1e-5, atol=1e-7,
        )
