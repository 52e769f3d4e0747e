"""QAT: STE gradients, fake-quant/int8-path agreement, and that the QAT
train step actually learns through the quantizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tensorflow_tpu.models.qat import (
    fake_quant_act,
    fake_quant_weight,
    make_qat_forward,
    make_qat_train_step,
    qat_apply_model,
)
from ssd_tensorflow_tpu.models.quantized import (
    _forward,
    calibrate_activation_amax,
    calibrate_activation_scales,
    quantize_weights,
    quantize_weights_folded,
)
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.presets import get_preset_by_name


def setup_small(rng, n_images=2):
    cfg = ModelConfig(
        preset_name="test64", num_classes=3, compute_dtype="float32",
        l2_norm_eps=1e-3,  # the QAT eps contract (models/qat.py)
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.integers(0, 256, (n_images, 64, 64, 3), dtype=np.uint8)
    )
    scales = calibrate_activation_scales(params, images, cfg)
    return cfg, params, images, scales


class TestFakeQuant:
    def test_weight_quantizes_to_127_levels(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
        q = fake_quant_weight(w)
        s = np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0
        levels = np.asarray(q) / s
        np.testing.assert_allclose(levels, np.round(levels), atol=1e-4)
        assert np.abs(np.asarray(q) - np.asarray(w)).max() <= s.max() * 0.5 + 1e-6

    def test_ste_gradient_is_identity(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 4, 4)).astype(np.float32))
        g = jax.grad(lambda w: fake_quant_weight(w).sum())(w)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
        x = jnp.asarray(rng.normal(0, 1, (8, 8)).astype(np.float32))
        gx = jax.grad(lambda x: fake_quant_act(x, 0.05).sum())(x)
        np.testing.assert_allclose(np.asarray(gx), 1.0, atol=1e-6)

    def test_act_gradient_gates_at_saturation(self):
        """Clipped STE: no gradient where the quantizer saturates."""
        x = jnp.asarray([-100.0, -1.0, 0.0, 1.0, 100.0])
        g = jax.grad(lambda x: fake_quant_act(x, 0.1).sum())(x)
        np.testing.assert_allclose(np.asarray(g), [0, 1, 1, 1, 0], atol=1e-6)

    def test_act_clips_to_int8_range(self):
        x = jnp.asarray([-1000.0, -0.4, 0.0, 0.4, 1000.0])
        q = np.asarray(fake_quant_act(x, 0.1))
        np.testing.assert_allclose(q, [-12.7, -0.4, 0.0, 0.4, 12.7], atol=1e-4)


class TestQATForward:
    def test_matches_int8_deploy_path(self, rng):
        """Fake-quant float and the int8 pipeline compute the same
        network (up to accumulator/bf16-requant rounding)."""
        cfg, params, images, scales = setup_small(rng)
        logits, locs = qat_apply_model(params, images, cfg, scales)
        probs = jax.nn.softmax(logits, axis=-1)

        qp = quantize_weights(params)
        ref = _forward(qp, scales, images, cfg)
        K = cfg.num_classes
        ref_probs, ref_locs = ref[..., : K + 1], ref[..., K + 1 :]

        agree = (
            np.asarray(jnp.argmax(probs, -1))
            == np.asarray(jnp.argmax(ref_probs, -1))
        ).mean()
        assert agree > 0.95, f"argmax agreement {agree}"
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(ref_probs), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(locs), np.asarray(ref_locs), atol=0.15
        )

    def test_gradients_flow_to_all_convs(self, rng):
        cfg, params, images, scales = setup_small(rng)

        def loss(p):
            logits, locs = qat_apply_model(p, images, cfg, scales)
            return (logits**2).mean() + (locs**2).mean()

        g = jax.jit(jax.grad(loss))(params)
        for name in ("conv1_1", "conv4_3", "mod_conv7", "classifier0"):
            gw = np.asarray(g[name]["w"])
            assert np.isfinite(gw).all() and np.abs(gw).max() > 0, name


class TestQATTraining:
    def test_loss_decreases_through_quantizer(self, rng):
        from ssd_tensorflow_tpu.parallel.train_step import (
            TrainConfig,
            make_train_state,
        )

        cfg, params, images, scales = setup_small(rng, n_images=4)
        tcfg = TrainConfig(
            model=cfg,
            lr_values=(0.001,),
            lr_boundaries=(),
            weight_decay=0.0,
            detect=None,
        )
        anchors = anchors_for_preset(get_preset_by_name("test64"))
        step = make_qat_train_step(tcfg, anchors, scales, donate=False)
        state = make_train_state(params, tcfg)
        # the box sits exactly on a 4x4-map anchor (center (0.375, 0.375),
        # scale 0.4) so target assignment yields positives
        batch = {
            "images": images,
            "gt_boxes": jnp.asarray(
                np.tile(
                    [[0.375, 0.375, 0.4, 0.4]], (4, 2, 1)
                ).astype(np.float32)
            ),
            "gt_labels": jnp.ones((4, 2), jnp.int32),
            "gt_mask": jnp.ones((4, 2), bool),
        }
        first = None
        for _ in range(25):
            state, losses, _ = step(state, batch)
            if first is None:
                first = float(losses["total"])
        last = float(losses["total"])
        assert np.isfinite(last)
        assert last < 0.7 * first, (first, last)


FAMILY_PRESETS = ["rtest64", "mntest64"]


def setup_family(preset_name, rng, n_images=2):
    cfg = ModelConfig(
        preset_name=preset_name, num_classes=3, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.integers(0, 256, (n_images, 64, 64, 3), dtype=np.uint8)
    )
    amax = calibrate_activation_amax(params, np.asarray(images), cfg)
    return cfg, params, images, amax


class TestFamilyQAT:
    """QAT for the GN families trains through the folded per-channel
    quantizer the int8 deploy path uses (quantize_weights_folded)."""

    # the deploy walk runs bf16 between int8 convs while the QAT twin is
    # f32, so the agreement floor includes bf16 noise — same floors as
    # tests/test_quantized_families.TestFamilyQuantizedForward
    AGREE = {"rtest64": 0.98, "mntest64": 0.95}

    @pytest.mark.parametrize("preset_name", FAMILY_PRESETS)
    def test_matches_int8_deploy_path(self, preset_name, rng):
        cfg, params, images, amax = setup_family(preset_name, rng)
        fwd = make_qat_forward(cfg, amax)
        logits, locs = jax.jit(fwd)(params, images)
        probs = jax.nn.softmax(logits, axis=-1)

        qp = quantize_weights_folded(params, amax)
        ref = np.asarray(_forward(qp, {}, images, cfg), np.float32)
        K = cfg.num_classes
        ref_probs, ref_locs = ref[..., : K + 1], ref[..., K + 1 :]

        agree = (
            np.asarray(jnp.argmax(probs, -1)) == ref_probs.argmax(-1)
        ).mean()
        assert agree > self.AGREE[preset_name], f"argmax agreement {agree}"
        prob_err = np.abs(np.asarray(probs) - ref_probs).mean()
        assert prob_err < 0.02, f"probability MAE {prob_err}"
        loc_err = np.abs(np.asarray(locs) - ref_locs).mean()
        assert loc_err < 0.5, f"location MAE {loc_err}"

    @pytest.mark.parametrize("preset_name", FAMILY_PRESETS)
    def test_gradients_flow_to_every_conv(self, preset_name, rng):
        """Every conv (full, pointwise, depthwise, head) and every
        GroupNorm leaf gets a finite nonzero gradient through the
        quantizers."""
        cfg, params, images, amax = setup_family(preset_name, rng)
        # resnet zero-initializes each block's gn2 scale (identity
        # residual), which legitimately zeroes the residual branch's
        # conv grads at init — in the float path too. Nudge those so
        # this test sees the quantizers, not the init scheme.
        for name, leaf in params.items():
            if isinstance(leaf, dict) and "scale" in leaf:
                s = np.asarray(leaf["scale"])
                if not np.any(s):
                    leaf["scale"] = jnp.full_like(leaf["scale"], 0.5)
        fwd = make_qat_forward(cfg, amax)

        def loss(p):
            logits, locs = fwd(p, images)
            return (logits**2).mean() + (locs**2).mean()

        g = jax.jit(jax.grad(loss))(params)
        saw_dw = False
        for name, leaf in g.items():
            if not isinstance(leaf, dict):
                continue
            for k, arr in leaf.items():
                arr = np.asarray(arr)
                assert np.isfinite(arr).all(), (name, k)
            if "w" in leaf:
                saw_dw = saw_dw or name.endswith("_dw")
                assert np.abs(np.asarray(leaf["w"])).max() > 0, name
        assert saw_dw == (preset_name == "mntest64")

    def test_family_train_step_learns(self, rng):
        from ssd_tensorflow_tpu.parallel.train_step import (
            TrainConfig,
            make_train_state,
        )

        cfg, params, images, amax = setup_family("mntest64", rng)
        images = jnp.concatenate([images, images])
        tcfg = TrainConfig(
            model=cfg,
            lr_values=(0.001,),
            lr_boundaries=(),
            weight_decay=0.0,
            detect=None,
        )
        anchors = anchors_for_preset(get_preset_by_name("mntest64"))
        step = make_qat_train_step(tcfg, anchors, amax, donate=False)
        state = make_train_state(params, tcfg)
        batch = {
            "images": images,
            "gt_boxes": jnp.asarray(
                np.tile(
                    [[0.375, 0.375, 0.4, 0.4]], (4, 2, 1)
                ).astype(np.float32)
            ),
            "gt_labels": jnp.ones((4, 2), jnp.int32),
            "gt_mask": jnp.ones((4, 2), bool),
        }
        first = None
        for _ in range(25):
            state, losses, _ = step(state, batch)
            if first is None:
                first = float(losses["total"])
        last = float(losses["total"])
        assert np.isfinite(last)
        assert last < 0.8 * first, (first, last)
