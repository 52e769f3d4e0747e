"""QAT: STE gradients, fake-quant/int8-path agreement, and that the QAT
train step actually learns through the quantizer."""

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tensorflow_tpu.models.qat import (
    fake_quant_act,
    fake_quant_weight,
    make_qat_train_step,
    qat_apply_model,
)
from ssd_tensorflow_tpu.models.quantized import (
    _forward,
    calibrate_activation_scales,
    quantize_weights,
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
