"""Width-packed stem and lazy-softmax scores path: parity contracts.

The packed stem (models/packed_conv.py) must compute exactly the same
function as the unpacked preprocess+conv1_1+conv1_2+pool1 chain, and
decode_scores must produce identical detections to decode_detections.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.packed_conv import (
    conv1_block_packed,
    pack_conv3x3_weights,
)
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_model,
    apply_result,
    apply_scores,
    init_params,
    preprocess,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import (
    DetectionConfig,
    decode_detections,
    decode_scores,
)
from ssd_tensorflow_tpu.presets import get_preset_by_name


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        preset_name="test64", num_classes=5, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    )
    return cfg, params, images


class TestPackedWeights:
    def test_pack_structure(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 8)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 1, (8,)), jnp.float32)
        wp, bp = pack_conv3x3_weights(w, b)
        assert wp.shape == (3, 3, 8, 16)
        assert bp.shape == (16,)
        np.testing.assert_array_equal(np.asarray(bp[:8]), np.asarray(b))
        # derivation spot-checks: (po=0,k=1) -> dxp=1, pi=0;
        # (po=0,k=0) -> dxp=0, pi=1; (po=1,k=2) -> dxp=2, pi=0
        np.testing.assert_array_equal(
            np.asarray(wp[:, 1, 0:4, 0:8]), np.asarray(w[:, 1])
        )
        np.testing.assert_array_equal(
            np.asarray(wp[:, 0, 4:8, 0:8]), np.asarray(w[:, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(wp[:, 2, 0:4, 8:16]), np.asarray(w[:, 2])
        )
        # never-reachable packed offsets stay zero
        assert float(jnp.abs(wp[:, 0, 0:4, 0:8]).max()) == 0.0
        assert float(jnp.abs(wp[:, 2, 4:8, 8:16]).max()) == 0.0


class TestPackedStemParity:
    def test_pool1_matches_unpacked(self, setup):
        cfg, params, images = setup
        from ssd_tensorflow_tpu.models.layers import conv_relu, max_pool

        x = preprocess(images, cfg)
        y = conv_relu(params["conv1_1"], x)
        y = conv_relu(params["conv1_2"], y)
        ref = max_pool(y, 2, 2)
        got = conv1_block_packed(params, images, cfg.mean_bgr, "float32")
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )

    def test_full_forward_matches_unpacked(self, setup):
        cfg, params, images = setup
        cfg_u = dataclasses.replace(cfg, packed_stem=False)
        lp, locp = apply_model(params, images, cfg)
        lu, locu = apply_model(params, images, cfg_u)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lu), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(locp), np.asarray(locu), atol=1e-3
        )

    def test_grad_flows_through_packed_stem(self, setup):
        cfg, params, images = setup

        def loss(p):
            logits, _ = apply_model(p, images, cfg)
            return jnp.sum(logits**2)

        g = jax.jit(jax.grad(loss))(params)
        g11 = np.asarray(g["conv1_1"]["w"])
        g12 = np.asarray(g["conv1_2"]["w"])
        assert np.isfinite(g11).all() and np.abs(g11).max() > 0
        assert np.isfinite(g12).all() and np.abs(g12).max() > 0

    def test_odd_width_rejected(self, setup):
        cfg, params, _ = setup
        bad = jnp.zeros((1, 64, 63, 3), jnp.uint8)
        with pytest.raises(AssertionError, match="even"):
            conv1_block_packed(params, bad, cfg.mean_bgr, "float32")


class TestScoresPath:
    def test_decode_scores_matches_decode_detections(self, setup):
        cfg, params, images = setup
        anchors = jnp.asarray(anchors_for_preset(get_preset_by_name("test64")))
        det = DetectionConfig(top_k=32, confidence_threshold=0.01)

        r = apply_result(params, images, cfg)
        K = cfg.num_classes
        d1 = decode_detections(r[..., : K + 1], r[..., K + 1 :], anchors, det)
        conf, cls, locs = apply_scores(params, images, cfg)
        d2 = decode_scores(conf, cls, locs, anchors, det)

        np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d2.valid))
        v = np.asarray(d1.valid)
        np.testing.assert_array_equal(
            np.asarray(d1.classes)[v], np.asarray(d2.classes)[v]
        )
        np.testing.assert_allclose(
            np.asarray(d1.scores)[v], np.asarray(d2.scores)[v], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d1.boxes)[v], np.asarray(d2.boxes)[v], rtol=1e-5
        )

    def test_conf_is_softmax_prob(self, setup):
        cfg, params, images = setup
        conf, cls, _ = apply_scores(params, images, cfg)
        logits, _ = apply_model(params, images, cfg)
        probs = jax.nn.softmax(logits, axis=-1)
        fg = np.asarray(probs[..., : cfg.num_classes])
        np.testing.assert_allclose(
            np.asarray(conf), fg.max(-1), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(cls), fg.argmax(-1))

