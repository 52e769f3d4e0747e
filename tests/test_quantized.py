"""Quantized inference path: numerical fidelity vs the float model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.quantized import (
    QuantizedModel,
    quantize_weights,
)
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_result,
    init_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        preset_name="test64", num_classes=3, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    return cfg, params, images


class TestQuantizeWeights:
    def test_roundtrip_error_bounded(self, setup):
        _, params, _ = setup
        q = quantize_weights(params)
        w = np.asarray(params["conv1_1"]["w"], np.float32)
        wq = np.asarray(q["conv1_1"]["wq"], np.float32)
        s = np.asarray(q["conv1_1"]["w_scale"])
        recon = wq * s
        # max error bounded by half a quantization step per channel
        err = np.abs(recon - w)
        assert (err <= s / 2 + 1e-7).all()
        assert q["conv1_1"]["wq"].dtype == jnp.int8

    def test_non_conv_leaves_passthrough(self, setup):
        _, params, _ = setup
        q = quantize_weights(params)
        np.testing.assert_array_equal(
            np.asarray(q["l2_norm_conv4_3"]["scale"]),
            np.asarray(params["l2_norm_conv4_3"]["scale"]),
        )


class TestQuantizedForward:
    def test_close_to_float_model(self, setup):
        cfg, params, images = setup
        # max-abs calibration (the default since the vgg512 parity
        # finding — see models/quantized.calibrate_activation_scales)
        qm = QuantizedModel(params, cfg, images, percentile=100)
        got = np.asarray(qm.result(jnp.asarray(images)))
        want = np.asarray(apply_result(params, jnp.asarray(images), cfg))
        assert got.shape == want.shape

        # class probabilities: argmax agreement on the overwhelming
        # majority of anchors + close probability values
        agree = (got[..., :4].argmax(-1) == want[..., :4].argmax(-1)).mean()
        assert agree > 0.98, f"class argmax agreement {agree}"
        prob_err = np.abs(got[..., :4] - want[..., :4]).mean()
        assert prob_err < 0.02, f"probability MAE {prob_err}"
        # locations: the decode clamp region is [-100, 100]; errors of a
        # few tenths do not move boxes materially (x10/x5 variances)
        loc_err = np.abs(got[..., 4:] - want[..., 4:]).mean()
        assert loc_err < 0.5, f"location MAE {loc_err}"


class TestQuantizedBundle:
    def test_export_and_load_roundtrip(self, setup, tmp_path):
        cfg, params, images = setup
        from ssd_tensorflow_tpu.inference import (
            InferenceModel,
            load_bundle,
            save_bundle,
        )
        from ssd_tensorflow_tpu.models.quantized import QuantizedModel

        qm = QuantizedModel(params, cfg, images)
        path = str(tmp_path / "model.int8.npz")
        save_bundle(path, qm.qparams, cfg, {0: "a"}, act_scales=qm.act_scales)
        p2, cfg2, lid2name, scales2 = load_bundle(path)
        assert scales2 is not None
        assert lid2name == {0: "a"}
        np.testing.assert_array_equal(
            np.asarray(p2["conv1_1"]["wq"]), np.asarray(qm.qparams["conv1_1"]["wq"])
        )

        model = InferenceModel.from_bundle(path)
        got = np.asarray(model.run(jnp.asarray(images))[0])
        want = np.asarray(qm.result(jnp.asarray(images)))
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestCalibration:
    def test_percentile_clips_outliers(self, setup):
        cfg, params, images = setup
        from ssd_tensorflow_tpu.models.quantized import (
            calibrate_activation_scales,
        )

        s100 = calibrate_activation_scales(params, images, cfg, percentile=100)
        s99 = calibrate_activation_scales(params, images, cfg, percentile=99.0)
        assert set(s100) == set(s99)
        assert all(s99[k] <= s100[k] + 1e-9 for k in s100)
        assert any(s99[k] < s100[k] for k in s100)

    def test_multi_batch_chunking_matches_max(self, setup):
        cfg, params, images = setup
        import numpy as np

        from ssd_tensorflow_tpu.models.quantized import (
            calibrate_activation_scales,
        )

        many = np.concatenate([np.asarray(images)] * 3, axis=0)
        one = calibrate_activation_scales(
            params, images, cfg, percentile=100, batch_size=8
        )
        chunked = calibrate_activation_scales(
            params, many, cfg, percentile=100, batch_size=1
        )
        for k in one:
            np.testing.assert_allclose(chunked[k], one[k], rtol=1e-6)


class TestQuantizedScoresPath:
    def test_forward_scores_matches_forward(self, rng):
        """The int8 lazy-softmax scores path (cells-minor) produces the
        same per-anchor confidence/class/locs as the full result
        tensor."""
        import jax
        import jax.numpy as jnp

        from ssd_tensorflow_tpu.models.quantized import (
            _forward,
            _forward_scores,
            calibrate_activation_scales,
            quantize_weights,
        )
        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params

        cfg = ModelConfig(
            preset_name="test64", num_classes=3, compute_dtype="float32"
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        images = jnp.asarray(
            rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
        )
        scales = calibrate_activation_scales(params, images, cfg)
        qp = quantize_weights(params)

        r = _forward(qp, scales, images, cfg)
        K = cfg.num_classes
        probs, locs_ref = r[..., : K + 1], r[..., K + 1 :]
        fg = np.asarray(probs[..., :K])

        conf, cls, locs = _forward_scores(qp, scales, images, cfg)
        np.testing.assert_array_equal(np.asarray(cls), fg.argmax(-1))
        np.testing.assert_allclose(
            np.asarray(conf), fg.max(-1), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(locs), np.asarray(locs_ref), rtol=1e-4, atol=1e-5
        )


class TestPackedInt8Stem:
    def test_packed_stem_matches_unpacked(self, rng):
        """The width-packed int8 stem computes the SAME sums as the
        unpacked one (structured zero weights). With f32 accumulation
        (the fast path on the current v5e runtime — see _qconv) the
        only permitted difference is f32 summation order, so the whole
        quantized forward must agree to float tolerance."""
        import dataclasses

        import jax

        import ssd_tensorflow_tpu.models.quantized as q
        from ssd_tensorflow_tpu.models.quantized import (
            QuantizedModel,
            _forward,
        )
        from ssd_tensorflow_tpu.models.ssd_vgg import (
            ModelConfig,
            init_params,
        )

        cfg_packed = ModelConfig(
            preset_name="test64", num_classes=3, compute_dtype="float32",
            packed_stem=True,
        )
        cfg_unpacked = dataclasses.replace(cfg_packed, packed_stem=False)
        params = init_params(jax.random.PRNGKey(0), cfg_packed)
        images = jnp.asarray(
            rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
        )
        qm = QuantizedModel(params, cfg_unpacked, images, percentile=100.0)
        out_unpacked = qm.result(images)
        prev = q.INT8_PACKED_STEM
        q.INT8_PACKED_STEM = True  # measured-off by default on v5e
        try:
            out_packed = jax.jit(
                lambda p, x: _forward(p, qm.act_scales, x, cfg_packed)
            )(qm.qparams, images)
        finally:
            q.INT8_PACKED_STEM = prev
        np.testing.assert_allclose(
            np.asarray(out_packed), np.asarray(out_unpacked),
            rtol=1e-5, atol=1e-5,
        )
