"""ModelConfig.padded_heads: lane-aligned head groups are math-identical.

The scores inference path may pad each classifier's per-anchor output
group from nv (= K+5) to a multiple of 32 with structured zero channels
(models/ssd_vgg.pad_head_vars) so the cells-minor transpose in
reduce_head_maps splits on vector-lane boundaries. The pad channels
carry zero weights/bias and are sliced away after the transpose, so the
padded model must produce the same scores as the exact one — bit-exact
on the int8 path (zero int8 weights add exact int32 zeros).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.quantized import _forward_scores, QuantizedModel
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_scores,
    init_params,
    pad_head_vars,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        preset_name="test64", num_classes=3, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    images = jnp.asarray(
        rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    )
    return cfg, params, images


def test_num_vars_padded_rounds_to_32():
    assert ModelConfig(num_classes=20).num_vars_padded == 25
    assert ModelConfig(num_classes=20, padded_heads=True).num_vars_padded == 32
    assert ModelConfig(num_classes=30, padded_heads=True).num_vars_padded == 64


def test_pad_head_vars_zero_extension():
    w = jnp.arange(2 * 2 * 3 * 2 * 5, dtype=jnp.float32).reshape(2, 2, 3, 10)
    b = jnp.arange(10, dtype=jnp.float32)
    wp, bp = pad_head_vars(w, b, ns=2, nv=5, nvp=8)
    assert wp.shape == (2, 2, 3, 16) and bp.shape == (16,)
    # original channels land group-wise at [g*8, g*8+5)
    np.testing.assert_array_equal(
        np.asarray(wp).reshape(2, 2, 3, 2, 8)[..., :5],
        np.asarray(w).reshape(2, 2, 3, 2, 5),
    )
    assert np.asarray(wp).reshape(2, 2, 3, 2, 8)[..., 5:].sum() == 0
    np.testing.assert_array_equal(np.asarray(bp).reshape(2, 8)[:, :5], [
        [0, 1, 2, 3, 4], [5, 6, 7, 8, 9]])
    assert np.asarray(bp).reshape(2, 8)[:, 5:].sum() == 0


def test_float_scores_parity(setup):
    cfg, params, images = setup
    cfg_pad = dataclasses.replace(cfg, padded_heads=True)
    conf, cls, locs = jax.jit(
        apply_scores, static_argnums=2)(params, images, cfg)
    conf_p, cls_p, locs_p = jax.jit(
        apply_scores, static_argnums=2)(params, images, cfg_pad)
    np.testing.assert_array_equal(np.asarray(cls), np.asarray(cls_p))
    np.testing.assert_allclose(
        np.asarray(conf), np.asarray(conf_p), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(locs), np.asarray(locs_p), rtol=1e-6, atol=1e-6
    )


def test_int8_scores_parity_bit_exact(setup):
    cfg, params, images = setup
    qm = QuantizedModel(params, cfg, np.asarray(images), percentile=100)
    cfg_pad = dataclasses.replace(cfg, padded_heads=True)
    out = jax.jit(_forward_scores, static_argnums=3)(
        qm.qparams, qm.act_scales, images, cfg
    )
    out_p = jax.jit(_forward_scores, static_argnums=3)(
        qm.qparams, qm.act_scales, images, cfg_pad
    )
    for a, b in zip(out, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
