"""Parity tests for the experimental fused-stem Pallas kernel.

ops/stem_pallas.py is an optional inference backend, wired into the
model behind ``ModelConfig(pallas_stem=True)`` (default off — see the
module docstring for the measured tradeoffs). These tests pin its math
to the width-packed XLA stem it replaces, across edge cases the kernel
handles specially: tile-exact heights, heights needing padding, the
single-tile case, and the SAME-padding zero semantics at image
borders — plus the model-level wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tensorflow_tpu.models.packed_conv import conv1_block_packed
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
from ssd_tensorflow_tpu.ops.stem_pallas import fused_stem_pallas


@pytest.fixture(scope="module")
def params():
    cfg = ModelConfig(preset_name="vgg300", num_classes=20)
    return init_params(jax.random.PRNGKey(0), cfg)


MEAN = (104.0, 117.0, 123.0)


@pytest.mark.parametrize(
    "h,w",
    [
        (32, 64),   # single row-tile
        (64, 64),   # two tiles, no padding
        (96, 64),   # three tiles
        (300, 300), # height not a multiple of the 32-row tile (vgg300)
    ],
)
def test_matches_packed_stem(params, h, w):
    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    ref = conv1_block_packed(params, img, MEAN, "bfloat16", f32_out=True)
    got = fused_stem_pallas(params, img, MEAN, "bfloat16", interpret=True)
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    assert got.dtype == jnp.bfloat16
    # bf16 summation-order differences only
    diff = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref.astype(jnp.float32)))
    assert float(diff) <= 0.005 * float(scale) + 0.25


def test_float_input(params):
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    ref = conv1_block_packed(params, img, MEAN, "bfloat16", f32_out=True)
    got = fused_stem_pallas(params, img, MEAN, "bfloat16", interpret=True)
    diff = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    assert float(diff) <= 0.5


def test_rejects_non_bf16(params):
    img = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    with pytest.raises(AssertionError):
        fused_stem_pallas(params, img, MEAN, "float32", interpret=True)


def test_model_wiring_pallas_stem():
    """ModelConfig(pallas_stem=True) routes inference through the DMA
    kernel (interpret-mode off-TPU) and matches the packed-stem scores."""
    from ssd_tensorflow_tpu.models.ssd_vgg import apply_scores

    cfg_ref = ModelConfig(preset_name="test64", num_classes=3)
    cfg_pal = ModelConfig(preset_name="test64", num_classes=3,
                          pallas_stem=True)
    p = init_params(jax.random.PRNGKey(1), cfg_ref)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    conf_r, cls_r, locs_r = apply_scores(p, img, cfg_ref)
    conf_p, cls_p, locs_p = apply_scores(p, img, cfg_pal)
    assert conf_r.shape == conf_p.shape
    # the stems differ only in bf16 summation order; downstream conf and
    # locs must agree tightly and the argmax class almost everywhere
    assert float(jnp.max(jnp.abs(conf_r - conf_p))) < 0.02
    assert float(jnp.mean((cls_r == cls_p))) > 0.99
    assert float(jnp.max(jnp.abs(locs_r - locs_p))) < 0.05


def test_pallas_stem_requires_bf16():
    with pytest.raises(ValueError, match="pallas_stem"):
        ModelConfig(preset_name="test64", num_classes=3,
                    pallas_stem=True, compute_dtype="float32")


@pytest.mark.parametrize(
    "h,w,nine",
    [
        (32, 64, False),    # single row-tile (prefetch crosses boundary)
        (96, 64, False),    # three tiles
        (300, 300, False),  # padded height (vgg300)
        (96, 64, True),     # the 9-dot K=6 probe variant
    ],
)
def test_uint8_variant_matches_packed_stem(params, h, w, nine):
    """The whole-stem uint8 kernel (preprocess+conv1_1+conv1_2+pool1 in
    one Pallas call) matches the packed XLA stem, both tap layouts."""
    from ssd_tensorflow_tpu.ops.stem_pallas import fused_stem_uint8

    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    ref = conv1_block_packed(params, img, MEAN, "bfloat16", f32_out=True)
    got = fused_stem_uint8(
        params, img, MEAN, "bfloat16", interpret=True, nine_taps=nine
    )
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    diff = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref.astype(jnp.float32)))
    assert float(diff) <= 0.005 * float(scale) + 0.25


def test_model_wiring_uint8_variant():
    """pallas_stem_variant='uint8' routes inference through the
    whole-stem kernel and matches the packed-stem scores."""
    from ssd_tensorflow_tpu.models.ssd_vgg import apply_scores

    cfg_ref = ModelConfig(preset_name="test64", num_classes=3)
    cfg_pal = ModelConfig(preset_name="test64", num_classes=3,
                          pallas_stem=True, pallas_stem_variant="uint8")
    p = init_params(jax.random.PRNGKey(1), cfg_ref)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    conf_r, cls_r, locs_r = apply_scores(p, img, cfg_ref)
    conf_p, cls_p, locs_p = apply_scores(p, img, cfg_pal)
    assert float(jnp.max(jnp.abs(conf_r - conf_p))) < 0.02
    assert float(jnp.mean((cls_r == cls_p))) > 0.99
    assert float(jnp.max(jnp.abs(locs_r - locs_p))) < 0.05


@pytest.mark.parametrize(
    "h,w",
    [
        (32, 64),    # single row-tile (prefetch crosses image boundary)
        (96, 64),    # three tiles
        (300, 300),  # padded height (vgg300)
    ],
)
def test_dma_variant_matches_packed_stem(params, h, w):
    from ssd_tensorflow_tpu.ops.stem_pallas import fused_stem_pallas_dma

    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8))
    ref = conv1_block_packed(params, img, MEAN, "bfloat16", f32_out=True)
    got = fused_stem_pallas_dma(params, img, MEAN, "bfloat16", interpret=True)
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    diff = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(ref.astype(jnp.float32)))
    assert float(diff) <= 0.005 * float(scale) + 0.25
