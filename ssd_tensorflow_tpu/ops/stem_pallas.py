"""Fused conv1_2 + pool1 as a Pallas TPU kernel (the "split stem").

The vgg512 batch-64 stem (preprocess + conv1_1 + conv1_2 + pool1) costs
~28 ms in XLA even width-packed (models/packed_conv.py): conv1_2
round-trips its 2.1 GB activation through HBM (16 ms) and pool1 runs as
a slow reduce_window (10 ms) — see tools/stem_experiments.py. This
module keeps the cheap part in XLA and fuses the expensive part:

  * XLA: preprocess (flat-layout mean subtraction) + the width-packed
    conv1_1 (3->64 real channels, 128 packed lanes). Its HBM write is
    the unavoidable hand-off (~5.5 ms measured, mostly the 2.1 GB
    activation write).
  * Pallas: conv1_2 (nine packed 3x3 tap matmuls, K=128, f32
    accumulation) + ReLU + pool1, with conv1_2's activation never
    touching HBM. Only pool1's 0.5 GB output is written.

Measured: the kernel runs at ~16.4 ms — the packed tap matmuls' MXU
floor is 12.6 ms (2.42 GFLOP/step at the v5e's 197 TFLOP/s bf16 peak;
width-packing doubles nominal FLOPs in exchange for full lane
utilization) — for a stem total of ~22 ms.

Halo handling without copies: each grid step needs conv1_1 rows
[32t-1, 32t+33) — one row beyond its 32-row block on each side. Rather
than stacking overlapped tiles in XLA (a 2.3 GB copy) or hand-rolling
DMA, the same conv1_1 array is passed THREE times with different
BlockSpec index maps: the 32-row body at row-block t, plus two 2-row
halo blocks reaching into the neighbours (indices clamped at the
edges; the out-of-image rows are zeroed in-kernel, because conv1_2's
SAME padding needs zeros there, not neighbouring garbage or
relu(bias)). Pallas pipelines all three streams automatically.

Several rejected designs, for the record (all measured slower):
in-kernel preprocess+im2col on (..., 6)-channel arrays runs at 6/128
VPU lane utilization (40 ms); an XLA-side conv1_1 im2col to K=64
either OOMs HBM (XLA pads the (..., 6)-minor intermediates 21x) or
streams 1.16 GB per pass; width-unpacking inside the kernel needs a
lane-unflatten reshape Mosaic does not support.

Inference-only (no custom VJP); training keeps the differentiable XLA
stem. Reference for the math: ssdvgg.py:202-204 (conv1_1/conv1_2),
pool1 2x2/s2.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssd_tensorflow_tpu.models.layers import conv2d
from ssd_tensorflow_tpu.models.packed_conv import (
    pack_conv3x3_weights,
    preprocess_flat,
)

#: conv1_2 output rows computed per grid step
_TILE = 32


def _stem_kernel_dma(c1_hbm, b1_ref, w2_ref, b2_ref, out_ref, buf, c1s_ref,
                     sems, *, h_valid, h_pad, wp, out_dtype):
    """Manual-DMA variant of :func:`_stem_kernel`.

    ``c1_hbm`` is the FULL conv1_1 output left in HBM (memory_space=ANY,
    passed once); each grid step DMAs its 34 rows (body + one halo row
    each side) into a double-buffered VMEM scratch itself. Motivation:
    the BlockSpec version needs the same array as three operands (body +
    two halo streams), and XLA materializes defensive copies of the
    2.1 GB activation around the custom call (docs/PERFORMANCE.md).
    Here there is exactly one operand and no XLA-side halo arrays.

    DMA volume is 2.2 MB/step (~3 us at HBM speed) vs ~16 us of compute,
    so one-step-ahead prefetch fully hides it.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    def start_fetch(bb, tt, slot):
        row0 = tt * _TILE
        top = jnp.clip(row0 - 1, 0, h_pad - 1)
        pltpu.make_async_copy(
            c1_hbm.at[bb, pl.ds(top, 1)], buf.at[slot, 0:1], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            c1_hbm.at[bb, pl.ds(row0, _TILE)],
            buf.at[slot, 1 : _TILE + 1],
            sems.at[slot, 1],
        ).start()
        bot = jnp.clip(row0 + _TILE, 0, h_pad - 1)
        pltpu.make_async_copy(
            c1_hbm.at[bb, pl.ds(bot, 1)],
            buf.at[slot, _TILE + 1 : _TILE + 2],
            sems.at[slot, 2],
        ).start()

    def wait_fetch(slot):
        pltpu.make_async_copy(
            c1_hbm.at[0, pl.ds(0, 1)], buf.at[slot, 0:1], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            c1_hbm.at[0, pl.ds(0, _TILE)],
            buf.at[slot, 1 : _TILE + 1],
            sems.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            c1_hbm.at[0, pl.ds(0, 1)],
            buf.at[slot, _TILE + 1 : _TILE + 2],
            sems.at[slot, 2],
        ).wait()

    step = b * nt + t
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_fetch(b, t, slot)

    # prefetch the next grid step's rows into the other buffer
    next_slot = jax.lax.rem(step + 1, 2)
    last_t = t == nt - 1

    @pl.when(jnp.logical_not(last_t))
    def _():
        start_fetch(b, t + 1, next_slot)

    @pl.when(jnp.logical_and(last_t, b + 1 < pl.num_programs(0)))
    def _():
        start_fetch(b + 1, 0, next_slot)

    wait_fetch(slot)

    b1 = b1_ref[0, :]
    y1 = jax.nn.relu(buf[slot].astype(jnp.float32) + b1).astype(jnp.bfloat16)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (_TILE + 2, 1, 1), 0)
    rows = _TILE * t - 1 + s_idx
    valid = jnp.logical_and(rows >= 0, rows < h_valid)
    c1s_ref[:, 1 : wp + 1, :] = jnp.where(valid, y1, jnp.bfloat16(0))
    c1s_ref[:, 0:1, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)
    c1s_ref[:, wp + 1 :, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)

    acc = jnp.zeros((_TILE, wp, 128), jnp.float32)
    for dy in range(3):
        for dxp in range(3):
            a = c1s_ref[dy : dy + _TILE, dxp : dxp + wp, :]
            acc = acc + jax.lax.dot_general(
                a, w2_ref[dy, dxp],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc + b2_ref[0, :])

    z = jnp.max(y2.reshape(_TILE // 2, 2, wp, 128), axis=1)
    out_ref[0] = jnp.maximum(z[:, :, :64], z[:, :, 64:]).astype(out_dtype)


def fused_stem_pallas_dma(params, images, mean_bgr, compute_dtype,
                          interpret: bool = False):
    """Like :func:`fused_stem_pallas`, but the kernel fetches conv1_1
    rows from HBM itself (single ANY-space operand, manual
    double-buffered DMA) instead of three BlockSpec streams."""
    B, H, W, C = images.shape
    assert C == 3 and W % 2 == 0 and H % 2 == 0, (H, W, C)
    out_dtype = jnp.dtype(compute_dtype)
    assert out_dtype == jnp.bfloat16, (
        "fused_stem_pallas_dma is a bf16 kernel; use the XLA stem for "
        f"compute_dtype={compute_dtype}"
    )
    wp = W // 2
    n_tiles = -(-H // _TILE)
    h_pad = n_tiles * _TILE

    x = preprocess_flat(images, mean_bgr, jnp.bfloat16)
    w1p, b1p = pack_conv3x3_weights(params["conv1_1"]["w"],
                                    params["conv1_1"]["b"])
    c1 = conv2d(x, w1p, None, f32_out=False)  # (B, H, wp, 128)
    if h_pad != H:
        c1 = jnp.pad(c1, ((0, 0), (0, h_pad - H), (0, 0), (0, 0)))

    w2p, b2p = pack_conv3x3_weights(params["conv1_2"]["w"],
                                    params["conv1_2"]["b"])
    w2p = w2p.astype(jnp.bfloat16)

    kernel = partial(
        _stem_kernel_dma, h_valid=H, h_pad=h_pad, wp=wp, out_dtype=out_dtype
    )
    half = _TILE // 2
    flops = B * n_tiles * 9 * _TILE * wp * 128 * 128 * 2
    bytes_accessed = (
        c1.size * 2 + B * h_pad // 2 * wp * 64 * out_dtype.itemsize
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, half, wp, 64),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * half, wp, 64), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _TILE + 2, wp, 128), jnp.bfloat16),
            pltpu.VMEM((_TILE + 2, wp + 2, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        c1,
        b1p.astype(jnp.float32).reshape(1, 128),
        w2p,
        b2p.astype(jnp.float32).reshape(1, 128),
    )
    return out[:, :H // 2]


def _stem_kernel_uint8(img_hbm, mean_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       out_ref, ubuf, c18_ref, c1s_ref, sems,
                       *, h_valid, h_pad, wp, out_dtype, nine_taps):
    """Whole-stem step: preprocess + conv1_1 + conv1_2 + pool1.

    The kernel reads the RAW image — ``img_hbm`` is the flat uint8
    ``(B, h_pad, 6*wp)`` view left in ANY/HBM space — so NO large
    operand ever crosses the XLA<->Pallas boundary (the split-stem
    variants above hand 2.1 GB of conv1_1 activation across it and lose
    ~10 ms to operand copies, docs/PERFORMANCE.md). Per (image,
    row-tile) step it DMAs a 36-row uint8 strip (~55 KB), then:

      1. preprocess on the lane-dense flat strip (mean subtract, bf16),
         masking rows outside the real image to zero (= conv1_1's SAME
         padding in preprocessed space);
      2. lane-unflatten ``(36, 6*wp) -> (36, wp, 6)`` — THE gamble: the
         round-2 Mosaic rejected this reshape ("width-unpacking inside
         the kernel"); on the rebuilt VM's newer libtpu it compiles,
         which is what unlocks this whole formulation;
      3. conv1_1 width-packed: either 3 dots of K=18 after merging the
         3 dy taps into the channel dim (3 lane-offset copies — copies
         and dots cost about the same here, ~1.2 us each per step), or
         ``nine_taps`` = 9 dots of K=6 (no copies, pure MXU
         starvation) for A/B probing;
      4. conv1_2 as the usual 9 packed K=128 taps + pool1, exactly as
         :func:`_stem_kernel`.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    def start_fetch(bb, tt, slot):
        row0 = tt * _TILE
        top = jnp.clip(row0 - 2, 0, h_pad - 2)
        pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(top, 2)], ubuf.at[slot, 0:2], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(row0, _TILE)],
            ubuf.at[slot, 2 : _TILE + 2],
            sems.at[slot, 1],
        ).start()
        bot = jnp.clip(row0 + _TILE, 0, h_pad - 2)
        pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(bot, 2)],
            ubuf.at[slot, _TILE + 2 : _TILE + 4],
            sems.at[slot, 2],
        ).start()

    def wait_fetch(slot):
        for i, (o, n) in enumerate(((0, 2), (2, _TILE), (_TILE + 2, 2))):
            pltpu.make_async_copy(
                img_hbm.at[0, pl.ds(0, n)], ubuf.at[slot, o : o + n],
                sems.at[slot, i],
            ).wait()

    step = b * nt + t
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_fetch(b, t, slot)

    next_slot = jax.lax.rem(step + 1, 2)
    last_t = t == nt - 1

    @pl.when(jnp.logical_not(last_t))
    def _():
        start_fetch(b, t + 1, next_slot)

    @pl.when(jnp.logical_and(last_t, b + 1 < pl.num_programs(0)))
    def _():
        start_fetch(b + 1, 0, next_slot)

    wait_fetch(slot)

    # 1. preprocess: rows [32t-2, 32t+34), lane-dense flat layout.
    # Out-of-image rows zero AFTER mean subtraction: SAME conv padding
    # is zeros in preprocessed space (models/packed_conv.preprocess_flat
    # + conv2d SAME semantics).
    rows36 = _TILE * t - 2 + jax.lax.broadcasted_iota(
        jnp.int32, (_TILE + 4, 1), 0
    )
    valid36 = jnp.logical_and(rows36 >= 0, rows36 < h_valid)
    x = ubuf[slot].astype(jnp.float32) - mean_ref[0, :]
    x = jnp.where(valid36, x, 0.0).astype(jnp.bfloat16)

    # 2. the lane-unflatten
    x6 = x.reshape(_TILE + 4, wp, 6)

    # 3. conv1_1 (rows [32t-1, 32t+33), i.e. x6 rows [1, 35))
    acc1 = jnp.zeros((_TILE + 2, wp, 128), jnp.float32)
    if nine_taps:
        for dy in range(3):
            for dxp in range(3):
                # column halo as a per-tap concat; no scratch assembly
                a = jnp.concatenate(
                    [
                        jnp.zeros((_TILE + 2, 1, 6), jnp.bfloat16),
                        x6[dy : dy + _TILE + 2],
                        jnp.zeros((_TILE + 2, 1, 6), jnp.bfloat16),
                    ],
                    axis=1,
                )[:, dxp : dxp + wp, :]
                acc1 = acc1 + jax.lax.dot_general(
                    a, w1_ref[dy, dxp],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    else:
        # dy-merged K=18: c18[r, 1+w2, 6*dy+cp] = x6[r+dy, w2, cp]
        for dy in range(3):
            c18_ref[:, 1 : wp + 1, 6 * dy : 6 * dy + 6] = x6[dy : dy + _TILE + 2]
        c18_ref[:, 0:1, :] = jnp.zeros((_TILE + 2, 1, 18), jnp.bfloat16)
        c18_ref[:, wp + 1 :, :] = jnp.zeros((_TILE + 2, 1, 18), jnp.bfloat16)
        for dxp in range(3):
            a = c18_ref[:, dxp : dxp + wp, :]
            acc1 = acc1 + jax.lax.dot_general(
                a, w1_ref[:, dxp].reshape(18, 128),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    y1 = jax.nn.relu(acc1 + b1_ref[0, :])
    # conv1_1 output rows [32t-1, 32t+33): zero the out-of-image ones
    # (they are conv1_2's SAME padding; relu(b1) there would be wrong)
    rows34 = _TILE * t - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (_TILE + 2, 1, 1), 0
    )
    valid34 = jnp.logical_and(rows34 >= 0, rows34 < h_valid)
    c1s_ref[:, 1 : wp + 1, :] = jnp.where(valid34, y1, 0.0).astype(
        jnp.bfloat16
    )
    c1s_ref[:, 0:1, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)
    c1s_ref[:, wp + 1 :, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)

    # 4. conv1_2 + pool1 (same as _stem_kernel)
    acc = jnp.zeros((_TILE, wp, 128), jnp.float32)
    for dy in range(3):
        for dxp in range(3):
            a = c1s_ref[dy : dy + _TILE, dxp : dxp + wp, :]
            acc = acc + jax.lax.dot_general(
                a, w2_ref[dy, dxp],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc + b2_ref[0, :])

    z = jnp.max(y2.reshape(_TILE // 2, 2, wp, 128), axis=1)
    out_ref[0] = jnp.maximum(z[:, :, :64], z[:, :, 64:]).astype(out_dtype)


def fused_stem_uint8(params, images, mean_bgr, compute_dtype,
                     interpret: bool = False, nine_taps: bool = False):
    """The WHOLE stem (preprocess + conv1_1 + conv1_2 + pool1) as one
    Pallas kernel reading the raw uint8 image.

    Unlike :func:`fused_stem_pallas`/`fused_stem_pallas_dma` (which
    split conv1_1 off to XLA and pay ~10 ms of operand copies moving
    its 2.1 GB activation across the custom-call boundary), the only
    operands here are the ~50 MB uint8 image (ANY space, DMA'd in
    36-row strips) and the weights; the only output is pool1's
    (B, H/2, W/2, 64). Requires Mosaic lane-unflatten reshape support
    (newer libtpu); tools/stem_kernel_probe.py measures it standalone
    and docs/PERFORMANCE.md records the in-situ verdict.

    Reference for the math: ssdvgg.py:202-204 + pool1 2x2/s2; parity
    with models/packed_conv.conv1_block_packed is tested in
    tests/test_stem_pallas.py.
    """
    B, H, W, C = images.shape
    assert C == 3 and W % 2 == 0 and H % 2 == 0, (H, W, C)
    out_dtype = jnp.dtype(compute_dtype)
    assert out_dtype == jnp.bfloat16, (
        "fused_stem_uint8 is a bf16 kernel; use the XLA stem for "
        f"compute_dtype={compute_dtype}"
    )
    assert images.dtype == jnp.uint8, images.dtype
    wp = W // 2
    n_tiles = -(-H // _TILE)
    h_pad = n_tiles * _TILE

    img = images.reshape(B, H, 3 * W)
    if h_pad != H:
        img = jnp.pad(img, ((0, 0), (0, h_pad - H), (0, 0)))

    w1p, b1p = pack_conv3x3_weights(params["conv1_1"]["w"],
                                    params["conv1_1"]["b"])
    w2p, b2p = pack_conv3x3_weights(params["conv1_2"]["w"],
                                    params["conv1_2"]["b"])
    mean = jnp.tile(jnp.asarray(mean_bgr, jnp.float32), W).reshape(1, 3 * W)

    kernel = partial(
        _stem_kernel_uint8, h_valid=H, h_pad=h_pad, wp=wp,
        out_dtype=out_dtype, nine_taps=nine_taps,
    )
    half = _TILE // 2
    flops = B * n_tiles * 9 * _TILE * wp * 128 * (128 + 18) * 2
    bytes_accessed = (
        img.size + B * h_pad // 2 * wp * 64 * out_dtype.itemsize
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3 * W), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 6, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, half, wp, 64),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * half, wp, 64), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _TILE + 4, 3 * W), jnp.uint8),
            pltpu.VMEM((_TILE + 2, wp + 2, 18), jnp.bfloat16),
            pltpu.VMEM((_TILE + 2, wp + 2, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        img,
        mean,
        w1p.astype(jnp.bfloat16),
        b1p.astype(jnp.float32).reshape(1, 128),
        w2p.astype(jnp.bfloat16),
        b2p.astype(jnp.float32).reshape(1, 128),
    )
    return out[:, : H // 2]


def _stem_kernel(body_ref, top_ref, bot_ref, b1_ref, w2_ref, b2_ref,
                 out_ref, c1_ref, *, h_valid, wp, out_dtype):
    """One (image, row-tile) step.

    body_ref: (1, 1, _TILE, wp, 128) bf16 — raw conv1_1 rows
              [32t, 32t+32) (no bias/relu yet — the XLA conv emits the
              bare conv so its output fuses into nothing and is
              materialized exactly once; bias+relu happen here)
    top_ref:  (1, 1, 2, wp, 128) bf16 — rows [32t-2, 32t) (t=0: junk,
              masked below)
    bot_ref:  (1, 1, 2, wp, 128) bf16 — rows [32t+32, 32t+34) (t=T-1:
              junk, masked below)
    b1_ref:   (1, 128) f32 — packed conv1_1 bias
    w2_ref:   (3, 3, 128, 128) bf16 — packed conv1_2 weights
    b2_ref:   (1, 128) f32 — packed conv1_2 bias
    out_ref:  (1, _TILE//2, wp, 64) — pool1 output tile
    c1_ref:   (_TILE+2, wp+2, 128) bf16 scratch — assembled rows + halo
    """
    t = pl.program_id(1)
    b1 = b1_ref[0, :]

    # assemble [row 32t-1 | body | row 32t+32], apply bias+relu, and
    # zero every row outside the real image (those are conv1_2's SAME
    # padding; the clamped halo blocks carry neighbouring garbage
    # there, and computing relu(bias) would also be wrong)
    y1 = jnp.concatenate(
        [top_ref[0, 0, 1:2], body_ref[0, 0], bot_ref[0, 0, 0:1]], axis=0
    )
    y1 = jax.nn.relu(y1.astype(jnp.float32) + b1).astype(jnp.bfloat16)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (_TILE + 2, 1, 1), 0)
    rows = _TILE * t - 1 + s_idx
    valid = jnp.logical_and(rows >= 0, rows < h_valid)
    c1_ref[:, 1:wp + 1, :] = jnp.where(
        valid, y1, jnp.bfloat16(0)
    )
    c1_ref[:, 0:1, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)
    c1_ref[:, wp + 1:, :] = jnp.zeros((_TILE + 2, 1, 128), jnp.bfloat16)

    # conv1_2: 9 packed taps, K=128, f32 accumulation
    acc = jnp.zeros((_TILE, wp, 128), jnp.float32)
    for dy in range(3):
        for dxp in range(3):
            a = c1_ref[dy:dy + _TILE, dxp:dxp + wp, :]
            acc = acc + jax.lax.dot_general(
                a, w2_ref[dy, dxp],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc + b2_ref[0, :])

    # pool1: height via row-pair max, width via lane-half max
    z = jnp.max(y2.reshape(_TILE // 2, 2, wp, 128), axis=1)
    out_ref[0] = jnp.maximum(z[:, :, :64], z[:, :, 64:]).astype(out_dtype)


def fused_stem_pallas(params, images, mean_bgr, compute_dtype,
                      interpret: bool = False):
    """preprocess + conv1_1 + conv1_2 + pool1, conv1_2+pool fused.

    Args:
      params: model pytree (uses ``conv1_1``/``conv1_2``).
      images: ``(B, H, W, 3)`` raw BGR uint8/float, W even.
      mean_bgr: channel means subtracted before conv1_1.
      compute_dtype: conv compute/output dtype for the XLA part.
      interpret: run in Pallas interpreter mode (CPU testing).

    Returns:
      pool1 output ``(B, H//2, W//2, 64)`` in ``compute_dtype`` —
      same math as models/packed_conv.conv1_block_packed.
    """
    B, H, W, C = images.shape
    # H must be even too: the final out[:, :H // 2] slice would silently
    # drop the last pooled row for odd H, where the XLA stem's
    # SAME-padded 2x2/s2 pool emits ceil(H/2) rows.
    assert C == 3 and W % 2 == 0 and H % 2 == 0, (H, W, C)
    out_dtype = jnp.dtype(compute_dtype)
    assert out_dtype == jnp.bfloat16, (
        "fused_stem_pallas is a bf16 kernel; use the XLA stem for "
        f"compute_dtype={compute_dtype}"
    )
    wp = W // 2

    n_tiles = -(-H // _TILE)
    h_pad = n_tiles * _TILE

    # XLA part: preprocess + width-packed conv1_1 (+ row padding to a
    # whole number of tiles; the padded rows are exact zeros, which is
    # what conv1_2's SAME padding needs at the bottom edge)
    x = preprocess_flat(images, mean_bgr, jnp.bfloat16)
    w1p, b1p = pack_conv3x3_weights(params["conv1_1"]["w"],
                                    params["conv1_1"]["b"])
    # bare bf16-out conv, no bias/relu: one 2.1 GB materialization at
    # the custom-call boundary (an f32-out + cast + relu chain cannot
    # fuse into the Pallas call and costs ~12 ms in extra copies)
    c1 = conv2d(x, w1p, None, f32_out=False)  # (B, H, wp, 128)
    if h_pad != H:
        c1 = jnp.pad(c1, ((0, 0), (0, h_pad - H), (0, 0), (0, 0)))

    w2p, b2p = pack_conv3x3_weights(params["conv1_2"]["w"],
                                    params["conv1_2"]["b"])
    w2p = w2p.astype(jnp.bfloat16)

    # Halo rows as SEPARATE small arrays (0.3 ms of gathers): feeding
    # the same c1 array to three Pallas operands makes XLA insert
    # defensive copies of the whole 2.1 GB tensor (~9 ms measured).
    # top_halos[t] = c1 rows [32t-2, 32t), bot_halos[t] = [32t+32,
    # 32t+34); the t=0 / t=T-1 entries are arbitrary (kernel masks).
    c1r = c1.reshape(B, n_tiles, _TILE, wp, 128)
    last2 = c1r[:, :, _TILE - 2:]
    first2 = c1r[:, :, :2]
    top_halos = jnp.concatenate([last2[:, :1], last2[:, :-1]], axis=1)
    bot_halos = jnp.concatenate([first2[:, 1:], first2[:, -1:]], axis=1)

    kernel = partial(
        _stem_kernel, h_valid=H, wp=wp, out_dtype=out_dtype
    )
    half = _TILE // 2

    flops = B * n_tiles * 9 * _TILE * wp * 128 * 128 * 2
    bytes_accessed = c1.size * 2 + B * h_pad // 2 * wp * 64 * out_dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, _TILE, wp, 128),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, wp, 128),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, wp, 128),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, half, wp, 64),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles * half, wp, 64), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 2, wp + 2, 128), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        # f32 accumulators + double-buffered IO exceed the 16 MB
        # default scoped-vmem limit; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        c1r,
        top_halos,
        bot_halos,
        b1p.astype(jnp.float32).reshape(1, 128),
        w2p,
        b2p.astype(jnp.float32).reshape(1, 128),
    )
    return out[:, :H // 2]
