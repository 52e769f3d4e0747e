"""Pallas TPU kernel: fused pairwise-IoU + greedy NMS.

One kernel invocation per image does everything the XLA path does in
many HLO ops: builds the (D, D) +1-pixel IoU matrix of the (already
class-offset) candidate corners entirely in VMEM/registers and runs the
greedy suppression loop without ever touching HBM for intermediates.
The XLA fallback (ops/nms.py) materializes the IoU matrix and runs a
200-iteration HLO while-loop over it; the kernel keeps the whole state
on-chip.

Candidates must be sorted by descending score (they come from top_k);
a non-lane-aligned D is padded to the next multiple of 128 internally
(padding rows are invalid, so they neither suppress nor get kept).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(corners_ref, valid_ref, keep_ref, iou_ref, sup_ref, *, threshold: float):
    """corners_ref: (1, 4, D) f32; valid_ref: (1, 1, D) f32;
    keep_ref: (1, 1, D) f32; scratch: iou_ref (D, D), sup_ref (1, D)."""
    xmin = corners_ref[0, 0, :]
    xmax = corners_ref[0, 1, :]
    ymin = corners_ref[0, 2, :]
    ymax = corners_ref[0, 3, :]
    valid = valid_ref[0, 0, :]
    d = xmin.shape[0]

    # pairwise +1-pixel IoU (ssdutils.py:138-152), all in VMEM
    area = (xmax - xmin + 1.0) * (ymax - ymin + 1.0)  # (D,)
    ix = jnp.maximum(0.0, jnp.minimum(xmax[:, None], xmax[None, :])
                     - jnp.maximum(xmin[:, None], xmin[None, :]) + 1.0)
    iy = jnp.maximum(0.0, jnp.minimum(ymax[:, None], ymax[None, :])
                     - jnp.maximum(ymin[:, None], ymin[None, :]) + 1.0)
    inter = ix * iy
    iou_ref[:, :] = inter / (area[:, None] + area[None, :] - inter)
    sup_ref[0, :] = jnp.zeros((d,), jnp.float32)

    col = lax.broadcasted_iota(jnp.int32, (1, d), 1)[0]  # (D,)

    # Mosaic constraints: no dynamic slicing of loop-carried values, and
    # lane-dim loads must be 128-aligned — so the greedy state lives in
    # VMEM scratch and per-candidate scalars come from masked lane
    # reductions; only the IoU row uses a (sublane-dim) dynamic slice.
    def body(i, _):
        sup = sup_ref[0, :]
        is_i = col == i
        sup_i = jnp.sum(jnp.where(is_i, sup, 0.0))
        val_i = jnp.sum(jnp.where(is_i, valid, 0.0))
        keep_i = (sup_i == 0.0) & (val_i != 0.0)
        row = iou_ref[pl.ds(i, 1), :][0]  # (D,)
        newly = keep_i & (row > threshold) & (col > i)
        sup_ref[0, :] = jnp.where(newly, 1.0, sup)
        return 0

    lax.fori_loop(0, d, body, 0)
    keep_ref[0, 0, :] = jnp.where(
        (sup_ref[0, :] == 0.0) & (valid != 0.0), 1.0, 0.0
    )


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def nms_keep_pallas(corners, valid, threshold: float = 0.45, interpret: bool = False):
    """Batched greedy-NMS keep mask.

    Args:
      corners: ``(B, D, 4)`` canvas corners (xmin, xmax, ymin, ymax),
        already class-offset for class-aware suppression, sorted by
        descending score. Any D works; non-multiples of 128 are padded
        to the lane tile internally.
      valid:   ``(B, D)`` bool candidate mask.
      threshold: IoU threshold.
      interpret: run the Pallas interpreter (for CPU tests).

    Returns:
      ``(B, D)`` bool keep mask.
    """
    b, d_in, _ = corners.shape
    d = max(128, -(-d_in // 128) * 128)
    if d != d_in:
        # invalid padding rows: val_i == 0 makes keep_i false in the
        # kernel, so they can never suppress a real candidate
        corners = jnp.pad(corners, ((0, 0), (0, d - d_in), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, d - d_in)))
    corners_t = jnp.transpose(corners, (0, 2, 1)).astype(jnp.float32)  # (B,4,D)
    valid_f = valid.astype(jnp.float32)[:, None, :]  # (B,1,D)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, threshold=threshold),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(corners_t, valid_f)
    return keep[:, 0, :d_in] != 0.0
