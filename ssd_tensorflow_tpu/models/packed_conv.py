"""Width-packed convolution: the TPU lane-utilization fix for C=64 convs.

The VGG stem's conv1_1/conv1_2 carry 3/64 channels, but the TPU vector
lane width is 128 — XLA runs conv1_2 at ~25% MXU utilization (measured:
24.8 ms of a 94 ms vgg512 b64 forward; see docs/PERFORMANCE.md). The
fix: merge adjacent width-pixel pairs into the channel dimension —
``(B, H, W, C) -> (B, H, W/2, 2C)`` is a *contiguous reshape* (free) —
and convolve with block-structured packed weights so the packed conv
computes exactly the original SAME 3x3 conv for both pixels of each
pair. Channel count doubles to the native 128 lanes; nominal FLOPs
double (structured zeros), but the MXU goes from 25% to near-full
utilization, a large net win.

Index derivation: output real pixel ``w = 2*w2 + po`` reads input pixels
``w + k - 1`` for tap ``k in {0,1,2}``; input pixel ``2*w2 + po + k - 1``
lives in packed column ``w2 + dxp - 1`` with
``dxp = (po + k - 1)//2 + 1`` at parity ``pi = (po + k - 1) % 2``.
SAME zero padding in packed space covers real pixels {-2,-1,W,W+1},
a superset of the real conv's {-1, W} — the extra columns only ever
multiply zero weights.

The packed weights are *derived in-graph* from the canonical HWIO
parameters (a scatter into zeros, ~300 KB), so the parameter pytree,
checkpoints, and the weight-import path are unchanged and the transform
is differentiable — training uses it too.

Reference for the layers being computed: ssdvgg.py:202-204 (conv1_1/2),
pool1 (2x2/s2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_conv3x3_weights(w, b):
    """``(3,3,Ci,Co)`` HWIO weights -> packed ``(3,3,2Ci,2Co)``.

    The packed conv on ``(B,H,W/2,2Ci)`` computes the original SAME 3x3
    conv for both real pixels of every width pair.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for po in (0, 1):
        for k in (0, 1, 2):
            off = po + k - 1
            dxp = off // 2 + 1
            pi = off % 2
            wp = wp.at[
                :, dxp, pi * ci : (pi + 1) * ci, po * co : (po + 1) * co
            ].set(w[:, k])
    bp = jnp.concatenate([b, b])
    return wp, bp


def pack_width(x):
    """``(B, H, W, C) -> (B, H, W/2, 2C)`` — contiguous, layout-free."""
    B, H, W, C = x.shape
    assert W % 2 == 0, f"width {W} must be even to pack"
    return x.reshape(B, H, W // 2, 2 * C)


def unpack_width(x):
    """Inverse of :func:`pack_width`."""
    B, H, W2, C2 = x.shape
    return x.reshape(B, H, W2 * 2, C2 // 2)


def preprocess_flat(images, mean_bgr, dtype):
    """uint8 ``(B,H,W,3)`` -> mean-subtracted packed ``(B,H,W/2,6)``.

    Elementwise work happens on a ``(B, H, W*3)`` view whose minor
    dimension is lane-aligned — the naive ``(B,H,W,3)`` form pays a 42x
    lane-padding penalty on TPU (measured 4 ms/batch for what is a
    0.2 ms op).
    """
    B, H, W, C = images.shape
    assert C == 3
    assert W % 2 == 0, f"width {W} must be even to pack"
    flat = images.reshape(B, H, W * 3)
    mean = jnp.tile(jnp.asarray(mean_bgr, jnp.float32), W).astype(jnp.float32)
    x = flat.astype(jnp.float32) - mean
    return x.astype(dtype).reshape(B, H, W // 2, 6)


def conv1_block_packed(params, images, mean_bgr, dtype, f32_out=False):
    """Fused preprocess + conv1_1 + conv1_2 + pool1, width-packed.

    Args:
      params: the model pytree (uses ``conv1_1``/``conv1_2`` entries).
      images: ``(B, H, W, 3)`` raw BGR (uint8 or float, 0-255 range).
      mean_bgr: channel means subtracted on device.
      dtype: compute dtype.

    Returns:
      pool1 output ``(B, H/2, W/2, 64)`` in ``dtype`` — bit-compatible
      (up to float summation order) with the unpacked path.
    """
    from ssd_tensorflow_tpu.models.layers import conv2d

    x = preprocess_flat(images, mean_bgr, jnp.dtype(dtype))

    w1p, b1p = pack_conv3x3_weights(
        params["conv1_1"]["w"], params["conv1_1"]["b"]
    )
    y = jax.nn.relu(conv2d(x, w1p, b1p, f32_out=f32_out))  # (B,H,W/2,128)

    w2p, b2p = pack_conv3x3_weights(
        params["conv1_2"]["w"], params["conv1_2"]["b"]
    )
    y = jax.nn.relu(conv2d(y, w2p, b2p, f32_out=f32_out))  # (B,H,W/2,128)

    # pool1 (2x2/s2): H via windowed max; W is a lane-half max because
    # each packed column already holds the two pooled width-pixels.
    y = jax.lax.reduce_window(
        y,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 1, 1),
        window_strides=(1, 2, 1, 1),
        padding="SAME",
    )
    return jnp.maximum(y[..., :64], y[..., 64:])
