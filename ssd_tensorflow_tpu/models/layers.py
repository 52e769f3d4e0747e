"""Primitive neural-net layers as pure functions over param dicts.

TPU-first: NHWC activations, HWIO filters — XLA's preferred layouts for
mapping convolutions onto the MXU. ``padding='SAME'`` follows TF
semantics (which both the reference's graph and XLA share), including
ceil-mode pooling so vgg300's 75 -> 38 pool works out
(reference: ssdvgg.py:42-52, 210-236).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, stride=1, padding="SAME", dilation=1):
    """2-D convolution, optional bias. ``w`` is HWIO.

    ``preferred_element_type=float32`` keeps MXU accumulation in f32
    even when activations/weights are bfloat16.
    """
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def conv_relu(params, x, stride=1, padding="SAME", dilation=1):
    """conv + bias + ReLU block (reference conv_map, ssdvgg.py:42-52)."""
    return jax.nn.relu(
        conv2d(x, params["w"], params["b"], stride, padding, dilation)
    )


def max_pool(x, window=2, stride=2, padding="SAME"):
    """Max pooling with TF-style SAME (ceil) semantics."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def l2_normalize_scale(x, scale, eps=1e-12):
    """Channel-wise L2 normalization with a learnable per-channel scale.

    Reference: l2_normalization (ssdvgg.py:80-84), applied to conv4_3
    with the scale initialized to 20 (ssdvgg.py:335-337).
    """
    x32 = x.astype(jnp.float32)
    norm = x32 * lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + eps)
    return (scale.astype(jnp.float32) * norm).astype(x.dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform init — matches tf.contrib.layers.
    xavier_initializer used throughout the reference (ssdvgg.py:46,59)."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Xavier filter + zero bias, the reference's conv block init."""
    return {
        "w": xavier_uniform(key, (kh, kw, cin, cout), dtype),
        "b": jnp.zeros((cout,), dtype),
    }
