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


def conv2d(x, w, b=None, stride=1, padding="SAME", dilation=1, f32_out=False):
    """2-D convolution, optional bias. ``w`` is HWIO.

    Computes in ``x.dtype``. The TPU MXU accumulates bf16 operands in
    float32 internally either way; the dtype-symmetric form (bf16 in,
    bf16 out) is required under autodiff (a mixed bf16-in/f32-out conv
    has no valid transpose in XLA). ``f32_out=True`` requests an
    f32-accumulate output and casts back — measured ~10% faster on v5e
    for the inference-only path; never use it under grad.
    """
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32 if f32_out else None,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype) if f32_out else y


def depthwise_conv2d(x, w, b=None, stride=1, padding="SAME", f32_out=False):
    """Depthwise 2-D convolution. ``w`` is HWIO with I=1, O=C.

    TPU note: a depthwise conv does one MAC per filter tap per output
    element — no contraction dimension — so XLA lowers it to the VPU,
    not the MXU. That is the right trade for the MobileNet family: the
    FLOPs live in the 1x1 pointwise convs (pure MXU matmuls) and the
    depthwise pass is a cheap bandwidth-bound stencil that XLA fuses
    with the surrounding elementwise work.
    """
    c = x.shape[-1]
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMNUMS,
        feature_group_count=c,
        preferred_element_type=jnp.float32 if f32_out else None,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype) if f32_out else y


def float_conv_executor(params, f32_out=False):
    """The float conv executor for a family ``walk_feature_maps``.

    Family backbones (models/resnet.py, models/mobilenet.py) express
    their feature-map walk once over an injectable conv executor
    ``conv(name, x, *, stride=1, padding="SAME", depthwise=False) -> y``
    (conv + bias only — norms/activations/skips live in the walker).
    This executor is the float instantiation; models/quantized.py
    injects the int8 one, and its calibration pass a recording one, so
    the three paths can never walk different structures.
    """

    def conv(name, x, *, stride=1, padding="SAME", depthwise=False):
        p = params[name]
        if depthwise:
            return depthwise_conv2d(x, p["w"], p["b"], stride=stride,
                                    f32_out=f32_out)
        return conv2d(x, p["w"], p["b"], stride=stride, padding=padding,
                      f32_out=f32_out)

    return conv


def conv_relu(params, x, stride=1, padding="SAME", dilation=1, f32_out=False):
    """conv + bias + ReLU block (reference conv_map, ssdvgg.py:42-52)."""
    return jax.nn.relu(
        conv2d(x, params["w"], params["b"], stride, padding, dilation, f32_out)
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


def _key_seed(key):
    """Derive a numpy seed sequence from a jax PRNG key (either the
    legacy uint32 pair or a new-style typed key)."""
    import numpy as np

    try:
        data = jax.random.key_data(key)
    except TypeError:  # legacy raw uint32 key
        data = key
    return np.asarray(data).ravel().astype(np.uint32)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform init — matches tf.contrib.layers.
    xavier_initializer used throughout the reference (ssdvgg.py:46,59).

    numpy-backed: threading this through jax.random costs ~40 threefry
    compilations (30+ s on a 1-core CPU host) per model init; host-side
    RNG is instant and just as deterministic in the key.
    """
    import numpy as np

    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    rng = np.random.default_rng(_key_seed(key))
    return jnp.asarray(rng.uniform(-limit, limit, shape), dtype)


def init_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Xavier filter + zero bias, the reference's conv block init."""
    return {
        "w": xavier_uniform(key, (kh, kw, cin, cout), dtype),
        "b": jnp.zeros((cout,), dtype),
    }
