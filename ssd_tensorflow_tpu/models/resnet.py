"""ResNet-34 SSD backbone — the second model family.

The reference implements exactly one backbone (VGG-16,
reference ssdvgg.py:87-372). This module adds a ResNet-34-style trunk
behind the same preset/head machinery, proving the framework's model
surface generalizes: presets carry a ``backbone`` tag, and every
downstream component (anchors, matching, loss, postprocess, the five
CLIs) is preset-generic and runs unchanged.

TPU-first choices:
  * **GroupNorm, not BatchNorm.** BatchNorm's running statistics need a
    train/eval mode split and — under data parallelism — a cross-chip
    ``psum`` of batch moments every step. GroupNorm(32) is a pure
    per-sample function: batch-size independent, no state threading, no
    collective, identical math on 1 chip or 256. The normalization cost
    fuses into the surrounding convs under XLA.
  * dense 3x3 residual convs (MXU-shaped; no depthwise VPU detours),
    NHWC/HWIO layouts as everywhere else in the package.
  * zero-initialized final-GN scale in every residual block, so each
    block starts as identity — stabilizes from-scratch training (no
    pretrained weights are fetchable in this environment,
    docs/DATA_ACCESS.md).

Feature maps: the trunk taps layer2/layer3/layer4 outputs (strides
8/16/32), then SSD-style conv pairs (1x1 reduce + 3x3, mirroring the
reference's extra-layer pattern, ssdvgg.py:300-332) produce the
remaining maps. The pairs' stride/padding are derived from the preset's
declared map sizes, so one implementation serves both ``resnet320``
(6 maps) and the tiny ``rtest64`` test preset (4 maps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.layers import (
    float_conv_executor,
    init_conv,
    max_pool,
)
from ssd_tensorflow_tpu.presets import SSDPreset

#: ResNet-34 stage layout: (num_blocks, channels, first-block stride).
STAGES = ((3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2))

#: channels of the three trunk taps (layer2/layer3/layer4 outputs)
TRUNK_TAP_CHANNELS = (128, 256, 512)

#: channels of every extra-map conv pair's 3x3 output
EXTRA_CHANNELS = 256

GN_GROUPS = 32


def map_channels(preset: SSDPreset):
    """Head-input channel count per multibox source map."""
    n_extra = preset.num_maps - len(TRUNK_TAP_CHANNELS)
    assert n_extra >= 0, (
        f"{preset.name}: resnet34 presets need >= 3 maps (trunk taps)"
    )
    return TRUNK_TAP_CHANNELS + (EXTRA_CHANNELS,) * n_extra


def extra_layer_defs(preset: SSDPreset):
    """Conv-pair definitions for the maps beyond the three trunk taps.

    Stride/padding are derived from consecutive preset map sizes the
    same way the reference's fixed table encodes them implicitly
    (ssdvgg.py:300-332): halving -> 3x3/s2 SAME, shrink-by-2 -> 3x3/s1
    VALID.
    """
    defs = []
    cur = preset.maps[len(TRUNK_TAP_CHANNELS) - 1].size.h
    for i, m in enumerate(preset.maps[len(TRUNK_TAP_CHANNELS):]):
        target = m.size.h
        if target == -(-cur // 2):
            stride, padding = 2, "SAME"
        elif target == cur - 2:
            stride, padding = 1, "VALID"
        else:
            raise ValueError(
                f"{preset.name}: can't derive extra layer {cur}->{target}"
            )
        defs.append((f"extra{i}_1", EXTRA_CHANNELS // 2, 1, 1, "SAME"))
        defs.append((f"extra{i}_2", EXTRA_CHANNELS, 3, stride, padding))
        cur = target
    return defs


def _init_gn(ch, dtype, zero_scale=False):
    scale = jnp.zeros((ch,), dtype) if zero_scale else jnp.ones((ch,), dtype)
    return {"scale": scale, "bias": jnp.zeros((ch,), dtype)}


def group_norm(x, gn, groups=GN_GROUPS, eps=1e-5):
    """GroupNorm over channel groups, computed in float32."""
    b, h, w, c = x.shape
    g = groups if c % groups == 0 else 1
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    y = y * gn["scale"].astype(jnp.float32) + gn["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_resnet_params(key, preset: SSDPreset, dtype=jnp.float32):
    """Parameter pytree for the trunk + extra layers (heads live with the
    caller, models/ssd_vgg.init_params, exactly as for the VGG family)."""
    params = {}
    n_blocks = sum(s[0] for s in STAGES)
    keys = jax.random.split(key, 1 + 2 * n_blocks + n_blocks + 16)
    ki = iter(range(len(keys)))

    params["stem_conv"] = init_conv(keys[next(ki)], 7, 7, 3, 64, dtype)
    # conv biases are redundant before a normalization layer; keeping
    # them zero-initialized costs nothing and keeps the {'w','b'} leaf
    # contract every conv in the package shares
    params["stem_gn"] = _init_gn(64, dtype)

    cin = 64
    for si, (blocks, ch, _) in enumerate(STAGES):
        for bi in range(blocks):
            name = f"s{si}b{bi}"
            params[f"{name}_conv1"] = init_conv(keys[next(ki)], 3, 3, cin, ch, dtype)
            params[f"{name}_gn1"] = _init_gn(ch, dtype)
            params[f"{name}_conv2"] = init_conv(keys[next(ki)], 3, 3, ch, ch, dtype)
            # zero-init residual: block starts as identity
            params[f"{name}_gn2"] = _init_gn(ch, dtype, zero_scale=True)
            if bi == 0 and cin != ch:
                params[f"{name}_proj"] = init_conv(
                    keys[next(ki)], 1, 1, cin, ch, dtype
                )
                params[f"{name}_proj_gn"] = _init_gn(ch, dtype)
            cin = ch

    for k, (name, cout, ksize, _, _) in zip(
        jax.random.split(keys[-1], max(1, len(extra_layer_defs(preset)))),
        extra_layer_defs(preset),
    ):
        params[name] = init_conv(k, ksize, ksize, cin, cout, dtype)
        cin = cout
    return params


def _block(params, name, x, stride, conv):
    """Basic residual block: conv-GN-relu-conv-GN + skip, then relu."""
    y = conv(f"{name}_conv1", x, stride=stride)
    y = jax.nn.relu(group_norm(y, params[f"{name}_gn1"]))
    y = conv(f"{name}_conv2", y)
    y = group_norm(y, params[f"{name}_gn2"])
    if f"{name}_proj" in params:
        skip = group_norm(conv(f"{name}_proj", x, stride=stride),
                          params[f"{name}_proj_gn"])
    elif stride != 1:
        skip = x[:, ::stride, ::stride, :]
    else:
        skip = x
    return jax.nn.relu(y + skip)


def walk_feature_maps(params, x, preset: SSDPreset, conv):
    """The family's feature-map walk over an injectable conv executor
    ``conv(name, x, *, stride=1, padding="SAME") -> y`` (conv + bias
    only). GroupNorms, activations and skip connections run here, in
    the executor's output dtype — so the float path
    (layers.float_conv_executor), the int8 deploy path and its
    calibration pass (models/quantized.py) share one structure by
    construction."""
    x = conv("stem_conv", x, stride=2)
    x = jax.nn.relu(group_norm(x, params["stem_gn"]))
    x = max_pool(x, 3, 2)

    maps = []
    for si, (blocks, _, stride) in enumerate(STAGES):
        for bi in range(blocks):
            x = _block(params, f"s{si}b{bi}", x, stride if bi == 0 else 1,
                       conv)
        if si >= 1:  # layer2/3/4 outputs are the trunk taps
            maps.append(x)

    for name, _, _, stride, padding in extra_layer_defs(preset):
        x = jax.nn.relu(conv(name, x, stride=stride, padding=padding))
        if name.endswith("_2"):
            maps.append(x)

    assert len(maps) == preset.num_maps, (len(maps), preset.num_maps)
    for m, pm in zip(maps, preset.maps):
        assert m.shape[1:3] == (pm.size.h, pm.size.w), (m.shape, pm.size)
    return maps


def apply_feature_maps(params, x, preset: SSDPreset, f32_out=False):
    """Preprocessed images -> the preset's multibox source maps."""
    return walk_feature_maps(
        params, x, preset, float_conv_executor(params, f32_out)
    )


#: uniform family-dispatch name (models/ssd_vgg._backbone_module)
init_backbone_params = init_resnet_params
