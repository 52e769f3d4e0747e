"""MobileNetV1 SSD backbone — the third model family.

The reference implements exactly one backbone (VGG-16, reference
ssdvgg.py:87-372); `models/resnet.py` added a second. This family
exercises the one op class neither of them touches: **depthwise-
separable convolutions** (Howard et al. 2017), the classic
MobileNet-SSD detector trunk. Everything anchor-side (generation,
matching, codec, NMS, AP) and every CLI runs unchanged — presets carry
a ``backbone`` tag and the head machinery is family-generic.

TPU-first choices:
  * **The FLOPs live in the pointwise convs.** A 1x1 conv is a pure
    matmul over the channel axis — exactly MXU shape. The 3x3 depthwise
    pass has no contraction dimension, so XLA lowers it to the VPU as a
    bandwidth-bound stencil and fuses it with the adjacent
    normalization/activation; that split (MXU for compute, VPU for the
    stencil) is what makes the family cheap per image on TPU, not just
    on phones.
  * **GroupNorm, not BatchNorm** — same rationale as the ResNet family
    (models/resnet.py): per-sample math, no train/eval mode split, no
    cross-chip moment psum under data parallelism.
  * **ReLU6** (the MobileNet standard): the bounded range keeps
    activation amplitudes calibration-friendly; representable exactly
    in bfloat16.
  * Width multiplier fixed at 1.0 — the preset registry is the place a
    slimmer variant would live, as a new preset, not a constructor arg.

Feature maps: trunk taps at the conv11 block output (512 ch, stride 16)
and the conv13 block output (1024 ch, stride 32) — the canonical
MobileNet-SSD tap points — then SSD-style conv pairs (1x1 reduce + 3x3,
mirroring the reference's extra-layer pattern, ssdvgg.py:300-332)
produce the remaining maps. Pair strides/paddings are derived from the
preset's declared map sizes, so one implementation serves both
``mobilenet320`` (6 maps) and the tiny ``mntest64`` test preset (3
maps).
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

from ssd_tensorflow_tpu.models.layers import float_conv_executor, init_conv
from ssd_tensorflow_tpu.models.resnet import _init_gn, group_norm
from ssd_tensorflow_tpu.presets import SSDPreset

#: MobileNetV1 stack: (stride, out_channels) per depthwise-separable
#: block, after the 3x3/s2/32ch full-conv stem (Howard 2017, table 1).
BLOCKS = (
    (1, 64),
    (2, 128), (1, 128),
    (2, 256), (1, 256),
    (2, 512), (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),
    (2, 1024), (1, 1024),
)

#: trunk tap points: block indices (1-based) and their channel counts.
#: conv11 (stride 16) and conv13 (stride 32) — the MobileNet-SSD
#: convention.
TAP_BLOCKS = (11, 13)
TRUNK_TAP_CHANNELS = (512, 1024)

#: extra-map conv pairs beyond the trunk taps: (1x1 reduce ch, 3x3 out
#: ch), in MobileNet-SSD's tapering widths. Presets with fewer maps use
#: a prefix.
EXTRA_DEFS = ((256, 512), (128, 256), (128, 256), (64, 128))


def map_channels(preset: SSDPreset):
    """Head-input channel count per multibox source map."""
    n_extra = preset.num_maps - len(TRUNK_TAP_CHANNELS)
    assert 0 <= n_extra <= len(EXTRA_DEFS), (
        f"{preset.name}: mobilenetv1 presets support "
        f"{len(TRUNK_TAP_CHANNELS)}..{len(TRUNK_TAP_CHANNELS) + len(EXTRA_DEFS)}"
        f" maps, got {preset.num_maps}"
    )
    return TRUNK_TAP_CHANNELS + tuple(out for _, out in EXTRA_DEFS[:n_extra])


def extra_layer_defs(preset: SSDPreset):
    """Conv-pair definitions for the maps beyond the two trunk taps.

    Stride/padding derived from consecutive preset map sizes exactly as
    the ResNet family does (models/resnet.py, mirroring the implicit
    table at reference ssdvgg.py:300-332).
    """
    defs = []
    cur = preset.maps[len(TRUNK_TAP_CHANNELS) - 1].size.h
    n_extra = preset.num_maps - len(TRUNK_TAP_CHANNELS)
    # init_backbone_params allocates PRNG keys for len(EXTRA_DEFS)
    # conv pairs; a preset needing more would fail there with an opaque
    # StopIteration — reject it here with the real reason instead
    if n_extra > len(EXTRA_DEFS):
        raise ValueError(
            f"{preset.name}: {n_extra} extra maps but the mobilenetv1 "
            f"channel table (EXTRA_DEFS) defines only {len(EXTRA_DEFS)}"
        )
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
        reduce_ch, out_ch = EXTRA_DEFS[i]
        defs.append((f"extra{i}_1", reduce_ch, 1, 1, "SAME"))
        defs.append((f"extra{i}_2", out_ch, 3, stride, padding))
        cur = target
    assert len(defs) == 2 * n_extra
    return defs


def relu6(x):
    """Bounded ReLU (Howard 2017); exact in bfloat16."""
    return jnp.minimum(jax.nn.relu(x), jnp.asarray(6.0, x.dtype))


def init_backbone_params(key, preset: SSDPreset, dtype=jnp.float32):
    """Parameter pytree for the trunk + extra layers (heads live with
    the caller, models/ssd_vgg.init_params, as for every family)."""
    params = {}
    keys = jax.random.split(key, 2 + 2 * len(BLOCKS) + 2 * len(EXTRA_DEFS))
    ki = iter(range(len(keys)))

    params["stem_conv"] = init_conv(keys[next(ki)], 3, 3, 3, 32, dtype)
    params["stem_gn"] = _init_gn(32, dtype)

    cin = 32
    for i, (_, cout) in enumerate(BLOCKS, start=1):
        # depthwise filter is HWIO with I=1, O=cin (layers.depthwise_conv2d)
        params[f"b{i}_dw"] = init_conv(keys[next(ki)], 3, 3, 1, cin, dtype)
        params[f"b{i}_dw_gn"] = _init_gn(cin, dtype)
        params[f"b{i}_pw"] = init_conv(keys[next(ki)], 1, 1, cin, cout, dtype)
        params[f"b{i}_pw_gn"] = _init_gn(cout, dtype)
        cin = cout

    for name, cout, ksize, _, _ in extra_layer_defs(preset):
        params[name] = init_conv(keys[next(ki)], ksize, ksize, cin, cout, dtype)
        cin = cout
    return params


def walk_feature_maps(params, x, preset: SSDPreset, conv):
    """The family's feature-map walk over an injectable conv executor
    ``conv(name, x, *, stride=1, padding="SAME", depthwise=False) -> y``
    (conv + bias only). GroupNorms and ReLU6 run here, in the executor's
    output dtype — so the float path (layers.float_conv_executor), the
    int8 deploy path and its calibration pass (models/quantized.py)
    share one structure by construction. The ``depthwise`` flag lets the
    int8 executor keep the depthwise stencils in float (weight-only
    quantized): they are VPU/bandwidth-bound, so A8 requant round trips
    would cost without any MXU payoff."""
    x = conv("stem_conv", x, stride=2)
    x = relu6(group_norm(x, params["stem_gn"]))

    maps = []
    for i, (stride, _) in enumerate(BLOCKS, start=1):
        x = conv(f"b{i}_dw", x, stride=stride, depthwise=True)
        x = relu6(group_norm(x, params[f"b{i}_dw_gn"]))
        x = conv(f"b{i}_pw", x)
        x = relu6(group_norm(x, params[f"b{i}_pw_gn"]))
        if i in TAP_BLOCKS:
            maps.append(x)

    for name, _, _, stride, padding in extra_layer_defs(preset):
        x = relu6(conv(name, x, stride=stride, padding=padding))
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
