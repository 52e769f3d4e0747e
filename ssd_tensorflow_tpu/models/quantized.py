"""int8 (W8A8) quantized inference path.

The v5e MXU runs int8 at ~1.5x the measured bf16 conv throughput, so the
deploy path offers a quantized forward: symmetric per-output-channel
int8 weights, static per-layer activation scales from a calibration
pass, int32 accumulation, float bias/requant. Training stays bf16/f32 —
this is a post-training deployment transform of a checkpoint, the
quantized analog of the reference's frozen-graph export
(export_model.py:62-72).

Layers quantized: every conv (backbone, a-trous conv6/7, extras,
multibox heads). The conv4_3 L2-normalization runs in float between
quantized convs.

All three model families deploy through this path. The VGG family has
its own hand-scheduled walk below; the resnet34/mobilenetv1 families
walk their module's ``walk_feature_maps`` with an int8 conv executor
(:func:`_qconv_executor`) — full/pointwise convs W8A8, GroupNorms in
float between them, and MobileNet's depthwise stencils weight-only
quantized (W8 with float activations: no contraction dim means no MXU
payoff for A8, only requant round trips). QAT
(models/qat.py) remains VGG-only; family PTQ parity is tested in
tests/test_quantized_families.py.
"""

from __future__ import annotations

from typing import Dict

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from ssd_tensorflow_tpu.models import vgg16
from ssd_tensorflow_tpu.models.layers import l2_normalize_scale, max_pool
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    _extra_layer_defs,
    preprocess,
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def quantize_weights(params) -> Dict:
    """Symmetric per-output-channel int8 quantization of every conv."""
    q = {}
    for name, leaf in params.items():
        if isinstance(leaf, dict) and "w" in leaf:
            w = np.asarray(leaf["w"], dtype=np.float32)
            scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0  # (cout,)
            scale = np.maximum(scale, 1e-12)
            wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            q[name] = {
                "wq": jnp.asarray(wq),
                "w_scale": jnp.asarray(scale),
                "b": jnp.asarray(np.asarray(leaf["b"], np.float32)),
            }
        else:
            q[name] = jax.tree_util.tree_map(jnp.asarray, leaf)
    return q


def _qconv(qp, x, act_scale, stride=1, padding="SAME", dilation=1, relu=True):
    """Quantize x with the static act_scale, int8 conv, requantize out.

    The int8 x int8 conv accumulates to **float32**, not int32: on the
    current v5e runtime (libtpu Nov-2025) the i32-accumulation conv
    lowers to a ~164 TOP/s path while f32/bf16 output runs at ~259
    TOP/s (measured, docs/PERFORMANCE.md "int8 accumulation dtype") —
    and the very next op dequantizes to f32 anyway. Numerics: the MXU
    accumulates in f32; integer dot products are exact below 2^24 and
    real activation sums sit orders of magnitude under the worst case,
    so the quantization error itself dominates (int8-vs-float mAP
    parity is verified end-to-end on the miniVOC test set).
    """
    inv = 1.0 / act_scale
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )
    y = lax.conv_general_dilated(
        xq,
        qp["wq"],
        (stride, stride),
        padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    )
    y = y * (act_scale * qp["w_scale"]) + qp["b"]
    if relu:
        y = jax.nn.relu(y)
    return y.astype(jnp.bfloat16)


_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3", "conv4_3"}

#: Width-packed int8 stem: measured a ~1% LOSS on v5e (vgg512 b64:
#: 1039 vs 1050 img/s, best-of-4 chained) — unlike bf16, the int8 conv
#: path is not lane-starved at 64 channels, so doubling nominal FLOPs
#: for full lanes nets out negative. Kept as an equivalent alternative
#: (tests/test_quantized.py::TestPackedInt8Stem); flip to re-measure on
#: other TPU generations.
INT8_PACKED_STEM = False


def _pack_qconv3x3(qp):
    """Width-pack an int8-quantized 3x3 conv (models/packed_conv.py).

    The packed int8 conv computes the SAME sums as the unpacked one
    (structured zero weights contribute exact zeros), so the packed
    stem matches the unpacked int8 stem up to f32 summation order
    (accumulation is f32 — see _qconv).
    """
    w = qp["wq"]
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for po in (0, 1):
        for k in (0, 1, 2):
            off = po + k - 1
            wp = wp.at[
                :, off // 2 + 1,
                (off % 2) * ci : (off % 2 + 1) * ci,
                po * co : (po + 1) * co,
            ].set(w[:, k])
    return {
        "wq": wp,
        "w_scale": jnp.concatenate([qp["w_scale"], qp["w_scale"]]),
        "b": jnp.concatenate([qp["b"], qp["b"]]),
    }


def _quantize_lanes(x, act_scale, flat_groups: int = 1):
    """Quantize to int8 with a static scale; elementwise work runs on a
    lane-aligned flat view when the minor dim is tiny (flat_groups > 1
    merges that many minor dims into the lanes, cf. preprocess_flat)."""
    shape = x.shape
    if flat_groups > 1:
        x = x.reshape(*shape[:-2], shape[-2] * shape[-1])
    inv = 1.0 / act_scale
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )
    return xq.reshape(shape)


def _stem_q_packed(qparams, act_scales, images, config: ModelConfig):
    """Width-packed int8 conv1_1 + conv1_2 + pool1 -> (B, H/2, W/2, 64).

    The 64-channel stem convs waste half the TPU's 128 vector lanes
    unpacked; packing width pairs into channels (packed_conv.py) fills
    them. Matches the unpacked int8 stem up to f32 summation order (the
    structured pad weights are exact zeros; accumulation is f32 like
    _qconv — see the accumulation-dtype note there).
    """
    from ssd_tensorflow_tpu.models.packed_conv import preprocess_flat

    x = preprocess_flat(images, config.mean_bgr, jnp.float32)
    xq = _quantize_lanes(x, act_scales["conv1_1"], flat_groups=2)

    def qconv_packed(name, xq):
        qp = _pack_qconv3x3(qparams[name])
        y = lax.conv_general_dilated(
            xq, qp["wq"], (1, 1), "SAME",
            dimension_numbers=_DIMNUMS,
            preferred_element_type=jnp.float32,
        )
        y = y * (act_scales[name] * qp["w_scale"]) + qp["b"]
        return jax.nn.relu(y)

    y = qconv_packed("conv1_1", xq).astype(jnp.bfloat16)
    y = qconv_packed("conv1_2", _quantize_lanes(y, act_scales["conv1_2"]))
    # pool1: height via windowed max; width is a lane-half max because
    # each packed column holds the two pooled width-pixels
    y = lax.reduce_window(
        y, -jnp.inf, lax.max,
        window_dimensions=(1, 2, 1, 1),
        window_strides=(1, 2, 1, 1),
        padding="SAME",
    )
    return jnp.maximum(y[..., :64], y[..., 64:]).astype(jnp.bfloat16)


def _family_module(config: ModelConfig):
    from ssd_tensorflow_tpu.models.ssd_vgg import _backbone_module

    return _backbone_module(config.preset)


# --- family (non-VGG) int8 path: per-input-channel activation scales ---
#
# The family trunks normalize between convs (GroupNorm), which
# *amplifies* per-tensor activation-quantization noise: GN divides by
# the tensor std, so a scale set by the tensor-wide max makes the
# relative error of low-amplitude channels large — measured ~10-11%
# per-map feature error on mobilenetv1 vs ~3% for the VGG family.
# Per-INPUT-channel activation scales cut that to ~7% (bf16 activations
# alone are ~3.5%) and cost NOTHING at inference: the channel scale
# a_c folds into the float weights along their input axis before
# per-output-channel weight quantization, so the deployed program is
# the same quantize -> int8 conv -> per-cout requant as the per-tensor
# path — only the int8 grid x is quantized onto is per-channel.


def quantize_weights_folded(params, act_amax=None):
    """Family int8 deploy pytree: per-input-channel activation scales
    folded into per-output-channel int8 weights.

    ``act_amax`` maps quantizable conv names to per-input-channel |x|
    maxima from :func:`calibrate_activation_amax` (None -> unit scales,
    used only to build the structural template in
    inference.load_bundle). Depthwise convs (``*_dw``) are weight-only
    quantized; non-conv leaves pass through.
    """
    q = {}
    for name, leaf in params.items():
        if not (isinstance(leaf, dict) and "w" in leaf):
            q[name] = jax.tree_util.tree_map(jnp.asarray, leaf)
            continue
        w = np.asarray(leaf["w"], dtype=np.float32)
        b = jnp.asarray(np.asarray(leaf["b"], np.float32))
        if name.endswith("_dw"):
            scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0
            scale = np.maximum(scale, 1e-12)
            wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            q[name] = {
                "wq": jnp.asarray(wq),
                "w_scale": jnp.asarray(scale),
                "b": b,
            }
            continue
        cin = w.shape[2]
        if act_amax is None:
            a_scale = np.ones((cin,), np.float32)
        else:
            a_scale = np.asarray(act_amax[name], np.float32) / 127.0
        a_scale = np.maximum(a_scale, 1e-12)
        wf = w * a_scale[None, None, :, None]  # fold act scale into cin
        w_scale = np.abs(wf).max(axis=(0, 1, 2)) / 127.0  # (cout,)
        w_scale = np.maximum(w_scale, 1e-12)
        wq = np.clip(np.round(wf / w_scale), -127, 127).astype(np.int8)
        q[name] = {
            "wq": jnp.asarray(wq),
            "w_scale": jnp.asarray(w_scale),
            "a_scale": jnp.asarray(a_scale),
            "b": b,
        }
    return q


def _qconv_folded(qp, x, stride=1, padding="SAME"):
    """int8 conv with the per-channel act scale folded into the weights.

    Same f32-accumulation rationale as :func:`_qconv`; the requant
    multiplier is just ``w_scale`` because the activation scale is
    already inside the quantized weights.
    """
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / qp["a_scale"])), -127, 127
    ).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq,
        qp["wq"],
        (stride, stride),
        padding,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.float32,
    )
    return (y * qp["w_scale"] + qp["b"]).astype(jnp.bfloat16)


def _qconv_executor(qparams):
    """The int8 conv executor for a family ``walk_feature_maps``.

    Full/pointwise convs run W8A8 through :func:`_qconv_folded`.
    Depthwise convs run weight-only quantized (W8, float activations):
    they are VPU/bandwidth-bound stencils with no contraction dim, so an
    int8 activation path buys no MXU throughput and would only add
    quantize/requantize round trips — the dequantized int8 weights keep
    the bundle small and the math within weight-quantization error.
    """

    def conv(name, x, *, stride=1, padding="SAME", depthwise=False):
        qp = qparams[name]
        if depthwise:
            from ssd_tensorflow_tpu.models.layers import depthwise_conv2d

            w = (qp["wq"].astype(jnp.float32) * qp["w_scale"]).astype(x.dtype)
            return depthwise_conv2d(x, w, qp["b"].astype(x.dtype),
                                    stride=stride)
        return _qconv_folded(qp, x, stride=stride, padding=padding)

    return conv


def _feature_maps_q(qparams, act_scales, images, config: ModelConfig):
    """int8 backbone + extras -> the preset's multibox source maps."""
    preset = config.preset
    fam = _family_module(config)
    if fam is not None:
        x = preprocess(images, config).astype(jnp.bfloat16)
        return fam.walk_feature_maps(
            qparams, x, preset, _qconv_executor(qparams)
        )
    packed = (
        INT8_PACKED_STEM
        and config.packed_stem
        and images.shape[2] % 2 == 0
    )

    if packed:
        x = _stem_q_packed(qparams, act_scales, images, config)
        layers = vgg16.VGG_CONV_LAYERS[2:]  # conv1_1/conv1_2/pool1 done
    else:
        x = preprocess(images, config).astype(jnp.bfloat16)
        layers = vgg16.VGG_CONV_LAYERS

    conv4_3 = None
    for name, _ in layers:
        x = _qconv(qparams[name], x, act_scales[name])
        if name == "conv4_3":
            conv4_3 = x
        if name in _POOL_AFTER:
            x = max_pool(x, 2, 2)
    x = max_pool(x, 3, 1)
    x = _qconv(qparams["mod_conv6"], x, act_scales["mod_conv6"], dilation=6)
    x = _qconv(qparams["mod_conv7"], x, act_scales["mod_conv7"])

    maps = [
        l2_normalize_scale(
            conv4_3,
            qparams["l2_norm_conv4_3"]["scale"],
            eps=config.l2_norm_eps,
        ),
        x,
    ]
    for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
        if name == "conv12_1":
            x = _qconv(qparams[name], x, act_scales[name], stride, padding)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            continue
        x = _qconv(qparams[name], x, act_scales[name], stride, padding)
        if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
            maps.append(x)
    return maps


def _head_qconv(qparams, act_scales, name, fmap, config: ModelConfig):
    """One multibox head conv on the right int8 path for the family."""
    if _family_module(config) is not None:
        return _qconv_folded(qparams[name], fmap)
    return _qconv(qparams[name], fmap, act_scales[name], relu=False)


def _forward(qparams, act_scales, images, config: ModelConfig):
    """Quantized forward -> (B, A, K+5) result tensor (softmax'd)."""
    preset = config.preset
    maps = _feature_maps_q(qparams, act_scales, images, config)
    nv = config.num_vars
    outs = []
    for i, (fmap, m) in enumerate(zip(maps, preset.maps)):
        name = f"classifier{i}"
        y = _head_qconv(qparams, act_scales, name, fmap, config)
        b, h, w, _ = y.shape
        y = y.astype(jnp.float32).reshape(b, h * w, m.num_shapes, nv)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, m.num_shapes * h * w, nv)
        outs.append(y)
    out = jnp.concatenate(outs, axis=1)
    logits = out[:, :, : config.num_classes + 1]
    locs = out[:, :, config.num_classes + 1 :]
    return jnp.concatenate([jax.nn.softmax(logits, -1), locs], axis=-1)


def _forward_scores(qparams, act_scales, images, config: ModelConfig):
    """int8 throughput head: per-anchor ``(conf, cls, locs)``.

    The int8 twin of models/ssd_vgg.apply_scores — lazy softmax with
    the cells-minor reduction layout, so the full (B, A, K+1) softmax
    never materializes. Feed to ops/postprocess.decode_scores.
    """
    from ssd_tensorflow_tpu.models.ssd_vgg import (
        pad_head_channels,
        pad_head_vars,
        reduce_head_maps,
    )

    preset = config.preset
    maps = _feature_maps_q(qparams, act_scales, images, config)
    nv, nvp = config.num_vars, config.num_vars_padded

    fam = _family_module(config)

    def head_conv(i, fmap):
        name = f"classifier{i}"
        qp = qparams[name]
        if nvp != nv:
            # lane-aligned head groups (ssd_vgg.ModelConfig.padded_heads):
            # zero int8 weights add exact int32 zeros, w_scale pads with
            # 1 (never read — the pad outputs are sliced away)
            ns = preset.maps[i].num_shapes
            wq, b = pad_head_vars(qp["wq"], qp["b"], ns, nv, nvp)
            qp = dict(
                qp,  # keeps a_scale on the family path (cin unchanged)
                wq=wq,
                w_scale=pad_head_channels(qp["w_scale"], ns, nv, nvp, 1),
                b=b,
            )
        if fam is not None:
            y = _qconv_folded(qp, fmap)
        else:
            y = _qconv(qp, fmap, act_scales[name], relu=False)
        return y.astype(jnp.float32)

    return reduce_head_maps(head_conv, maps, preset, config)


def calibrate_activation_scales(
    params,
    images,
    config: ModelConfig,
    percentile: float = 100.0,
    batch_size: int = 8,
) -> Dict:
    """Float forwards over the calibration set recording each conv
    input's amplitude -> static symmetric activation scales.

    ``percentile`` defaults to 100 (max-abs). Percentile clipping
    (e.g. 99.9) sounds like robustness but was measured to destroy
    accuracy on this network: post-ReLU VGG feature maps are sparse, so
    a *value* percentile over the tensor clips the salient activations,
    not outliers — on a trained vgg512 checkpoint the per-multibox-map
    relative error is 0.11-0.24 at pct=99.9 vs 0.011-0.032 at max-abs,
    and the held-out test mAP gap was ~16 points vs ~2
    (tools/diag_int8_gap.py; docs/PERFORMANCE.md "int8 calibration").
    Max-abs is also cheaper (no O(n log n) percentile sort). The set is
    processed in ``batch_size`` chunks and each layer's scale is the max
    over chunks, so calibrating over many images costs memory of one
    small batch.
    """
    out = None
    for off in range(0, images.shape[0], batch_size):
        chunk = _calibrate_one_batch(
            params, images[off : off + batch_size], config, percentile
        )
        if out is None:
            out = chunk
        else:
            out = {k: max(out[k], chunk[k]) for k in out}
    return out


def _calibrate_one_batch(
    params, images, config: ModelConfig, percentile: float
) -> Dict:
    # one jitted program per (config, percentile, shape): eager execution
    # would pay a host<->device round trip per op
    amps = _calibrate_amps_jit(params, images, config, percentile)
    return {k: float(v) / 127.0 + 1e-12 for k, v in amps.items()}


@partial(jax.jit, static_argnames=("config", "percentile"))
def _calibrate_amps_jit(
    params, images, config: ModelConfig, percentile: float
) -> Dict:
    from ssd_tensorflow_tpu.models.layers import conv_relu

    scales = {}
    preset = config.preset
    x = preprocess(images, config).astype(jnp.float32)

    def record(name, x):
        a = jnp.abs(x)
        amp = jnp.max(a) if percentile >= 100 else jnp.percentile(a, percentile)
        scales[name] = amp

    assert _family_module(config) is None, (
        "family presets calibrate per-channel via calibrate_activation_amax"
    )

    conv4_3 = None
    for name, _ in vgg16.VGG_CONV_LAYERS:
        record(name, x)
        x = conv_relu(params[name], x)
        if name == "conv4_3":
            conv4_3 = x
        if name in _POOL_AFTER:
            x = max_pool(x, 2, 2)
    x = max_pool(x, 3, 1)
    record("mod_conv6", x)
    x = conv_relu(params["mod_conv6"], x, dilation=6)
    record("mod_conv7", x)
    x = conv_relu(params["mod_conv7"], x)

    maps = [
        l2_normalize_scale(
            conv4_3,
            params["l2_norm_conv4_3"]["scale"],
            eps=config.l2_norm_eps,
        ),
        x,
    ]
    for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
        record(name, x)
        x = conv_relu(params[name], x, stride, padding)
        if name == "conv12_1":
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            continue
        if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
            maps.append(x)

    for i, fmap in enumerate(maps):
        record(f"classifier{i}", fmap)
    return scales


def calibrate_activation_amax(
    params,
    images,
    config: ModelConfig,
    percentile: float = 100.0,
    batch_size: int = 8,
) -> Dict:
    """Per-INPUT-CHANNEL |x| maxima for every quantizable family conv.

    The family analog of :func:`calibrate_activation_scales` (see the
    per-channel rationale above :func:`quantize_weights_folded`): float
    forwards over the calibration set recording each conv input's
    per-channel amplitude, chunked so memory stays one small batch.
    Returns ``{conv_name: (cin,) array}`` for
    :func:`quantize_weights_folded`; depthwise convs are skipped
    (weight-only quantized).

    Chunks merge with an elementwise max, which is exact only for the
    max-abs (``percentile=100``) calibration; a per-chunk percentile
    merged with max would silently depend on ``batch_size``, so a
    sub-100 percentile runs the whole calibration set as ONE chunk
    (exact global percentile, at the cost of activation memory scaling
    with the calibration-set size — fine for the 16-64 image sets the
    export CLI uses).
    """
    if percentile < 100.0:
        batch_size = int(images.shape[0])
    out = None
    for off in range(0, images.shape[0], batch_size):
        chunk = _calibrate_amax_family_jit(
            params, images[off : off + batch_size], config, percentile
        )
        chunk = {k: np.asarray(v) for k, v in chunk.items()}
        if out is None:
            out = chunk
        else:
            out = {k: np.maximum(out[k], chunk[k]) for k in out}
    return out


@partial(jax.jit, static_argnames=("config", "percentile"))
def _calibrate_amax_family_jit(
    params, images, config: ModelConfig, percentile: float
) -> Dict:
    from ssd_tensorflow_tpu.models.layers import conv2d, depthwise_conv2d

    fam = _family_module(config)
    assert fam is not None, "VGG presets calibrate via _calibrate_amps_jit"
    amax = {}

    def record(name, x):
        a = jnp.abs(x.astype(jnp.float32))
        if percentile >= 100:
            amax[name] = jnp.max(a, axis=tuple(range(a.ndim - 1)))
        else:
            amax[name] = jnp.percentile(
                a.reshape(-1, a.shape[-1]), percentile, axis=0
            )

    def rec_conv(name, x, *, stride=1, padding="SAME", depthwise=False):
        p = params[name]
        if depthwise:
            return depthwise_conv2d(x, p["w"], p["b"], stride=stride)
        record(name, x)
        return conv2d(x, p["w"], p["b"], stride=stride, padding=padding)

    x = preprocess(images, config).astype(jnp.float32)
    maps = fam.walk_feature_maps(params, x, config.preset, rec_conv)
    for i, fmap in enumerate(maps):
        record(f"classifier{i}", fmap)
    return amax


class QuantizedModel:
    """Post-training-quantized deployable model."""

    def __init__(
        self, params, config: ModelConfig, calibration_images,
        percentile: float = 100.0,
    ):
        self.config = config
        if _family_module(config) is not None:
            amax = calibrate_activation_amax(
                params, calibration_images, config, percentile=percentile
            )
            self.qparams = quantize_weights_folded(params, amax)
            # per-channel scales live inside qparams; the (non-None)
            # empty dict marks the bundle int8 (inference.save_bundle)
            self.act_scales = {}
        else:
            self.qparams = quantize_weights(params)
            self.act_scales = calibrate_activation_scales(
                params, calibration_images, config, percentile=percentile
            )

        def fwd(qp, images):
            return _forward(qp, self.act_scales, images, config)

        self._fwd = jax.jit(fwd)

    def result(self, images):
        """(B, A, K+5) fused result tensor, like apply_result."""
        return self._fwd(self.qparams, images)
