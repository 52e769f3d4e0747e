"""Quantization-aware training (QAT) for the int8 deploy path.

The post-training path (models/quantized.py) quantizes a float
checkpoint: symmetric per-output-channel int8 weights, static per-layer
activation scales, int32 accumulation. QAT closes whatever accuracy gap
that transform leaves by *training through the quantizer*: the forward
pass applies the exact same rounding/clipping the deploy path will, as
differentiable fake-quantization with straight-through-estimator (STE)
gradients, so SGD moves the weights to minima that survive int8.

Usage: take a float checkpoint, calibrate activation scales once
(models/quantized.calibrate_activation_scales for VGG;
calibrate_activation_amax — per input channel — for the GN families),
finetune a few epochs
with :func:`make_qat_train_step`, then export with the SAME scales —
the deployed int8 network then computes (up to int32-vs-f32 accumulator
rounding) exactly what training optimized. Demo: tools/qat_finetune.py.

The reference has no analog (TF1 frozen-graph export only,
export_model.py:62-72); this is TPU-deployment capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ssd_tensorflow_tpu.models import vgg16
from ssd_tensorflow_tpu.models.layers import l2_normalize_scale, max_pool
from ssd_tensorflow_tpu.models.quantized import _POOL_AFTER
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    _extra_layer_defs,
    preprocess,
)

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _ste(x, q):
    """Straight-through estimator: forward q, gradient of x."""
    return x + lax.stop_gradient(q - x)


def fake_quant_weight(w):
    """Symmetric per-output-channel int8 fake-quantization (the scale
    recomputes from the live weights every step, matching
    quantized.quantize_weights at export time)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True) / 127.0
    s = jnp.maximum(lax.stop_gradient(s), 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127) * s
    return _ste(w, q)


def fake_quant_act(x, scale):
    """Symmetric per-layer int8 fake-quantization with a static scale.

    Clipped STE: the gradient is identity inside the representable range
    and ZERO where the quantizer saturates. An identity-everywhere STE
    lets weights drift arbitrarily behind a saturated activation (the
    forward is clipped, so the loss never pushes back) until the
    backward — which multiplies by those weights — explodes; measured as
    1e26-scale conv1_1 gradients ~20 steps into a finetune.
    """
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    in_range = (jnp.abs(x) <= 127.5 * scale).astype(x.dtype)
    return lax.stop_gradient(q) + in_range * (x - lax.stop_gradient(x))


def _fq_conv(p, x, act_scale, stride=1, padding="SAME", dilation=1, relu=True):
    """Fake-quantized conv: the float twin of quantized._qconv.

    f32 math throughout — the quantized values are exact small integers
    times scales, which bf16 would destroy.
    """
    xq = fake_quant_act(x, act_scale)
    wq = fake_quant_weight(p["w"].astype(jnp.float32))
    y = lax.conv_general_dilated(
        xq,
        wq,
        (stride, stride),
        padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
    )
    y = y + p["b"].astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y


def qat_apply_model(params, images, config: ModelConfig, act_scales):
    """Fake-quantized forward -> ``(logits, locs)`` like apply_model.

    Mirrors quantized._forward layer for layer (same layers quantized,
    same pool placement, float L2-norm between quantized convs) so that
    what QAT optimizes is what the int8 deploy path computes.
    """
    preset = config.preset
    x = preprocess(images, config).astype(jnp.float32)

    conv4_3 = None
    for name, _ in vgg16.VGG_CONV_LAYERS:
        x = _fq_conv(params[name], x, act_scales[name])
        if name == "conv4_3":
            conv4_3 = x
        if name in _POOL_AFTER:
            x = max_pool(x, 2, 2)
    x = max_pool(x, 3, 1)
    x = _fq_conv(params["mod_conv6"], x, act_scales["mod_conv6"], dilation=6)
    x = _fq_conv(params["mod_conv7"], x, act_scales["mod_conv7"])

    # config.l2_norm_eps must be large enough (1e-3; the QAT CLIs set
    # it) to bound the rsqrt backward: activation fake-quant rounds
    # small values to exact zeros, so whole conv4_3 pixel vectors can be
    # 0 — with the float path's 1e-12 eps that makes 1e6-scale gradients
    # and the weights blow up mid-finetune. Reading it from the config
    # (which the checkpoint carries) keeps float eval, calibration and
    # the int8 deploy path computing exactly what QAT trained.
    maps = [
        l2_normalize_scale(
            conv4_3,
            params["l2_norm_conv4_3"]["scale"],
            eps=config.l2_norm_eps,
        ),
        x,
    ]
    for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
        if name == "conv12_1":
            x = _fq_conv(params[name], x, act_scales[name], stride, padding)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            continue
        x = _fq_conv(params[name], x, act_scales[name], stride, padding)
        if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
            maps.append(x)

    nv = config.num_vars
    outs = []
    for i, (fmap, m) in enumerate(zip(maps, preset.maps)):
        name = f"classifier{i}"
        y = _fq_conv(params[name], fmap, act_scales[name], relu=False)
        b, h, w, _ = y.shape
        y = y.reshape(b, h * w, m.num_shapes, nv)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, m.num_shapes * h * w, nv)
        outs.append(y)
    out = jnp.concatenate(outs, axis=1).astype(jnp.float32)
    logits = out[:, :, : config.num_classes + 1]
    locs = out[:, :, config.num_classes + 1 :]
    return logits, locs


def _fq_conv_folded(p, x, a_scale, stride=1, padding="SAME"):
    """Float twin of the family int8 deploy conv (quantized._qconv_folded).

    Per-input-channel activation fake-quant on the grid ``a_scale``
    (shape ``(cin,)``), the same scale folded into the float weights
    along cin, per-output-channel weight fake-quant on the *folded*
    weights, then unfolded — so the forward computes
    ``conv(round(x/a)·a, (round(w·a/s)·s)/a) + b``, which is exactly the
    deployed program ``conv(round(x/a), wq)·s + b`` up to accumulator
    rounding. Gradients: clipped STE through the activation quantizer,
    identity STE through the weight quantizer (the fold is linear in
    ``w``; ``a`` is static).
    """
    a = a_scale
    xq = fake_quant_act(x.astype(jnp.float32), a)  # broadcasts over cin
    wf = p["w"].astype(jnp.float32) * a[None, None, :, None]
    s = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
    s = jnp.maximum(lax.stop_gradient(s), 1e-12)
    wq = _ste(wf, jnp.clip(jnp.round(wf / s), -127, 127) * s)
    y = lax.conv_general_dilated(
        xq,
        wq / a[None, None, :, None],
        (stride, stride),
        padding,
        dimension_numbers=_DIMNUMS,
    )
    return y + p["b"].astype(jnp.float32)


def _fq_family_executor(params, a_scales):
    """Conv executor for a family ``walk_feature_maps``: the fake-quant
    twin of quantized._qconv_executor. Full/pointwise convs run through
    :func:`_fq_conv_folded`; depthwise stencils are weight-only
    fake-quantized (the deploy path dequantizes their int8 weights and
    convolves in float — no activation quantizer to train through)."""
    from ssd_tensorflow_tpu.models.layers import depthwise_conv2d

    def conv(name, x, *, stride=1, padding="SAME", depthwise=False):
        p = params[name]
        if depthwise:
            w = fake_quant_weight(p["w"].astype(jnp.float32))
            return depthwise_conv2d(
                x, w, p["b"].astype(jnp.float32), stride=stride
            )
        return _fq_conv_folded(
            p, x, a_scales[name], stride=stride, padding=padding
        )

    return conv


def qat_apply_model_family(params, images, config: ModelConfig, a_scales):
    """Fake-quantized forward for the GN families -> ``(logits, locs)``.

    Mirrors the family branch of quantized._feature_maps_q/_forward
    layer for layer — GroupNorms and activations run in float between
    fake-quantized convs inside the family's own ``walk_feature_maps``,
    heads go through the same folded per-channel quantizer — so what QAT
    optimizes is what the int8 deploy path computes. ``a_scales`` maps
    quantized conv names to per-input-channel scales (amax/127, the
    quantize_weights_folded grid).
    """
    from ssd_tensorflow_tpu.models.ssd_vgg import _backbone_module

    fam = _backbone_module(config.preset)
    assert fam is not None, "VGG presets use qat_apply_model"
    preset = config.preset
    x = preprocess(images, config).astype(jnp.float32)
    maps = fam.walk_feature_maps(
        params, x, preset, _fq_family_executor(params, a_scales)
    )

    nv = config.num_vars
    outs = []
    for i, (fmap, m) in enumerate(zip(maps, preset.maps)):
        name = f"classifier{i}"
        y = _fq_conv_folded(params[name], fmap, a_scales[name])
        b, h, w, _ = y.shape
        y = y.reshape(b, h * w, m.num_shapes, nv)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, m.num_shapes * h * w, nv)
        outs.append(y)
    out = jnp.concatenate(outs, axis=1)
    logits = out[:, :, : config.num_classes + 1]
    locs = out[:, :, config.num_classes + 1 :]
    return logits, locs


def make_qat_forward(model_cfg: ModelConfig, act_scales):
    """The fake-quant forward ``(params, images) -> (logits, locs)`` as a
    closure over static scales — pluggable into make_train_step /
    make_eval_step via their ``forward`` parameter.

    For VGG presets ``act_scales`` is the per-layer scale dict from
    quantized.calibrate_activation_scales; for the GN families it is the
    per-input-channel amax dict from quantized.calibrate_activation_amax
    (checkpoint key ``qat_act_amax``; JSON lists round-trip fine).
    """
    if model_cfg.preset.backbone != "vgg":
        import numpy as np

        a_scales = {
            k: jnp.maximum(
                jnp.asarray(np.asarray(v, np.float32)) / 127.0, 1e-12
            )
            for k, v in act_scales.items()
        }

        def family_forward(p, x):
            return qat_apply_model_family(p, x, model_cfg, a_scales)

        return family_forward
    if model_cfg.l2_norm_eps < 1e-6:
        raise ValueError(
            "QAT requires ModelConfig.l2_norm_eps >= 1e-6 (got "
            f"{model_cfg.l2_norm_eps}): fake-quant zeros whole conv4_3 "
            "pixel vectors and rsqrt(tiny eps) explodes the backward — "
            "build the config with l2_norm_eps=1e-3 like train.py --qat"
        )
    scales = {k: float(v) for k, v in act_scales.items()}

    def forward(p, x):
        return qat_apply_model(p, x, model_cfg, scales)

    return forward


def make_qat_train_step(cfg, anchors, act_scales, donate: bool = True):
    """A jitted train step whose forward is the fake-quant network.

    Same signature/semantics as parallel.train_step.make_train_step;
    ``act_scales`` is the static per-layer scale dict from
    quantized.calibrate_activation_scales on the float checkpoint.
    """
    from ssd_tensorflow_tpu.parallel.train_step import make_train_step

    return make_train_step(
        cfg, anchors, donate=donate,
        forward=make_qat_forward(cfg.model, act_scales),
    )
