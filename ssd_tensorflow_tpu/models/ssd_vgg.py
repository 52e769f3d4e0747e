"""The SSD-VGG detector: preset-parameterized pure forward pass.

Replaces the reference's TF1 graph builder (ssdvgg.py:87-372) with a
functional design: ``init_params`` builds a parameter pytree,
``apply_model`` is a pure function ``(params, images) -> (logits, locs)``
that jits, vmaps, shards and differentiates.

Architecture (reference ssdvgg.py:300-372):
  VGG16 trunk -> a-trous conv6/conv7 -> extra layers conv8..11 (+12 for
  7-map presets) -> L2-normalized conv4_3 + 5-6 more feature maps ->
  one 3x3 multibox head per anchor shape per map -> concat to
  ``(B, A, K+5)``.

TPU-first choices:
  * all heads of one map run as a single wide conv (one big MXU matmul)
    whose output channels are the per-shape heads concatenated —
    initialization is still done per head so statistics match the
    reference's separate 3x3 convs;
  * anchor ordering contract: heads-major then row-major cells,
    identical to the anchor generator (see ops/anchors.py);
  * optional bfloat16 compute with float32 accumulation & output;
  * preprocessing (BGR mean subtraction) fused into the jitted forward.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models import vgg16
from ssd_tensorflow_tpu.models.layers import conv2d, conv_relu, init_conv
from ssd_tensorflow_tpu.presets import SSDPreset, get_preset_by_name


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model configuration (hashable -> usable as a jit static arg)."""

    preset_name: str = "vgg300"
    #: number of foreground classes K; background becomes index K
    #: (reference: ssdvgg.py:106-107).
    num_classes: int = 20
    #: a-trous fc6/fc7 conversion (reference: ssdvgg.py:111-112).
    a_trous: bool = True
    #: conv compute dtype; params stay float32.
    compute_dtype: str = "bfloat16"
    #: BGR channel means subtracted on device. The reference feeds raw
    #: BGR floats and relies on its downloaded VGG graph's internal
    #: preprocessing; the expand-fill mean [104,117,123]
    #: (process_dataset.py:114) pins the convention.
    mean_bgr: Tuple[float, float, float] = (104.0, 117.0, 123.0)
    #: run preprocess+conv1_1+conv1_2+pool1 as the width-packed stem
    #: (models/packed_conv.py) — same math, ~3x faster on TPU where the
    #: 64-channel convs otherwise waste half the vector lanes. Same
    #: parameters either way; differentiable; disable for exact
    #: bit-parity with the unpacked path.
    packed_stem: bool = True
    #: run conv1_2+pool1 as the manual-DMA Pallas kernel
    #: (ops/stem_pallas.fused_stem_pallas_dma) on the inference path:
    #: conv1_2's 2.1 GB activation never touches HBM. bf16-only and
    #: inference-only (no VJP) — training and non-bf16 forwards fall
    #: back to the packed XLA stem. Off CPU/interpret the kernel runs
    #: in interpret mode so the wiring stays testable.
    pallas_stem: bool = False
    #: which Pallas stem kernel `pallas_stem` selects: "dma" = the
    #: split stem (XLA conv1_1, Pallas conv1_2+pool1 with manual DMA);
    #: "uint8" = the whole stem in one kernel reading the raw uint8
    #: image (ops/stem_pallas.fused_stem_uint8 — no large operand at
    #: the custom-call boundary; needs Mosaic lane-unflatten support,
    #: present on newer libtpu only).
    pallas_stem_variant: str = "dma"
    #: epsilon inside the conv4_3 L2-normalization rsqrt. QAT training
    #: sets 1e-3 (activation fake-quant rounds small values to exact
    #: zeros; rsqrt(1e-12) there makes 1e6-scale gradients) and the value
    #: travels in the checkpoint config so float eval, calibration and
    #: the int8 deploy path all compute exactly what QAT trained.
    l2_norm_eps: float = 1e-12
    #: pad each classifier's per-anchor output group from nv (= K+5,
    #: 25 for VOC) to the next multiple of 32 with structured zero
    #: channels on the scores inference path. The head conv's output
    #: then reshapes into (cells, ns, 32)-groups that split on vector-
    #: lane boundaries, so the cells-minor transpose in
    #: reduce_head_maps is a lane-aligned permute instead of an
    #: unaligned 25-minor gather; the pad channels are sliced away
    #: after the transpose, where that axis is no longer minor.
    #: Math-identical (zero weights, zero bias, outputs never read).
    #: Scores path only — training and the reference-parity result
    #: tensor keep the exact nv-wide heads.
    padded_heads: bool = False

    def __post_init__(self):
        if self.pallas_stem and self.compute_dtype != "bfloat16":
            raise ValueError(
                "pallas_stem requires compute_dtype='bfloat16' "
                f"(got {self.compute_dtype!r}); the fused stem kernel "
                "is a bf16 MXU kernel (ops/stem_pallas.py)"
            )
        if self.pallas_stem and self.preset.backbone != "vgg":
            raise ValueError(
                "pallas_stem is a VGG conv1-block kernel; preset "
                f"{self.preset_name!r} uses backbone "
                f"{self.preset.backbone!r}"
            )

    @property
    def preset(self) -> SSDPreset:
        return get_preset_by_name(self.preset_name)

    @property
    def num_vars(self) -> int:
        """Per-anchor output width: K+1 classes + 4 offsets."""
        return self.num_classes + 5

    @property
    def num_vars_padded(self) -> int:
        """Per-anchor head-conv group width on the scores path: num_vars
        rounded up to a multiple of 32 when ``padded_heads`` is set."""
        if not self.padded_heads:
            return self.num_vars
        return -(-self.num_vars // 32) * 32


# Extra feature layers: (name, out_ch, kernel, stride, padding)
# conv10_2 differs between 6- and 7-map presets (ssdvgg.py:300-305).
# Each convN_1/convN_2 pair produces one multibox source map beyond the
# two backbone taps, so presets with fewer maps (e.g. the tiny test64
# preset) use a truncated prefix of the chain.
def _extra_layer_defs(num_maps: int):
    stride10, padding10 = (2, "SAME") if num_maps >= 7 else (1, "VALID")
    defs = [
        ("conv8_1", 256, 1, 1, "SAME"),
        ("conv8_2", 512, 3, 2, "SAME"),
        ("conv9_1", 128, 1, 1, "SAME"),
        ("conv9_2", 256, 3, 2, "SAME"),
        ("conv10_1", 128, 1, 1, "SAME"),
        ("conv10_2", 256, 3, stride10, padding10),
        ("conv11_1", 128, 1, 1, "SAME"),
        ("conv11_2", 256, 3, 1, "VALID"),
    ][: 2 * (num_maps - 2)]
    if num_maps >= 7:
        defs += [
            ("conv12_1", 128, 1, 1, "SAME"),  # + asymmetric pad, see apply
            ("conv12_2", 256, 3, 1, "VALID"),
        ]
    return defs


#: input channel count of each multibox head source map (VGG family)
#: [norm_conv4_3, mod_conv7, conv8_2, conv9_2, conv10_2, conv11_2, (conv12_2)]
#: (reference: ssdvgg.py:340-350).
_MAP_CHANNELS = (512, 1024, 512, 256, 256, 256, 256)


def _backbone_module(preset: SSDPreset):
    """Non-VGG family module for a preset, or None for the VGG family.

    Each family module exposes the same surface: ``map_channels``,
    ``init_backbone_params`` and ``apply_feature_maps``. Imports are
    lazy so the VGG path never pays for families it doesn't use.
    """
    if preset.backbone == "resnet34":
        from ssd_tensorflow_tpu.models import resnet

        return resnet
    if preset.backbone == "mobilenetv1":
        from ssd_tensorflow_tpu.models import mobilenet

        return mobilenet
    return None


def map_channels(preset: SSDPreset):
    """Head-input channel count per multibox source map, per family."""
    fam = _backbone_module(preset)
    if fam is not None:
        return fam.map_channels(preset)
    return _MAP_CHANNELS[: preset.num_maps]


def init_params(key, config: ModelConfig, dtype=jnp.float32):
    """Build the full parameter pytree (numpy-backed init, see layers)."""
    preset = config.preset
    k_vgg, k_extra, k_heads = jax.random.split(key, 3)

    fam = _backbone_module(preset)
    if fam is not None:
        params = fam.init_backbone_params(k_vgg, preset, dtype)
    else:
        params = vgg16.init_vgg_params(k_vgg, dtype)

        # conv4_3 L2-norm learnable scale, init to 20 (ssdvgg.py:335-337)
        params["l2_norm_conv4_3"] = {"scale": jnp.full((512,), 20.0, dtype)}

        defs = _extra_layer_defs(preset.num_maps)
        cin = 1024
        for k, (name, cout, ksize, _, _) in zip(
            jax.random.split(k_extra, len(defs)), defs
        ):
            params[name] = init_conv(k, ksize, ksize, cin, cout, dtype)
            cin = cout

    # Multibox heads: one wide conv per map, channels = heads-major
    # concat of per-shape heads, each initialized like a separate
    # 3x3xCx(num_vars) xavier conv (ssdvgg.py:55-65,353-362).
    nv = config.num_vars
    chans = map_channels(preset)
    head_keys = jax.random.split(k_heads, preset.num_maps)
    for i, m in enumerate(preset.maps):
        c = chans[i]
        ks = jax.random.split(head_keys[i], m.num_shapes)
        ws, bs = [], []
        for kk in ks:
            hp = init_conv(kk, 3, 3, c, nv, dtype)
            ws.append(hp["w"])
            bs.append(hp["b"])
        params[f"classifier{i}"] = {
            "w": jnp.concatenate(ws, axis=-1),
            "b": jnp.concatenate(bs, axis=-1),
        }
    return params


def preprocess(images, config: ModelConfig):
    """uint8/float BGR images -> mean-subtracted compute-dtype tensor."""
    dtype = jnp.dtype(config.compute_dtype)
    x = images.astype(jnp.float32) - jnp.asarray(
        config.mean_bgr, dtype=jnp.float32
    )
    return x.astype(dtype)


def _feature_maps(
    params,
    images,
    config: ModelConfig,
    *,
    preprocessed: bool = False,
    inference: bool = False,
):
    """Backbone + extra layers -> the preset's multibox source maps."""
    from ssd_tensorflow_tpu.models.layers import l2_normalize_scale

    preset = config.preset
    fam = _backbone_module(preset)
    if fam is not None:
        x = images if preprocessed else preprocess(images, config)
        x = x.astype(jnp.dtype(config.compute_dtype))
        return fam.apply_feature_maps(params, x, preset, f32_out=inference)
    if config.pallas_stem and inference and not preprocessed:
        import jax as _jax

        from ssd_tensorflow_tpu.ops import stem_pallas

        stem_fn = {
            "dma": stem_pallas.fused_stem_pallas_dma,
            "uint8": stem_pallas.fused_stem_uint8,
        }[config.pallas_stem_variant]
        stem_in = images
        if config.pallas_stem_variant == "uint8":
            stem_in = images.astype(jnp.uint8)
        pool1 = stem_fn(
            params,
            stem_in,
            config.mean_bgr,
            config.compute_dtype,
            interpret=_jax.default_backend() != "tpu",
        )
        conv4_3, x = vgg16.apply_backbone(
            params, pool1, config.a_trous, f32_out=inference, from_pool1=True
        )
    elif config.packed_stem and not preprocessed:
        from ssd_tensorflow_tpu.models.packed_conv import conv1_block_packed

        pool1 = conv1_block_packed(
            params,
            images,
            config.mean_bgr,
            config.compute_dtype,
            f32_out=inference,
        )
        conv4_3, x = vgg16.apply_backbone(
            params, pool1, config.a_trous, f32_out=inference, from_pool1=True
        )
    else:
        x = images if preprocessed else preprocess(images, config)
        x = x.astype(jnp.dtype(config.compute_dtype))

        conv4_3, x = vgg16.apply_backbone(
            params, x, config.a_trous, f32_out=inference
        )

    maps = [
        l2_normalize_scale(
            conv4_3, params["l2_norm_conv4_3"]["scale"], eps=config.l2_norm_eps
        ),
        x,
    ]

    for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
        if name == "conv12_1":
            x = conv_relu(params[name], x, stride, padding, f32_out=inference)
            # asymmetric zero-pad before conv12_2 (ssdvgg.py:327-330)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            continue
        x = conv_relu(params[name], x, stride, padding, f32_out=inference)
        if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
            maps.append(x)

    assert len(maps) == preset.num_maps, (len(maps), preset.num_maps)
    return maps


def apply_model(
    params,
    images,
    config: ModelConfig,
    *,
    preprocessed: bool = False,
    inference: bool = False,
):
    """Forward pass.

    Args:
      params: pytree from :func:`init_params`.
      images: ``(B, H, W, 3)`` BGR images (raw 0-255 range unless
        ``preprocessed``).
      config: static model config.
      inference: enables the faster f32-accumulate conv path, which is
        not differentiable — set only when no grad flows through.

    Returns:
      ``(logits, locs)``: ``(B, A, K+1)`` float32 class logits and
      ``(B, A, 4)`` float32 location offsets.
    """
    preset = config.preset
    maps = _feature_maps(
        params, images, config, preprocessed=preprocessed, inference=inference
    )
    nv = config.num_vars
    outputs = []
    for i, (fmap, m) in enumerate(zip(maps, preset.maps)):
        hp = params[f"classifier{i}"]
        y = conv2d(fmap, hp["w"], hp["b"], f32_out=inference)  # (B,h,w,ns*nv)
        b, h, w, _ = y.shape
        assert (h, w) == (m.size.h, m.size.w), (
            f"map {i}: got {h}x{w}, preset says {m.size.h}x{m.size.w}"
        )
        # heads-major, then row-major cells — the anchor-order contract
        y = y.reshape(b, h * w, m.num_shapes, nv)
        y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, m.num_shapes * h * w, nv)
        outputs.append(y)

    out = jnp.concatenate(outputs, axis=1).astype(jnp.float32)
    logits = out[:, :, : config.num_classes + 1]
    locs = out[:, :, config.num_classes + 1 :]
    return logits, locs


def apply_result(params, images, config: ModelConfig):
    """The reference's fused inference tensor: concat(softmax, locs).

    Reference: ssdvgg.py:368-372 ('result/result'). Inference-only:
    uses the faster non-differentiable conv path.
    """
    logits, locs = apply_model(params, images, config, inference=True)
    return jnp.concatenate([jax.nn.softmax(logits, axis=-1), locs], axis=-1)


def pad_head_vars(w, b, ns: int, nv: int, nvp: int):
    """Zero-pad a classifier conv's per-anchor output groups nv -> nvp.

    ``w`` is ``(kh, kw, ci, ns*nv)``, ``b`` ``(ns*nv,)`` — the padded
    channels carry zero weights and zero bias, so the original channels'
    sums are untouched and the pad outputs are never read (sliced away
    in reduce_head_maps). Works for any per-channel trailing-dim array
    via the same reshape, see pad_head_channels.
    """
    if nvp == nv:
        return w, b
    kh, kw, ci, _ = w.shape
    w = jnp.pad(
        w.reshape(kh, kw, ci, ns, nv),
        ((0, 0), (0, 0), (0, 0), (0, 0), (0, nvp - nv)),
    ).reshape(kh, kw, ci, ns * nvp)
    return w, pad_head_channels(b, ns, nv, nvp)


def pad_head_channels(v, ns: int, nv: int, nvp: int, fill=0):
    """Pad a per-output-channel vector ``(ns*nv,)`` -> ``(ns*nvp,)``."""
    if nvp == nv:
        return v
    return jnp.pad(
        v.reshape(ns, nv), ((0, 0), (0, nvp - nv)), constant_values=fill
    ).reshape(ns * nvp)


def apply_scores(params, images, config: ModelConfig):
    """Throughput inference head: per-anchor ``(conf, cls, locs)``.

    The decode+NMS pipeline only consumes the argmax foreground class
    and its softmax probability per anchor (ops/postprocess.py), so the
    full ``(B, A, K+1)`` float32 softmax of ``apply_result`` never needs
    to materialize: ``conf = exp(max_fg_logit - logsumexp(logits))`` and
    ``cls = argmax(fg_logits)`` reduce each head map in-place. Saves
    ~300 MB of HBM round-trips per vgg512 batch-64 step.

    The per-anchor reductions run in a *cells-minor* layout: reducing
    over a 25-wide minor axis would map nv=25 onto the 128 vector lanes
    and waste 4/5 of them, so each head map is transposed once to
    ``(B, ns, nv, h*w)``, the argmax/logsumexp reductions run over a
    non-minor axis at full lane width, and the results land directly in
    the heads-major anchor order (no second transpose). Measured
    ~0.65 ms/batch faster than the anchor-minor formulation on both
    presets (b64, v5e).

    Returns:
      conf ``(B, A)`` float32, cls ``(B, A)`` int32, locs ``(B, A, 4)``
      float32 — in the anchor-order contract.
    """
    preset = config.preset
    maps = _feature_maps(params, images, config, inference=True)

    nv, nvp = config.num_vars, config.num_vars_padded

    def head_conv(i, fmap):
        hp = params[f"classifier{i}"]
        w, b = pad_head_vars(hp["w"], hp["b"], preset.maps[i].num_shapes, nv, nvp)
        return conv2d(fmap, w, b, f32_out=True)

    return reduce_head_maps(head_conv, maps, preset, config)


def reduce_head_maps(head_conv, maps, preset, config: ModelConfig):
    """Shared cells-minor lazy-softmax reduction over the head maps.

    ``head_conv(i, fmap)`` runs map i's classifier conv (float or int8 —
    models/quantized uses this too); the reduction below is the single
    source of truth for the scores-path math.
    """
    K = config.num_classes
    confs, clss, locss = [], [], []
    for i, (fmap, m) in enumerate(zip(maps, preset.maps)):
        y = head_conv(i, fmap)  # (B, h, w, ns*nvp)
        b, h, w, co = y.shape
        # per-anchor group width as the conv produced it — num_vars, or
        # the lane-aligned padded width when config.padded_heads is set
        # (the pad channels fall off in the logits/locs slices below,
        # on a non-minor axis after the transpose)
        nvp = co // m.num_shapes
        assert nvp * m.num_shapes == co and nvp >= config.num_vars, (
            co, m.num_shapes, config.num_vars
        )
        # cells-minor: (B, ns, nvp, hw) — reductions below run over the
        # nvp axis, which is no longer the lane dimension
        y = y.reshape(b, h * w, m.num_shapes, nvp)
        y = jnp.transpose(y, (0, 2, 3, 1))  # (B, ns, nvp, hw)
        logits = y[:, :, : K + 1, :]
        fg = logits[:, :, :K, :]
        cls_m = jnp.argmax(fg, axis=2).astype(jnp.int32)  # (B, ns, hw)
        mx = jnp.max(logits, axis=2).astype(jnp.float32)
        se = jnp.sum(
            jnp.exp(logits.astype(jnp.float32) - mx[:, :, None, :]), axis=2
        )
        conf_m = jnp.exp(jnp.max(fg, axis=2).astype(jnp.float32) - mx) / se
        locs_m = jnp.transpose(y[:, :, K + 1 : K + 5, :], (0, 1, 3, 2))
        # (B, ns, hw) / (B, ns, hw, 4) are already in the heads-major
        # anchor-order contract
        confs.append(conf_m.reshape(b, -1))
        clss.append(cls_m.reshape(b, -1))
        locss.append(locs_m.reshape(b, -1, 4).astype(jnp.float32))
    return (
        jnp.concatenate(confs, axis=1),
        jnp.concatenate(clss, axis=1),
        jnp.concatenate(locss, axis=1),
    )


class SSDVGG:
    """Thin OO facade bundling config + params, mirroring the reference's
    class surface (ssdvgg.py:87) for users coming from it."""

    def __init__(self, config: ModelConfig, params=None):
        self.config = config
        self.preset = config.preset
        self.num_classes = config.num_classes + 1
        self.num_vars = config.num_vars
        self.params = params

    def init(self, seed: int = 0, pretrained_vgg: Optional[str] = None):
        self.params = init_params(jax.random.PRNGKey(seed), self.config)
        if pretrained_vgg:
            self.params = vgg16.load_pretrained_vgg(pretrained_vgg, self.params)
        return self.params

    def __call__(self, images):
        return apply_model(self.params, images, self.config)

    def result(self, images):
        return apply_result(self.params, images, self.config)
