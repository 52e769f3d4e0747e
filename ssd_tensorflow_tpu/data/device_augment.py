"""Batched on-device SSD augmentation.

The reference augments one image at a time on the host with OpenCV
inside fork workers (transforms.py:162-391) and ships results through a
shared-memory queue (data_queue.py). Here the entire SSD augmentation
chain — photometric distortion, channel reorder, mean-filled expand,
the min-IoU crop sampler, horizontal flip and the final resize — runs
as ONE jitted, vmapped program over a fixed-shape uint8 batch, so the
host only decodes and stages JPEGs while the TPU does the math.

TPU-first redesign of the geometry: *expand -> crop -> resize* collapse
into a single axis-aligned source window ``(x0, y0, x1, y1)`` in
normalized image coordinates. The window is applied with two small
interpolation matmuls (MXU work, fixed shapes, no gathers); any
interpolation mass that falls outside the staged image — the expand
canvas — is routed to the per-channel mean, which reproduces the
reference's mean-filled canvas without ever materializing it
(transforms.py:272-299).

Documented deviations from the reference's host semantics:

* the crop sampler's IoU runs in continuous normalized coordinates,
  not the integerized +1-pixel 1000-canvas (ssdutils.py:138-152) —
  at 300/512-px staging sizes the accept decisions differ only on
  sub-pixel ties;
* crops resample the fixed-size staged image instead of the original
  full-resolution JPEG;
* the random interpolation-algorithm pick (transforms.py:117-125) is
  always bilinear on device;
* box centers are dropped by the continuous rule ``0 <= c < 1`` rather
  than the reference's integer-center test (transforms.py:236-259);
* the >=1-positive guarantee (training_data.py:92-98, a 50x host
  resampling loop) becomes a branch-free fallback: when the augmented
  geometry leaves no anchor matched, the identity window (whole image,
  no flip) is used instead.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.ops.iou import canvas_iou

#: the six channel permutations of ReorderChannelsTransform
#: (transforms.py:226-233).
_PERMS = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation parameters.

    Defaults reproduce the reference's canonical SSD chain
    (process_dataset.py:60-151 via data/transforms.py:370-423).
    """

    out_h: int = 300
    out_w: int = 300
    mean_bgr: Tuple[float, float, float] = (104.0, 117.0, 123.0)
    brightness_prob: float = 0.5
    brightness_delta: int = 32
    contrast_prob: float = 0.5
    contrast_lower: float = 0.5
    contrast_upper: float = 1.5
    hue_prob: float = 0.5
    hue_delta: int = 18
    saturation_prob: float = 0.5
    saturation_lower: float = 0.5
    saturation_upper: float = 1.5
    reorder_prob: float = 0.5
    expand_prob: float = 0.5
    expand_max_ratio: float = 4.0
    sampler_overlaps: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
    sampler_trials: int = 50
    sampler_min_scale: float = 0.3
    sampler_max_scale: float = 1.0
    sampler_min_ar: float = 0.5
    sampler_max_ar: float = 2.0
    flip_prob: float = 0.5
    #: fall back to the identity window when the augmented geometry has
    #: no anchor with IoU > match_threshold (training_data.py:92-98).
    ensure_positive: bool = True
    match_threshold: float = 0.5


# ---------------------------------------------------------------------------
# Color: OpenCV-convention HSV (H in [0,180), S,V in [0,255]) on BGR floats
# ---------------------------------------------------------------------------


def bgr_to_hsv(img):
    """(..., 3) BGR float [0,255] -> (..., 3) HSV, OpenCV ranges."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe_delta,
        jnp.where(
            v == g,
            120.0 + 60.0 * (b - r) / safe_delta,
            240.0 + 60.0 * (r - g) / safe_delta,
        ),
    )
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) * 0.5  # -> [0, 180)
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr(hsv):
    """Inverse of :func:`bgr_to_hsv` (OpenCV ranges)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = h * 2.0  # degrees [0, 360)
    c = v * s / 255.0
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    rs = jnp.stack([c, x, z, z, x, c], axis=-1)
    gs = jnp.stack([x, c, c, x, z, z], axis=-1)
    bs = jnp.stack([z, z, x, c, c, x], axis=-1)
    sel = jax.nn.one_hot(sector, 6, dtype=hsv.dtype)
    r = (rs * sel).sum(-1) + m
    g = (gs * sel).sum(-1) + m
    b = (bs * sel).sum(-1) + m
    return jnp.stack([b, g, r], axis=-1)


def _photometric(key, img, cfg: AugmentConfig):
    """Brightness, contrast/saturation/hue distortion and channel
    reorder on one float image (transforms.py:162-233 semantics, one
    HSV round trip instead of one per transform)."""
    ks = jax.random.split(key, 11)

    # brightness: integer delta in [-d, d], p=0.5 (transforms.py:162-174)
    do_b = jax.random.uniform(ks[0]) < cfg.brightness_prob
    delta_b = jax.random.randint(
        ks[1], (), -cfg.brightness_delta, cfg.brightness_delta + 1
    ).astype(img.dtype)
    img = jnp.clip(img + jnp.where(do_b, delta_b, 0.0), 0.0, 255.0)

    # the distort picker applies [contrast, sat, hue] or
    # [sat, hue, contrast] (transforms.py / build_train_transforms):
    # contrast either precedes or follows the HSV pair.
    do_c = jax.random.uniform(ks[2]) < cfg.contrast_prob
    fac_c = jax.random.uniform(
        ks[3], (), minval=cfg.contrast_lower, maxval=cfg.contrast_upper
    )
    fac_c = jnp.where(do_c, fac_c, 1.0)

    do_s = jax.random.uniform(ks[4]) < cfg.saturation_prob
    fac_s = jax.random.uniform(
        ks[5], (), minval=cfg.saturation_lower, maxval=cfg.saturation_upper
    )
    fac_s = jnp.where(do_s, fac_s, 1.0)

    do_h = jax.random.uniform(ks[6]) < cfg.hue_prob
    delta_h = jax.random.randint(
        ks[7], (), -cfg.hue_delta, cfg.hue_delta + 1
    ).astype(img.dtype)
    delta_h = jnp.where(do_h, delta_h, 0.0)

    contrast_first = jax.random.uniform(ks[8]) < 0.5

    def hsv_pass(x):
        hsv = bgr_to_hsv(x)
        h = hsv[..., 0] + delta_h
        h = jnp.where(h >= 180.0, h - 180.0, jnp.where(h < 0, h + 180.0, h))
        s = jnp.clip(hsv[..., 1] * fac_s, 0.0, 255.0)
        return hsv_to_bgr(jnp.stack([h, s, hsv[..., 2]], axis=-1))

    def contrast(x):
        return jnp.clip(x * fac_c, 0.0, 255.0)

    img = jnp.where(contrast_first, hsv_pass(contrast(img)), contrast(hsv_pass(img)))
    img = jnp.clip(img, 0.0, 255.0)

    # channel reorder, p=0.5 (transforms.py:226-233)
    do_r = jax.random.uniform(ks[9]) < cfg.reorder_prob
    perm_id = jax.random.randint(ks[10], (), 0, len(_PERMS))
    perm = jnp.where(do_r, jnp.asarray(_PERMS)[perm_id], jnp.arange(3))
    img = jnp.take(img, perm, axis=-1)
    return img


# ---------------------------------------------------------------------------
# Geometry: expand + crop sampler -> one source window
# ---------------------------------------------------------------------------


def _corner_iou(a, b):
    """Plain continuous IoU of (..., 4) [x0, y0, x1, y1] boxes.

    a: (T, 4), b: (G, 4) -> (T, G).
    """
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.where(union > 0, union, 1.0)


def _sampler_windows(key, boxes_c, mask, cfg: AugmentConfig):
    """Run every min-IoU sampler on boxes in canvas-normalized corner
    form (transforms.py:302-361, vectorized over samplers x trials).

    Returns ``(ok (S,), windows (S, 4))`` — the first passing trial per
    sampler as ``[x0, y0, x1, y1]`` in canvas-normalized coordinates.
    """
    S = len(cfg.sampler_overlaps)
    T = cfg.sampler_trials
    ks = jax.random.split(key, 4)
    scale = jax.random.uniform(
        ks[0], (S, T), minval=cfg.sampler_min_scale, maxval=cfg.sampler_max_scale
    )
    ar = jax.random.uniform(
        ks[1], (S, T), minval=cfg.sampler_min_ar, maxval=cfg.sampler_max_ar
    )
    # keep both extents <= 1 (transforms.py:330-331)
    ar = jnp.clip(ar, scale**2, 1.0 / scale**2)
    w = scale * jnp.sqrt(ar)
    h = scale / jnp.sqrt(ar)
    cx = 0.5 * w + jax.random.uniform(ks[2], (S, T)) * jnp.clip(1.0 - w, 0.0)
    cy = 0.5 * h + jax.random.uniform(ks[3], (S, T)) * jnp.clip(1.0 - h, 0.0)
    trials = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )  # (S, T, 4)

    G = boxes_c.shape[0]
    iou = _corner_iou(trials.reshape(S * T, 4), boxes_c).reshape(S, T, G)
    iou = jnp.where(mask[None, None, :], iou, -1.0)
    best = iou.max(axis=-1)  # (S, T)
    overlaps = jnp.asarray(cfg.sampler_overlaps)[:, None]
    # accept rule: best IoU > 0 and >= the sampler's threshold
    # (transforms.py:337-347 via compute_overlap)
    ok_t = (best > 0.0) & (best >= overlaps)
    first = jnp.argmax(ok_t, axis=1)  # (S,) first passing trial
    ok = ok_t.any(axis=1) & mask.any()
    windows = jnp.take_along_axis(trials, first[:, None, None], axis=1)[:, 0]
    return ok, windows


def _sample_geometry(key, boxes, mask, cfg: AugmentConfig):
    """Expand + sampler pick + flip -> (window (4,), flip bool).

    ``boxes``: (G, 4) center-form normalized; the returned window is
    ``[x0, y0, x1, y1]`` in source-image normalized coordinates and may
    extend outside [0, 1] (the expand canvas).
    """
    k_exp, k_ratio, k_off, k_samp, k_pick, k_flip = jax.random.split(key, 6)

    # -- expand canvas (transforms.py:272-299) --------------------------
    do_expand = jax.random.uniform(k_exp) < cfg.expand_prob
    ratio = jax.random.uniform(k_ratio, (), minval=1.0, maxval=cfg.expand_max_ratio)
    ratio = jnp.where(do_expand, ratio, 1.0)
    off = jax.random.uniform(k_off, (2,)) * (ratio - 1.0)  # (ox, oy) >= 0
    # canvas in image coords: x in [-ox, ratio - ox), y in [-oy, ...)
    ox, oy = off[0], off[1]

    # gt boxes in canvas-normalized corner form
    cx = (boxes[:, 0] + ox) / ratio
    cy = (boxes[:, 1] + oy) / ratio
    w2 = boxes[:, 2] / (2.0 * ratio)
    h2 = boxes[:, 3] / (2.0 * ratio)
    boxes_c = jnp.stack([cx - w2, cy - h2, cx + w2, cy + h2], axis=-1)

    ok, windows = _sampler_windows(k_samp, boxes_c, mask, cfg)
    # identity sampler (SamplerTransform(sample=False)) always succeeds
    ok = jnp.concatenate([jnp.ones((1,), bool), ok])
    windows = jnp.concatenate(
        [jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), windows], axis=0
    )
    # uniform pick among successes (transforms.py:364-375)
    gumbel = jax.random.uniform(k_pick, (ok.shape[0],))
    pick = jnp.argmax(jnp.where(ok, gumbel, -1.0))
    win_c = windows[pick]

    # canvas-normalized -> image-normalized
    x0 = win_c[0] * ratio - ox
    y0 = win_c[1] * ratio - oy
    x1 = win_c[2] * ratio - ox
    y1 = win_c[3] * ratio - oy
    window = jnp.stack([x0, y0, x1, y1])

    flip = jax.random.uniform(k_flip) < cfg.flip_prob
    return window, flip


def remap_boxes(boxes, mask, window, flip):
    """Remap center-form boxes into a window; drop boxes whose center
    leaves it (transforms.py:236-269) and mirror when flipped.

    Returns ``(boxes, mask)`` with the same shapes.
    """
    wx0, wy0, wx1, wy1 = window[0], window[1], window[2], window[3]
    ww = wx1 - wx0
    wh = wy1 - wy0
    cx = (boxes[:, 0] - wx0) / ww
    cy = (boxes[:, 1] - wy0) / wh
    w = boxes[:, 2] / ww
    h = boxes[:, 3] / wh
    keep = mask & (cx >= 0) & (cx < 1) & (cy >= 0) & (cy < 1)
    cx = jnp.where(flip, 1.0 - cx, cx)
    out = jnp.stack([cx, cy, w, h], axis=-1)
    return jnp.where(keep[:, None], out, 0.0), keep


def resample_window(img, window, flip, out_h, out_w, mean):
    """Resample a source window of one HxWx3 float image to
    (out_h, out_w, 3) with bilinear weights via two interpolation
    matmuls; out-of-window interpolation mass takes the mean color
    (the expand canvas fill, transforms.py:282-287)."""
    H, W = img.shape[0], img.shape[1]
    wx0, wy0, wx1, wy1 = window[0], window[1], window[2], window[3]

    def interp_matrix(n_out, n_in, lo, hi):
        # source pixel-center coordinate of each output pixel
        o = (jnp.arange(n_out) + 0.5) / n_out
        src = (lo + o * (hi - lo)) * n_in - 0.5
        i = jnp.arange(n_in)
        return jnp.clip(1.0 - jnp.abs(src[:, None] - i[None, :]), 0.0)

    ry = interp_matrix(out_h, H, wy0, wy1)  # (out_h, H)
    rx = interp_matrix(out_w, W, wx0, wx1)  # (out_w, W)
    tmp = jnp.einsum("oh,hwc->owc", ry, img)
    out = jnp.einsum("pw,owc->opc", rx, tmp)
    coverage = jnp.clip(ry.sum(1)[:, None] * rx.sum(1)[None, :], 0.0, 1.0)
    out = out + (1.0 - coverage)[..., None] * jnp.asarray(mean, img.dtype)
    return jnp.where(flip, out[:, ::-1, :], out)


# ---------------------------------------------------------------------------
# Full per-image chain + batch entry point
# ---------------------------------------------------------------------------


def augment_image(key, img_u8, boxes, labels, mask, anchors, cfg: AugmentConfig):
    """The full SSD augmentation chain for one image, on device.

    Args:
      key:    PRNG key for this image.
      img_u8: (H, W, 3) uint8 BGR staged image.
      boxes:  (G, 4) center-form normalized gt; labels (G,); mask (G,).
      anchors: (A, 4) center-form anchors (for the positive fallback).
      cfg:    static parameters.

    Returns:
      ``(image (out_h, out_w, 3) uint8, boxes (G, 4), labels (G,),
      mask (G,))``.
    """
    k_photo, k_geom = jax.random.split(key)
    img = _photometric(k_photo, img_u8.astype(jnp.float32), cfg)

    window, flip = _sample_geometry(k_geom, boxes, mask, cfg)
    new_boxes, new_mask = remap_boxes(boxes, mask, window, flip)

    if cfg.ensure_positive:
        iou = canvas_iou(new_boxes, anchors)  # (G, A)
        iou = jnp.where(new_mask[:, None], iou, -1.0)
        has_pos = (iou > cfg.match_threshold).any()
        identity = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        window = jnp.where(has_pos, window, identity)
        flip = jnp.logical_and(flip, has_pos)
        id_boxes = jnp.where(mask[:, None], boxes, 0.0)
        new_boxes = jnp.where(has_pos, new_boxes, id_boxes)
        new_mask = jnp.where(has_pos, new_mask, mask)

    out = resample_window(img, window, flip, cfg.out_h, cfg.out_w, cfg.mean_bgr)
    out_u8 = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out_u8, new_boxes.astype(jnp.float32), labels, new_mask


def make_augment_fn(cfg: AugmentConfig, anchors):
    """Build the jitted batch augmentation: ``(key, batch) -> batch``.

    ``batch`` is the pipeline's fixed-shape dict (images uint8
    (B, H, W, 3), gt_boxes (B, G, 4), gt_labels (B, G), gt_mask (B, G));
    each image gets an independent key folded from ``key``.
    """
    anchors = jnp.asarray(anchors)

    def fn(key, batch):
        B = batch["images"].shape[0]
        keys = jax.random.split(key, B)
        imgs, boxes, labels, mask = jax.vmap(
            lambda k, i, b, l, m: augment_image(k, i, b, l, m, anchors, cfg)
        )(keys, batch["images"], batch["gt_boxes"], batch["gt_labels"],
          batch["gt_mask"])
        return {
            "images": imgs,
            "gt_boxes": boxes,
            "gt_labels": labels,
            "gt_mask": mask,
        }

    return jax.jit(fn)


def augment_config_for(preset, aug_params: dict | None = None) -> AugmentConfig:
    """AugmentConfig from a preset + the pipeline's declarative
    augmentation dict (training-data.json)."""
    from ssd_tensorflow_tpu.data.pipeline import validate_augmentation_config

    aug_params = validate_augmentation_config(
        aug_params or {}, "augment_config_for"
    )
    return AugmentConfig(
        out_h=preset.image_size.h,
        out_w=preset.image_size.w,
        sampler_trials=aug_params.get("sampler_trials", 50),
        expand_prob=aug_params.get("expand_probability", 0.5),
    )
