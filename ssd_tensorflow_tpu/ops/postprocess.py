"""Fused prediction decoding: softmax scores -> final detections.

Replaces the reference's per-image host loop decode_boxes +
suppress_overlaps (ssdutils.py:192-318) with one fixed-shape device
program: per-anchor class argmax -> top-K by confidence -> box decode ->
canvas clamp -> class-aware greedy NMS. The whole thing jits, vmaps over
the batch, and fuses into the inference step — no host round-trip per
image.

Semantics parity notes:
  * the reference pre-NMS cap is ``detections_cap=200`` sorted by
    confidence (ssdutils.py:207-210) — here ``top_k``;
  * confidence is the max over *foreground* classes; background never
    produces a detection (ssdutils.py:203-206);
  * the threshold keeps ``conf >= threshold`` (the reference breaks on
    ``conf < threshold``, ssdutils.py:218-219);
  * decoded boxes are clamped against the virtual canvas exactly like
    normalize_box (ssdutils.py:226, utils.py:118-135).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners, clamp_boxes
from ssd_tensorflow_tpu.ops.codec import decode_locations
from ssd_tensorflow_tpu.ops.nms import NMS_THRESHOLD, class_aware_keep


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """Static knobs of the decode+NMS program."""

    #: pre-NMS candidate cap (reference detections_cap, ssdutils.py:193).
    top_k: int = 200
    #: minimum class confidence (train loop uses 0.5, train.py:276;
    #: infer default 0.5, infer.py:77).
    confidence_threshold: float = 0.5
    #: NMS IoU threshold (ssdutils.py:317).
    nms_threshold: float = NMS_THRESHOLD
    #: post-NMS cap on emitted detections (infer.py:235).
    max_detections: int = 200
    #: run NMS as the fused Pallas kernel (ops/nms_pallas.py) instead of
    #: the XLA loop. Identical pick sets; both are latency-bound in the
    #: greedy loop, so throughput is at parity — the kernel keeps all
    #: intermediates in VMEM. Any top_k works: the kernel lane-pads
    #: non-multiples of 128 internally with invalid candidates.
    use_pallas_nms: bool = False


@dataclasses.dataclass
class Detections:
    """Fixed-size per-image detection tensors (batch-leading)."""

    boxes: jax.Array  # (B, D, 4) center-form, canvas-clamped
    scores: jax.Array  # (B, D) descending
    classes: jax.Array  # (B, D) int32 foreground class ids
    valid: jax.Array  # (B, D) bool


jax.tree_util.register_dataclass(
    Detections, data_fields=["boxes", "scores", "classes", "valid"], meta_fields=[]
)


def _candidates_single(probs, locs, anchors, cfg: DetectionConfig):
    """Top-K candidate prep for one image (pre-NMS)."""
    num_fg = probs.shape[-1] - 1
    fg = probs[:, :num_fg]
    cls = jnp.argmax(fg, axis=-1)  # (A,)
    conf = jnp.max(fg, axis=-1)  # (A,)
    return _candidates_from_scores(conf, cls, locs, anchors, cfg)


def _candidates_from_scores(conf, cls, locs, anchors, cfg: DetectionConfig):
    """Top-K candidate prep from per-anchor ``(conf, cls)`` scores.

    ``top_k`` is clamped to the anchor count so tiny presets (fewer
    anchors than the default 200-candidate cap, e.g. mntest64's 116)
    run unchanged.
    """
    conf_top, idx = jax.lax.top_k(conf, min(cfg.top_k, conf.shape[-1]))
    cls_top = cls[idx].astype(jnp.int32)
    boxes = decode_locations(locs[idx].astype(jnp.float32), anchors[idx])
    boxes = clamp_boxes(boxes)
    valid = conf_top >= cfg.confidence_threshold
    return boxes, conf_top, cls_top, valid


def _finalize_single(boxes, conf_top, cls_top, keep, cfg: DetectionConfig):
    """Compact kept rows to the front and trim to max_detections."""
    n_cand = boxes.shape[0]  # min(cfg.top_k, num_anchors)
    if cfg.max_detections < n_cand:
        # Compact kept detections to the front (they are already sorted
        # by confidence) and trim to max_detections.
        rank = jnp.cumsum(keep) - 1
        d = cfg.max_detections
        dest = jnp.where(keep, rank, n_cand)  # parked rows -> out of range
        boxes_o = jnp.zeros((d, 4), boxes.dtype).at[dest].set(boxes, mode="drop")
        scores_o = jnp.zeros((d,), conf_top.dtype).at[dest].set(conf_top, mode="drop")
        cls_o = jnp.zeros((d,), jnp.int32).at[dest].set(cls_top, mode="drop")
        valid_o = jnp.zeros((d,), bool).at[dest].set(keep, mode="drop")
        return boxes_o, scores_o, cls_o, valid_o

    return boxes, conf_top, cls_top, keep


def _decode_single(probs, locs, anchors, cfg: DetectionConfig):
    """Decode one image: ``(A, K+1)`` probs + ``(A, 4)`` locs -> Detections row."""
    boxes, conf_top, cls_top, valid = _candidates_single(probs, locs, anchors, cfg)
    corners = box_canvas_corners(boxes)
    keep = class_aware_keep(corners, cls_top, valid, cfg.nms_threshold)
    return _finalize_single(boxes, conf_top, cls_top, keep, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def decode_detections(probs, locs, anchors, cfg: DetectionConfig = DetectionConfig()):
    """Batched fused decode+NMS.

    Args:
      probs:   ``(B, A, K+1)`` softmax class probabilities.
      locs:    ``(B, A, 4)`` predicted location offsets.
      anchors: ``(A, 4)`` center-form anchors.
      cfg:     static decode configuration.

    Returns:
      :class:`Detections` with ``D = min(top_k, max_detections)`` rows
      per image, confidence-sorted, ``valid`` marking real detections.
    """
    if cfg.use_pallas_nms:
        from ssd_tensorflow_tpu.ops.nms import _CLASS_OFFSET
        from ssd_tensorflow_tpu.ops.nms_pallas import nms_keep_pallas

        cand = jax.vmap(lambda p, l: _candidates_single(p, l, anchors, cfg))
        boxes, conf_top, cls_top, valid = cand(probs, locs)
        corners = box_canvas_corners(boxes)
        shifted = corners + (
            cls_top.astype(corners.dtype) * _CLASS_OFFSET
        )[..., None]
        interpret = jax.default_backend() != "tpu"
        keep = nms_keep_pallas(
            shifted, valid, cfg.nms_threshold, interpret=interpret
        )
        fin = jax.vmap(lambda b, s, c, k: _finalize_single(b, s, c, k, cfg))
        boxes, scores, classes, valid = fin(boxes, conf_top, cls_top, keep)
    else:
        f = jax.vmap(lambda p, l: _decode_single(p, l, anchors, cfg))
        boxes, scores, classes, valid = f(probs, locs)
    return Detections(boxes=boxes, scores=scores, classes=classes, valid=valid)


@partial(jax.jit, static_argnames=("cfg",))
def decode_scores(
    conf, cls, locs, anchors, cfg: DetectionConfig = DetectionConfig()
):
    """Batched fused decode+NMS from per-anchor scores.

    The throughput-path twin of :func:`decode_detections` for use with
    ``models.ssd_vgg.apply_scores`` — identical detections, but takes
    the already-reduced ``(B, A)`` confidence / ``(B, A)`` class tensors
    so the full softmax never materializes. Honors
    ``cfg.use_pallas_nms`` like :func:`decode_detections`.
    """
    cand = jax.vmap(
        lambda cf, cl, lc: _candidates_from_scores(cf, cl, lc, anchors, cfg)
    )
    boxes, conf_top, cls_top, valid = cand(conf, cls, locs)
    corners = box_canvas_corners(boxes)
    if cfg.use_pallas_nms:
        from ssd_tensorflow_tpu.ops.nms import _CLASS_OFFSET
        from ssd_tensorflow_tpu.ops.nms_pallas import nms_keep_pallas

        shifted = corners + (
            cls_top.astype(corners.dtype) * _CLASS_OFFSET
        )[..., None]
        interpret = jax.default_backend() != "tpu"
        keep = nms_keep_pallas(
            shifted, valid, cfg.nms_threshold, interpret=interpret
        )
    else:
        keep = jax.vmap(
            lambda co, cl, v: class_aware_keep(co, cl, v, cfg.nms_threshold)
        )(corners, cls_top, valid)
    fin = jax.vmap(lambda b, s, c, k: _finalize_single(b, s, c, k, cfg))
    boxes, scores, classes, valid = fin(boxes, conf_top, cls_top, keep)
    return Detections(boxes=boxes, scores=scores, classes=classes, valid=valid)


def detect(result, anchors, cfg: DetectionConfig = DetectionConfig()):
    """Decode the network's fused ``result`` tensor ``(B, A, K+5)``.

    ``result = concat(softmax(logits), locations)`` — the reference's
    single inference tensor (ssdvgg.py:364-372).
    """
    num_vars = result.shape[-1]
    probs = result[..., : num_vars - 4]
    locs = result[..., num_vars - 4 :]
    return decode_detections(probs, locs, anchors, cfg)


def detections_to_boxes(dets: Detections, lid2name=None):
    """Convert device Detections to host lists of ``(conf, Box)`` tuples.

    Mirrors the return shape of the reference decode_boxes
    (ssdutils.py:192-229) for the CLI/eval layers.
    """
    import numpy as np

    from ssd_tensorflow_tpu.types import Box, Point, Size

    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)

    out = []
    for b in range(boxes.shape[0]):
        rows = []
        for i in np.nonzero(valid[b])[0]:
            cid = int(classes[b, i])
            cname = lid2name.get(cid) if lid2name else None
            rows.append(
                (
                    float(scores[b, i]),
                    Box(
                        cname,
                        cid,
                        Point(float(boxes[b, i, 0]), float(boxes[b, i, 1])),
                        Size(float(boxes[b, i, 2]), float(boxes[b, i, 3])),
                    ),
                )
            )
        out.append(rows)
    return out
