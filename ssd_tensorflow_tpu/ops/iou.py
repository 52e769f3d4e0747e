"""Jaccard-overlap (IoU) kernels.

Two flavors:

* :func:`pairwise_iou` — standard continuous IoU on float corner boxes.
* :func:`canvas_iou` / :func:`pairwise_canvas_iou` — the reference's
  protocol IoU: boxes integerized onto the 1000x1000 canvas, areas and
  intersections computed with the +1-pixel convention
  (reference: ssdutils.py:138-152). Anchor matching and VOC AP both use
  this convention, so parity of match sets and mAP depends on it.

All functions broadcast over leading batch dimensions and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners


def _corner_iou(a, b, plus_one: float):
    """IoU of corner boxes ``a (..., N, 4)`` vs ``b (..., M, 4)`` -> (..., N, M).

    Corner layout is (xmin, xmax, ymin, ymax) as everywhere in this
    codebase (matching the reference's array layout, ssdutils.py:129).
    """
    ax_min, ax_max = a[..., :, None, 0], a[..., :, None, 1]
    ay_min, ay_max = a[..., :, None, 2], a[..., :, None, 3]
    bx_min, bx_max = b[..., None, :, 0], b[..., None, :, 1]
    by_min, by_max = b[..., None, :, 2], b[..., None, :, 3]

    area_a = (ax_max - ax_min + plus_one) * (ay_max - ay_min + plus_one)
    area_b = (bx_max - bx_min + plus_one) * (by_max - by_min + plus_one)

    iw = jnp.maximum(
        0.0, jnp.minimum(ax_max, bx_max) - jnp.maximum(ax_min, bx_min) + plus_one
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(ay_max, by_max) - jnp.maximum(ay_min, by_min) + plus_one
    )
    inter = iw * ih
    return inter / (area_a + area_b - inter)


def pairwise_iou(corners_a, corners_b):
    """Continuous IoU on float corner boxes, no pixel convention."""
    return _corner_iou(corners_a, corners_b, plus_one=0.0)


def pairwise_canvas_iou(corners_a, corners_b):
    """IoU on (already integerized) canvas corners with +1-pixel areas.

    Reference: ssdutils.py:138-152.
    """
    return _corner_iou(corners_a, corners_b, plus_one=1.0)


def canvas_iou(boxes_a, boxes_b):
    """Protocol IoU of proportional center-form boxes.

    Integerizes both operands onto the 1000x1000 canvas (truncation
    toward zero, utils.py:100-108) and applies the +1-pixel convention —
    the exact overlap measure used for anchor matching
    (transforms.py:86-88) and AP (average_precision.py:148).

    Args:
      boxes_a: ``(..., N, 4)`` center-form boxes.
      boxes_b: ``(..., M, 4)`` center-form boxes.

    Returns:
      ``(..., N, M)`` IoU matrix.
    """
    return pairwise_canvas_iou(
        box_canvas_corners(boxes_a), box_canvas_corners(boxes_b)
    )
