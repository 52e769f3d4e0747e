"""Vectorized box-coordinate operations.

The reference does coordinate conversion one namedtuple at a time
(utils.py:85-135); here every conversion is a batched array op so it can
live inside a jitted program. Two coordinate systems appear:

* **proportional center form** ``(cx, cy, w, h)``, floats, nominally in
  [0, 1] — the canonical on-device representation;
* **canvas corners** ``(xmin, xmax, ymin, ymax)``, the reference's
  integerized 1000x1000 virtual canvas used for all protocol-sensitive
  IoU math (utils.py:100-108 truncates toward zero; jaccard_overlap uses
  +1-pixel areas, ssdutils.py:138-152).
"""

from __future__ import annotations

import jax.numpy as jnp

from ssd_tensorflow_tpu.types import CANVAS

#: Virtual canvas edge length (reference: utils.py:122) — single source
#: of truth: the square protocol canvas types.CANVAS.
CANVAS_SIZE = CANVAS.w


def cxcywh_to_corners(boxes, img_w: float = 1.0, img_h: float = 1.0):
    """``(..., 4)`` center-form boxes -> float corners (xmin, xmax, ymin, ymax).

    No integerization; use :func:`box_canvas_corners` for the reference's
    truncated-integer canvas convention.
    """
    cx = boxes[..., 0] * img_w
    cy = boxes[..., 1] * img_h
    w2 = boxes[..., 2] * img_w * 0.5
    h2 = boxes[..., 3] * img_h * 0.5
    return jnp.stack([cx - w2, cx + w2, cy - h2, cy + h2], axis=-1)


def corners_to_cxcywh(corners, img_w: float = 1.0, img_h: float = 1.0):
    """Float corners ``(xmin, xmax, ymin, ymax)`` -> proportional center form.

    Mirrors abs2prop (reference: utils.py:85-97).
    """
    xmin, xmax = corners[..., 0], corners[..., 1]
    ymin, ymax = corners[..., 2], corners[..., 3]
    w = (xmax - xmin) / img_w
    h = (ymax - ymin) / img_h
    cx = (xmin + (xmax - xmin) * 0.5) / img_w
    cy = (ymin + (ymax - ymin) * 0.5) / img_h
    return jnp.stack([cx, cy, w, h], axis=-1)


def box_canvas_corners(boxes, canvas: int = CANVAS_SIZE):
    """Proportional center-form boxes -> integerized canvas corners.

    Replicates prop2abs exactly (reference: utils.py:100-108): compute in
    float, then truncate toward zero (Python ``int()`` semantics), and
    return as float for downstream arithmetic.
    """
    corners = cxcywh_to_corners(boxes, canvas, canvas)
    return jnp.trunc(corners)


def clamp_boxes(boxes, canvas: int = CANVAS_SIZE):
    """Vectorized normalize_box (reference: utils.py:118-135).

    Integerize onto the canvas, clamp to its bounds (with the degenerate
    ``min(xmin, xmax)`` guard for early-training boxes), and convert back
    to proportional center form.
    """
    c = box_canvas_corners(boxes, canvas)
    xmin = jnp.maximum(c[..., 0], 0.0)
    xmax = jnp.minimum(c[..., 1], canvas - 1.0)
    ymin = jnp.maximum(c[..., 2], 0.0)
    ymax = jnp.minimum(c[..., 3], canvas - 1.0)
    xmin = jnp.minimum(xmin, xmax)
    ymin = jnp.minimum(ymin, ymax)
    out = corners_to_cxcywh(
        jnp.stack([xmin, xmax, ymin, ymax], axis=-1), canvas, canvas
    )
    # normalize_box passes NaN/Inf boxes through untouched
    # (utils.py:111-120); keep that behavior element-wise.
    finite = jnp.all(jnp.isfinite(boxes), axis=-1, keepdims=True)
    return jnp.where(finite, out, boxes)
