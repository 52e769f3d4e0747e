"""On-device non-maximum suppression with static shapes.

The reference NMS is greedy per-class numpy on the host, IoU 0.45 on
1000-canvas absolute coordinates with the +1-pixel convention
(ssdutils.py:232-318). Here the same greedy pick-set is produced by a
fixed-iteration masked program over a precomputed pairwise-IoU matrix of
the top-K candidates, so the entire decode+NMS path fuses into the
jitted inference function.

Class separation uses the standard coordinate-offset trick: shifting
each candidate's canvas corners by ``class_id * OFFSET`` guarantees zero
cross-class overlap, making one suppression pass equivalent to the
reference's per-class loops (suppress_overlaps, ssdutils.py:310-318).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: IoU threshold used by the reference (ssdutils.py:317).
NMS_THRESHOLD = 0.45

#: Per-class coordinate shift. Canvas corners live in [0, 1000]; any
#: shift > 1001 guarantees zero overlap under the +1-pixel convention.
_CLASS_OFFSET = 4096.0


def greedy_keep(iou, order_valid, threshold: float):
    """Greedy NMS keep-mask given candidates sorted by descending score.

    Args:
      iou:         ``(D, D)`` pairwise IoU of the candidates.
      order_valid: ``(D,)`` bool — candidates eligible for selection.
      threshold:   suppress j if IoU(i, j) > threshold for a kept i < j.

    Returns:
      ``(D,)`` bool keep mask (subset of ``order_valid``).
    """
    iou = jnp.asarray(iou)
    order_valid = jnp.asarray(order_valid)
    d = iou.shape[0]
    idx = jnp.arange(d)

    def body(i, suppressed):
        keep_i = jnp.logical_not(suppressed[i]) & order_valid[i]
        newly = keep_i & (iou[i] > threshold) & (idx > i)
        return suppressed | newly

    suppressed = jax.lax.fori_loop(0, d, body, jnp.zeros((d,), dtype=bool))
    return jnp.logical_not(suppressed) & order_valid


def class_aware_keep(corners, classes, order_valid, threshold: float = NMS_THRESHOLD):
    """Per-class greedy NMS over sorted candidates via coordinate offsets.

    Args:
      corners:     ``(D, 4)`` canvas corners (xmin, xmax, ymin, ymax).
      classes:     ``(D,)`` int class ids.
      order_valid: ``(D,)`` bool candidate mask.

    Returns:
      ``(D,)`` bool keep mask.
    """
    shift = classes.astype(corners.dtype) * _CLASS_OFFSET
    shifted = corners + shift[:, None]
    # +1-pixel-convention IoU among the (shifted) candidates, mirroring
    # non_maximum_suppression (ssdutils.py:261-296).
    from ssd_tensorflow_tpu.ops.iou import pairwise_canvas_iou

    iou = pairwise_canvas_iou(shifted, shifted)
    return greedy_keep(iou, order_valid, threshold)
