"""Numpy (host) versions of the protocol IoU — float64, exact.

The data pipeline runs on the host (crop-sampler rejection loops and the
>=1-positive resampling rule are data-dependent and stay off-device, see
reference transforms.py:302-361 / training_data.py:92-98). These helpers
reproduce the reference's float64 math bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ssd_tensorflow_tpu.types import CANVAS

#: single source of truth: the square protocol canvas (types.CANVAS,
#: reference utils.py:122)
CANVAS_SIZE = CANVAS.w


def canvas_corners_np(boxes, canvas: int = CANVAS_SIZE):
    """Center-form ``(N, 4)`` boxes -> integerized canvas corners.

    Truncation toward zero like Python's int() (utils.py:100-108).
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    cx = boxes[..., 0] * canvas
    cy = boxes[..., 1] * canvas
    w2 = boxes[..., 2] * canvas / 2.0
    h2 = boxes[..., 3] * canvas / 2.0
    corners = np.stack([cx - w2, cx + w2, cy - h2, cy + h2], axis=-1)
    return np.trunc(corners)


def pairwise_canvas_iou_np(a, b):
    """+1-pixel-convention IoU of canvas corners ``(N,4)`` x ``(M,4)``.

    Reference: ssdutils.py:138-152.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    area_a = (a[:, 1] - a[:, 0] + 1) * (a[:, 3] - a[:, 2] + 1)
    area_b = (b[:, 1] - b[:, 0] + 1) * (b[:, 3] - b[:, 2] + 1)
    iw = np.maximum(
        0.0,
        np.minimum(a[:, None, 1], b[None, :, 1])
        - np.maximum(a[:, None, 0], b[None, :, 0])
        + 1,
    )
    ih = np.maximum(
        0.0,
        np.minimum(a[:, None, 3], b[None, :, 3])
        - np.maximum(a[:, None, 2], b[None, :, 2])
        + 1,
    )
    inter = iw * ih
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def canvas_iou_np(boxes_a, boxes_b):
    """Protocol IoU of center-form boxes ``(N,4)`` x ``(M,4)`` on the host."""
    return pairwise_canvas_iou_np(
        canvas_corners_np(boxes_a), canvas_corners_np(boxes_b)
    )
