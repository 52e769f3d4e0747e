"""Pure, fixed-shape detection math — the TPU-native core.

Everything in this package is a jit-able function over arrays with static
shapes. Boxes are ``(..., 4)`` float arrays in proportional center form
``(cx, cy, w, h)``; protocol-sensitive IoU runs on the integerized
1000x1000 canvas with the reference's +1-pixel convention.
"""

from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.boxes import (
    CANVAS_SIZE,
    box_canvas_corners,
    clamp_boxes,
    corners_to_cxcywh,
    cxcywh_to_corners,
)
from ssd_tensorflow_tpu.ops.codec import decode_locations, encode_locations
from ssd_tensorflow_tpu.ops.iou import canvas_iou, pairwise_canvas_iou, pairwise_iou
from ssd_tensorflow_tpu.ops.matching import encode_targets, match_anchors
from ssd_tensorflow_tpu.ops.postprocess import (
    DetectionConfig,
    decode_detections,
    detect,
)

__all__ = [
    "anchors_for_preset",
    "CANVAS_SIZE",
    "box_canvas_corners",
    "clamp_boxes",
    "corners_to_cxcywh",
    "cxcywh_to_corners",
    "decode_locations",
    "encode_locations",
    "canvas_iou",
    "pairwise_canvas_iou",
    "pairwise_iou",
    "encode_targets",
    "match_anchors",
    "DetectionConfig",
    "decode_detections",
    "detect",
]
