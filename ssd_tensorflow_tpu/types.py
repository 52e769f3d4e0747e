"""Host-side geometry datatypes.

API-parity with the reference's namedtuples (reference: utils.py:64-70).
These types only live on the host — on device every box is a row of an
``(N, 4)`` float array in proportional center form ``(cx, cy, w, h)``.
"""

from __future__ import annotations

import math
from collections import namedtuple

Label = namedtuple("Label", ["name", "color"])
Size = namedtuple("Size", ["w", "h"])
Point = namedtuple("Point", ["x", "y"])
Sample = namedtuple("Sample", ["filename", "boxes", "imgsize"])
Box = namedtuple("Box", ["label", "labelid", "center", "size"])
Score = namedtuple("Score", ["idx", "score"])
Overlap = namedtuple("Overlap", ["best", "good"])

#: The virtual canvas all protocol-sensitive IoU math is computed on
#: (reference: utils.py:122, average_precision.py:27). The reference
#: integerizes proportional boxes onto a 1000x1000 grid and uses the
#: +1-pixel area convention; we keep the convention bit-for-bit so that
#: anchor matching and mAP numbers are comparable.
CANVAS = Size(1000, 1000)


def abs2prop(xmin, xmax, ymin, ymax, imgsize):
    """Absolute min/max corner bounds -> proportional center/size.

    Reference: utils.py:85-97.
    """
    width = float(xmax - xmin)
    height = float(ymax - ymin)
    cx = float(xmin) + width / 2
    cy = float(ymin) + height / 2
    return (
        Point(cx / imgsize.w, cy / imgsize.h),
        Size(width / imgsize.w, height / imgsize.h),
    )


def prop2abs(center, size, imgsize):
    """Proportional center/size -> absolute integer min/max corner bounds.

    Truncates toward zero, exactly like the reference (utils.py:100-108).
    """
    w2 = size.w * imgsize.w / 2
    h2 = size.h * imgsize.h / 2
    cx = center.x * imgsize.w
    cy = center.y * imgsize.h
    return int(cx - w2), int(cx + w2), int(cy - h2), int(cy + h2)


def box_is_valid(box):
    """A box is valid when none of its parameters are NaN/Inf.

    Reference: utils.py:111-115.
    """
    for x in (box.center.x, box.center.y, box.size.w, box.size.h):
        if math.isnan(x) or math.isinf(x):
            return False
    return True


def normalize_box(box):
    """Clamp a box against the virtual 1000x1000 canvas.

    Reference: utils.py:118-135 (including the min(xmin, xmax) guard for
    degenerate early-training boxes).
    """
    if not box_is_valid(box):
        return box
    xmin, xmax, ymin, ymax = prop2abs(box.center, box.size, CANVAS)
    xmin = max(xmin, 0)
    xmax = min(xmax, CANVAS.w - 1)
    ymin = max(ymin, 0)
    ymax = min(ymax, CANVAS.h - 1)
    xmin = min(xmin, xmax)
    ymin = min(ymin, ymax)
    center, size = abs2prop(xmin, xmax, ymin, ymax, CANVAS)
    return Box(box.label, box.labelid, center, size)


def rgb2bgr(tpl):
    """RGB color tuple -> BGR (reference: utils.py:57-61)."""
    return (tpl[2], tpl[1], tpl[0])


def str2bool(v):
    """Parse a boolean CLI flag (reference: utils.py:73-82)."""
    import argparse

    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
