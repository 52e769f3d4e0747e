"""Sequential from-spec implementations used as test oracles.

These re-state the reference algorithms (anchor matching, greedy NMS,
prediction decode) as slow, obviously-correct Python so the vectorized
device programs can be checked against them. They are written from the
behavioral spec in SURVEY.md §2 — not copied from the reference.
"""

from __future__ import annotations

import numpy as np

from ssd_tensorflow_tpu.ops.iou_np import canvas_corners_np, pairwise_canvas_iou_np

THRESHOLD = 0.5


def match_anchors_sequential(iou, gt_mask, threshold=THRESHOLD):
    """Two-pass assignment, literal restatement of the reference flow.

    Pass 1: iterate gts in order; every anchor with IoU > threshold is
    assigned, re-assignment only on strictly greater IoU. Pass 2: fresh
    conflict dict; each gt whose global-best anchor exceeds the
    threshold claims it (strictly-greater replacement again), always
    overwriting pass-1 values. (transforms.py:47-54,100-112,
    ssdutils.py:155-170)
    """
    num_gt, num_anchors = iou.shape
    assign = -np.ones(num_anchors, dtype=np.int64)

    matches = {}
    for g in range(num_gt):
        if not gt_mask[g]:
            continue
        for a in np.nonzero(iou[g] > threshold)[0]:
            if a in matches and matches[a] >= iou[g, a]:
                continue
            matches[a] = iou[g, a]
            assign[a] = g

    matches = {}
    for g in range(num_gt):
        if not gt_mask[g]:
            continue
        a = int(np.argmax(iou[g]))
        if iou[g, a] <= threshold:
            continue
        if a in matches and matches[a] >= iou[g, a]:
            continue
        matches[a] = iou[g, a]
        assign[a] = g

    positive = assign >= 0
    return assign, positive


def nms_sequential(corners, scores, valid, threshold):
    """Greedy NMS oracle: repeatedly keep the most confident remaining
    candidate, discard everything overlapping it above the threshold
    (+1-pixel IoU). Candidates are given in descending-score order;
    `valid` excludes below-confidence rows."""
    order = [i for i in range(len(scores)) if valid[i]]
    keep = np.zeros(len(scores), dtype=bool)
    alive = set(order)
    for i in order:
        if i not in alive:
            continue
        keep[i] = True
        alive.discard(i)
        ious = pairwise_canvas_iou_np(corners[i : i + 1], corners)[0]
        for j in list(alive):
            if ious[j] > threshold:
                alive.discard(j)
    return keep


def encode_location_scalar(box, anchor):
    """(tx, ty, tw, th) for one box/anchor pair (ssdutils.py:173-179)."""
    return np.array(
        [
            (box[0] - anchor[0]) / anchor[2] * 10.0,
            (box[1] - anchor[1]) / anchor[3] * 10.0,
            np.log(box[2] / anchor[2]) * 5.0,
            np.log(box[3] / anchor[3]) * 5.0,
        ]
    )


def random_boxes(rng, n, tight=False):
    """Random proportional center-form boxes with plausible extents."""
    if tight:
        w = rng.uniform(0.05, 0.5, size=n)
        h = rng.uniform(0.05, 0.5, size=n)
    else:
        w = rng.uniform(0.02, 0.9, size=n)
        h = rng.uniform(0.02, 0.9, size=n)
    cx = rng.uniform(w / 2, 1 - w / 2)
    cy = rng.uniform(h / 2, 1 - h / 2)
    return np.stack([cx, cy, w, h], axis=-1)
