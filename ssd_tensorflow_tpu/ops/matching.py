"""Anchor matching and ground-truth target encoding — as tensor ops.

The reference assigns anchors to ground-truth boxes per image, in Python,
inside data-loader worker processes (transforms.py:57-114 with
process_overlap at :47-54). The algorithm, restated precisely:

1. For every gt box, compute protocol IoU against every anchor
   (integerized 1000-canvas, +1-pixel areas — ssdutils.py:138-152).
2. **Pass 1** — threshold matches: iterating boxes in order, every anchor
   with IoU > 0.5 is assigned to that box; an anchor already assigned is
   only re-assigned when the new IoU is *strictly* greater
   (process_overlap's ``matches[idx] >= score -> return``). Net effect
   per anchor: the gt with maximal IoU among those > 0.5, earliest gt on
   ties.
3. **Pass 2** — best-anchor forcing with a *fresh* conflict dict: each gt
   whose global-best anchor has IoU > 0.5 claims that anchor,
   overwriting pass 1; among gts claiming the same anchor the higher IoU
   wins, earliest gt on ties. (Note: the reference only forces when the
   best IoU itself exceeds 0.5 — gts with max IoU <= 0.5 match nothing.)

Here both passes are deterministic argmax/mask algebra over the full
``(G, A)`` IoU matrix — no data-dependent control flow, so the whole
encoder jits and vmaps over the batch and runs on-device inside the
train step (fixed shapes: gt padded to G_max).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.ops.codec import encode_locations
from ssd_tensorflow_tpu.ops.iou import canvas_iou

#: Matching threshold (reference: transforms.py:88 — compute_overlap(.., 0.5)).
MATCH_THRESHOLD = 0.5


def match_anchors(iou, gt_mask, threshold: float = MATCH_THRESHOLD):
    """Resolve the two-pass assignment given an IoU matrix.

    Args:
      iou:     ``(G, A)`` protocol IoU of (padded) gt boxes vs anchors.
      gt_mask: ``(G,)`` bool, True for real (non-padding) gt rows.
      threshold: matching threshold (strictly-greater comparison).

    Returns:
      ``(anchor_gt, positive)``:
        anchor_gt: ``(A,)`` int32 index of the assigned gt per anchor
                   (arbitrary where not positive);
        positive:  ``(A,)`` bool, True where the anchor is matched.
    """
    neg = jnp.full_like(iou, -1.0)
    iou = jnp.where(gt_mask[:, None], iou, neg)

    # Pass 1: per-anchor argmax over gts, thresholded. jnp.argmax returns
    # the first maximal index = earliest gt, matching the reference's
    # strictly-greater replacement rule.
    best_gt = jnp.argmax(iou, axis=0)  # (A,)
    best_gt_iou = jnp.max(iou, axis=0)  # (A,)
    pass1 = best_gt_iou > threshold

    # Pass 2: each valid gt claims its single global-best anchor
    # (earliest anchor on ties, like np.argmax in compute_overlap).
    best_anchor = jnp.argmax(iou, axis=1)  # (G,)
    best_anchor_iou = jnp.max(iou, axis=1)  # (G,)
    claim_valid = (best_anchor_iou > threshold) & gt_mask  # (G,)

    # claims[g, a] = gt g claims anchor a. Resolve multi-claims by IoU,
    # earliest gt on ties (argmax over g).
    a_ids = jnp.arange(iou.shape[1], dtype=jnp.int32)[None, :]
    claims = (best_anchor[:, None] == a_ids) & claim_valid[:, None]  # (G, A)
    claimed_iou = jnp.where(claims, iou, -1.0)
    pass2_gt = jnp.argmax(claimed_iou, axis=0)  # (A,)
    pass2 = jnp.max(claimed_iou, axis=0) > 0.0  # any claim (claims imply iou>thr)

    # Pass 2 runs with a fresh conflict dict and therefore overwrites
    # pass-1 assignments on contested anchors (transforms.py:100-112).
    anchor_gt = jnp.where(pass2, pass2_gt, best_gt).astype(jnp.int32)
    positive = pass1 | pass2
    return anchor_gt, positive


def encode_targets(
    gt_boxes,
    gt_labels,
    gt_mask,
    anchors,
    num_classes: int,
    threshold: float = MATCH_THRESHOLD,
):
    """Build the ``(A, K+5)`` training target tensor for one image.

    Layout matches the reference's label vector (transforms.py:79-114):
    ``[:K]`` foreground one-hot, ``[K]`` background bit, ``[K+1:]`` the
    four encoded location offsets (zero for background anchors).

    Args:
      gt_boxes:  ``(G, 4)`` center-form gt boxes (padded rows arbitrary).
      gt_labels: ``(G,)`` int class ids in [0, K).
      gt_mask:   ``(G,)`` bool validity of each gt row.
      anchors:   ``(A, 4)`` center-form anchors.
      num_classes: K, number of foreground classes.

    Returns:
      ``(A, K+5)`` float32 target tensor.
    """
    iou = canvas_iou(gt_boxes, anchors)  # (G, A)
    anchor_gt, positive = match_anchors(iou, gt_mask, threshold)

    cls = jnp.where(positive, gt_labels[anchor_gt], num_classes)
    onehot = jax.nn.one_hot(cls, num_classes + 1, dtype=jnp.float32)

    matched = gt_boxes[anchor_gt]  # (A, 4)
    # Padded/background lanes would hit log(0) in the codec; substitute
    # the anchor itself (encodes to exact zeros) before masking.
    safe = jnp.where(positive[:, None], matched, anchors)
    loc = encode_locations(safe, anchors)
    loc = jnp.where(positive[:, None], loc, 0.0).astype(jnp.float32)

    return jnp.concatenate([onehot, loc], axis=-1)


def encode_targets_batch(
    gt_boxes, gt_labels, gt_mask, anchors, num_classes: int
):
    """vmapped :func:`encode_targets` over a leading batch dim.

    Args:
      gt_boxes:  ``(B, G, 4)``; gt_labels: ``(B, G)``; gt_mask: ``(B, G)``.
      anchors:   ``(A, 4)`` shared across the batch.

    Returns:
      ``(B, A, K+5)`` target tensor.
    """
    return jax.vmap(
        lambda b, l, m: encode_targets(b, l, m, anchors, num_classes)
    )(gt_boxes, gt_labels, gt_mask)


def has_positive_anchor(gt_boxes_np, gt_mask_np, anchors_np,
                        threshold=MATCH_THRESHOLD, *,
                        anchor_corners_np=None):
    """Host-side check used by the data pipeline's resampling rule.

    The reference re-runs the augmentation chain up to 50x until the
    encoded label contains at least one positive anchor
    (training_data.py:92-98). A positive exists iff any (gt, anchor)
    protocol IoU exceeds the threshold, so the check reduces to one
    numpy max — no full assignment needed.

    ``anchor_corners_np``: optional precomputed
    ``iou_np.canvas_corners_np(anchors)`` — the pipeline's per-sample
    hot path passes it to avoid re-integerizing thousands of anchors on
    every resample (``anchors_np`` is ignored when given).
    """
    import numpy as np

    from ssd_tensorflow_tpu.ops.iou_np import (
        canvas_corners_np,
        pairwise_canvas_iou_np,
    )

    if gt_mask_np is not None:
        gt_boxes_np = gt_boxes_np[gt_mask_np]
    gt_boxes_np = np.asarray(gt_boxes_np)
    if gt_boxes_np.shape[0] == 0:
        return False
    if anchor_corners_np is None:
        anchor_corners_np = canvas_corners_np(np.asarray(anchors_np))
    iou = pairwise_canvas_iou_np(
        canvas_corners_np(gt_boxes_np), anchor_corners_np
    )
    return bool(iou.max() > threshold)
