"""Multibox loss with hard negative mining.

A fixed-shape transcription of the reference's loss graph
(ssdvgg.py:375-599) — it was already static-shape tensor algebra, which
is exactly what XLA wants:

* confidence: softmax CE per anchor; positives summed; hard negative
  mining keeps the ``min(num_neg, 3*num_pos)`` highest-CE negatives per
  sample via a full descending sort + range mask (ssdvgg.py:459-501);
  normalized by positives, zeroed for positive-free samples, batch-mean.
* localization: smooth-L1 on positive anchors only, same normalization.
* l2: 0.5 * sum(w^2) over every conv filter (not biases, not the
  l2-norm scale), times weight_decay (ssdvgg.py:51,64,565-580).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(x):
    """Elementwise smooth-L1 (reference: ssdvgg.py:68-71)."""
    absx = jnp.abs(x)
    return jnp.where(absx < 1.0, 0.5 * x * x, absx - 0.5)


def multibox_loss(logits, locs, labels, num_classes: int):
    """Compute confidence + localization losses.

    Args:
      logits: ``(B, A, K+1)`` float32 class logits.
      locs:   ``(B, A, 4)`` float32 predicted offsets.
      labels: ``(B, A, K+5)`` target tensor from
        :func:`ssd_tensorflow_tpu.ops.matching.encode_targets`.
      num_classes: K.

    Returns:
      dict with float32 scalars ``confidence`` and ``localization``.
    """
    gt_cl = labels[:, :, : num_classes + 1]
    gt_loc = labels[:, :, num_classes + 1 :]
    batch = gt_cl.shape[0]
    num_anchors = gt_cl.shape[1]

    # match counters (ssdvgg.py:400-419)
    negatives_num = jnp.sum(gt_cl[:, :, -1] != 0, axis=1)
    positives_num = num_anchors - negatives_num
    has_pos = positives_num > 0
    positives_num_safe = jnp.where(
        has_pos, positives_num.astype(jnp.float32), 1e-14
    )

    positives_mask = gt_cl[:, :, -1] == 0  # (B, A)

    # confidence loss (ssdvgg.py:436-521)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(gt_cl * logp, axis=-1)  # (B, A), non-negative

    positives_sum = jnp.sum(jnp.where(positives_mask, ce, 0.0), axis=-1)

    negatives = jnp.where(positives_mask, 0.0, ce)
    # full descending sort == top_k(num_anchors) (ssdvgg.py:463)
    negatives_top = -jnp.sort(-negatives, axis=-1)
    negatives_num_max = jnp.minimum(negatives_num, 3 * positives_num)
    rng = jnp.arange(num_anchors)[None, :]
    negatives_max = jnp.where(
        rng < negatives_num_max[:, None], negatives_top, 0.0
    )
    negatives_max_sum = jnp.sum(negatives_max, axis=-1)

    confidence_loss = positives_sum + negatives_max_sum
    confidence_loss = jnp.where(
        has_pos, confidence_loss / positives_num_safe, 0.0
    )
    confidence_loss = jnp.mean(confidence_loss)

    # localization loss (ssdvgg.py:526-560)
    loc_loss = jnp.sum(smooth_l1(locs - gt_loc), axis=-1)  # (B, A)
    loc_sum = jnp.sum(jnp.where(positives_mask, loc_loss, 0.0), axis=-1)
    localization_loss = jnp.where(has_pos, loc_sum / positives_num_safe, 0.0)
    localization_loss = jnp.mean(localization_loss)

    return {
        "confidence": confidence_loss,
        "localization": localization_loss,
    }


def l2_regularizer(params):
    """0.5 * sum of squares of every conv filter in the pytree.

    Matches tf.nn.l2_loss accumulated over all filters
    (ssdvgg.py:51,64,202-207,220-228,264,292).
    """
    total = 0.0
    for name, leaf in params.items():
        if isinstance(leaf, dict) and "w" in leaf:
            w = leaf["w"].astype(jnp.float32)
            total = total + 0.5 * jnp.sum(w * w)
    return total


def total_loss(logits, locs, labels, params, num_classes: int, weight_decay: float):
    """conf + loc + weight_decay * l2 (ssdvgg.py:565-580)."""
    losses = multibox_loss(logits, locs, labels, num_classes)
    l2 = weight_decay * l2_regularizer(params)
    losses["l2"] = l2
    losses["total"] = losses["confidence"] + losses["localization"] + l2
    return losses
