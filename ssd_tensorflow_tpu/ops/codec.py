"""SSD box codec: ground-truth boxes <-> anchor-relative offsets.

Encode (reference: ssdutils.py:173-179)::

    tx = (cx - acx) / aw * 10        ty = (cy - acy) / ah * 10
    tw = log(w / aw) * 5             th = log(h / ah) * 5

i.e. the canonical SSD prior variances 0.1 (center) and 0.2 (size) baked
in as x10 / x5 multipliers. Decode is the inverse with the reference's
``offset > 100 -> 100`` clamp that guards against exploding exp() early
in training (ssdutils.py:182-189).

Both functions broadcast over any leading dims and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Decode clamp — "only happens early training" (ssdutils.py:183).
DECODE_CLAMP = 100.0


def encode_locations(boxes, anchors):
    """Center-form gt boxes -> anchor-relative offsets.

    Args:
      boxes:   ``(..., 4)`` (cx, cy, w, h), proportional coords.
      anchors: ``(..., 4)`` broadcast-compatible anchors.

    Returns:
      ``(..., 4)`` offsets (tx, ty, tw, th).
    """
    acx, acy, aw, ah = (anchors[..., i] for i in range(4))
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    tx = (cx - acx) / aw * 10.0
    ty = (cy - acy) / ah * 10.0
    tw = jnp.log(w / aw) * 5.0
    th = jnp.log(h / ah) * 5.0
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_locations(offsets, anchors):
    """Anchor-relative offsets -> center-form boxes (inverse of encode).

    Applies the reference's early-training stability clamp
    (ssdutils.py:183) before decoding.
    """
    offsets = jnp.minimum(offsets, DECODE_CLAMP)
    acx, acy, aw, ah = (anchors[..., i] for i in range(4))
    tx, ty, tw, th = (offsets[..., i] for i in range(4))
    cx = tx / 10.0 * aw + acx
    cy = ty / 10.0 * ah + acy
    w = jnp.exp(tw / 5.0) * aw
    h = jnp.exp(th / 5.0) * ah
    return jnp.stack([cx, cy, w, h], axis=-1)
