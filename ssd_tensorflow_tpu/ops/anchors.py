"""Default (anchor) box generation — fully vectorized.

The reference builds anchors with a triple Python loop over
sizes x rows x cols producing a list of namedtuples
(ssdutils.py:76-117). Here the whole anchor set is one numpy
computation producing an ``(A, 4)`` float array in proportional center
form. The ordering is identical to the reference — map-major, then
anchor-shape-major, then row-major cells — which is load-bearing: the
multibox heads' concatenation order must agree with it
(reference: ssdvgg.py:353-366 vs ssdutils.py:105-117).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from ssd_tensorflow_tpu.presets import SSDPreset, get_preset_by_name


def _box_sizes_for_preset(preset: SSDPreset):
    """Per-map list of (w, h) anchor shapes.

    Order per map: AR=1 first, then each configured aspect ratio, then
    the extra s' = sqrt(s_k * s_{k+1}) box (reference: ssdutils.py:83-100).
    """
    box_sizes = []
    for i, m in enumerate(preset.maps):
        s = m.scale
        sizes = []
        for ar in (1.0,) + tuple(m.aspect_ratios):
            r = math.sqrt(ar)
            sizes.append((s * r, s / r))
        if i < len(preset.maps) - 1:
            s_prime = math.sqrt(s * preset.maps[i + 1].scale)
        else:
            s_prime = math.sqrt(s * preset.extra_scale)
        sizes.append((s_prime, s_prime))
        box_sizes.append(sizes)
    return box_sizes


def anchors_for_preset(preset: SSDPreset) -> np.ndarray:
    """All anchors for a preset as an ``(A, 4)`` float32 array (cx, cy, w, h).

    Equivalent to get_anchors_for_preset + a center/size extraction
    (reference: ssdutils.py:76-117), but vectorized per feature map.
    """
    parts = []
    box_sizes = _box_sizes_for_preset(preset)
    for k, m in enumerate(preset.maps):
        fk = m.size.w
        # Cell centers: y-major (rows), x-minor (cols) — matches the
        # reference's `for j (rows): for i (cols)` order and the heads'
        # row-major spatial reshape (ssdvgg.py:63).
        coords = (np.arange(fk, dtype=np.float64) + 0.5) / fk
        cy, cx = np.meshgrid(coords, coords, indexing="ij")
        centers = np.stack([cx.ravel(), cy.ravel()], axis=-1)  # (fk*fk, 2)
        for w, h in box_sizes[k]:
            wh = np.broadcast_to(
                np.array([w, h], dtype=np.float64), centers.shape
            )
            parts.append(np.concatenate([centers, wh], axis=-1))
    anchors = np.concatenate(parts, axis=0).astype(np.float32)
    assert anchors.shape == (preset.num_anchors, 4), (
        f"anchor count mismatch: {anchors.shape[0]} != {preset.num_anchors}"
    )
    return anchors


@lru_cache(maxsize=None)
def anchors_by_name(preset_name: str) -> np.ndarray:
    """Cached anchors for a named preset (read-only)."""
    a = anchors_for_preset(get_preset_by_name(preset_name))
    a.setflags(write=False)
    return a


def num_anchors_per_map(preset: SSDPreset):
    """Anchors contributed by each feature map (for head bookkeeping)."""
    return [m.size.w * m.size.h * m.num_shapes for m in preset.maps]
