"""Rematerialization (activation checkpointing) policies.

VGG activations at 300-512 px are the memory hot spot (conv1_x alone is
~11 MB/image in bf16). ``jax.checkpoint`` around the backbone trades a
second forward pass for not keeping those activations live through the
backward pass — the standard XLA memory/FLOPs trade (prompt: HBM is the
usual bottleneck). Enable via TrainConfig.remat.
"""

from __future__ import annotations

import jax


def checkpoint_backbone(apply_fn):
    """Wrap a forward fn with full rematerialization."""
    return jax.checkpoint(apply_fn)


def checkpoint_dots_only(apply_fn):
    """Remat policy keeping matmul/conv outputs, recomputing elementwise.

    Cheaper recompute than full remat: convs (the expensive ops) are
    saved, ReLUs/normalization are recomputed.
    """
    return jax.checkpoint(
        apply_fn,
        policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    )
