"""Sharding rules: how parameters and batches map onto the mesh.

Data parallelism: batch leading dim over ``data``, params replicated —
XLA inserts the gradient all-reduce (psum) over ICI automatically when
the loss is jitted with these shardings.

Tensor parallelism (optional, ``model`` axis > 1): the widest layers —
the 1024-channel a-trous conv6/conv7 (the reference's decimated fc6/fc7,
ssdvgg.py:241-292) — shard their filters over output channels; XLA
partitions the convolutions channel-parallel and inserts the boundary
collectives. VGG-scale nets don't need TP (SURVEY.md §2.4), but the
plumbing exists and is exercised by the multichip dry-run.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: params whose conv filters shard over the model axis: name -> (w spec, b spec)
_TP_RULES = {
    # HWIO filters: shard output channels (dim 3)
    "mod_conv6": (P(None, None, None, "model"), P("model")),
    # conv7 consumes conv6's sharded channels and shards its own output
    "mod_conv7": (P(None, None, "model", None), P()),
}


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = True):
    """A NamedSharding pytree matching ``params``."""
    replicated = NamedSharding(mesh, P())
    use_tp = tensor_parallel and mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        name = path[0].key if path else None
        field = path[1].key if len(path) > 1 else None
        if use_tp and name in _TP_RULES and field in ("w", "b"):
            w_spec, b_spec = _TP_RULES[name]
            return NamedSharding(mesh, w_spec if field == "w" else b_spec)
        return replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(mesh: Mesh, tree):
    """Shard every leaf's leading (batch) dim over the data axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda _: s, tree)


def replicated(mesh: Mesh, tree=None):
    s = NamedSharding(mesh, P())
    if tree is None:
        return s
    return jax.tree_util.tree_map(lambda _: s, tree)
