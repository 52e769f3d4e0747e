"""Multi-host input feeding.

Each host runs its own data pipeline over its shard of the sample list
(the TPU-native replacement for the reference's per-process DataQueue
feeding a single session) and contributes its local batch to one global
``jax.Array`` sharded over the mesh's data axis. On a single host this
degenerates to :func:`shard_batch`.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard(items, process_index=None, process_count=None):
    """This host's contiguous shard of a global work list."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(items)
    per = n // pc
    extra = n % pc
    start = pi * per + min(pi, extra)
    end = start + per + (1 if pi < extra else 0)
    return items[start:end]


def local_rows(x):
    """This process's rows of a batch-leading global ``jax.Array``.

    ``make_global_batch`` places each process's rows on its own devices,
    so the addressable shards (sorted by batch offset) are exactly the
    rows this host fed in — usable for host-side accounting (mAP, image
    summaries) without a cross-host gather. On a single process this is
    the whole array.
    """
    return local_rows_many([x])[0]


def local_rows_many(arrays):
    """:func:`local_rows` for several arrays with ONE combined host
    fetch (each separate device_get pays a full transfer round trip —
    significant over a remote-TPU tunnel)."""
    import numpy as np

    refs = []
    for x in arrays:
        unique = {}  # dedup replicated shards BEFORE the transfer
        for s in x.addressable_shards:
            unique.setdefault(s.index[0].start or 0, s.data)
        refs.append(unique)
    fetched = jax.device_get([list(u.values()) for u in refs])
    out = []
    for u, datas in zip(refs, fetched):
        by_off = dict(zip(u.keys(), datas))
        out.append(
            np.concatenate(
                [np.asarray(by_off[k]) for k in sorted(by_off)], axis=0
            )
        )
    return out


def make_global_batch(local_batch: dict, mesh: Mesh) -> dict:
    """Assemble per-host batch arrays into global data-sharded arrays.

    ``local_batch`` holds this process's rows; the returned arrays have
    global shape ``(local_rows * process_count, ...)`` sharded over the
    ``data`` axis. Works unchanged on one host.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: put(v) for k, v in local_batch.items()}
