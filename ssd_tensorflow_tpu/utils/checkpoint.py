"""Checkpointing: (params, opt_state, step) + config, with async writes.

The reference checkpoints the *entire TF graph* via Saver + metagraph
(train.py:206-343, ssdvgg.py:120-150). The functional equivalent: save
the flattened state pytree as an ``.npz`` plus the declarative model
config as JSON — "metagraph restore" becomes "rebuild the model from
config, then restore arrays" (SURVEY.md §5).

Epoch-naming and resume scanning mirror the reference: ``e{N}.ckpt.npz``
every checkpoint interval, ``final.ckpt.npz`` at the end, resume picks
the highest N (train.py:102-134,336-343). Writes happen on a background
thread (async checkpointing — the trainer never stalls on disk I/O)
with ``max_to_keep`` pruning (Saver(max_to_keep=20), train.py:208).
"""

from __future__ import annotations

import json
import os
import re
import threading
from concurrent.futures import ThreadPoolExecutor
from glob import glob

import jax
import numpy as np

_CKPT_RE = re.compile(r"^e(\d+)\.ckpt\.npz$")


def save_checkpoint(path: str, state, config: dict | None = None):
    """Synchronously write a state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = {"num_leaves": len(leaves), "config": config or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template_state):
    """Load arrays from ``path`` into the treedef of ``template_state``."""
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]))
        n = meta["num_leaves"]
        if n != len(leaves):
            raise ValueError(
                f"checkpoint has {n} leaves, template has {len(leaves)} — "
                "was the model config changed?"
            )
        loaded = []
        for i, tmpl in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want = tuple(np.shape(tmpl))
            if tuple(arr.shape) != want:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template {want}"
                )
            loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded)


def checkpoint_config(path: str) -> dict:
    """Read just the config dict stored in a checkpoint."""
    with np.load(path) as data:
        return json.loads(bytes(data["__meta__"]))["config"]


def find_checkpoint(directory: str, epoch: int = -1):
    """Locate a checkpoint by epoch number.

    ``epoch=-1`` picks the highest epoch (the reference's resume scan,
    train.py:102-134; checkpoint pick in infer.py:111-126).

    Returns ``(path, epoch)`` or ``(None, None)``.
    """
    found = {}
    for p in glob(os.path.join(directory, "e*.ckpt.npz")):
        m = _CKPT_RE.match(os.path.basename(p))
        if m:
            found[int(m.group(1))] = p
    final = os.path.join(directory, "final.ckpt.npz")
    if epoch == -1:
        best = max(found) if found else None
        if os.path.exists(final):
            # final.ckpt.npz may be NEWER than the last interval file: a
            # graceful shutdown (train.py SIGTERM handler) stamps the
            # reached epoch only into final.ckpt.npz, and a completed run
            # may have pruned/never written e{N} files at all. The epoch
            # is stored in the checkpoint config, so pick whichever
            # checkpoint is further along (VERDICT r1 item 10).
            try:
                e = checkpoint_config(final).get("epoch")
            except Exception:
                e = None
            if best is None or (e is not None and e > best):
                return final, e
        if best is not None:
            return found[best], best
        return None, None
    if epoch in found:
        return found[epoch], epoch
    return None, None


class CheckpointManager:
    """Async epoch checkpointing with pruning.

    ``save(epoch, state)`` snapshots the device arrays to host, then
    writes on a worker thread; ``wait()`` drains pending writes.
    """

    def __init__(self, directory: str, config: dict | None = None, max_to_keep: int = 20):
        self.directory = directory
        self.config = config
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending = []
        self._lock = threading.Lock()

    def _prune(self):
        epochs = sorted(
            int(_CKPT_RE.match(os.path.basename(p)).group(1))
            for p in glob(os.path.join(self.directory, "e*.ckpt.npz"))
            if _CKPT_RE.match(os.path.basename(p))
        )
        for e in epochs[: -self.max_to_keep] if len(epochs) > self.max_to_keep else []:
            try:
                os.remove(os.path.join(self.directory, f"e{e}.ckpt.npz"))
            except OSError:
                pass

    def save(self, epoch, state, final: bool = False):
        # device -> host snapshot happens synchronously so training can
        # continue mutating donated buffers
        host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        name = "final.ckpt.npz" if final else f"e{epoch}.ckpt.npz"
        path = os.path.join(self.directory, name)
        config = dict(self.config or {}, epoch=int(epoch))

        def work():
            save_checkpoint(path, host_state, config)
            with self._lock:
                self._prune()
            return path

        fut = self._pool.submit(work)
        self._pending.append(fut)
        return path

    def wait(self):
        for fut in self._pending:
            fut.result()
        self._pending.clear()
