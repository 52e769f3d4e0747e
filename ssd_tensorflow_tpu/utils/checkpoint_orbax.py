"""Orbax checkpoint backend (optional alternative to the npz backend).

SURVEY.md §5 names orbax async checkpointing as the TPU-native
equivalent of the reference's Saver flow. The npz backend
(utils/checkpoint.py) is the default — single-file artifacts, zero
version churn; this backend provides orbax's async machinery and
directory layout for users who standardize on it. Select it with
``train.py --checkpoint-backend orbax`` (resume included).
"""

from __future__ import annotations

import json
import os


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def stored_config(directory: str) -> dict:
    """Read the config dict an :class:`OrbaxCheckpointManager` stored
    alongside its checkpoints (the npz backend embeds it in the archive;
    orbax steps are pure pytrees, so it rides as ``config.json``)."""
    path = os.path.join(os.path.abspath(directory), "config.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


class OrbaxCheckpointManager:
    """Epoch-keyed orbax checkpoints with the same surface as
    :class:`ssd_tensorflow_tpu.utils.checkpoint.CheckpointManager`."""

    def __init__(self, directory: str, config: dict | None = None, max_to_keep: int = 20):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        self.config = config or {}
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )
        if config is not None:
            self._write_config()

    def _write_config(self):
        with open(os.path.join(self.directory, "config.json"), "w") as f:
            json.dump(self.config, f)
            f.write("\n")

    def set_config(self, config: dict):
        """Attach/replace the config after construction (the resume path
        builds the manager before the run config exists)."""
        self.config = config or {}
        self._write_config()

    def save(self, epoch: int, state, final: bool = False):
        import orbax.checkpoint as ocp

        config = dict(self.config, epoch=int(epoch))
        if config != self.config:
            self.config = config
            self._write_config()
        # a final save at an interval boundary targets an existing step
        # (e.g. interval checkpoint at e20 then final at e20) — a no-op,
        # not an error
        if epoch in set(self._mgr.all_steps()):
            return os.path.join(self.directory, str(epoch))
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        return os.path.join(self.directory, str(epoch))

    def restore(self, template_state, epoch: int | None = None):
        import orbax.checkpoint as ocp

        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template_state)
        )

    def latest_epoch(self):
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
