"""Device parallelism: mesh construction, sharding rules, jitted steps.

The reference has no accelerator parallelism at all — a single
tf.Session and host-process data workers (SURVEY.md §2.4). Here data
parallelism is first-class: one ``jax.sharding.Mesh`` with a ``data``
axis (and an optional ``model`` axis for tensor-parallel experiments),
batch sharded over ``data``, parameters replicated, gradient
all-reduce emitted by XLA over ICI.
"""

from ssd_tensorflow_tpu.parallel.mesh import make_mesh
from ssd_tensorflow_tpu.parallel.train_step import (
    TrainConfig,
    TrainState,
    lr_schedule,
    make_eval_step,
    make_train_state,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "TrainConfig",
    "TrainState",
    "lr_schedule",
    "make_eval_step",
    "make_train_state",
    "make_train_step",
]
