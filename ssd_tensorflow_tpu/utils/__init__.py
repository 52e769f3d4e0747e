"""Framework utilities: checkpointing, TensorBoard, profiling, config."""

from ssd_tensorflow_tpu.utils.checkpoint import (
    CheckpointManager,
    find_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ssd_tensorflow_tpu.utils.tensorboard import SummaryWriter

__all__ = [
    "CheckpointManager",
    "find_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
    "SummaryWriter",
]
