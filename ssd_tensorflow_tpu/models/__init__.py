"""SSD model family: functional parameter pytrees + pure forward passes."""

from ssd_tensorflow_tpu.models.loss import multibox_loss, l2_regularizer
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    SSDVGG,
    apply_model,
    init_params,
)

__all__ = [
    "ModelConfig",
    "SSDVGG",
    "apply_model",
    "init_params",
    "multibox_loss",
    "l2_regularizer",
]
