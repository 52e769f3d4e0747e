"""SSD model family: functional parameter pytrees + pure forward passes."""

from ssd_tensorflow_tpu.models.loss import multibox_loss, l2_regularizer
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    SSDVGG,
    apply_model,
    init_params,
)


def __getattr__(name):
    # lazy: quantized pulls in extra machinery only deploy paths need
    if name == "QuantizedModel":
        from ssd_tensorflow_tpu.models.quantized import QuantizedModel

        return QuantizedModel
    raise AttributeError(name)


__all__ = [
    "ModelConfig",
    "SSDVGG",
    "QuantizedModel",
    "apply_model",
    "init_params",
    "multibox_loss",
    "l2_regularizer",
]
