"""ssd_tensorflow_tpu — a TPU-native SSD object-detection framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ljanyst/ssd-tensorflow (reference mounted at /root/reference):

* Single Shot MultiBox Detector (Liu et al. 2016) with a VGG-16 backbone,
  ``vgg300`` and ``vgg512`` flavors (reference: ssdutils.py:36-62).
* Pascal VOC 2007+2012 training / evaluation pipeline
  (reference: source_pascal_voc.py, process_dataset.py).
* Five CLI drivers: process_dataset / train / infer / export_model / detect
  (reference: the same-named top-level scripts).

Everything on the device side is functional JAX: pure functions over
parameter pytrees, ``jax.jit``-compiled train/eval steps sharded over a
``jax.sharding.Mesh``, target assignment and NMS as fixed-shape tensor
programs instead of the reference's per-image Python loops.
"""

__version__ = "0.1.0"

from ssd_tensorflow_tpu.types import Box, Label, Point, Sample, Size
from ssd_tensorflow_tpu.presets import SSD_PRESETS, SSDPreset, get_preset_by_name

__all__ = [
    "Box",
    "Label",
    "Point",
    "Sample",
    "Size",
    "SSDPreset",
    "SSD_PRESETS",
    "get_preset_by_name",
    "__version__",
]
