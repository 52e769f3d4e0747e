"""Host-side data machinery: sources, augmentation, batching.

Augmentation stays on the host because its control flow is data
dependent (crop-sampler rejection loops, the >=1-positive resampling
rule — reference transforms.py:302-361, training_data.py:92-98); target
assignment moved on-device into the train step, so the pipeline only
ships images + padded gt arrays.
"""

from ssd_tensorflow_tpu.data.sources import load_data_source
from ssd_tensorflow_tpu.data.pipeline import TrainingData

__all__ = ["load_data_source", "TrainingData"]
