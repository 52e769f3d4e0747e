"""Evaluation: Pascal VOC average precision + submission files."""

from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
from ssd_tensorflow_tpu.eval.pascal_summary import PascalSummary

__all__ = ["APCalculator", "APs2mAP", "PascalSummary"]
