"""CLI helper unit tests."""

import numpy as np

from ssd_tensorflow_tpu.cli.train import _losses_for_summary


class TestLossesForSummary:
    def test_full_batch_passthrough(self):
        losses = {"confidence": 2.0, "localization": 1.0, "l2": 0.5}
        out = _losses_for_summary(losses, batch_size=8, num_real=8)
        assert out["confidence"] == 2.0
        assert out["localization"] == 1.0
        assert out["l2"] == 0.5
        assert out["total"] == 3.5

    def test_padded_batch_rescaling(self):
        # batch mean over 8 rows where only 4 are real: per-real-sample
        # mean is twice the batch mean; l2 is batch-size independent
        losses = {"confidence": 1.0, "localization": 0.5, "l2": 0.25}
        out = _losses_for_summary(losses, batch_size=8, num_real=4)
        assert out["confidence"] == 2.0
        assert out["localization"] == 1.0
        assert out["l2"] == 0.25
        assert out["total"] == 3.25
