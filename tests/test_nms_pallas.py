"""Pallas NMS kernel vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

import jax

from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners
from ssd_tensorflow_tpu.ops.nms import class_aware_keep
from ssd_tensorflow_tpu.ops.nms_pallas import nms_keep_pallas

from reference_impl import random_boxes


def _candidates(rng, b, d, num_classes=4):
    boxes = np.zeros((b, d, 4), dtype=np.float32)
    classes = np.zeros((b, d), dtype=np.int32)
    valid = np.zeros((b, d), dtype=bool)
    for i in range(b):
        bx = random_boxes(rng, d, tight=True)
        for j in range(d // 2):  # force overlap clusters
            bx[j] = np.clip(bx[j % 8] + rng.normal(0, 0.01, 4), 0.02, 0.98)
        boxes[i] = bx
        classes[i] = rng.integers(0, num_classes, d)
        valid[i] = np.sort(rng.uniform(0, 1, d))[::-1] > 0.3
    return boxes, classes, valid


class TestNMSPallasKernel:
    @pytest.mark.parametrize("seed,d", [(0, 128), (1, 128), (2, 128),
                                        (3, 200), (4, 57)])
    def test_matches_xla_path(self, seed, d):
        # d=200/57 exercise the internal lane padding (non-multiples of
        # 128 must produce the identical pick set)
        rng = np.random.default_rng(seed)
        b = 3
        boxes, classes, valid = _candidates(rng, b, d)
        corners = np.asarray(box_canvas_corners(boxes))
        shift = classes.astype(np.float32) * 4096.0
        shifted = corners + shift[..., None]

        got = np.asarray(
            nms_keep_pallas(shifted, valid, threshold=0.45, interpret=True)
        )
        for i in range(b):
            want = np.asarray(
                class_aware_keep(corners[i], classes[i], valid[i], 0.45)
            )
            np.testing.assert_array_equal(got[i], want)

    def test_all_invalid(self):
        b, d = 1, 128
        corners = np.zeros((b, d, 4), dtype=np.float32)
        valid = np.zeros((b, d), dtype=bool)
        got = np.asarray(nms_keep_pallas(corners, valid, interpret=True))
        assert not got.any()


class TestDecodeScoresPallas:
    def test_decode_scores_honors_pallas_flag(self, rng):
        """decode_scores(use_pallas_nms=True) matches the XLA-loop path
        (interpret mode on CPU)."""
        import jax.numpy as jnp

        from ssd_tensorflow_tpu.ops.postprocess import (
            DetectionConfig,
            decode_scores,
        )

        A = 256
        conf = jnp.asarray(rng.uniform(0, 1, (2, A)).astype(np.float32))
        cls = jnp.asarray(rng.integers(0, 3, (2, A)), jnp.int32)
        locs = jnp.asarray(rng.normal(0, 0.3, (2, A, 4)).astype(np.float32))
        anchors = jnp.asarray(
            rng.uniform(0.2, 0.8, (A, 4)).astype(np.float32)
        )
        # top_k=200 (the reference default): the kernel lane-pads to 256
        # internally, so the flag composes with the stock config
        base = DetectionConfig(top_k=200, confidence_threshold=0.05)
        want = decode_scores(conf, cls, locs, anchors, base)
        got = decode_scores(
            conf, cls, locs, anchors,
            DetectionConfig(
                top_k=200, confidence_threshold=0.05, use_pallas_nms=True
            ),
        )
        np.testing.assert_array_equal(
            np.asarray(want.valid), np.asarray(got.valid)
        )
        v = np.asarray(want.valid)
        np.testing.assert_allclose(
            np.asarray(want.boxes)[v], np.asarray(got.boxes)[v], atol=1e-6
        )
