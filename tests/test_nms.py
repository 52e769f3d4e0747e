"""Parity tests: fixed-shape NMS / decode vs sequential oracles."""

import numpy as np
import pytest

from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners
from ssd_tensorflow_tpu.ops.codec import encode_locations
from ssd_tensorflow_tpu.ops.iou_np import canvas_corners_np
from ssd_tensorflow_tpu.ops.nms import class_aware_keep, greedy_keep
from ssd_tensorflow_tpu.ops.postprocess import (
    DetectionConfig,
    decode_detections,
)
from ssd_tensorflow_tpu.ops.iou import pairwise_canvas_iou

from reference_impl import nms_sequential, random_boxes


def _sorted_candidates(rng, n, num_classes=4):
    boxes = random_boxes(rng, n, tight=True)
    # Cluster boxes to force overlaps
    cluster = random_boxes(rng, max(1, n // 8), tight=True)
    for i in range(n // 2):
        c = cluster[i % len(cluster)]
        jitter = rng.normal(0, 0.01, size=4)
        boxes[i] = np.clip(c + jitter, 0.02, 0.98)
    scores = np.sort(rng.uniform(0.1, 1.0, size=n))[::-1].copy()
    classes = rng.integers(0, num_classes, size=n)
    valid = scores >= 0.3
    return boxes.astype(np.float32), scores.astype(np.float32), classes, valid


class TestGreedyKeep:
    @pytest.mark.parametrize("seed", range(6))
    def test_single_class_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        boxes, scores, _, valid = _sorted_candidates(rng, 64)
        corners = canvas_corners_np(boxes)
        iou = np.asarray(
            pairwise_canvas_iou(corners.astype(np.float32), corners.astype(np.float32))
        )
        got = np.asarray(greedy_keep(iou, valid, 0.45))
        ref = nms_sequential(corners, scores, valid, 0.45)
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("seed", range(6))
    def test_class_aware_matches_per_class_oracle(self, seed):
        rng = np.random.default_rng(seed + 100)
        boxes, scores, classes, valid = _sorted_candidates(rng, 64)
        corners_np = canvas_corners_np(boxes)
        got = np.asarray(
            class_aware_keep(
                box_canvas_corners(boxes), classes.astype(np.int32), valid, 0.45
            )
        )
        ref = np.zeros(len(scores), dtype=bool)
        for c in np.unique(classes):
            m = classes == c
            ref[m] = nms_sequential(
                corners_np[m], scores[m], valid[m], 0.45
            )
        np.testing.assert_array_equal(got, ref)


class TestDecodeDetections:
    def _make_predictions(self, rng, num_anchors=512, K=20):
        anchors = random_boxes(rng, num_anchors, tight=True).astype(np.float32)
        # Plant 5 strong detections at known anchors/classes.
        logits = rng.normal(0, 0.1, size=(num_anchors, K + 1))
        logits[:, K] += 6.0  # background-dominant elsewhere
        planted = []
        for i, a in enumerate(rng.choice(num_anchors, 5, replace=False)):
            cls = int(rng.integers(0, K))
            logits[a, K] = 0.0
            logits[a, cls] = 8.0 + i
            planted.append((int(a), cls))
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        locs = rng.normal(0, 0.5, size=(num_anchors, 4))
        return (
            probs.astype(np.float32)[None],
            locs.astype(np.float32)[None],
            anchors,
            planted,
        )

    def test_planted_detections_found(self):
        rng = np.random.default_rng(42)
        probs, locs, anchors, planted = self._make_predictions(rng)
        cfg = DetectionConfig(top_k=64, confidence_threshold=0.5)
        dets = decode_detections(probs, locs, anchors, cfg)
        valid = np.asarray(dets.valid[0])
        classes = np.asarray(dets.classes[0])[valid]
        got = set(classes.tolist())
        want = {cls for _, cls in planted}
        assert want <= got | set(), f"missing planted classes: {want - got}"
        # scores sorted descending among valid rows
        scores = np.asarray(dets.scores[0])[valid]
        assert np.all(np.diff(scores) <= 1e-6)

    def test_threshold_masks_everything_when_high(self):
        rng = np.random.default_rng(43)
        probs, locs, anchors, _ = self._make_predictions(rng)
        cfg = DetectionConfig(top_k=64, confidence_threshold=1.01)
        dets = decode_detections(probs, locs, anchors, cfg)
        assert not np.asarray(dets.valid).any()

    def test_max_detections_compaction(self):
        rng = np.random.default_rng(44)
        probs, locs, anchors, _ = self._make_predictions(rng)
        cfg = DetectionConfig(
            top_k=64, confidence_threshold=0.5, max_detections=3
        )
        dets = decode_detections(probs, locs, anchors, cfg)
        assert dets.boxes.shape[1] == 3
        valid = np.asarray(dets.valid[0])
        # valid rows are compacted to the front
        if valid.any():
            first_invalid = valid.argmin() if not valid.all() else len(valid)
            assert valid[:first_invalid].all()

    def test_boxes_decoded_against_anchors(self):
        """A zero location offset must decode to the anchor itself."""
        rng = np.random.default_rng(45)
        K = 3
        anchors = random_boxes(rng, 32, tight=True).astype(np.float32)
        probs = np.zeros((1, 32, K + 1), dtype=np.float32)
        probs[0, :, K] = 1.0
        probs[0, 7, K] = 0.0
        probs[0, 7, 1] = 1.0
        locs = np.zeros((1, 32, 4), dtype=np.float32)
        cfg = DetectionConfig(top_k=8, confidence_threshold=0.5)
        dets = decode_detections(probs, locs, anchors, cfg)
        valid = np.asarray(dets.valid[0])
        assert valid.sum() == 1
        got_box = np.asarray(dets.boxes[0])[valid][0]
        # decoded box == anchor 7 modulo the canvas clamp rounding
        np.testing.assert_allclose(got_box, anchors[7], atol=2e-3)
        assert np.asarray(dets.classes[0])[valid][0] == 1


class TestPallasNMSIntegration:
    def test_use_pallas_nms_matches_default(self):
        from ssd_tensorflow_tpu.ops.postprocess import (
            DetectionConfig,
            decode_detections,
        )

        rng = np.random.default_rng(77)
        A, K = 512, 20
        anchors = random_boxes(rng, A, tight=True).astype(np.float32)
        logits = rng.normal(0, 1, (2, A, K + 1)).astype(np.float32)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        locs = rng.normal(0, 0.3, (2, A, 4)).astype(np.float32)

        base = decode_detections(
            probs, locs, anchors,
            DetectionConfig(top_k=128, confidence_threshold=0.05),
        )
        pallas = decode_detections(
            probs, locs, anchors,
            DetectionConfig(
                top_k=128, confidence_threshold=0.05, use_pallas_nms=True
            ),
        )
        np.testing.assert_array_equal(
            np.asarray(base.valid), np.asarray(pallas.valid)
        )
        np.testing.assert_allclose(
            np.asarray(base.boxes), np.asarray(pallas.boxes)
        )
        np.testing.assert_array_equal(
            np.asarray(base.classes), np.asarray(pallas.classes)
        )
