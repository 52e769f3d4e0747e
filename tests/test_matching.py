"""Parity tests: vectorized anchor matching vs the sequential oracle."""

import numpy as np
import pytest

from ssd_tensorflow_tpu import get_preset_by_name
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.iou_np import canvas_iou_np
from ssd_tensorflow_tpu.ops.matching import (
    encode_targets,
    encode_targets_batch,
    has_positive_anchor,
    match_anchors,
)

from reference_impl import (
    encode_location_scalar,
    match_anchors_sequential,
    random_boxes,
)


def _random_case(rng, num_gt, num_anchors=256, pad_to=None):
    gt = random_boxes(rng, num_gt, tight=True)
    anchors = random_boxes(rng, num_anchors, tight=True)
    mask = np.ones(num_gt, dtype=bool)
    if pad_to:
        pad = pad_to - num_gt
        gt = np.concatenate([gt, np.tile([[0.5, 0.5, 1.0, 1.0]], (pad, 1))])
        mask = np.concatenate([mask, np.zeros(pad, dtype=bool)])
    return gt.astype(np.float32), mask, anchors.astype(np.float32)


class TestMatchAnchors:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_sequential_oracle(self, seed):
        rng = np.random.default_rng(seed)
        gt, mask, anchors = _random_case(rng, num_gt=7, pad_to=12)
        iou = canvas_iou_np(gt, anchors)
        ref_assign, ref_pos = match_anchors_sequential(iou, mask)
        got_assign, got_pos = match_anchors(iou, mask)
        got_assign, got_pos = np.asarray(got_assign), np.asarray(got_pos)
        np.testing.assert_array_equal(got_pos, ref_pos)
        np.testing.assert_array_equal(
            got_assign[ref_pos], ref_assign[ref_pos]
        )

    def test_real_anchors_voc_like(self):
        """Random gt boxes against the true vgg300 anchor set."""
        rng = np.random.default_rng(99)
        anchors = anchors_for_preset(get_preset_by_name("vgg300"))
        for _ in range(4):
            gt = random_boxes(rng, 5, tight=True).astype(np.float32)
            mask = np.ones(5, dtype=bool)
            iou = canvas_iou_np(gt, anchors)
            ref_assign, ref_pos = match_anchors_sequential(iou, mask)
            got_assign, got_pos = match_anchors(iou.astype(np.float32), mask)
            got_assign, got_pos = np.asarray(got_assign), np.asarray(got_pos)
            np.testing.assert_array_equal(got_pos, ref_pos)
            np.testing.assert_array_equal(
                got_assign[ref_pos], ref_assign[ref_pos]
            )

    def test_pass2_overrides_pass1(self):
        """A gt's best anchor must be forced to it even when another gt
        had the higher IoU in pass 1."""
        # anchor 0 overlaps gtA @0.8 and gtB @0.7; anchor 0 is gtB's best
        # anchor; gtA's best anchor is anchor 1 (0.9). After pass 2,
        # anchor 0 belongs to gtB.
        iou = np.array(
            [
                [0.8, 0.9, 0.0],  # gtA
                [0.7, 0.0, 0.0],  # gtB
            ],
            dtype=np.float32,
        )
        mask = np.ones(2, dtype=bool)
        assign, pos = match_anchors(iou, mask)
        ref_assign, ref_pos = match_anchors_sequential(iou, mask)
        np.testing.assert_array_equal(np.asarray(pos), ref_pos)
        np.testing.assert_array_equal(np.asarray(assign)[:2], [1, 0])

    def test_below_threshold_gt_is_unmatched(self):
        """The reference only forces the best anchor when IoU > 0.5."""
        iou = np.array([[0.45, 0.3]], dtype=np.float32)
        assign, pos = match_anchors(iou, np.ones(1, dtype=bool))
        assert not np.asarray(pos).any()

    def test_empty_gt(self):
        iou = np.zeros((4, 16), dtype=np.float32)
        assign, pos = match_anchors(iou, np.zeros(4, dtype=bool))
        assert not np.asarray(pos).any()


class TestEncodeTargets:
    def test_label_tensor_structure(self):
        rng = np.random.default_rng(7)
        gt, mask, anchors = _random_case(rng, 4, pad_to=8)
        labels = rng.integers(0, 20, size=8).astype(np.int32)
        K = 20
        vec = np.asarray(encode_targets(gt, labels, mask, anchors, K))
        assert vec.shape == (anchors.shape[0], K + 5)
        # every row must be a valid one-hot over K+1 classes
        np.testing.assert_allclose(vec[:, : K + 1].sum(axis=1), 1.0)

        iou = canvas_iou_np(gt, anchors)
        ref_assign, ref_pos = match_anchors_sequential(iou, mask)
        # background rows
        np.testing.assert_array_equal(vec[~ref_pos, K], 1.0)
        np.testing.assert_array_equal(vec[~ref_pos, K + 1 :], 0.0)
        # positive rows carry the matched class and encoded location
        for a in np.nonzero(ref_pos)[0]:
            g = ref_assign[a]
            assert vec[a, labels[g]] == 1.0
            np.testing.assert_allclose(
                vec[a, K + 1 :],
                encode_location_scalar(gt[g], anchors[a]),
                rtol=1e-3,
                atol=1e-4,
            )

    def test_batched_matches_single(self):
        rng = np.random.default_rng(3)
        anchors = random_boxes(rng, 128, tight=True).astype(np.float32)
        B, G, K = 3, 6, 20
        gts = np.stack([random_boxes(rng, G, tight=True) for _ in range(B)]).astype(
            np.float32
        )
        labels = rng.integers(0, K, size=(B, G)).astype(np.int32)
        masks = rng.random((B, G)) < 0.8
        batched = np.asarray(
            encode_targets_batch(gts, labels, masks, anchors, K)
        )
        for b in range(B):
            single = np.asarray(
                encode_targets(gts[b], labels[b], masks[b], anchors, K)
            )
            np.testing.assert_allclose(batched[b], single)


class TestHasPositiveAnchor:
    def test_resample_check(self):
        anchors = anchors_for_preset(get_preset_by_name("vgg300"))
        # A box exactly matching an anchor must register a positive.
        gt = anchors[100:101].copy()
        assert has_positive_anchor(gt, None, anchors)
        # A sliver in a corner should not.
        sliver = np.array([[0.001, 0.001, 0.001, 0.001]], dtype=np.float32)
        assert not has_positive_anchor(sliver, None, anchors)
        # Empty gt set -> no positives.
        empty = np.zeros((0, 4), dtype=np.float32)
        assert not has_positive_anchor(empty, None, anchors)


class TestMatchingEdgeCases:
    def test_duplicate_gt_boxes(self):
        """Two identical gt boxes: exact tie everywhere. Earliest gt wins
        pass 1; pass 2's strictly-greater rule keeps the earliest too."""
        anchors = np.array(
            [[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]], dtype=np.float32
        )
        gt = np.array(
            [[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]], dtype=np.float32
        )
        mask = np.ones(2, dtype=bool)
        iou = canvas_iou_np(gt, anchors).astype(np.float32)
        assign, pos = match_anchors(iou, mask)
        ref_assign, ref_pos = match_anchors_sequential(iou, mask)
        np.testing.assert_array_equal(np.asarray(pos), ref_pos)
        np.testing.assert_array_equal(
            np.asarray(assign)[ref_pos], ref_assign[ref_pos]
        )
        assert np.asarray(assign)[0] == 0  # earliest gt

    def test_single_anchor_many_gts(self):
        """More gts than anchors — every valid gt claims the one anchor."""
        iou = np.array([[0.6], [0.9], [0.7]], dtype=np.float32)
        mask = np.ones(3, dtype=bool)
        assign, pos = match_anchors(iou, mask)
        # highest IoU gt (index 1) wins the only anchor
        assert np.asarray(pos)[0]
        assert np.asarray(assign)[0] == 1

    def test_encode_with_zero_valid_gt(self):
        anchors = np.array([[0.5, 0.5, 0.2, 0.2]], dtype=np.float32)
        gt = np.zeros((3, 4), dtype=np.float32)
        labels = np.zeros(3, dtype=np.int32)
        mask = np.zeros(3, dtype=bool)
        vec = np.asarray(encode_targets(gt, labels, mask, anchors, 5))
        assert vec[0, 5] == 1.0  # background
        np.testing.assert_array_equal(vec[0, 6:], 0.0)
        assert np.isfinite(vec).all()
