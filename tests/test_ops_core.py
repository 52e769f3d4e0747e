"""Unit tests for the pure detection math (anchors, IoU, codec, boxes)."""

import numpy as np
import pytest

from ssd_tensorflow_tpu import get_preset_by_name
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset, num_anchors_per_map
from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners, clamp_boxes
from ssd_tensorflow_tpu.ops.codec import decode_locations, encode_locations
from ssd_tensorflow_tpu.ops.iou import canvas_iou
from ssd_tensorflow_tpu.ops.iou_np import canvas_corners_np, canvas_iou_np
from ssd_tensorflow_tpu.types import Box, Point, Size, normalize_box, prop2abs

from reference_impl import encode_location_scalar, random_boxes


class TestAnchors:
    @pytest.mark.parametrize(
        "name,expected", [("vgg300", 8732), ("vgg512", 24564)]
    )
    def test_counts(self, name, expected):
        preset = get_preset_by_name(name)
        anchors = anchors_for_preset(preset)
        assert anchors.shape == (expected, 4)
        assert sum(num_anchors_per_map(preset)) == expected

    def test_ordering_matches_sequential_spec(self):
        """Anchor order must be map-major, shape-major, row-major cells."""
        import math

        preset = get_preset_by_name("vgg300")
        anchors = anchors_for_preset(preset)

        expected = []
        box_sizes_all = []
        for i, m in enumerate(preset.maps):
            sizes = []
            for ar in (1.0,) + tuple(m.aspect_ratios):
                r = math.sqrt(ar)
                sizes.append((m.scale * r, m.scale / r))
            nxt = (
                preset.maps[i + 1].scale
                if i + 1 < len(preset.maps)
                else preset.extra_scale
            )
            sp = math.sqrt(m.scale * nxt)
            sizes.append((sp, sp))
            box_sizes_all.append(sizes)
        for k, m in enumerate(preset.maps):
            fk = m.size.w
            for (w, h) in box_sizes_all[k]:
                for j in range(fk):
                    for i in range(fk):
                        expected.append(
                            ((i + 0.5) / fk, (j + 0.5) / fk, w, h)
                        )
        expected = np.array(expected, dtype=np.float32)
        np.testing.assert_allclose(anchors, expected, rtol=1e-6)

    def test_first_map_first_anchor(self):
        anchors = anchors_for_preset(get_preset_by_name("vgg300"))
        np.testing.assert_allclose(
            anchors[0], [0.5 / 38, 0.5 / 38, 0.1, 0.1], rtol=1e-6
        )


class TestCanvasCorners:
    def test_matches_scalar_prop2abs(self, rng):
        boxes = random_boxes(rng, 64)
        corners = canvas_corners_np(boxes)
        for i in range(boxes.shape[0]):
            b = boxes[i]
            xmin, xmax, ymin, ymax = prop2abs(
                Point(b[0], b[1]), Size(b[2], b[3]), Size(1000, 1000)
            )
            np.testing.assert_array_equal(
                corners[i], [xmin, xmax, ymin, ymax]
            )

    def test_negative_coords_truncate_toward_zero(self):
        boxes = np.array([[0.0005, 0.0005, 0.01, 0.01]])  # xmin = -4.5
        corners = canvas_corners_np(boxes)
        assert corners[0, 0] == -4  # int(-4.5) == -4, not floor's -5

    def test_jnp_matches_np(self, rng):
        boxes = random_boxes(rng, 128).astype(np.float32)
        jc = np.asarray(box_canvas_corners(boxes))
        nc = canvas_corners_np(boxes)
        # float32 vs float64 truncation can differ exactly at integer
        # boundaries; allow at most a 1-pixel discrepancy, none expected
        # for these well-separated random boxes.
        np.testing.assert_allclose(jc, nc, atol=1.0)


class TestIoU:
    def test_self_iou_is_one(self, rng):
        boxes = random_boxes(rng, 16)
        iou = canvas_iou_np(boxes, boxes)
        np.testing.assert_allclose(np.diag(iou), 1.0)

    def test_disjoint_is_zero(self):
        a = np.array([[0.1, 0.1, 0.1, 0.1]])
        b = np.array([[0.9, 0.9, 0.1, 0.1]])
        assert canvas_iou_np(a, b)[0, 0] == 0.0

    def test_hand_computed_half_overlap(self):
        # Two 200x200-pixel boxes offset by 100 px horizontally:
        # inter = 101*201, union = 2*201*201 - 101*201
        a = np.array([[0.2, 0.2, 0.2, 0.2]])
        b = np.array([[0.3, 0.2, 0.2, 0.2]])
        iou = canvas_iou_np(a, b)[0, 0]
        inter = 101 * 201
        union = 2 * 201 * 201 - inter
        np.testing.assert_allclose(iou, inter / union)

    def test_jnp_matches_np(self, rng):
        a = random_boxes(rng, 20).astype(np.float32)
        b = random_boxes(rng, 30).astype(np.float32)
        jiou = np.asarray(canvas_iou(a, b))
        niou = canvas_iou_np(a, b)
        np.testing.assert_allclose(jiou, niou, atol=5e-3)


class TestCodec:
    def test_encode_matches_scalar(self, rng):
        boxes = random_boxes(rng, 32).astype(np.float32)
        anchors = random_boxes(rng, 32, tight=True).astype(np.float32)
        enc = np.asarray(encode_locations(boxes, anchors))
        for i in range(32):
            np.testing.assert_allclose(
                enc[i],
                encode_location_scalar(boxes[i], anchors[i]),
                rtol=5e-4,
                atol=5e-4,
            )

    def test_roundtrip(self, rng):
        boxes = random_boxes(rng, 64).astype(np.float32)
        # anchors near their boxes, as in real matching — keeps the
        # encoded offsets under the legitimate decode clamp of 100
        anchors = boxes + rng.normal(0, 0.02, boxes.shape).astype(np.float32)
        anchors[:, 2:] = np.abs(anchors[:, 2:]) + 0.05
        enc = encode_locations(boxes, anchors)
        dec = np.asarray(decode_locations(enc, anchors))
        np.testing.assert_allclose(dec, boxes, rtol=1e-3, atol=1e-4)

    def test_decode_clamps_at_100(self):
        anchors = np.array([[0.5, 0.5, 0.2, 0.2]], dtype=np.float32)
        crazy = np.array([[500.0, 500.0, 500.0, 500.0]], dtype=np.float32)
        dec = np.asarray(decode_locations(crazy, anchors))
        capped = np.asarray(
            decode_locations(np.full((1, 4), 100.0, np.float32), anchors)
        )
        np.testing.assert_allclose(dec, capped)


class TestClampBoxes:
    def test_matches_normalize_box(self, rng):
        boxes = random_boxes(rng, 32)
        # include out-of-bounds boxes like early-training decodes
        wild = np.array(
            [
                [1.2, 0.5, 0.4, 0.4],
                [-0.2, 0.5, 0.4, 0.4],
                [0.5, 0.5, 3.0, 3.0],
                [2.0, 2.0, 0.1, 0.1],
            ]
        )
        allb = np.concatenate([boxes, wild]).astype(np.float64)
        out = np.asarray(clamp_boxes(allb))
        for i in range(allb.shape[0]):
            b = allb[i]
            ref = normalize_box(
                Box(None, None, Point(b[0], b[1]), Size(b[2], b[3]))
            )
            np.testing.assert_allclose(
                out[i],
                [ref.center.x, ref.center.y, ref.size.w, ref.size.h],
                atol=1e-6,
            )

    def test_nan_passthrough(self):
        b = np.array([[np.nan, 0.5, 0.1, 0.1]])
        out = np.asarray(clamp_boxes(b))
        assert np.isnan(out[0, 0])
