"""Direct parity tests against the actual reference implementation.

SURVEY.md §7 calls parity testing against the reference encoder
mandatory: every other oracle in this suite is a from-spec restatement
(tests/reference_impl.py) that could share a misreading with the
implementation. Here we import the reference's own numpy modules from
/root/reference (ssdutils, transforms.LabelCreatorTransform,
average_precision — pure numpy/cv2, no TF needed) and diff against:

  * ops/anchors.anchors_for_preset  vs get_anchors_for_preset (exact)
  * ops/boxes.box_canvas_corners    vs prop2abs integerization (exact)
  * ops/codec                       vs compute_location/decode_location
  * ops/matching.encode_targets     vs LabelCreatorTransform's (A, K+5)
  * ops/nms.class_aware_keep        vs suppress_overlaps pick sets
  * eval/average_precision          vs APCalculator AP values

The reference modules are IMPORTED, never copied (CLAUDE.md rule).
Tests skip when /root/reference is not present.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not available"
)

_REF_MODULES = ("utils", "ssdutils", "transforms", "average_precision")


@pytest.fixture(scope="module")
def ref():
    """Import the reference's numpy modules under their own sys.path.

    Generic names (utils, transforms) are imported fresh and removed
    from sys.modules afterwards so they can't shadow anything else.
    """
    # numpy 2.x compat: the 2017-era reference uses the removed
    # np.int alias (average_precision.py:120); shim it for the import's
    # runtime, not by editing the read-only reference.
    if not hasattr(np, "int"):
        np.int = int
    saved = {m: sys.modules.pop(m, None) for m in _REF_MODULES}
    sys.path.insert(0, REFERENCE_DIR)
    try:
        ns = types.SimpleNamespace(
            **{m: importlib.import_module(m) for m in _REF_MODULES}
        )
        yield ns
    finally:
        sys.path.remove(REFERENCE_DIR)
        for m, old in saved.items():
            if old is not None:
                sys.modules[m] = old
            else:
                sys.modules.pop(m, None)


def _ref_box(ref, cx, cy, w, h, labelid=0, label=None):
    return ref.utils.Box(
        label, labelid, ref.utils.Point(cx, cy), ref.utils.Size(w, h)
    )


def _random_boxes(rng, n):
    """Random plausible prop-coords boxes (cx, cy, w, h) rows."""
    w = rng.uniform(0.03, 0.6, n)
    h = rng.uniform(0.03, 0.6, n)
    cx = rng.uniform(0.05, 0.95, n)
    cy = rng.uniform(0.05, 0.95, n)
    return np.stack([cx, cy, w, h], axis=1)


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["vgg300", "vgg512"])
def test_anchor_parity_exact(ref, name):
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    ref_anchors = ref.ssdutils.get_anchors_for_preset(
        ref.ssdutils.get_preset_by_name(name)
    )
    ref_arr = np.array(
        [[a.center.x, a.center.y, a.size.w, a.size.h] for a in ref_anchors]
    )
    ours = anchors_for_preset(get_preset_by_name(name))
    assert ours.shape == ref_arr.shape
    np.testing.assert_array_equal(ours, ref_arr.astype(np.float32))


@pytest.mark.parametrize("name", ["vgg300", "vgg512"])
def test_anchor_canvas_corners_exact(ref, name):
    """The integerized 1000-canvas corners every protocol IoU uses."""
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    ref_anchors = ref.ssdutils.get_anchors_for_preset(
        ref.ssdutils.get_preset_by_name(name)
    )
    ref_corners = ref.ssdutils.anchors2array(
        ref_anchors, ref.utils.Size(1000, 1000)
    )
    ours = np.asarray(box_canvas_corners(anchors_for_preset(
        get_preset_by_name(name)
    )))
    np.testing.assert_array_equal(ours, ref_corners)


# ---------------------------------------------------------------------------
# box codec
# ---------------------------------------------------------------------------


def test_codec_encode_parity(ref, rng):
    from ssd_tensorflow_tpu.ops.codec import encode_locations

    boxes = _random_boxes(rng, 50)
    anchors = _random_boxes(rng, 50)
    ref_out = np.stack(
        [
            ref.ssdutils.compute_location(
                _ref_box(ref, *boxes[i]), _ref_box(ref, *anchors[i])
            )
            for i in range(50)
        ]
    )
    ours = np.asarray(
        encode_locations(boxes.astype(np.float32), anchors.astype(np.float32))
    )
    np.testing.assert_allclose(ours, ref_out, rtol=2e-5, atol=2e-5)


def test_codec_decode_parity(ref, rng):
    from ssd_tensorflow_tpu.ops.codec import decode_locations

    offsets = rng.uniform(-30, 30, (50, 4))
    offsets[:5] = rng.uniform(100, 300, (5, 4))  # exercise the >100 clamp
    anchors = _random_boxes(rng, 50)
    ref_rows = []
    for i in range(50):
        center, size = ref.ssdutils.decode_location(
            offsets[i].copy(), _ref_box(ref, *anchors[i])
        )
        ref_rows.append([center.x, center.y, size.w, size.h])
    ours = np.asarray(
        decode_locations(
            offsets.astype(np.float32), anchors.astype(np.float32)
        )
    )
    np.testing.assert_allclose(ours, np.array(ref_rows), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# IoU + matching: the full encoded label tensor
# ---------------------------------------------------------------------------


def test_protocol_iou_parity(ref, rng):
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.iou import canvas_iou
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    anchors = anchors_for_preset(get_preset_by_name("vgg300"))
    ref_anchor_arr = ref.ssdutils.anchors2array(
        ref.ssdutils.get_anchors_for_preset(
            ref.ssdutils.get_preset_by_name("vgg300")
        ),
        ref.utils.Size(1000, 1000),
    )
    boxes = _random_boxes(rng, 50)
    ours = np.asarray(canvas_iou(boxes.astype(np.float32), anchors))
    for i in range(50):
        ref_iou = ref.ssdutils.jaccard_overlap(
            ref.ssdutils.box2array(
                _ref_box(ref, *boxes[i]), ref.utils.Size(1000, 1000)
            ),
            ref_anchor_arr,
        )
        np.testing.assert_allclose(ours[i], ref_iou, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("preset_name", ["vgg300"])
def test_label_encoder_parity(ref, rng, preset_name):
    """ops/matching.encode_targets vs the reference LabelCreatorTransform:
    the full (A, K+5) training tensor on randomized gt sets, including
    crowded images that exercise both conflict-resolution passes."""
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.matching import encode_targets
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    K = 5
    lc = ref.transforms.LabelCreatorTransform(
        preset=ref.ssdutils.get_preset_by_name(preset_name), num_classes=K
    )
    anchors = anchors_for_preset(get_preset_by_name(preset_name))

    mismatches = []
    for case in range(30):
        g = int(rng.integers(1, 12))
        boxes = _random_boxes(rng, g)
        # crowd some cases: overlapping near-duplicates force pass-1/2
        # conflicts between gts
        if case % 3 == 0 and g > 1:
            boxes[1] = boxes[0] + rng.normal(0, 0.01, 4)
            boxes[1, 2:] = np.abs(boxes[1, 2:]) + 0.02
        labels = rng.integers(0, K, g)
        gt = ref.utils.Sample(
            None,
            [
                _ref_box(ref, *boxes[i], labelid=int(labels[i]))
                for i in range(g)
            ],
            None,
        )
        _, ref_vec, _ = lc(None, None, gt)

        ours = np.asarray(
            encode_targets(
                boxes.astype(np.float32),
                labels.astype(np.int32),
                np.ones(g, bool),
                anchors,
                K,
            )
        )
        if not np.allclose(ours, ref_vec, rtol=2e-4, atol=2e-4):
            bad = np.where(
                ~np.isclose(ours, ref_vec, rtol=2e-4, atol=2e-4)
            )
            mismatches.append((case, bad[0][:5], g))
    assert not mismatches, f"label tensors diverge: {mismatches}"


def test_label_encoder_parity_padded_gt(ref, rng):
    """Padded gt rows must not affect the encoding."""
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.matching import encode_targets
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    K = 3
    lc = ref.transforms.LabelCreatorTransform(
        preset=ref.ssdutils.get_preset_by_name("vgg300"), num_classes=K
    )
    anchors = anchors_for_preset(get_preset_by_name("vgg300"))
    boxes = _random_boxes(rng, 4)
    labels = rng.integers(0, K, 4)
    gt = ref.utils.Sample(
        None,
        [_ref_box(ref, *boxes[i], labelid=int(labels[i])) for i in range(2)],
        None,
    )
    _, ref_vec, _ = lc(None, None, gt)
    mask = np.array([True, True, False, False])
    ours = np.asarray(
        encode_targets(
            boxes.astype(np.float32), labels.astype(np.int32), mask,
            anchors, K,
        )
    )
    np.testing.assert_allclose(ours, ref_vec, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def _nms_case(ref, rng, n, num_classes):
    """One random detection set in both representations."""
    boxes = _random_boxes(rng, n)
    # cluster boxes to create real suppressions
    for i in range(1, n, 2):
        boxes[i] = boxes[i - 1] + rng.normal(0, 0.02, 4)
        boxes[i, 2:] = np.abs(boxes[i, 2:]) + 0.02
    confs = rng.permutation(np.linspace(0.1, 0.99, n))  # distinct
    classes = rng.integers(0, num_classes, n)
    ref_dets = [
        (
            confs[i],
            _ref_box(ref, *boxes[i], labelid=int(classes[i])),
        )
        for i in range(n)
    ]
    return boxes, confs, classes, ref_dets


@pytest.mark.parametrize("num_classes", [1, 3])
def test_nms_pick_set_parity(ref, rng, num_classes):
    from ssd_tensorflow_tpu.ops.boxes import box_canvas_corners
    from ssd_tensorflow_tpu.ops.nms import class_aware_keep

    for _ in range(10):
        n = int(rng.integers(4, 40))
        boxes, confs, classes, ref_dets = _nms_case(ref, rng, n, num_classes)
        kept_ref = sorted(
            float(c) for c, _ in ref.ssdutils.suppress_overlaps(ref_dets)
        )

        order = np.argsort(-confs)  # our kernel wants sorted-desc input
        corners = np.asarray(
            box_canvas_corners(boxes[order].astype(np.float32))
        )
        keep = np.asarray(
            class_aware_keep(
                corners, classes[order].astype(np.int32), np.ones(n, bool)
            )
        )
        kept_ours = sorted(float(c) for c in confs[order][keep])
        assert kept_ours == pytest.approx(kept_ref), (
            f"pick sets diverge (n={n}, classes={num_classes})"
        )


# ---------------------------------------------------------------------------
# average precision
# ---------------------------------------------------------------------------


def test_ap_parity(ref, rng):
    """AP values of both calculators on randomized multi-image scenes."""
    from ssd_tensorflow_tpu.eval.average_precision import APCalculator
    from ssd_tensorflow_tpu.types import Box, Point, Size

    names = ["aero", "bike", "bird"]

    def our_box(cx, cy, w, h, lid):
        return Box(names[lid], lid, Point(cx, cy), Size(w, h))

    ref_calc = ref.average_precision.APCalculator()
    our_calc = APCalculator()

    for _img in range(12):
        g = int(rng.integers(0, 5))
        gt_rows = _random_boxes(rng, g)
        gt_lids = rng.integers(0, 3, g)
        d = int(rng.integers(0, 8))
        det_rows = _random_boxes(rng, d)
        # make some detections near-copies of gt (true positives)
        for j in range(min(g, d)):
            if rng.random() < 0.6:
                det_rows[j] = gt_rows[j] + rng.normal(0, 0.01, 4)
                det_rows[j, 2:] = np.abs(det_rows[j, 2:]) + 0.01
        det_lids = rng.integers(0, 3, d)
        det_confs = rng.uniform(0.05, 1.0, d)

        ref_gt = [
            _ref_box(
                ref, *gt_rows[i], labelid=int(gt_lids[i]),
                label=names[gt_lids[i]],
            )
            for i in range(g)
        ]
        ref_dets = [
            (
                float(det_confs[i]),
                _ref_box(
                    ref, *det_rows[i], labelid=int(det_lids[i]),
                    label=names[det_lids[i]],
                ),
            )
            for i in range(d)
        ]
        ref_calc.add_detections(ref_gt, ref_dets)

        our_gt = [our_box(*gt_rows[i], int(gt_lids[i])) for i in range(g)]
        our_dets = [
            (float(det_confs[i]), our_box(*det_rows[i], int(det_lids[i])))
            for i in range(d)
        ]
        our_calc.add_detections(our_gt, our_dets)

    ref_aps = ref_calc.compute_aps()
    our_aps = our_calc.compute_aps()
    assert set(ref_aps) == set(our_aps)
    for k in ref_aps:
        assert our_aps[k] == pytest.approx(ref_aps[k], abs=1e-9), k


# ---------------------------------------------------------------------------
# end-to-end prediction decode: decode_boxes + suppress_overlaps vs detect()
# ---------------------------------------------------------------------------


def test_full_decode_chain_parity(ref, rng):
    """Random (A, K+5) prediction tensors through the reference's
    decode_boxes -> suppress_overlaps chain vs our fused detect():
    same surviving (class, conf, box) sets."""
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, detect
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    K = 4
    preset = get_preset_by_name("vgg300")
    anchors = anchors_for_preset(preset)
    ref_anchors = ref.ssdutils.get_anchors_for_preset(
        ref.ssdutils.get_preset_by_name("vgg300")
    )
    A = anchors.shape[0]

    cfg = DetectionConfig(
        top_k=200, confidence_threshold=0.3, max_detections=200
    )

    for _ in range(5):
        # mostly-background probabilities with a few hot anchors
        logits = rng.normal(0, 1, (A, K + 1))
        logits[:, K] += 4.0  # background prior
        hot = rng.choice(A, 40, replace=False)
        logits[hot, :] = rng.normal(0, 1, (40, K + 1))
        logits[hot, rng.integers(0, K, 40)] += rng.uniform(2, 6, 40)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        locs = rng.normal(0, 2, (A, 4))
        pred = np.concatenate([probs, locs], axis=1).astype(np.float32)

        ref_boxes = ref.ssdutils.decode_boxes(
            pred, ref_anchors, confidence_threshold=cfg.confidence_threshold,
            detections_cap=cfg.top_k,
        )
        ref_final = ref.ssdutils.suppress_overlaps(ref_boxes)[
            : cfg.max_detections
        ]
        want = sorted(
            (int(b.labelid), round(float(c), 4),
             round(b.center.x, 4), round(b.center.y, 4),
             round(b.size.w, 4), round(b.size.h, 4))
            for c, b in ref_final
        )

        dets = detect(jnp.asarray(pred)[None], jnp.asarray(anchors), cfg)
        v = np.asarray(dets.valid[0])
        got = sorted(
            (int(cl), round(float(s), 4),
             round(float(bx[0]), 4), round(float(bx[1]), 4),
             round(float(bx[2]), 4), round(float(bx[3]), 4))
            for cl, s, bx in zip(
                np.asarray(dets.classes[0])[v],
                np.asarray(dets.scores[0])[v],
                np.asarray(dets.boxes[0])[v],
            )
        )
        assert got == want
