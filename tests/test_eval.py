"""AP calculator tests: hand-computed PR curves + VOC protocol quirks."""

import numpy as np

from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
from ssd_tensorflow_tpu.eval.pascal_summary import PascalSummary
from ssd_tensorflow_tpu.types import Box, Point, Size


def B(label, cx, cy, w, h):
    return Box(label, 0, Point(cx, cy), Size(w, h))


class TestAPCalculator:
    def test_perfect_detection_single_class(self):
        calc = APCalculator()
        gt = [B("cat", 0.5, 0.5, 0.2, 0.2)]
        det = [(0.9, B("cat", 0.5, 0.5, 0.2, 0.2))]
        calc.add_detections(gt, det)
        aps = calc.compute_aps()
        assert aps["cat"] == 1.0
        assert APs2mAP(aps) == 1.0

    def test_missed_gt_caps_recall(self):
        calc = APCalculator()
        # 2 gt cats, only one detected -> recall tops at 0.5:
        # 11-point AP = (6 * 1.0) / 11 (recall thresholds 0.0-0.5)
        calc.add_detections(
            [B("cat", 0.2, 0.2, 0.1, 0.1), B("cat", 0.8, 0.8, 0.1, 0.1)],
            [(0.9, B("cat", 0.2, 0.2, 0.1, 0.1))],
        )
        aps = calc.compute_aps()
        np.testing.assert_allclose(aps["cat"], 6.0 / 11.0)

    def test_false_positive_precision(self):
        calc = APCalculator()
        # one gt; detections: fp at conf .95, tp at conf .9
        # sorted: [fp, tp] -> prec = [0, 1/2], recall = [0, 1]
        # 11-point: max prec at recall>=r is 0.5 for all r -> AP = 0.5
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [
                (0.95, B("cat", 0.9, 0.9, 0.05, 0.05)),
                (0.90, B("cat", 0.5, 0.5, 0.2, 0.2)),
            ],
        )
        aps = calc.compute_aps()
        np.testing.assert_allclose(aps["cat"], 0.5)

    def test_duplicate_detection_is_fp(self):
        """Second detection of an already-matched gt counts as FP."""
        calc = APCalculator()
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [
                (0.9, B("cat", 0.5, 0.5, 0.2, 0.2)),
                (0.8, B("cat", 0.5, 0.5, 0.2, 0.2)),
            ],
        )
        aps = calc.compute_aps()
        # tp then fp: prec=[1, .5], recall=[1, 1] -> AP = 1.0
        np.testing.assert_allclose(aps["cat"], 1.0)

    def test_global_confidence_ordering_across_images(self):
        """The protocol is order-sensitive across images
        (average_precision.py:49-53): a high-confidence FP in image 2
        must precede a lower-confidence TP in image 1."""
        calc = APCalculator()
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [(0.5, B("cat", 0.5, 0.5, 0.2, 0.2))],  # tp, low conf
        )
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [(0.9, B("cat", 0.1, 0.1, 0.05, 0.05))],  # fp, high conf
        )
        aps = calc.compute_aps()
        # sorted: fp(.9), tp(.5) -> prec=[0,.5], recall=[0,.5]
        # max prec at recall>=0..0.5 = 0.5 (6 pts) -> AP = 3/11
        np.testing.assert_allclose(aps["cat"], 3.0 / 11.0)

    def test_iou_threshold(self):
        calc = APCalculator(minoverlap=0.5)
        # detection shifted enough that IoU < 0.5 -> fp, AP 0
        calc.add_detections(
            [B("cat", 0.3, 0.3, 0.2, 0.2)],
            [(0.9, B("cat", 0.45, 0.45, 0.2, 0.2))],
        )
        aps = calc.compute_aps()
        assert aps["cat"] == 0.0

    def test_clear(self):
        calc = APCalculator()
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [(0.9, B("cat", 0.5, 0.5, 0.2, 0.2))],
        )
        calc.clear()
        assert calc.compute_aps() == {}

    def test_unmatched_class_image_fp(self):
        """Detections in an image whose gt has no boxes of that class."""
        calc = APCalculator()
        calc.add_detections(
            [B("dog", 0.5, 0.5, 0.2, 0.2)],
            [(0.9, B("cat", 0.5, 0.5, 0.2, 0.2))],
        )
        calc.add_detections(
            [B("cat", 0.5, 0.5, 0.2, 0.2)],
            [(0.8, B("cat", 0.5, 0.5, 0.2, 0.2))],
        )
        aps = calc.compute_aps()
        # cat: fp(.9) then tp(.8) -> AP = .5; dog: no detections -> AP 0
        np.testing.assert_allclose(aps["cat"], 0.5)
        np.testing.assert_allclose(aps["dog"], 0.0)
        np.testing.assert_allclose(APs2mAP(aps), 0.25)


class TestPascalSummary:
    def test_format(self, tmp_path):
        ps = PascalSummary()
        ps.add_detections(
            "/data/images/000123.jpg",
            [(0.87, B("cat", 0.5, 0.5, 0.5, 0.5))],
            img_size=Size(200, 100),
        )
        ps.write_summary(str(tmp_path))
        content = (tmp_path / "comp4_det_test_cat.txt").read_text().strip()
        parts = content.split()
        assert parts[0] == "000123"
        assert float(parts[1]) == 0.87
        # box: cx=.5,w=.5 on 200-wide -> xmin=50, +1 -> 51
        assert float(parts[2]) == 51.0
        assert float(parts[3]) == 26.0
        assert float(parts[4]) == 151.0
        assert float(parts[5]) == 76.0

    def test_clamping(self, tmp_path):
        ps = PascalSummary()
        ps.add_detections(
            "x.jpg",
            [(0.5, B("dog", 0.0, 0.0, 0.5, 0.5))],  # extends below 0
            img_size=Size(100, 100),
        )
        ps.write_summary(str(tmp_path))
        parts = (tmp_path / "comp4_det_test_dog.txt").read_text().split()
        assert float(parts[2]) == 1.0  # clamped to 0, +1
        assert float(parts[3]) == 1.0
