"""Tests on the committed miniVOC fixture (tests/fixtures/minivoc).

miniVOC is a real-format VOCdevkit tree (tools/make_minivoc.py) standing
in for Pascal VOC, which is not fetchable from this environment
(docs/DATA_ACCESS.md). These tests prove the pascal_voc source, the
reference split policy (source_pascal_voc.py:150-171: VOC07-test used as
training data, unlisted VOC12 annotations as validation), and the
eval-server writer all run on genuine VOC-format data on disk.
"""

import os

import numpy as np
import pytest

pytest.importorskip("cv2")
pytest.importorskip("lxml")

from ssd_tensorflow_tpu.data.sources import load_data_source

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "minivoc")


@pytest.fixture(scope="module")
def src_trainval():
    src = load_data_source("pascal_voc")
    src.load_trainval_data(FIXTURE, valid_fraction=0)
    return src


class TestMiniVOC:
    def test_split_policy_counts(self, src_trainval):
        # train = VOC07 trainval (60) + VOC12 trainval listed (60)
        #       + VOC07 test (30); valid = the 20 unlisted VOC12 annotations
        assert src_trainval.num_train == 150
        assert src_trainval.num_valid == 20
        valid_names = {
            os.path.basename(s.filename) for s in src_trainval.valid_samples
        }
        assert all(n.startswith("2012_") for n in valid_names)

    def test_test_split(self):
        src = load_data_source("pascal_voc")
        src.load_test_data(FIXTURE)
        assert src.num_test == 30
        assert all(
            "VOC2012" in s.filename for s in src.test_samples
        )

    def test_boxes_proportional_and_labeled(self, src_trainval):
        n_boxes = 0
        for s in src_trainval.train_samples:
            assert os.path.exists(s.filename), s.filename
            assert s.imgsize.w in (500, 375, 333)
            for b in s.boxes:
                n_boxes += 1
                assert 0 <= b.labelid < 20
                assert 0.0 <= b.center.x <= 1.0 and 0.0 <= b.center.y <= 1.0
                assert 0.0 < b.size.w <= 1.0 and 0.0 < b.size.h <= 1.0
        assert n_boxes >= 150  # >= 1 object per image

    def test_xml_dims_match_images(self, src_trainval):
        import cv2

        # XML <size> is the source of image dims (no JPEG decode);
        # spot-check 3 images that the pixels agree.
        for s in src_trainval.train_samples[:3]:
            img = cv2.imread(s.filename)
            assert img is not None
            h, w = img.shape[:2]
            assert (s.imgsize.w, s.imgsize.h) == (w, h)

    def test_pascal_summary_on_minivoc(self, tmp_path, src_trainval):
        from ssd_tensorflow_tpu.eval.pascal_summary import PascalSummary
        from ssd_tensorflow_tpu.types import Box, Point, Size

        ps = PascalSummary()
        s = src_trainval.train_samples[0]
        det = Box(
            label=s.boxes[0].label,
            labelid=s.boxes[0].labelid,
            center=Point(0.5, 0.5),
            size=Size(0.4, 0.4),
        )
        ps.add_detections(s.filename, [(0.9, det)], img_size=s.imgsize)
        ps.write_summary(str(tmp_path))
        files = list(tmp_path.glob("comp4_det_test_*.txt"))
        assert len(files) == 1
        line = files[0].read_text().strip().split()
        # fileid conf left top right bottom, 1-based absolute coords
        assert line[0] == os.path.splitext(os.path.basename(s.filename))[0]
        assert float(line[1]) == pytest.approx(0.9)
        assert all(float(v) >= 1 for v in line[2:])
