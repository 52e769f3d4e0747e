"""Pascal VOC source tests on a synthetic VOCdevkit tree."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_tensorflow_tpu.data.sources import load_data_source


def _write_annotation(root, name, size, objects):
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    w, h = size
    objs = "".join(
        f"""
  <object>
    <name>{label}</name>
    <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox>
  </object>"""
        for label, x0, y0, x1, y1 in objects
    )
    xml = f"""<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>{objs}
</annotation>
"""
    with open(os.path.join(root, "Annotations", name + ".xml"), "w") as f:
        f.write(xml)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    cv2.imwrite(os.path.join(root, "JPEGImages", name + ".jpg"), img)


def _write_imageset(root, setname, names):
    d = os.path.join(root, "ImageSets", "Main")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, setname + ".txt"), "w") as f:
        f.writelines(n + "\n" for n in names)


@pytest.fixture
def voc_tree(tmp_path):
    data_dir = str(tmp_path)
    # trainval VOC2007: 2 samples; VOC2012: 2 trainval + 1 extra (-> valid)
    r07 = os.path.join(data_dir, "trainval", "VOCdevkit", "VOC2007")
    r12 = os.path.join(data_dir, "trainval", "VOCdevkit", "VOC2012")
    rt07 = os.path.join(data_dir, "test", "VOCdevkit", "VOC2007")
    rt12 = os.path.join(data_dir, "test", "VOCdevkit", "VOC2012")

    _write_annotation(r07, "000001", (100, 80), [("dog", 10, 10, 50, 60)])
    _write_annotation(r07, "000002", (100, 80), [("cat", 5, 5, 40, 40)])
    _write_imageset(r07, "trainval", ["000001", "000002"])

    _write_annotation(r12, "100001", (200, 150), [("person", 20, 20, 100, 120)])
    _write_annotation(r12, "100002", (200, 150), [("car", 30, 10, 150, 100)])
    _write_annotation(r12, "100003", (200, 150), [("bus", 1, 1, 199, 149)])
    _write_imageset(r12, "trainval", ["100001", "100002"])  # 100003 -> valid

    _write_annotation(rt07, "200001", (60, 60), [("train", 2, 2, 58, 58)])
    _write_imageset(rt07, "test", ["200001"])

    _write_annotation(rt12, "300001", (60, 60), [("sofa", 2, 2, 58, 58)])
    _write_imageset(rt12, "test", ["300001"])
    return data_dir


class TestPascalVOCSource:
    def test_split_policy(self, voc_tree):
        src = load_data_source("pascal_voc")
        src.load_trainval_data(voc_tree, 0.025)
        # train = VOC07 trainval (2) + VOC12 trainval (2) + VOC07 test (1)
        assert src.num_train == 5
        # valid = VOC12 annotations not in trainval list (100003)
        assert src.num_valid == 1
        assert os.path.basename(src.valid_samples[0].filename) == "100003.jpg"

    def test_test_split(self, voc_tree):
        src = load_data_source("pascal_voc")
        src.load_test_data(voc_tree)
        assert src.num_test == 1
        assert os.path.basename(src.test_samples[0].filename) == "300001.jpg"

    def test_box_geometry(self, voc_tree):
        src = load_data_source("pascal_voc")
        src.load_trainval_data(voc_tree, 0)
        s = next(
            x for x in src.train_samples if x.filename.endswith("000001.jpg")
        )
        assert s.imgsize.w == 100 and s.imgsize.h == 80
        box = s.boxes[0]
        assert box.label == "dog"
        assert box.labelid == src.lname2id["dog"]
        # abs2prop of (10, 50, 10, 60) in 100x80
        np.testing.assert_allclose(box.center.x, (10 + 20) / 100)
        np.testing.assert_allclose(box.center.y, (10 + 25) / 80)
        np.testing.assert_allclose(box.size.w, 40 / 100)
        np.testing.assert_allclose(box.size.h, 50 / 80)

    def test_metadata(self, voc_tree):
        src = load_data_source("pascal_voc")
        assert src.num_classes == 20
        assert src.lid2name[0] == "aeroplane"
        assert src.lname2id["tvmonitor"] == 19
        assert len(src.colors) == 20

    def test_unknown_source_raises(self):
        with pytest.raises(ImportError):
            load_data_source("does_not_exist")


class TestSyntheticSource:
    def test_generate_and_contract(self, tmp_path):
        src = load_data_source("synthetic")
        src._counts = (8, 4, 4)  # keep the test fast
        src.load_trainval_data(str(tmp_path), 0.1)
        src.load_test_data(str(tmp_path))
        assert src.num_train == 8
        assert src.num_valid == 4
        assert src.num_test == 4
        s = src.train_samples[0]
        assert os.path.exists(s.filename)
        assert len(s.boxes) >= 1
        b = s.boxes[0]
        assert 0 <= b.labelid < src.num_classes
        assert 0 < b.size.w <= 0.5 and 0 < b.size.h <= 0.5
        # deterministic regeneration
        src2 = load_data_source("synthetic")
        src2._counts = (8, 4, 4)
        src2.load_trainval_data(str(tmp_path), 0.1)
        assert src2.train_samples[0].boxes == src.train_samples[0].boxes
