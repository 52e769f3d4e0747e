"""COCO source plugin: JSON parsing, split policy, CLI integration.

The COCO source (data/source_coco.py) is a beyond-reference addition
behind the same duck-typed plugin contract as pascal_voc (reference
utils.py:48-54); these tests build a tiny but structurally-faithful
COCO distribution (annotations/instances_*.json + split image dirs)
and run it through the source and the process_dataset CLI.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_tensorflow_tpu.data.sources import load_data_source


def _write_img(path, w, h):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(hash(path) % (2**32))
    cv2.imwrite(path, rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def _coco_json(images, annotations):
    return {
        "images": images,
        "annotations": annotations,
        # non-standard sparse ids, standard names: the source must map
        # by name, not assume contiguous COCO ids
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 18, "name": "dog"},
            {"id": 99, "name": "not-a-coco-class"},
        ],
    }


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    ann_dir = root / "annotations"
    os.makedirs(ann_dir)

    train_images, train_anns = [], []
    for i in range(6):
        fn = f"t{i:03d}.jpg"
        _write_img(str(root / "train2017" / fn), 64, 48)
        train_images.append(
            {"id": i, "file_name": fn, "width": 64, "height": 48}
        )
    # image 0: one person box, one dog box
    train_anns.append({"id": 0, "image_id": 0, "category_id": 1,
                       "bbox": [8, 6, 16, 12], "iscrowd": 0})
    train_anns.append({"id": 1, "image_id": 0, "category_id": 18,
                       "bbox": [32, 24, 16, 12], "iscrowd": 0})
    # image 1: crowd annotation only -> sample dropped
    train_anns.append({"id": 2, "image_id": 1, "category_id": 1,
                       "bbox": [0, 0, 32, 32], "iscrowd": 1})
    # image 2: unknown category only -> sample dropped
    train_anns.append({"id": 3, "image_id": 2, "category_id": 99,
                       "bbox": [0, 0, 32, 32], "iscrowd": 0})
    # image 3: box hanging past the edge -> clamped, kept
    train_anns.append({"id": 4, "image_id": 3, "category_id": 1,
                       "bbox": [56, 40, 20, 20], "iscrowd": 0})
    # image 4: degenerate box (fully outside) -> dropped with the sample
    train_anns.append({"id": 5, "image_id": 4, "category_id": 1,
                       "bbox": [64, 48, 5, 5], "iscrowd": 0})
    # image 5: ordinary box
    train_anns.append({"id": 6, "image_id": 5, "category_id": 18,
                       "bbox": [16, 12, 32, 24], "iscrowd": 0})
    with open(ann_dir / "instances_train2017.json", "w") as f:
        json.dump(_coco_json(train_images, train_anns), f)

    val_images, val_anns = [], []
    for i in range(2):
        fn = f"v{i:03d}.jpg"
        _write_img(str(root / "val2017" / fn), 64, 48)
        val_images.append(
            {"id": i, "file_name": fn, "width": 64, "height": 48}
        )
        val_anns.append({"id": i, "image_id": i, "category_id": 1,
                         "bbox": [10, 10, 20, 20], "iscrowd": 0})
    with open(ann_dir / "instances_val2017.json", "w") as f:
        json.dump(_coco_json(val_images, val_anns), f)

    # test split: images only, no boxes (like COCO's public test set)
    test_images = []
    for i in range(2):
        fn = f"x{i:03d}.jpg"
        _write_img(str(root / "test2017" / fn), 64, 48)
        test_images.append(
            {"id": i, "file_name": fn, "width": 64, "height": 48}
        )
    with open(ann_dir / "image_info_test2017.json", "w") as f:
        json.dump({"images": test_images, "annotations": [],
                   "categories": []}, f)
    return str(root)


class TestCOCOSource:
    def test_plugin_loads_by_name(self):
        src = load_data_source("coco")
        assert src.num_classes == 80
        assert src.lname2id["person"] == 0
        assert len(src.colors) == 80

    def test_trainval_split(self, coco_dir):
        src = load_data_source("coco")
        src.load_trainval_data(coco_dir, 0.1)
        # images 1 (crowd-only), 2 (unknown-class-only), 4 (degenerate)
        # are dropped -> 3 train samples
        assert src.num_train == 3
        assert src.num_valid == 2  # from instances_val2017.json
        names = {os.path.basename(s.filename) for s in src.train_samples}
        assert names == {"t000.jpg", "t003.jpg", "t005.jpg"}

    def test_box_conversion(self, coco_dir):
        src = load_data_source("coco")
        src.load_trainval_data(coco_dir, 0)
        s0 = next(s for s in src.train_samples
                  if s.filename.endswith("t000.jpg"))
        assert len(s0.boxes) == 2
        person = next(b for b in s0.boxes if b.label == "person")
        # bbox [8,6,16,12] in a 64x48 image -> center (16/64, 12/48),
        # size (16/64, 12/48) in proportional coords
        assert person.labelid == 0
        assert abs(person.center.x - 0.25) < 0.02
        assert abs(person.center.y - 0.25) < 0.03
        assert abs(person.size.w - 0.25) < 0.02
        assert abs(person.size.h - 0.25) < 0.03

    def test_clamped_box(self, coco_dir):
        src = load_data_source("coco")
        src.load_trainval_data(coco_dir, 0)
        s3 = next(s for s in src.train_samples
                  if s.filename.endswith("t003.jpg"))
        (b,) = s3.boxes
        # [56,40,20,20] clamped to the 64x48 canvas: x 56..64, y 40..48
        assert b.center.x <= 1.0 and b.center.y <= 1.0
        assert abs((b.center.x + b.size.w / 2) - 1.0) < 1e-6
        assert abs((b.center.y + b.size.h / 2) - 1.0) < 1e-6

    def test_valid_carved_when_no_val_json(self, coco_dir, tmp_path):
        # same train json, no val json -> deterministic tail split
        root = tmp_path / "coco_noval"
        os.makedirs(root / "annotations")
        os.symlink(os.path.join(coco_dir, "train2017"), root / "train2017")
        os.symlink(
            os.path.join(coco_dir, "annotations", "instances_train2017.json"),
            root / "annotations" / "instances_train2017.json",
        )
        src = load_data_source("coco")
        src.load_trainval_data(str(root), 0.34)
        assert src.num_train == 2
        assert src.num_valid == 1
        again = load_data_source("coco")
        again.load_trainval_data(str(root), 0.34)
        assert [s.filename for s in again.valid_samples] == [
            s.filename for s in src.valid_samples
        ]

    def test_test_split_keeps_empty(self, coco_dir):
        src = load_data_source("coco")
        src.load_test_data(coco_dir)
        assert src.num_test == 2
        assert all(s.boxes == [] for s in src.test_samples)

    def test_missing_dir_raises(self, tmp_path):
        src = load_data_source("coco")
        with pytest.raises(RuntimeError, match="No training samples"):
            src.load_trainval_data(str(tmp_path), 0.1)


class TestCocoResultsWriter:
    """eval/coco_results.py — the COCO analog of PascalSummary."""

    def _loaded_source(self, coco_dir):
        src = load_data_source("coco")
        src.load_trainval_data(coco_dir, 0)
        return src

    def test_source_exposes_ids(self, coco_dir):
        src = self._loaded_source(coco_dir)
        t5 = next(s for s in src.train_samples
                  if s.filename.endswith("t005.jpg"))
        assert src.image_ids[t5.filename] == 5
        # the dataset JSON's own (non-standard) ids win ...
        assert src.cat_ids["person"] == 1
        assert src.cat_ids["dog"] == 18
        # ... and classes absent from the JSON fall back to the
        # canonical COCO table (car = 3, toothbrush = 90)
        assert src.cat_ids["car"] == 3
        assert src.cat_ids["toothbrush"] == 90

    def test_gt_round_trips_to_original_bbox(self, coco_dir):
        from ssd_tensorflow_tpu.eval.coco_results import CocoResultsWriter
        from ssd_tensorflow_tpu.types import Size

        src = self._loaded_source(coco_dir)
        writer = CocoResultsWriter(src.image_ids, src.cat_ids)
        t5 = next(s for s in src.train_samples
                  if s.filename.endswith("t005.jpg"))
        writer.add_detections(
            t5.filename, [(0.9, b) for b in t5.boxes], Size(64, 48)
        )
        (r,) = writer.results
        # exactly the numbers instances_train2017.json carries
        assert r == {
            "image_id": 5,
            "category_id": 18,
            "bbox": [16.0, 12.0, 32.0, 24.0],
            "score": pytest.approx(0.9),
        }

    def test_out_of_bounds_detection_is_clamped(self, coco_dir):
        from ssd_tensorflow_tpu.eval.coco_results import CocoResultsWriter
        from ssd_tensorflow_tpu.types import Box, Point, Size

        writer = CocoResultsWriter({}, {"person": 1})
        huge = Box("person", 0, Point(0.5, 0.5), Size(2.0, 2.0))
        writer.add_detections("000007.jpg", [(0.5, huge)], Size(64, 48))
        (r,) = writer.results
        assert r["image_id"] == 7  # numeric-stem fallback
        assert r["bbox"] == [0.0, 0.0, 64.0, 48.0]

    def test_fully_outside_detection_dropped(self, coco_dir):
        from ssd_tensorflow_tpu.eval.coco_results import CocoResultsWriter
        from ssd_tensorflow_tpu.types import Box, Point, Size

        writer = CocoResultsWriter({}, {"person": 1})
        outside = [
            # fully left / above / right / below of the 64x48 canvas
            Box("person", 0, Point(-0.5, 0.5), Size(0.2, 0.2)),
            Box("person", 0, Point(0.5, -0.5), Size(0.2, 0.2)),
            Box("person", 0, Point(1.5, 0.5), Size(0.2, 0.2)),
            Box("person", 0, Point(0.5, 1.5), Size(0.2, 0.2)),
        ]
        writer.add_detections(
            "000001.jpg", [(0.9, b) for b in outside], Size(64, 48)
        )
        assert writer.results == []

    def test_unknown_label_skipped_and_json_written(self, coco_dir, tmp_path):
        from ssd_tensorflow_tpu.eval.coco_results import CocoResultsWriter
        from ssd_tensorflow_tpu.types import Box, Point, Size

        writer = CocoResultsWriter({}, {"person": 1})
        boxes = [
            (0.8, Box("person", 0, Point(0.5, 0.5), Size(0.5, 0.5))),
            (0.7, Box("aeroplane", 1, Point(0.5, 0.5), Size(0.5, 0.5))),
        ]
        writer.add_detections("img_a.jpg", boxes, Size(64, 48))
        assert writer.skipped_labels == {"aeroplane"}
        path = tmp_path / "out" / "coco_results.json"
        writer.write_results(str(path))
        loaded = json.load(open(path))
        assert len(loaded) == 1
        assert loaded[0]["category_id"] == 1
        assert loaded[0]["image_id"] == "img_a"  # non-numeric stem kept


@pytest.mark.e2e
def test_process_dataset_cli_coco(coco_dir):
    from ssd_tensorflow_tpu.cli.process_dataset import main

    rc = main([
        "--data-source", "coco",
        "--data-dir", coco_dir,
        "--validation-fraction", "0.1",
        "--preset", "vgg300",
        "--compute-td", "True",
    ])
    assert rc in (0, None)
    with open(os.path.join(coco_dir, "training-data.json")) as f:
        td = json.load(f)
    assert td["num-classes"] == 80
    assert td["lname2id"]["person"] == 0
