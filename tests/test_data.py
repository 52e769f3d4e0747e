"""Data pipeline tests: transforms semantics, batching, artifacts."""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ssd_tensorflow_tpu.data import transforms as T
from ssd_tensorflow_tpu.data.pipeline import TrainingData, _SampleProcessor
from ssd_tensorflow_tpu.presets import get_preset_by_name, preset_to_dict
from ssd_tensorflow_tpu.types import Box, Point, Sample, Size


def make_sample(tmp_path, name="img0.jpg", w=120, h=90, boxes=None):
    img = np.random.default_rng(0).integers(
        0, 255, (h, w, 3), dtype=np.uint8
    )
    path = str(tmp_path / name)
    cv2.imwrite(path, img)
    if boxes is None:
        boxes = [Box("cat", 7, Point(0.5, 0.5), Size(0.4, 0.5))]
    return Sample(path, boxes, Size(w, h))


class TestTransforms:
    def test_flip_boxes(self, tmp_path):
        s = make_sample(tmp_path)
        img = cv2.imread(s.filename)
        t = T.HorizontalFlipTransform()
        data, _, gt = t(img, None, s)
        np.testing.assert_array_equal(data, img[:, ::-1])
        assert gt.boxes[0].center.x == pytest.approx(0.5)

        s2 = Sample(s.filename, [Box("c", 0, Point(0.3, 0.4), Size(0.1, 0.1))], s.imgsize)
        _, _, gt2 = t(img, None, s2)
        assert gt2.boxes[0].center.x == pytest.approx(0.7)
        assert gt2.boxes[0].center.y == pytest.approx(0.4)

    def test_expand_keeps_boxes_and_mean_fill(self, tmp_path):
        s = make_sample(tmp_path)
        img = cv2.imread(s.filename)
        t = T.ExpandTransform(max_ratio=3.0, mean_value=[104, 117, 123])
        data, _, gt = t(img, None, s)
        assert data.shape[0] >= img.shape[0]
        assert data.shape[1] >= img.shape[1]
        assert len(gt.boxes) == 1
        # box must still cover the same absolute pixels
        b = gt.boxes[0]
        assert 0 < b.size.w <= 0.4 + 1e-9
        assert gt.imgsize.w == data.shape[1]

    def test_brightness_clamps(self, tmp_path):
        s = make_sample(tmp_path)
        img = np.full((20, 20, 3), 250, np.uint8)
        t = T.BrightnessTransform(delta=32)
        data, _, _ = t(img, None, s)
        assert data.dtype == np.uint8
        assert data.max() <= 255

    def test_sampler_crop_remaps_gt(self, tmp_path):
        import random

        random.seed(42)
        s = make_sample(tmp_path)
        img = cv2.imread(s.filename)
        t = T.build_sampler(0.1, 50)
        out = t(img, None, s)
        assert out is not None
        data, _, gt = out
        assert gt.imgsize.w == data.shape[1]
        assert gt.imgsize.h == data.shape[0]

    def test_sampler_impossible_returns_none(self, tmp_path):
        # min overlap 1.0 with a tiny box is (nearly) unsatisfiable within
        # a handful of trials of a large crop
        import random

        random.seed(1)
        boxes = [Box("cat", 7, Point(0.05, 0.05), Size(0.01, 0.01))]
        s = make_sample(tmp_path, boxes=boxes)
        img = cv2.imread(s.filename)
        t = T.SamplerTransform(
            sample=True,
            min_scale=0.9,
            max_scale=1.0,
            min_aspect_ratio=1.0,
            max_aspect_ratio=1.0,
            min_jaccard_overlap=1.0,
            max_trials=3,
        )
        assert t(img, None, s) is None

    def test_transform_box_center_rule(self):
        # a box whose center leaves the crop is dropped
        box = Box("c", 0, Point(0.1, 0.5), Size(0.1, 0.1))
        orig = Size(100, 100)
        out = T.transform_box(box, orig, Size(50, 100), 0, -40)
        assert out is None
        out2 = T.transform_box(box, orig, Size(50, 100), 0, 0)
        assert out2 is not None

    def test_resize(self, tmp_path):
        s = make_sample(tmp_path)
        img = cv2.imread(s.filename)
        t = T.ResizeTransform(width=300, height=300, algorithms=[cv2.INTER_LINEAR])
        data, _, _ = t(img, None, s)
        assert data.shape == (300, 300, 3)

    def test_train_chain_runs(self, tmp_path):
        preset = get_preset_by_name("vgg300")
        chain = T.build_train_transforms(preset, 20, sampler_trials=5, expand_prob=0.5)
        s = make_sample(tmp_path)
        img, _, gt = T.run_transforms(s, chain)
        assert img.shape == (300, 300, 3)


class TestPipeline:
    def _write_artifacts(self, tmp_path, n_train=10, n_valid=4):
        preset = get_preset_by_name("vgg300")
        samples = [
            make_sample(tmp_path, f"img{i}.jpg")
            for i in range(max(n_train, n_valid))
        ]
        data_dir = tmp_path / "data"
        os.makedirs(data_dir)
        with open(data_dir / "train-samples.pkl", "wb") as f:
            pickle.dump(samples[:n_train], f)
        with open(data_dir / "valid-samples.pkl", "wb") as f:
            pickle.dump(samples[:n_valid], f)
        with open(data_dir / "training-data.json", "w") as f:
            json.dump(
                {
                    "preset": preset_to_dict(preset),
                    "num-classes": 20,
                    "colors": {"cat": [0, 0, 255]},
                    "lid2name": {"7": "cat"},
                    "lname2id": {"cat": 7},
                    "augmentation": {
                        "sampler_trials": 5,
                        "expand_probability": 0.5,
                    },
                },
                f,
            )
        return str(data_dir)

    def test_training_data_metadata(self, tmp_path):
        data_dir = self._write_artifacts(tmp_path)
        td = TrainingData(data_dir)
        assert td.num_train == 10
        assert td.num_valid == 4
        assert td.preset.name == "vgg300"
        assert td.lid2name[7] == "cat"

    def test_train_generator_batches(self, tmp_path):
        data_dir = self._write_artifacts(tmp_path)
        td = TrainingData(data_dir)
        batches = list(td.train_generator(4, num_workers=0))
        assert len(batches) == 2  # 10 // 4, drop_last
        batch, gt_lists, n = batches[0]
        assert batch["images"].shape == (4, 300, 300, 3)
        assert batch["images"].dtype == np.uint8
        assert batch["gt_boxes"].shape == (4, 60, 4)
        assert batch["gt_mask"].any()
        assert n == 4
        assert len(gt_lists) == 4

    def test_valid_generator_pads_last(self, tmp_path):
        data_dir = self._write_artifacts(tmp_path)
        td = TrainingData(data_dir)
        batches = list(td.valid_generator(3, num_workers=0))
        assert len(batches) == 2
        _, _, n_last = batches[-1]
        assert n_last == 1  # 4 = 3 + 1

    def test_parallel_workers_match_serial_shapes(self, tmp_path):
        data_dir = self._write_artifacts(tmp_path)
        td = TrainingData(data_dir)
        batches = list(td.train_generator(5, num_workers=2))
        assert len(batches) == 2
        batch, _, n = batches[0]
        assert batch["images"].shape == (5, 300, 300, 3)
        assert n == 5

    def test_resampling_produces_positive(self, tmp_path):
        data_dir = self._write_artifacts(tmp_path)
        td = TrainingData(data_dir)
        proc = _SampleProcessor(td.preset, 20, td.augmentation, train=True)
        with open(os.path.join(data_dir, "train-samples.pkl"), "rb") as f:
            samples = pickle.load(f)
        img, boxes, labels, mask, gt = proc(samples[0])
        # a 0.4x0.5 centered box must match some anchor
        assert mask.any()


class TestDecodeCache:
    def test_cache_returns_fresh_copies(self, tmp_path):
        import cv2

        path = str(tmp_path / "img.png")
        cv2.imwrite(path, np.full((8, 8, 3), 77, np.uint8))
        gt = Sample(path, [], Size(8, 8))
        loader = T.ImageLoaderTransform()
        T.enable_decode_cache(True)
        try:
            img1, _, _ = loader(None, None, gt)
            assert (img1 == 77).all()
            img1 += 1  # mutating the handed-out copy ...
            img2, _, _ = loader(None, None, gt)
            assert (img2 == 77).all()  # ... must not poison the cache
            assert len(T._DECODE_CACHE) == 1
            # second distinct file
            path2 = str(tmp_path / "img2.png")
            cv2.imwrite(path2, np.zeros((4, 4, 3), np.uint8))
            loader(None, None, Sample(path2, [], Size(4, 4)))
            assert len(T._DECODE_CACHE) == 2
        finally:
            T.enable_decode_cache(False)
        assert len(T._DECODE_CACHE) == 0

    def test_missing_file_raises_and_not_cached(self):
        # an undecodable file fails loudly with its name (a silent None
        # would surface as an opaque AttributeError in a worker) and
        # must not pollute the cache
        T.enable_decode_cache(True)
        try:
            with pytest.raises(ValueError, match="nonexistent.jpg"):
                T.ImageLoaderTransform()(
                    None, None, Sample("/nonexistent.jpg", [], Size(1, 1))
                )
            assert len(T._DECODE_CACHE) == 0
        finally:
            T.enable_decode_cache(False)

    def test_missing_file_raises_without_cache(self):
        with pytest.raises(ValueError, match="nonexistent.jpg"):
            T.ImageLoaderTransform()(
                None, None, Sample("/nonexistent.jpg", [], Size(1, 1))
            )
