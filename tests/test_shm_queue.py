"""Shared-memory batch queue tests."""

import multiprocessing as mp

import numpy as np
import pytest

from ssd_tensorflow_tpu.data.shm_queue import ShmBatchQueue

SPECS = {
    "images": ((2, 8, 8, 3), np.uint8),
    "gt_boxes": ((2, 4, 4), np.float32),
}


def _make_batch(seed):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8),
        "gt_boxes": rng.normal(size=(2, 4, 4)).astype(np.float32),
    }


class TestShmBatchQueue:
    def test_roundtrip_same_process(self):
        q = ShmBatchQueue(SPECS, maxsize=2)
        try:
            b = _make_batch(0)
            q.put(b, aux={"n": 2})
            out, aux = q.get()
            assert aux == {"n": 2}
            np.testing.assert_array_equal(out["images"], b["images"])
            np.testing.assert_array_equal(out["gt_boxes"], b["gt_boxes"])
        finally:
            q.close()

    def test_slot_recycling(self):
        q = ShmBatchQueue(SPECS, maxsize=2)
        try:
            for i in range(6):  # 3x the pool size
                q.put(_make_batch(i))
                out, _ = q.get()
                np.testing.assert_array_equal(
                    out["images"], _make_batch(i)["images"]
                )
        finally:
            q.close()

    def test_shape_validation(self):
        q = ShmBatchQueue(SPECS, maxsize=1)
        try:
            bad = _make_batch(0)
            bad["images"] = bad["images"][:1]
            with pytest.raises(ValueError):
                q.put(bad)
        finally:
            q.close()

    def test_cross_process(self):
        ctx = mp.get_context("fork")
        q = ShmBatchQueue(SPECS, maxsize=2, ctx=ctx)

        def producer(queue):
            for i in range(4):
                queue.put(_make_batch(i), aux=i)

        try:
            p = ctx.Process(target=producer, args=(q,))
            p.start()
            got = {}
            for _ in range(4):
                batch, aux = q.get(timeout=10)
                got[aux] = batch
            p.join()
            for i in range(4):
                np.testing.assert_array_equal(
                    got[i]["images"], _make_batch(i)["images"]
                )
        finally:
            q.close()


class TestPipelineShm:
    def test_shm_generator(self, tmp_path):
        pytest.importorskip("cv2")
        import json
        import os
        import pickle

        from ssd_tensorflow_tpu.data.pipeline import TrainingData
        from ssd_tensorflow_tpu.presets import get_preset_by_name, preset_to_dict
        from ssd_tensorflow_tpu.types import Box, Point, Sample, Size

        import cv2

        samples = []
        for i in range(6):
            img = np.random.default_rng(i).integers(
                0, 255, (60, 80, 3), dtype=np.uint8
            )
            path = str(tmp_path / f"i{i}.jpg")
            cv2.imwrite(path, img)
            samples.append(
                Sample(
                    path,
                    [Box("cat", 0, Point(0.5, 0.5), Size(0.5, 0.5))],
                    Size(80, 60),
                )
            )
        data_dir = tmp_path / "d"
        os.makedirs(data_dir)
        for name, part in (("train", samples), ("valid", samples[:2])):
            with open(data_dir / f"{name}-samples.pkl", "wb") as f:
                pickle.dump(part, f)
        with open(data_dir / "training-data.json", "w") as f:
            json.dump(
                {
                    "preset": preset_to_dict(get_preset_by_name("vgg300")),
                    "num-classes": 1,
                    "colors": {"cat": [0, 0, 255]},
                    "lid2name": {"0": "cat"},
                    "lname2id": {"cat": 0},
                    "augmentation": {"sampler_trials": 3, "expand_probability": 0.3},
                },
                f,
            )
        td = TrainingData(str(data_dir))
        batches = list(td.train_generator(3, num_workers=2, use_shm=True))
        assert len(batches) == 2
        batch, gt_lists, n = batches[0]
        assert batch["images"].shape == (3, 300, 300, 3)
        assert n == 3
        assert len(gt_lists) == 3


class TestWorkerDeath:
    def test_epoch_completes_after_sigkill(self, tmp_path):
        """SIGKILL one augmentation worker mid-epoch: the supervisor must
        re-queue the lost chunk and the epoch must still deliver every
        batch (the reference hangs forever here — SURVEY §5)."""
        pytest.importorskip("cv2")
        import json
        import os
        import pickle
        import signal

        import cv2

        from ssd_tensorflow_tpu.data.pipeline import TrainingData
        from ssd_tensorflow_tpu.presets import get_preset_by_name, preset_to_dict
        from ssd_tensorflow_tpu.types import Box, Point, Sample, Size

        samples = []
        img_dir = tmp_path / "imgs"
        os.makedirs(img_dir)
        for i in range(16):
            img = np.random.default_rng(i).integers(
                0, 255, (60, 80, 3), dtype=np.uint8
            )
            path = str(img_dir / f"s{i}.jpg")
            cv2.imwrite(path, img)
            samples.append(
                Sample(
                    path,
                    [Box("cat", 0, Point(0.5, 0.5), Size(0.5, 0.5))],
                    Size(80, 60),
                )
            )
        data_dir = tmp_path / "d"
        os.makedirs(data_dir)
        for name, part in (("train", samples), ("valid", samples[:2])):
            with open(data_dir / f"{name}-samples.pkl", "wb") as f:
                pickle.dump(part, f)
        with open(data_dir / "training-data.json", "w") as f:
            json.dump(
                {
                    "preset": preset_to_dict(get_preset_by_name("test64")),
                    "num-classes": 1,
                    "colors": {"cat": [0, 0, 255]},
                    "lid2name": {"0": "cat"},
                    "lname2id": {"cat": 0},
                    "augmentation": {
                        "sampler_trials": 3,
                        "expand_probability": 0.3,
                    },
                },
                f,
            )
        td = TrainingData(str(data_dir))

        before = set(p.pid for p in mp.active_children())
        gen = td.train_generator(2, num_workers=2, use_shm=True)
        batches = [next(gen)]
        victims = [
            p for p in mp.active_children() if p.pid not in before
        ]
        assert victims, "expected live shm workers"
        os.kill(victims[0].pid, signal.SIGKILL)

        batches.extend(gen)
        assert len(batches) == 8  # 16 samples / batch 2: every chunk arrived
        for batch, gt_lists, n in batches:
            assert batch["images"].shape == (2, 64, 64, 3)
            assert n == 2
