"""Checkpoint + TensorBoard writer tests."""

import os
import struct

import numpy as np
import pytest

import jax

from ssd_tensorflow_tpu.utils.checkpoint import (
    CheckpointManager,
    checkpoint_config,
    find_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ssd_tensorflow_tpu.utils.tensorboard import (
    SummaryWriter,
    _crc32c,
    _masked_crc,
    _varint,
)


def _tiny_state():
    return {
        "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "step": np.int32(17),
    }


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = _tiny_state()
        path = str(tmp_path / "e5.ckpt.npz")
        save_checkpoint(path, state, {"preset": "vgg300"})
        template = jax.tree_util.tree_map(np.zeros_like, state)
        restored = restore_checkpoint(path, template)
        np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
        assert restored["step"] == 17
        assert checkpoint_config(path)["preset"] == "vgg300"

    def test_shape_mismatch_raises(self, tmp_path):
        state = _tiny_state()
        path = str(tmp_path / "e1.ckpt.npz")
        save_checkpoint(path, state)
        bad = {"params": {"w": np.zeros((2, 2), np.float32)}, "step": np.int32(0)}
        with pytest.raises(ValueError):
            restore_checkpoint(path, bad)

    def test_find_checkpoint_highest(self, tmp_path):
        for e in (5, 10, 2):
            save_checkpoint(str(tmp_path / f"e{e}.ckpt.npz"), _tiny_state())
        path, epoch = find_checkpoint(str(tmp_path))
        assert epoch == 10
        path, epoch = find_checkpoint(str(tmp_path), epoch=5)
        assert epoch == 5
        path, epoch = find_checkpoint(str(tmp_path), epoch=99)
        assert path is None

    def test_manager_async_and_prune(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), {"a": 1}, max_to_keep=2)
        for e in (1, 2, 3, 4):
            mgr.save(e, _tiny_state())
        mgr.wait()
        left = sorted(os.listdir(tmp_path))
        assert "e3.ckpt.npz" in left and "e4.ckpt.npz" in left
        assert "e1.ckpt.npz" not in left
        mgr.save(5, _tiny_state(), final=True)
        mgr.wait()
        assert "final.ckpt.npz" in os.listdir(tmp_path)

    def test_resume_from_lone_final(self, tmp_path):
        """A completed run may leave only final.ckpt.npz; the stored
        epoch makes --continue-training work (VERDICT r1 item 10)."""
        mgr = CheckpointManager(str(tmp_path), {"a": 1}, max_to_keep=2)
        mgr.save(42, _tiny_state(), final=True)
        mgr.wait()
        assert os.listdir(tmp_path) == ["final.ckpt.npz"]
        path, epoch = find_checkpoint(str(tmp_path))
        assert path.endswith("final.ckpt.npz")
        assert epoch == 42

    def test_final_newer_than_interval_files_wins(self, tmp_path):
        """A graceful shutdown stamps the reached epoch only into
        final.ckpt.npz; resume must prefer it over an older e{N} file
        (with default --checkpoint-interval 5 the interval file can be
        up to 4 epochs stale)."""
        mgr = CheckpointManager(str(tmp_path), {"a": 1}, max_to_keep=2)
        mgr.save(5, _tiny_state())
        mgr.save(7, _tiny_state(), final=True)  # SIGTERM during epoch 8
        mgr.wait()
        path, epoch = find_checkpoint(str(tmp_path))
        assert path.endswith("final.ckpt.npz")
        assert epoch == 7

    def test_interval_file_newer_than_final_wins(self, tmp_path):
        # resumed-then-re-killed runs can leave a stale final.ckpt.npz
        mgr = CheckpointManager(str(tmp_path), {"a": 1}, max_to_keep=2)
        mgr.save(7, _tiny_state(), final=True)
        mgr.save(10, _tiny_state())
        mgr.wait()
        path, epoch = find_checkpoint(str(tmp_path))
        assert path.endswith("e10.ckpt.npz")
        assert epoch == 10

    def test_lone_final_without_epoch_metadata(self, tmp_path):
        # pre-item-10 checkpoints carry no epoch; resume degrades cleanly
        save_checkpoint(str(tmp_path / "final.ckpt.npz"), _tiny_state())
        path, epoch = find_checkpoint(str(tmp_path))
        assert path.endswith("final.ckpt.npz")
        assert epoch is None


def _read_records(path):
    """Parse TFRecord framing, verifying CRCs."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            records.append(payload)
    return records


class TestTensorBoard:
    def test_crc32c_known_values(self):
        # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
        assert _crc32c(b"\x00" * 32) == 0x8A9136AA
        assert _crc32c(b"123456789") == 0xE3069283

    def test_varint(self):
        assert _varint(0) == b"\x00"
        assert _varint(127) == b"\x7f"
        assert _varint(128) == b"\x80\x01"
        assert _varint(300) == b"\xac\x02"

    def test_records_wellformed(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("loss", 1.5, 1)
        w.add_scalar("loss", 1.2, 2)
        w.add_histogram("weights", np.random.default_rng(0).normal(size=100), 1)
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        w.add_image("sample", img, 1)
        w.flush()
        files = os.listdir(tmp_path)
        assert len(files) == 1
        records = _read_records(os.path.join(tmp_path, files[0]))
        # file_version event + 4 summaries
        assert len(records) == 5
        assert b"brain.Event:2" in records[0]
        assert b"loss" in records[1]

    def test_tensorboard_can_parse(self, tmp_path):
        """Cross-check with the real TensorBoard event parser if present."""
        try:
            from tensorboard.backend.event_processing.event_file_loader import (
                RawEventFileLoader,
            )
            from tensorboard.compat.proto import event_pb2
        except ImportError:
            pytest.skip("tensorboard not installed")
        w = SummaryWriter(str(tmp_path))
        w.add_scalar("metric/x", 3.25, 7)
        w.flush()
        fname = os.path.join(tmp_path, os.listdir(tmp_path)[0])
        events = []
        for raw in RawEventFileLoader(fname).Load():
            ev = event_pb2.Event()
            ev.ParseFromString(raw)
            events.append(ev)
        assert len(events) == 2
        assert events[1].step == 7
        assert events[1].summary.value[0].tag == "metric/x"
        assert events[1].summary.value[0].simple_value == pytest.approx(3.25)


class TestOrbaxBackend:
    def test_save_restore_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from ssd_tensorflow_tpu.utils.checkpoint_orbax import (
            OrbaxCheckpointManager,
        )

        state = {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.int32(3),
        }
        mgr = OrbaxCheckpointManager(str(tmp_path / "ckpt"), {"x": 1}, max_to_keep=2)
        mgr.save(1, state)
        state2 = {
            "params": {"w": state["params"]["w"] * 2},
            "step": np.int32(7),
        }
        mgr.save(2, state2)
        mgr.wait()
        assert mgr.latest_epoch() == 2
        template = jax.tree_util.tree_map(np.zeros_like, state)
        restored = mgr.restore(template)
        np.testing.assert_array_equal(
            restored["params"]["w"], state2["params"]["w"]
        )
        assert int(restored["step"]) == 7
        mgr.close()


class TestTensorBoardFullParse:
    def test_histogram_and_image_parse(self, tmp_path):
        """Histogram and image events must parse with the real TB protos."""
        try:
            from tensorboard.backend.event_processing.event_file_loader import (
                RawEventFileLoader,
            )
            from tensorboard.compat.proto import event_pb2
        except ImportError:
            pytest.skip("tensorboard not installed")
        w = SummaryWriter(str(tmp_path))
        values = np.random.default_rng(0).normal(size=500)
        w.add_histogram("h/w1", values, 3)
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[2:6, 2:6] = 255
        w.add_image("img/x", img, 4)
        w.flush()
        fname = os.path.join(tmp_path, os.listdir(tmp_path)[0])
        events = []
        for raw in RawEventFileLoader(fname).Load():
            ev = event_pb2.Event()
            ev.ParseFromString(raw)
            events.append(ev)
        hist = events[1].summary.value[0]
        assert hist.tag == "h/w1"
        assert hist.histo.num == 500
        assert hist.histo.min == pytest.approx(values.min())
        assert hist.histo.max == pytest.approx(values.max())
        assert abs(hist.histo.sum - values.sum()) < 1e-6
        imgv = events[2].summary.value[0]
        assert imgv.tag == "img/x"
        assert imgv.image.height == 8
        assert imgv.image.width == 8
        assert imgv.image.encoded_image_string.startswith(b"\x89PNG")


class TestLossSummary:
    def test_normalizes_by_seen_samples(self, tmp_path):
        """drop_last means fewer samples than the dataset size reach
        add(); push() must divide by what it actually saw, or the
        reported loss reads systematically low."""
        from ssd_tensorflow_tpu.utils.summaries import LossSummary

        w = SummaryWriter(str(tmp_path))
        # dataset nominally 1000 samples, but only 960 accumulated
        ls = LossSummary(w, "training", 1000)
        for _ in range(15):
            ls.add(
                {"total": 2.0, "localization": 1.0,
                 "confidence": 0.5, "l2": 0.25},
                64,
            )
        ls.push(1)
        # accumulators reset for the next epoch
        assert ls.seen == 0
        w.flush()
        records = _read_records(
            os.path.join(tmp_path, os.listdir(tmp_path)[0])
        )
        # 2.0 * 960 / 960 == 2.0 — the old /1000 behavior would give 1.92
        total = next(r for r in records if b"training_total_loss" in r)
        assert struct.pack("<f", 2.0) in total
