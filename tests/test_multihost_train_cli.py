"""TRUE 2-process execution of the train CLI's multi-host branches.

tests/test_multihost_multiprocess.py proves the step-level feeding
plumbing; this test runs ``cli/train.main`` itself under
``process_count == 2`` (VERDICT r3 item 4), covering the branches only
multi-host reaches: sample-shard truncation, ``local_rows``
detection/image fetches in the epoch loop, and the
``num_real * n_proc`` loss rescaling.

Construction that makes the runs comparable: the 2-process dataset's
validation list is a duplicated half (``[A,B,C,D,A,B,C,D]``) so each
process's contiguous shard is exactly ``[A,B,C,D]`` — the same list a
single-process run sees in the control dataset — and training runs with
lr=0 so params stay frozen and validation metrics depend only on the
(deterministic) validation pipeline. Then per-process valid mAP and the
TensorBoard validation losses must agree with the single-process run
exactly.

Slow-marked (two subprocess CPU compiles of the full train CLI).
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_multihost_train_cli_worker.py"
)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_dataset(root, n_train, valid_samples=None, n_valid=4):
    """A tiny test64 dataset dir; returns (data_dir, valid_samples)."""
    from ssd_tensorflow_tpu.presets import get_preset_by_name, preset_to_dict
    from ssd_tensorflow_tpu.types import Box, Point, Sample, Size

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(7)

    def make_sample(i):
        img = rng.integers(0, 40, (96, 96, 3), dtype=np.uint8)
        cx, cy, s = rng.uniform(0.35, 0.65), rng.uniform(0.35, 0.65), 0.35
        x0, y0 = int((cx - s / 2) * 96), int((cy - s / 2) * 96)
        x1, y1 = int((cx + s / 2) * 96), int((cy + s / 2) * 96)
        img[y0:y1, x0:x1] = (210, 220, 230)
        path = os.path.join(img_dir, f"img{i:03d}.jpg")
        cv2.imwrite(path, img)
        return Sample(
            path,
            [Box("square", 0, Point(cx, cy), Size(s, s))],
            Size(96, 96),
        )

    train = [make_sample(i) for i in range(n_train)]
    if valid_samples is None:
        valid_samples = [make_sample(100 + i) for i in range(n_valid)]

    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "train-samples.pkl"), "wb") as f:
        pickle.dump(train, f)
    with open(os.path.join(data_dir, "valid-samples.pkl"), "wb") as f:
        pickle.dump(valid_samples, f)
    preset = get_preset_by_name("test64")
    with open(os.path.join(data_dir, "training-data.json"), "w") as f:
        json.dump(
            {
                "preset": preset_to_dict(preset),
                "num-classes": 1,
                "colors": {"square": [0, 0, 255]},
                "lid2name": {"0": "square"},
                "lname2id": {"square": 0},
                "augmentation": {
                    "sampler_trials": 3,
                    "expand_probability": 0.3,
                },
            },
            f,
        )
    return data_dir, valid_samples


def _tb_scalars(tb_dir):
    """tag -> {step: value} from a SummaryWriter event dir."""
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader,
    )
    from tensorboard.compat.proto import event_pb2

    out = {}
    for fname in os.listdir(tb_dir):
        for raw in RawEventFileLoader(os.path.join(tb_dir, fname)).Load():
            ev = event_pb2.Event()
            ev.ParseFromString(raw)
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    out.setdefault(v.tag, {})[ev.step] = v.simple_value
    return out


def test_train_cli_two_process_matches_single(tmp_path):
    pytest.importorskip("tensorboard")
    # --- datasets: doubled valid for the 2-proc run, half for control --
    valid_root = str(tmp_path / "mk")
    data_single, valid_half = _make_dataset(valid_root, n_train=16)
    data_double, _ = _make_dataset(
        str(tmp_path / "mk2"),
        n_train=16,
        valid_samples=valid_half + valid_half,
    )

    # --- 2-process run of the real train CLI ---------------------------
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    workdir = str(tmp_path / "mh")
    os.makedirs(workdir)
    procs, outfiles = [], []
    for pid in range(2):
        out = tmp_path / f"result_{pid}.json"
        outfiles.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER, str(pid), str(port), str(out),
                    data_double, workdir,
                ],
                env=env,
                cwd=str(tmp_path),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1200)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = [json.loads(f.read_text()) for f in outfiles]

    # (a) both processes saw the cluster, split the 16 train samples 8/8,
    # and dispatched identical batch counts (SPMD collectives require it)
    assert all(r["rc"] == 0 for r in results)
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["local_train_samples"] == 8 for r in results)
    assert results[0]["batch_counts"] == results[1]["batch_counts"]
    # 2 epochs x (train: 8 local / 4 local rows = 2, valid: 1)
    assert results[0]["batch_counts"] == [2, 1, 2, 1]

    # --- single-process control run on the half valid set --------------
    import io

    import ssd_tensorflow_tpu.cli.train as train_cli

    tb_single = str(tmp_path / "tb-single")
    buf = io.StringIO()
    real_stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = train_cli.main(
            [
                "--name", str(tmp_path / "proj-single"),
                "--data-dir", data_single,
                "--epochs", "2",
                "--batch-size", "8",
                "--tensorboard-dir", tb_single,
                "--checkpoint-interval", "2",
                "--num-workers", "0",
                "--compute-dtype", "float32",
                "--lr-values", "0;0",
                "--lr-boundaries", "100",
            ]
        )
    finally:
        sys.stdout = real_stdout
    assert rc == 0
    import re

    single_maps = [
        float(m) for m in re.findall(r"valid mAP ([0-9.]+)", buf.getvalue())
    ]

    # (b) frozen params => each process's valid mAP over its shard
    # ([A,B,C,D]) equals the single-process mAP over the same list
    assert results[0]["valid_maps"] == results[1]["valid_maps"]
    assert len(results[0]["valid_maps"]) == 1
    assert results[0]["valid_maps"] == pytest.approx(single_maps, abs=1e-4)

    # ...and the TB validation losses agree: across processes exactly
    # (they are global SPMD means) and with the control run (duplicated
    # global batch has the same per-image mean) — covering the
    # num_real * n_proc rescaling
    tb0 = _tb_scalars(os.path.join(workdir, "tb0"))
    tb1 = _tb_scalars(os.path.join(workdir, "tb1"))
    tbs = _tb_scalars(tb_single)
    for tag in ("validation_total_loss", "validation_confidence_loss",
                "validation_localization_loss"):
        for step in (1, 2):
            assert tb0[tag][step] == pytest.approx(tb1[tag][step], rel=1e-6)
            assert tb0[tag][step] == pytest.approx(tbs[tag][step], rel=1e-4), (
                f"{tag} step {step}: 2-proc {tb0[tag][step]} vs "
                f"single {tbs[tag][step]}"
            )
    # the two processes' training losses are the same global means too
    for step in (1, 2):
        assert tb0["training_total_loss"][step] == pytest.approx(
            tb1["training_total_loss"][step], rel=1e-6
        )
