"""TRUE multi-process execution of the multi-host feeding path.

tests/test_multihost.py covers the single-process degenerate case; here
``jax.make_array_from_process_local_data`` actually runs with
``process_count == 2``: two subprocesses join a JAX CPU cluster via
``jax.distributed.initialize`` (4 virtual devices each), shard a
deterministic global batch with ``process_shard``, assemble it with
``make_global_batch`` over the global 8-device data mesh (the exact
plumbing cli/train.py uses), and run one real SPMD train step. The
parent runs the SAME batch single-process on its own 8-device mesh and
asserts the losses agree.

Slow-marked (two fresh CPU compiles of the test64 train step).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _expected_single_process_loss():
    """The same batch + params + step on this process's 8-device mesh."""
    import jax

    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.parallel.mesh import make_mesh
    from ssd_tensorflow_tpu.parallel.multihost import make_global_batch
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_train_state,
        make_train_step,
        shard_state,
    )
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    B, G, K = 8, 6, 3
    rng = np.random.default_rng(42)  # must match _multihost_worker.py
    batch = {
        "images": rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8),
        "gt_boxes": np.stack(
            [
                np.stack(
                    [
                        rng.uniform(0.3, 0.7, G),
                        rng.uniform(0.3, 0.7, G),
                        rng.uniform(0.2, 0.5, G),
                        rng.uniform(0.2, 0.5, G),
                    ],
                    axis=1,
                )
                for _ in range(B)
            ]
        ).astype(np.float32),
        "gt_labels": rng.integers(0, K, (B, G)).astype(np.int32),
        "gt_mask": np.ones((B, G), dtype=bool),
    }
    cfg = TrainConfig(
        model=ModelConfig(
            preset_name="test64", num_classes=K, compute_dtype="float32"
        ),
        detect=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    anchors = anchors_for_preset(get_preset_by_name("test64"))
    step = make_train_step(cfg, anchors, donate=False)
    mesh = make_mesh()
    state = shard_state(make_train_state(params, cfg), mesh)
    _, losses, _ = step(state, make_global_batch(batch, mesh))
    return float(losses["total"])


def test_two_process_feeding_matches_single_process(tmp_path):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs, outfiles = [], []
    for pid in range(2):
        out = tmp_path / f"result_{pid}.json"
        outfiles.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(port), str(out)],
                env=env,
                cwd=str(tmp_path),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )

    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(f.read_text()) for f in outfiles]
    # both processes saw the 2-process cluster and split the sample list
    assert all(r["process_count"] == 2 for r in results)
    assert results[0]["rows"] == [0, 1, 2, 3]
    assert results[1]["rows"] == [4, 5, 6, 7]

    # the replicated loss is identical across processes...
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    # ...and matches the single-process run of the same global batch
    expected = _expected_single_process_loss()
    assert np.isfinite(expected)
    assert results[0]["loss"] == pytest.approx(expected, rel=1e-4), (
        f"2-process loss {results[0]['loss']} != single-process {expected}"
    )
