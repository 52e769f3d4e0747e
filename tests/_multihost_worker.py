"""Worker process for the true multi-process feeding test.

Launched (twice) by tests/test_multihost_multiprocess.py with
``python _multihost_worker.py <process_id> <port> <outfile>``. Each
worker joins a 2-process JAX CPU cluster (4 virtual devices each =
one global 8-device data mesh), feeds ITS shard of a deterministic
global batch through ``make_global_batch`` (the exact path
cli/train.py uses for multi-host feeding), runs one real SPMD train
step, and writes the replicated loss for the parent to compare against
a single-process run of the same batch.
"""

import json
import os
import sys


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    outfile = sys.argv[3]

    # must happen before jax import; conftest-style hard override of the
    # axon TPU pinning
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_TEST_CACHE_DIR", "/tmp/jax_cache_tests")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_TEST_CACHE_DIR"]
    )
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import numpy as np

    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.parallel.mesh import make_mesh
    from ssd_tensorflow_tpu.parallel.multihost import (
        local_rows,
        make_global_batch,
        process_shard,
    )
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_train_state,
        make_train_step,
        shard_state,
    )
    from ssd_tensorflow_tpu.presets import get_preset_by_name

    # deterministic global batch, identical in every process AND in the
    # parent's single-process reference run
    B, G, K = 8, 6, 3
    rng = np.random.default_rng(42)
    global_batch = {
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

    # this host's shard of the sample list -> its local batch rows
    # (cli/train.py shards the sample lists the same way)
    my_rows = process_shard(list(range(B)))
    local = {k: v[my_rows] for k, v in global_batch.items()}

    mesh = make_mesh()  # 8-way data over the GLOBAL device set
    gbatch = make_global_batch(local, mesh)
    assert gbatch["images"].shape == (B, 64, 64, 3)

    # the addressable rows must be exactly what this process fed in
    # (the train CLI's local_rows readback contract)
    np.testing.assert_array_equal(
        local_rows(gbatch["images"]), local["images"]
    )

    cfg = TrainConfig(
        model=ModelConfig(
            preset_name="test64", num_classes=K, compute_dtype="float32"
        ),
        detect=None,
    )
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    anchors = anchors_for_preset(get_preset_by_name("test64"))
    step = make_train_step(cfg, anchors, donate=False)
    state = shard_state(make_train_state(params, cfg), mesh)

    state, losses, _ = step(state, gbatch)
    loss = float(losses["total"])

    with open(outfile, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "loss": loss,
                "rows": my_rows,
                "process_count": jax.process_count(),
            },
            f,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
