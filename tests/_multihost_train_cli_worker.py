"""Worker for the true 2-process train-CLI test.

Launched (twice) by tests/test_multihost_train_cli.py with
``python _multihost_train_cli_worker.py <pid> <port> <outfile> <data_dir>
<workdir>``. Each worker joins a 2-process JAX CPU cluster (4 virtual
devices each = one global 8-device mesh) and runs the REAL
``cli/train.main`` — exercising the n_proc>1 branches: sample-shard
truncation (cli/train.py), local_rows detection/image fetch, and the
``num_real * n_proc`` loss rescaling. It records per-generator batch
counts and the printed per-epoch valid mAP for the parent to compare
against a single-process run of the same data.
"""

import io
import json
import os
import re
import sys


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    outfile = sys.argv[3]
    data_dir = sys.argv[4]
    workdir = sys.argv[5]

    # conftest-style hard override of the axon TPU pinning; must happen
    # before jax import
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
    assert len(jax.devices()) == 8

    import ssd_tensorflow_tpu.cli.train as train_cli

    # count the batches each generator actually yields (per epoch:
    # train, then valid)
    batch_counts = []
    orig_prefetch = train_cli.prefetch_to_device

    def counting_prefetch(gen, **kw):
        def run():
            n = 0
            for item in orig_prefetch(gen, **kw):
                n += 1
                yield item
            batch_counts.append(n)

        return run()

    train_cli.prefetch_to_device = counting_prefetch

    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        rc = train_cli.main(
            [
                "--name", os.path.join(workdir, f"proj{process_id}"),
                "--data-dir", data_dir,
                "--epochs", "2",
                "--batch-size", "8",
                "--tensorboard-dir", os.path.join(workdir, f"tb{process_id}"),
                "--checkpoint-interval", "2",
                "--num-workers", "0",
                "--compute-dtype", "float32",
                # lr=0 freezes the params: validation losses/mAP become
                # order-independent and comparable to a single-process run
                "--lr-values", "0;0",
                "--lr-boundaries", "100",
            ]
        )
    finally:
        sys.stdout = stdout
    log = buf.getvalue()
    sys.stdout.write(log)

    valid_maps = [float(m) for m in re.findall(r"valid mAP ([0-9.]+)", log)]
    with open(outfile, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "rc": rc,
                "batch_counts": batch_counts,
                "valid_maps": valid_maps,
                "process_count": jax.process_count(),
                "local_train_samples": int(
                    re.search(r"(\d+) local train samples", log).group(1)
                ),
            },
            f,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
