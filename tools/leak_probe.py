"""Probe: does per-step device_put of a fresh host batch leak host RSS?

The 300-epoch vgg512 run was OOM-killed at epoch 100 with anon-RSS
126 GB; growth matched ~12.6 MB/step — exactly one staged uint8 batch
per train step. This loop isolates the staging path: device_put a fresh
(16,512,512,3) uint8 array, run a trivial jit reduce on it, drop every
reference, and print our RSS every 50 iterations. Flat RSS = no leak;
~12.6 MB/iter growth reproduces the training leak.

Usage: python tools/leak_probe.py [iters] [--gc] [--delete]
"""

import gc
import sys

import numpy as np

import jax
import jax.numpy as jnp


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    use_gc = "--gc" in sys.argv
    use_delete = "--delete" in sys.argv

    @jax.jit
    def step(x):
        return jnp.sum(x, dtype=jnp.int32)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (16, 512, 512, 3), dtype=np.uint8)

    print(f"[i] backend={jax.default_backend()} iters={iters} "
          f"gc={use_gc} delete={use_delete}")
    out = None
    start = rss_mb()
    for i in range(iters):
        batch = base.copy()  # fresh host buffer each step, like the pipeline
        dev = jax.device_put(batch)
        out = step(dev)
        if use_delete:
            dev.delete()
        del dev, batch
        if use_gc and i % 50 == 0:
            gc.collect()
        if i % 50 == 0:
            print(f"[i] iter {i:4d}: rss {rss_mb():8.1f} MB "
                  f"(+{rss_mb() - start:7.1f})", flush=True)
    # final sync so everything retained only by pending execution can go
    float(out)
    gc.collect()
    print(f"[i] after sync: rss {rss_mb():8.1f} MB (+{rss_mb() - start:.1f})")


if __name__ == "__main__":
    main()
