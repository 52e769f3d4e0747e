"""Shared tunnel-safe device timing.

The remote-TPU tunnel acks dispatches before execution and a per-call
host sync pays a ~34 ms round trip, so honest timing chains N
data-dependent iterations inside ONE jitted fori_loop and fetches a
scalar (see CLAUDE.md / bench.py). Every profiling tool should use this
helper rather than re-implementing the chaining trick.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_chained(run, params, images, iters: int = 10, repeats: int = 2):
    """Best per-iteration wall time of ``run(params, images) -> scalar``.

    ``run`` must return a float-convertible scalar; its output feeds a
    fake data dependency into the next iteration so XLA cannot overlap
    or elide iterations.
    """

    def chained(p, x):
        def body(i, acc):
            return acc + run(p, x + (acc * 0).astype(x.dtype))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    # stage weights on device BEFORE timing: a numpy pytree passed to a
    # jitted fn is re-uploaded every call, which taxes every timed call
    # by the full H2D transfer (bench.py postmortem, docs/PERFORMANCE.md)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    fn = jax.jit(chained)
    float(fn(params, images))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, images))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
