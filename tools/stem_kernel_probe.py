#!/usr/bin/env python3
"""Bisect the fused-stem kernel's cost with stripped variants."""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, wp = 64, 512, 256
T = 16
TILE = 32


def make_call(kernel, n_taps=9):
    return pl.pallas_call(
        partial(kernel, n_taps=n_taps),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 34, wp, 64), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128, 128), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE // 2, wp, 64),
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, TILE // 2, wp, 64),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((34, wp + 2, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def k_copy(a1_ref, w1_ref, w2_ref, out_ref, c1_ref, n_taps=0):
    out_ref[0, 0] = a1_ref[0, 0, :16, :, :]


def k_conv11(a1_ref, w1_ref, w2_ref, out_ref, c1_ref, n_taps=0):
    y1 = jnp.dot(a1_ref[0, 0].reshape(34 * wp, 64), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1).reshape(34, wp, 128)
    out_ref[0, 0] = y1[:16, :, :64].astype(jnp.bfloat16)


def k_conv11_store(a1_ref, w1_ref, w2_ref, out_ref, c1_ref, n_taps=0):
    y1 = jnp.dot(a1_ref[0, 0].reshape(34 * wp, 64), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1).reshape(34, wp, 128)
    c1_ref[:, 1:wp + 1, :] = y1.astype(jnp.bfloat16)
    c1_ref[:, 0:1, :] = jnp.zeros((34, 1, 128), jnp.bfloat16)
    c1_ref[:, wp + 1:wp + 2, :] = jnp.zeros((34, 1, 128), jnp.bfloat16)
    out_ref[0, 0] = c1_ref[:16, 1:wp + 1, :64]


def k_taps(a1_ref, w1_ref, w2_ref, out_ref, c1_ref, n_taps=9):
    y1 = jnp.dot(a1_ref[0, 0].reshape(34 * wp, 64), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1).reshape(34, wp, 128)
    c1_ref[:, 1:wp + 1, :] = y1.astype(jnp.bfloat16)
    c1_ref[:, 0:1, :] = jnp.zeros((34, 1, 128), jnp.bfloat16)
    c1_ref[:, wp + 1:wp + 2, :] = jnp.zeros((34, 1, 128), jnp.bfloat16)
    acc = jnp.zeros((TILE, wp, 128), jnp.float32)
    taps = [(dy, dxp) for dy in range(3) for dxp in range(3)][:n_taps]
    for dy, dxp in taps:
        a = c1_ref[dy:dy + TILE, dxp:dxp + wp, :]
        acc = acc + jax.lax.dot_general(
            a, w2_ref[dy, dxp], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(acc)
    z = jnp.max(y2.reshape(TILE // 2, 2, wp, 128), axis=1)
    out_ref[0, 0] = jnp.maximum(z[:, :, :64], z[:, :, 64:]).astype(jnp.bfloat16)


def k_taps_aligned(a1_ref, w1_ref, w2_ref, out_ref, c1_ref, n_taps=9):
    """taps read at fixed col offset 0 (wrong math, isolates shift cost)"""
    y1 = jnp.dot(a1_ref[0, 0].reshape(34 * wp, 64), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1).reshape(34, wp, 128)
    c1_ref[:, 1:wp + 1, :] = y1.astype(jnp.bfloat16)
    acc = jnp.zeros((TILE, wp, 128), jnp.float32)
    taps = [(dy, dxp) for dy in range(3) for dxp in range(3)][:n_taps]
    for dy, dxp in taps:
        a = c1_ref[dy:dy + TILE, 0:wp, :]
        acc = acc + jax.lax.dot_general(
            a, w2_ref[dy, dxp], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(acc)
    z = jnp.max(y2.reshape(TILE // 2, 2, wp, 128), axis=1)
    out_ref[0, 0] = jnp.maximum(z[:, :, :64], z[:, :, 64:]).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    a1 = jax.jit(lambda k: jax.random.normal(k, (B, T, 34, wp, 64),
                                             jnp.bfloat16))(
        jax.random.PRNGKey(0))
    w1 = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)), jnp.bfloat16)

    variants = [
        ("copy only", k_copy, 0),
        ("conv1_1 matmul", k_conv11, 0),
        ("conv1_1 + c1 store", k_conv11_store, 0),
        ("+1 tap", k_taps, 1),
        ("+3 taps", k_taps, 3),
        ("+9 taps (full)", k_taps, 9),
        ("+9 taps aligned cols", k_taps_aligned, 9),
    ]
    for name, kern, n in variants:
        call = make_call(kern, n)

        def chained(a, w1, w2):
            def body(i, acc):
                out = call(a + (acc * 0).astype(a.dtype), w1, w2)
                return acc + jnp.sum(out[0, 0, 0, :2, :2].astype(jnp.float32))
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        fn = jax.jit(chained)
        float(fn(a1, w1, w2))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(a1, w1, w2))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{name:>24} {best*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
