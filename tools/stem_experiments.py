#!/usr/bin/env python3
"""Micro-experiments on the vgg512 stem cost (chained-in-jit timing)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ssd_tensorflow_tpu.models.layers import conv2d, max_pool
from ssd_tensorflow_tpu.models.packed_conv import (
    conv1_block_packed, pack_conv3x3_weights, preprocess_flat,
)
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params

B, H, W = 64, 512, 512
MEAN = (104.0, 117.0, 123.0)


def timeit(name, fn, *args, iters=10, repeats=2):
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + (acc * 0).astype(x.dtype) if j == len(a) - 1 else x
                       for j, x in enumerate(a)))
            return acc + jnp.sum(out.astype(jnp.float32))
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    jf = jax.jit(chained)
    float(jf(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jf(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:>44} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    config = ModelConfig(preset_name="vgg512", num_classes=20)
    params = init_params(jax.random.PRNGKey(0), config)
    w1, b1 = params["conv1_1"]["w"], params["conv1_1"]["b"]
    w2, b2 = params["conv1_2"]["w"], params["conv1_2"]["b"]
    w1p, b1p = pack_conv3x3_weights(w1, b1)
    w2p, b2p = pack_conv3x3_weights(w2, b2)
    w1p, b1p, w2p, b2p = jax.device_put((w1p, b1p, w2p, b2p))

    # generate on device: host RNG for a billion elements takes minutes
    x_packed = jax.jit(
        lambda k: jax.random.normal(k, (B, H, W // 2, 128), jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    x_unpacked = jax.jit(
        lambda k: jax.random.normal(k, (B, H, W, 64), jnp.bfloat16)
    )(jax.random.PRNGKey(2))

    timeit("full packed stem f32out", lambda im: conv1_block_packed(
        params, im, MEAN, "bfloat16", f32_out=True), images)
    timeit("full packed stem bf16out", lambda im: conv1_block_packed(
        params, im, MEAN, "bfloat16", f32_out=False), images)
    timeit("preprocess_flat only", lambda im: preprocess_flat(
        im, MEAN, jnp.bfloat16), images)
    timeit("conv1_1 packed (6->128) f32out", lambda x: jax.nn.relu(
        conv2d(x, w1p, b1p, f32_out=True)),
        preprocess_flat(images, MEAN, jnp.bfloat16))
    timeit("conv1_2 packed (128->128) f32out", lambda x: jax.nn.relu(
        conv2d(x, w2p, b2p, f32_out=True)), x_packed)
    timeit("conv1_2 packed (128->128) bf16out", lambda x: jax.nn.relu(
        conv2d(x, w2p, b2p, f32_out=False)), x_packed)
    timeit("conv1_2 unpacked (64->64) f32out", lambda x: jax.nn.relu(
        conv2d(x, w2, b2, f32_out=True)), x_unpacked)
    timeit("pool1 on packed", lambda y: jnp.maximum(
        lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 1, 1), (1, 2, 1, 1),
                          "SAME")[..., :64],
        lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 1, 1), (1, 2, 1, 1),
                          "SAME")[..., 64:]), x_packed)

    # dense equivalent matmul at same shape, for the MXU ceiling
    a = jax.jit(
        lambda k: jax.random.normal(k, (B * H * W // 2, 128), jnp.bfloat16)
    )(jax.random.PRNGKey(3))
    wd = jnp.asarray(rng.standard_normal((128, 128)), jnp.bfloat16)
    def mm9(x, w):
        acc = jnp.zeros((x.shape[0], 128), jnp.float32)
        for i in range(9):
            # data dependency defeats CSE of the 9 identical matmuls
            acc = acc + jnp.dot(
                x + (acc * 0).astype(x.dtype), w,
                preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)
    timeit("9x dense matmul same shape (MXU ceiling)", mm9, a, wd)


if __name__ == "__main__":
    main()
