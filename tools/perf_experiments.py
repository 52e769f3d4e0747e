#!/usr/bin/env python3
"""One-off timing experiments for the vgg512 inference path.

Usage: python tools/perf_experiments.py <variant> [batch]
Variants: f32out (current), bf16out, f32compute
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_model,
    init_params,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, decode_detections
from ssd_tensorflow_tpu.presets import get_preset_by_name


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "f32out"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    preset = sys.argv[3] if len(sys.argv) > 3 else "vgg512"
    iters, repeats = 10, 3

    dtype = "float32" if variant == "f32compute" else "bfloat16"
    inference = variant == "f32out"
    config = ModelConfig(preset_name=preset, num_classes=20, compute_dtype=dtype)
    params = init_params(jax.random.PRNGKey(0), config)
    anchors = jnp.asarray(anchors_for_preset(get_preset_by_name(preset)))
    det_cfg = DetectionConfig(top_k=200, confidence_threshold=0.01)
    K = config.num_classes

    h, w = config.preset.image_size.h, config.preset.image_size.w
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, h, w, 3), dtype=np.uint8))

    def one_step(p, x):
        logits, locs = apply_model(p, x, config, inference=inference)
        r = jnp.concatenate([jax.nn.softmax(logits, -1), locs], -1)
        d = decode_detections(r[..., : K + 1], r[..., K + 1 :], anchors, det_cfg)
        return d.scores.sum()

    def chained(p, x):
        def body(i, acc):
            return acc + one_step(p, x + (acc * 0).astype(x.dtype))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    fn = jax.jit(chained)
    float(fn(params, images))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, images))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(
        f"{preset} b{batch} {variant}: {best*1e3:.2f} ms/batch, "
        f"{batch/best:.0f} img/s"
    )


if __name__ == "__main__":
    main()
