#!/usr/bin/env python3
"""Headline benchmark: batch-64 fused-NMS inference throughput on one chip.

Measures the full deployed inference path — uint8 BGR batch in,
preprocess + VGG300-SSD forward (bfloat16) + softmax + top-k decode +
class-aware NMS, all inside one jitted program — and prints ONE JSON
line. Baseline: 1000 images/sec/chip on TPU v5e (BASELINE.md).
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--preset", default="vgg300")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--compute-dtype", default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.inference import InferenceModel
    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig

    config = ModelConfig(
        preset_name=args.preset,
        num_classes=20,
        compute_dtype=args.compute_dtype,
    )
    params = init_params(jax.random.PRNGKey(0), config)
    model = InferenceModel(
        params,
        config,
        detection=DetectionConfig(top_k=200, confidence_threshold=0.01),
    )

    h, w = config.preset.image_size.h, config.preset.image_size.w
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8)
    )

    # warmup / compile
    for _ in range(args.warmup):
        result, dets = model.run(images)
    jax.block_until_ready(dets.boxes)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        result, dets = model.run(images)
    jax.block_until_ready(dets.boxes)
    dt = time.perf_counter() - t0

    images_per_sec = args.batch_size * args.iters / dt
    baseline = 1000.0  # img/s/chip target from BASELINE.md
    print(
        json.dumps(
            {
                "metric": f"{args.preset}_batch{args.batch_size}_fused_nms_inference",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
