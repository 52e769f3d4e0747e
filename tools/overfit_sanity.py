#!/usr/bin/env python3
"""Training-correctness sanity: overfit a tiny synthetic detection set.

Generates images of colored shapes (3 classes), trains vgg300 from
random init for a few hundred steps on one chip, and reports train mAP.
If matching, loss, gradients, optimizer and decode are all correct, the
model must be able to memorize ~32 images (mAP -> ~1); any wiring bug
(anchor ordering, codec sign, loss masking) keeps mAP near 0.

Usage: python tools/overfit_sanity.py [--steps 300] [--images 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_dataset(n, rng, size=300):
    """Images with 1-2 colored rectangles; class = color."""
    colors = [(40, 40, 220), (40, 220, 40), (220, 40, 40)]  # BGR classes
    images = np.zeros((n, size, size, 3), dtype=np.uint8)
    gt_boxes = np.zeros((n, 4, 4), dtype=np.float32)
    gt_labels = np.zeros((n, 4), dtype=np.int32)
    gt_mask = np.zeros((n, 4), dtype=bool)
    for i in range(n):
        images[i] = rng.integers(0, 60, (size, size, 3))
        for j in range(int(rng.integers(1, 3))):
            cls = int(rng.integers(0, 3))
            w = float(rng.uniform(0.2, 0.5))
            h = float(rng.uniform(0.2, 0.5))
            cx = float(rng.uniform(w / 2, 1 - w / 2))
            cy = float(rng.uniform(h / 2, 1 - h / 2))
            x0, x1 = int((cx - w / 2) * size), int((cx + w / 2) * size)
            y0, y1 = int((cy - h / 2) * size), int((cy + h / 2) * size)
            images[i, y0:y1, x0:x1] = colors[cls]
            gt_boxes[i, j] = (cx, cy, w, h)
            gt_labels[i, j] = cls
            gt_mask[i, j] = True
    return images, gt_boxes, gt_labels, gt_mask


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--images", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--compute-dtype", default="bfloat16")
    parser.add_argument("--map-target", type=float, default=0.5)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.postprocess import (
        DetectionConfig,
        detections_to_boxes,
    )
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_eval_step,
        make_train_state,
        make_train_step,
    )
    from ssd_tensorflow_tpu.presets import get_preset_by_name
    from ssd_tensorflow_tpu.types import Box, Point, Size

    rng = np.random.default_rng(7)
    images, gt_boxes, gt_labels, gt_mask = make_dataset(args.images, rng)

    cfg = TrainConfig(
        model=ModelConfig(
            preset_name="vgg300", num_classes=3, compute_dtype=args.compute_dtype
        ),
        lr_values=(args.lr,),
        lr_boundaries=(),
        detect=None,
    )
    anchors = anchors_for_preset(get_preset_by_name("vgg300"))
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    state = make_train_state(params, cfg)
    train_step = make_train_step(cfg, anchors)
    eval_cfg = TrainConfig(
        model=cfg.model,
        detect=DetectionConfig(top_k=64, confidence_threshold=0.3),
    )
    eval_step = make_eval_step(eval_cfg, anchors)

    batch = {
        "images": jnp.asarray(images[: args.batch_size]),
        "gt_boxes": jnp.asarray(gt_boxes[: args.batch_size]),
        "gt_labels": jnp.asarray(gt_labels[: args.batch_size]),
        "gt_mask": jnp.asarray(gt_mask[: args.batch_size]),
    }

    t0 = time.time()
    for s in range(args.steps):
        state, losses, _ = train_step(state, batch)
        if (s + 1) % 50 == 0:
            print(
                f"[i] step {s + 1}: total={float(losses['total']):.4f} "
                f"conf={float(losses['confidence']):.4f} "
                f"loc={float(losses['localization']):.4f} "
                f"({(time.time() - t0):.0f}s)"
            )

    # evaluate on the training images (memorization check)
    _, dets = eval_step(state.params, batch)
    lid2name = {0: "red", 1: "green", 2: "blue"}
    boxes_list = detections_to_boxes(dets, lid2name)

    calc = APCalculator()
    for i in range(args.batch_size):
        gt = [
            Box(
                lid2name[int(gt_labels[i, j])],
                int(gt_labels[i, j]),
                Point(*gt_boxes[i, j, :2]),
                Size(*gt_boxes[i, j, 2:]),
            )
            for j in range(4)
            if gt_mask[i, j]
        ]
        calc.add_detections(gt, boxes_list[i])
    aps = calc.compute_aps()
    mAP = APs2mAP(aps)
    print(f"[i] APs: { {k: round(v, 3) for k, v in aps.items()} }")
    print(f"[i] train mAP after {args.steps} steps: {mAP:.4f}")
    if mAP < args.map_target:
        print(f"[!] FAIL: mAP {mAP:.3f} < target {args.map_target}")
        return 1
    print("[i] PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
