#!/usr/bin/env python3
"""Per-stage timing of the SSD forward via cumulative-prefix diffs.

The remote-TPU tunnel acks dispatches before execution, so each prefix
is timed with the chained-in-jit methodology (see bench.py). The diff
between successive prefixes attributes time to the added stage. XLA
optimizes each prefix as a whole, so a diff includes fusion-boundary
effects of the added stage — which is exactly what we want to know.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tensorflow_tpu.models import vgg16
from ssd_tensorflow_tpu.models.layers import (
    conv2d,
    conv_relu,
    l2_normalize_scale,
    max_pool,
)
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    _extra_layer_defs,
    init_params,
    preprocess,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, decode_detections
from ssd_tensorflow_tpu.presets import get_preset_by_name


def build_stages(config: ModelConfig, fine: bool):
    """Returns [(name, fn)] where fn(params, x, state) -> (x, state).

    state carries (conv4_3, maps list) through the pipeline.
    """
    preset = config.preset
    inference = True
    stages = []

    def add(name, f):
        stages.append((name, f))

    add("preprocess", lambda p, x, s: (preprocess(x, config), s))

    pool_after = {"conv1_2", "conv2_2", "conv3_3", "conv4_3"}
    for name, _ in vgg16.VGG_CONV_LAYERS:
        def conv_stage(p, x, s, name=name):
            y = conv_relu(p[name], x, f32_out=inference)
            if name == "conv4_3":
                s = dict(s); s["conv4_3"] = y
            if name in pool_after:
                y = max_pool(y, 2, 2)
            return y, s
        add(name, conv_stage)

    def conv6_stage(p, x, s):
        x = max_pool(x, 3, 1)
        return conv_relu(p["mod_conv6"], x, dilation=6, f32_out=inference), s
    add("pool5+conv6", conv6_stage)

    def conv7_stage(p, x, s):
        y = conv_relu(p["mod_conv7"], x, f32_out=inference)
        s = dict(s)
        s["maps"] = [
            l2_normalize_scale(s["conv4_3"], p["l2_norm_conv4_3"]["scale"]),
            y,
        ]
        return y, s
    add("conv7+l2norm", conv7_stage)

    def extras_stage(p, x, s):
        s = dict(s); maps = list(s["maps"])
        for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
            if name == "conv12_1":
                x = conv_relu(p[name], x, stride, padding, f32_out=inference)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                continue
            x = conv_relu(p[name], x, stride, padding, f32_out=inference)
            if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
                maps.append(x)
        s["maps"] = maps
        return x, s
    add("extras", extras_stage)

    nv = config.num_vars

    def heads_stage(p, x, s):
        outputs = []
        for i, (fmap, m) in enumerate(zip(s["maps"], preset.maps)):
            hp = p[f"classifier{i}"]
            y = conv2d(fmap, hp["w"], hp["b"], f32_out=inference)
            b, h, w, _ = y.shape
            y = y.reshape(b, h * w, m.num_shapes, nv)
            y = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, m.num_shapes * h * w, nv)
            outputs.append(y)
        out = jnp.concatenate(outputs, axis=1).astype(jnp.float32)
        logits = out[:, :, : config.num_classes + 1]
        locs = out[:, :, config.num_classes + 1 :]
        return jnp.concatenate([jax.nn.softmax(logits, -1), locs], -1), s
    add("heads+softmax", heads_stage)

    anchors = jnp.asarray(anchors_for_preset(preset))
    det_cfg = DetectionConfig(top_k=200, confidence_threshold=0.01)
    K = config.num_classes

    def decode_stage(p, r, s):
        d = decode_detections(r[..., : K + 1], r[..., K + 1 :], anchors, det_cfg)
        return d.scores, s
    add("decode+nms", decode_stage)

    if not fine:  # collapse the 13 vgg convs into blocks
        coarse, block, blockname = [], [], None
        groups = {
            "conv1_1": "conv1", "conv1_2": "conv1",
            "conv2_1": "conv2", "conv2_2": "conv2",
            "conv3_1": "conv3", "conv3_2": "conv3", "conv3_3": "conv3",
            "conv4_1": "conv4", "conv4_2": "conv4", "conv4_3": "conv4",
            "conv5_1": "conv5", "conv5_2": "conv5", "conv5_3": "conv5",
        }
        def flush():
            if block:
                fns = list(block)
                def blockfn(p, x, s, fns=fns):
                    for f in fns:
                        x, s = f(p, x, s)
                    return x, s
                coarse.append((blockname, blockfn))
        for name, f in stages:
            g = groups.get(name)
            if g is None:
                flush(); block, blockname = [], None
                coarse.append((name, f))
            elif g == blockname:
                block.append(f)
            else:
                flush(); blockname, block = g, [f]
        flush()
        stages = coarse
    return stages


def time_prefix(stages, k, params, images, iters, repeats):
    from _timing import time_chained

    fns = [f for _, f in stages[:k]]

    def run(p, x):
        s = {}
        for f in fns:
            x, s = f(p, x, s)
        if isinstance(x, tuple):
            x = x[0]
        return jnp.sum(x.astype(jnp.float32))

    return time_chained(run, params, images, iters, repeats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="vgg512")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--fine", action="store_true", help="per-conv, not per-block")
    ap.add_argument("--start", type=int, default=1, help="first prefix index")
    args = ap.parse_args()

    config = ModelConfig(preset_name=args.preset, num_classes=20)
    params = init_params(jax.random.PRNGKey(0), config)
    preset = get_preset_by_name(args.preset)
    h, w = preset.image_size.h, preset.image_size.w
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8)
    )

    stages = build_stages(config, args.fine)
    prev = 0.0
    print(f"{'stage':>16} {'cum_ms':>9} {'delta_ms':>9}")
    for k in range(args.start, len(stages) + 1):
        t = time_prefix(stages, k, params, images, args.iters, args.repeats)
        print(
            f"{stages[k-1][0]:>16} {t*1e3:9.2f} {(t-prev)*1e3:9.2f}",
            flush=True,
        )
        prev = t


if __name__ == "__main__":
    main()
