#!/usr/bin/env python3
"""Per-block timing of the *shipped int8* vgg512 inference path.

The int8 twin of tools/profile512.py: times cumulative prefixes of the
exact path bench.py's default (quantized) mode runs —
models/quantized._feature_maps_q -> lazy-softmax heads
(_forward_scores) -> decode+NMS — with the chained-in-jit methodology
(see bench.py; per-call sync lies over the tunnel).

Run on the real TPU:  python tools/profile512_int8.py
The per-stage deltas say where the 60.9 ms (b64) goes and whether a
fused int8 stem kernel is worth building: every _qconv pays an
elementwise quantize (f32 round/clip -> int8) of its input and a f32
dequant+bias+relu -> bf16 of its output, so the early high-resolution
layers carry HBM traffic beyond the conv itself.
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
from ssd_tensorflow_tpu.models.layers import l2_normalize_scale, max_pool
from ssd_tensorflow_tpu.models.quantized import (
    _POOL_AFTER,
    _qconv,
    quantize_weights,
)
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    _extra_layer_defs,
    init_params,
    preprocess,
    reduce_head_maps,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, decode_scores
from ssd_tensorflow_tpu.presets import get_preset_by_name


def build_stages(config, act_scales):
    preset = config.preset
    stages = []

    def qblock(names):
        def f(qp, x, s):
            for n in names:
                x = _qconv(qp[n], x, act_scales[n])
                if n == "conv4_3":
                    s = dict(s)
                    s["conv4_3"] = x
                if n in _POOL_AFTER:
                    x = max_pool(x, 2, 2)
            return x, s
        return f

    stages.append(("pre+conv1+pool1", qblock(["conv1_1", "conv1_2"])))
    stages.append(("conv2", qblock(["conv2_1", "conv2_2"])))
    stages.append(("conv3", qblock(["conv3_1", "conv3_2", "conv3_3"])))
    stages.append(("conv4", qblock(["conv4_1", "conv4_2", "conv4_3"])))
    stages.append(("conv5", qblock(["conv5_1", "conv5_2", "conv5_3"])))

    def conv6(qp, x, s):
        x = max_pool(x, 3, 1)
        return _qconv(qp["mod_conv6"], x, act_scales["mod_conv6"],
                      dilation=6), s
    stages.append(("pool5+conv6", conv6))

    def conv7(qp, x, s):
        y = _qconv(qp["mod_conv7"], x, act_scales["mod_conv7"])
        s = dict(s)
        s["maps"] = [
            l2_normalize_scale(s["conv4_3"], qp["l2_norm_conv4_3"]["scale"],
                               eps=config.l2_norm_eps),
            y,
        ]
        return y, s
    stages.append(("conv7+l2n", conv7))

    def extras(qp, x, s):
        s = dict(s)
        maps = list(s["maps"])
        for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
            x = _qconv(qp[name], x, act_scales[name], stride, padding)
            if name == "conv12_1":
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                continue
            if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2",
                        "conv12_2"):
                maps.append(x)
        s["maps"] = maps
        return x, s
    stages.append(("extras", extras))

    def heads(qp, x, s):
        def head_conv(i, fmap):
            y = _qconv(qp[f"classifier{i}"], fmap,
                       act_scales[f"classifier{i}"], relu=False)
            return y.astype(jnp.float32)

        s = dict(s)
        s["scores"] = reduce_head_maps(head_conv, s["maps"], preset, config)
        return s["scores"][0], s
    stages.append(("heads(scores)", heads))

    anchors = jnp.asarray(anchors_for_preset(preset))
    det_cfg = DetectionConfig(top_k=200, confidence_threshold=0.01)

    def decode(qp, x, s):
        conf, cls, locs = s["scores"]
        d = decode_scores(conf, cls, locs, anchors, det_cfg)
        return d.scores, s
    stages.append(("decode+nms", decode))
    return stages


def time_prefix(stages, k, qparams, images, config, iters, repeats):
    from _timing import time_chained

    fns = [f for _, f in stages[:k]]

    def run(qp, x):
        s = {}
        x = preprocess(x, config).astype(jnp.bfloat16)
        for f in fns:
            x, s = f(qp, x, s)
        return jnp.sum(x.astype(jnp.float32))

    return time_chained(run, qparams, images, iters, repeats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="vgg512")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--start", type=int, default=1)
    args = ap.parse_args()

    config = ModelConfig(preset_name=args.preset, num_classes=20)
    params = init_params(jax.random.PRNGKey(0), config)
    qparams = quantize_weights(params)
    # throughput is scale-insensitive (bench.py): fixed unit scales keep
    # this a pure timing tool with no calibration dependency
    names = [n for n, _ in vgg16.VGG_CONV_LAYERS]
    names += ["mod_conv6", "mod_conv7"]
    names += [d[0] for d in _extra_layer_defs(config.preset.num_maps)]
    names += [f"classifier{i}" for i in range(config.preset.num_maps)]
    act_scales = {n: 1.0 for n in names}

    preset = get_preset_by_name(args.preset)
    h, w = preset.image_size.h, preset.image_size.w
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8)
    )

    stages = build_stages(config, act_scales)
    prev = 0.0
    print(f"{'stage':>16} {'cum_ms':>9} {'delta_ms':>9}")
    for k in range(args.start, len(stages) + 1):
        t = time_prefix(stages, k, qparams, images, config,
                        args.iters, args.repeats)
        print(f"{stages[k-1][0]:>16} {t*1e3:9.2f} {(t-prev)*1e3:9.2f}",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
