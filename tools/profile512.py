#!/usr/bin/env python3
"""Per-block timing of the *shipped* vgg512 inference path.

Unlike tools/layer_profile.py (which times the unpacked reference-shaped
stages), this times cumulative prefixes of the exact path bench.py runs:
packed stem -> VGG blocks -> a-trous conv6/7 -> extras -> lazy-softmax
heads -> decode+NMS. Chained-in-jit methodology (see bench.py).
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
from ssd_tensorflow_tpu.models.layers import conv_relu, conv2d, max_pool, l2_normalize_scale
from ssd_tensorflow_tpu.models.packed_conv import conv1_block_packed
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig, _extra_layer_defs, init_params,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, decode_scores
from ssd_tensorflow_tpu.presets import get_preset_by_name


def build_stages(config):
    preset = config.preset
    inf = True
    stages = []

    def vgg_block(names, pool_last=True):
        def f(p, x, s):
            for n in names:
                x = conv_relu(p[n], x, f32_out=inf)
                if n == "conv4_3":
                    s = dict(s); s["conv4_3"] = x
            if pool_last:
                x = max_pool(x, 2, 2)
            return x, s
        return f

    stages.append(("stem(pre+c1+p1)", lambda p, x, s: (
        conv1_block_packed(p, x, config.mean_bgr, config.compute_dtype, f32_out=inf), s)))
    stages.append(("conv2", vgg_block(["conv2_1", "conv2_2"])))
    stages.append(("conv3", vgg_block(["conv3_1", "conv3_2", "conv3_3"])))
    stages.append(("conv4", vgg_block(["conv4_1", "conv4_2", "conv4_3"])))
    stages.append(("conv5", vgg_block(["conv5_1", "conv5_2", "conv5_3"], pool_last=False)))

    def conv6(p, x, s):
        x = max_pool(x, 3, 1)
        return conv_relu(p["mod_conv6"], x, dilation=6, f32_out=inf), s
    stages.append(("pool5+conv6", conv6))

    def conv7(p, x, s):
        y = conv_relu(p["mod_conv7"], x, f32_out=inf)
        s = dict(s)
        s["maps"] = [l2_normalize_scale(s["conv4_3"], p["l2_norm_conv4_3"]["scale"]), y]
        return y, s
    stages.append(("conv7+l2n", conv7))

    def extras(p, x, s):
        s = dict(s); maps = list(s["maps"])
        for name, _, _, stride, padding in _extra_layer_defs(preset.num_maps):
            if name == "conv12_1":
                x = conv_relu(p[name], x, stride, padding, f32_out=inf)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                continue
            x = conv_relu(p[name], x, stride, padding, f32_out=inf)
            if name in ("conv8_2", "conv9_2", "conv10_2", "conv11_2", "conv12_2"):
                maps.append(x)
        s["maps"] = maps
        return x, s
    stages.append(("extras", extras))

    K = config.num_classes
    nv = config.num_vars

    def heads(p, x, s):
        # cells-minor reduction layout — keep in lockstep with
        # models/ssd_vgg.apply_scores (the shipped path this times)
        confs, clss, locss = [], [], []
        for i, (fmap, m) in enumerate(zip(s["maps"], preset.maps)):
            hp = p[f"classifier{i}"]
            y = conv2d(fmap, hp["w"], hp["b"], f32_out=True)
            b, h, w, _ = y.shape
            y = y.reshape(b, h * w, m.num_shapes, nv)
            y = jnp.transpose(y, (0, 2, 3, 1))  # (B, ns, nv, hw)
            logits = y[:, :, : K + 1, :]
            fg = logits[:, :, :K, :]
            cls_m = jnp.argmax(fg, axis=2).astype(jnp.int32)
            mx = jnp.max(logits, axis=2).astype(jnp.float32)
            se = jnp.sum(
                jnp.exp(logits.astype(jnp.float32) - mx[:, :, None, :]), axis=2
            )
            conf_m = jnp.exp(jnp.max(fg, axis=2).astype(jnp.float32) - mx) / se
            locs_m = jnp.transpose(y[:, :, K + 1 :, :], (0, 1, 3, 2))
            confs.append(conf_m.reshape(b, -1))
            clss.append(cls_m.reshape(b, -1))
            locss.append(locs_m.reshape(b, -1, 4))
        s = dict(s)
        s["scores"] = (
            jnp.concatenate(confs, 1), jnp.concatenate(clss, 1), jnp.concatenate(locss, 1))
        return s["scores"][0], s
    stages.append(("heads(scores)", heads))

    anchors = jnp.asarray(anchors_for_preset(preset))
    det_cfg = DetectionConfig(top_k=200, confidence_threshold=0.01)

    def decode(p, x, s):
        conf, cls, locs = s["scores"]
        d = decode_scores(conf, cls, locs, anchors, det_cfg)
        return d.scores, s
    stages.append(("decode+nms", decode))
    return stages


def time_prefix(stages, k, params, images, iters, repeats):
    from _timing import time_chained

    fns = [f for _, f in stages[:k]]

    def run(p, x):
        s = {}
        for f in fns:
            x, s = f(p, x, s)
        return jnp.sum(x.astype(jnp.float32))

    return time_chained(run, params, images, iters, repeats)


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
    preset = get_preset_by_name(args.preset)
    h, w = preset.image_size.h, preset.image_size.w
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8))

    stages = build_stages(config)
    prev = 0.0
    print(f"{'stage':>16} {'cum_ms':>9} {'delta_ms':>9}")
    for k in range(args.start, len(stages) + 1):
        t = time_prefix(stages, k, params, images, args.iters, args.repeats)
        print(f"{stages[k-1][0]:>16} {t*1e3:9.2f} {(t-prev)*1e3:9.2f}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
