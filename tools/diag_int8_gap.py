"""Diagnose the vgg512 int8-vs-float accuracy gap on the CPU backend.

The e75 premature post run (runs/post_v512/test_*.log) showed test mAP
0.628 float vs 0.466 int8 — a ~16-point PTQ gap, vs the ~1.8-point gap
established on vgg300 (docs/PERFORMANCE.md "QAT"). This script localizes
where the quantized forward diverges, without touching the (busy) TPU:

  1. per-multibox-map relative error between the float and int8 feature
     maps (maps 0..6 for vgg512) — finds the layer where error blows up;
  2. final fused-result comparison: confidence agreement on argmax class
     and localization deltas;
  3. sweeps calibration percentile / calibration-set size to see whether
     the gap is a calibration artifact or a path bug.

Usage (CPU, ~minutes):  python tools/diag_int8_gap.py [ckpt]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import glob

import jax.numpy as jnp

from ssd_tensorflow_tpu.inference import (
    load_calibration_images,
    load_params_from_train_checkpoint,
)
from ssd_tensorflow_tpu.models import quantized as Q
from ssd_tensorflow_tpu.models.ssd_vgg import _feature_maps, apply_result


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/v512/final.ckpt.npz"
    params, cfg, _ = load_params_from_train_checkpoint(ckpt)
    h, w = cfg.preset.image_size
    print(f"ckpt={ckpt} preset={cfg.preset.name} image={h}x{w}")

    train_jpgs = sorted(
        glob.glob(
            "runs/minivoc1500_512/trainval/VOCdevkit/*/JPEGImages/*.jpg"
        )
    )
    test_jpgs = sorted(
        glob.glob("runs/minivoc1500_512/test/VOCdevkit/*/JPEGImages/*.jpg")
    )
    calib = load_calibration_images(train_jpgs[:16], h, w)
    probe = load_calibration_images(test_jpgs[:4], h, w)
    print(f"calib={calib.shape} probe={probe.shape}")

    # float reference on the probe batch
    f_maps = jax.jit(
        lambda p, im: _feature_maps(p, im, cfg, inference=True)
    )(params, probe)
    f_res = jax.jit(lambda p, im: apply_result(p, im, cfg))(params, probe)

    def compare(tag, act_scales):
        qparams = Q.quantize_weights(params)
        q_maps = jax.jit(
            lambda qp, im: Q._feature_maps_q(qp, act_scales, im, cfg)
        )(qparams, probe)
        q_res = jax.jit(
            lambda qp, im: Q._forward(qp, act_scales, im, cfg)
        )(qparams, probe)
        errs = [rel_err(f, q) for f, q in zip(f_maps, q_maps)]
        print(f"[{tag}] per-map rel err: "
              + " ".join(f"m{i}={e:.4f}" for i, e in enumerate(errs)))
        fr = np.asarray(f_res, np.float32)
        qr = np.asarray(q_res, np.float32)
        K = cfg.num_classes + 1
        f_cls = fr[..., :K].argmax(-1)
        q_cls = qr[..., :K].argmax(-1)
        f_conf = 1.0 - fr[..., 0]
        # agreement among anchors the float path is confident about
        hot = f_conf > 0.5
        agree = float((f_cls[hot] == q_cls[hot]).mean()) if hot.any() else 1.0
        dconf = float(np.abs(fr[..., 0] - qr[..., 0])[hot].mean()) if hot.any() else 0.0
        dloc = float(np.abs(fr[..., K:] - qr[..., K:])[hot].mean()) if hot.any() else 0.0
        print(f"[{tag}] hot anchors={int(hot.sum())} cls-agree={agree:.3f} "
              f"mean|d bg-conf|={dconf:.4f} mean|d loc|={dloc:.4f}")
        return errs

    for pct in (99.9, 99.99, 100.0):
        scales = Q.calibrate_activation_scales(
            params, calib, cfg, percentile=pct
        )
        big = sorted(scales.items(), key=lambda kv: -kv[1])[:5]
        print(f"pct={pct}: top scales "
              + ", ".join(f"{k}={v:.1f}" for k, v in big))
        compare(f"pct={pct} n=16", scales)

    # calibration-set size sweep at the default percentile
    calib64 = load_calibration_images(train_jpgs[:64], h, w)
    scales = Q.calibrate_activation_scales(params, calib64, cfg)
    compare("pct=99.9 n=64", scales)


if __name__ == "__main__":
    main()
