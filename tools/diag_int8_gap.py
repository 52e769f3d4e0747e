"""Diagnose the vgg512 int8-vs-float accuracy gap on the CPU backend.

The e75 premature post run (runs/post_v512/test_*.log) showed test mAP
0.628 float vs 0.466 int8 — a ~16-point PTQ gap, vs the ~1.8-point gap
established on vgg300 (docs/PERFORMANCE.md "QAT"). This script localizes
where the quantized forward diverges, without touching the (busy) TPU:

  1. per-multibox-map relative error between the float and int8 feature
     maps (maps 0..6 for vgg512) — finds the layer where error blows up;
  2. final fused-result comparison: background/foreground flip rate on
     anchors the float path scores as foreground, class agreement, and
     localization deltas (background = LAST class index, ssdvgg.py:378-395).

Usage (CPU, ~15 min per variant — run one variant per invocation):
  python tools/diag_int8_gap.py [ckpt] [percentile] [n_calib]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")

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
    pct = float(sys.argv[2]) if len(sys.argv) > 2 else 99.9
    n_calib = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    params, cfg, _ = load_params_from_train_checkpoint(ckpt)
    h, w = cfg.preset.image_size
    print(f"ckpt={ckpt} preset={cfg.preset.name} pct={pct} n={n_calib}")

    train_jpgs = sorted(
        glob.glob(
            "runs/minivoc1500_512/trainval/VOCdevkit/*/JPEGImages/*.jpg"
        )
    )
    test_jpgs = sorted(
        glob.glob("runs/minivoc1500_512/test/VOCdevkit/*/JPEGImages/*.jpg")
    )
    calib = load_calibration_images(train_jpgs[:n_calib], h, w)
    probe = load_calibration_images(test_jpgs[:4], h, w)

    f_maps = jax.jit(
        lambda p, im: _feature_maps(p, im, cfg, inference=True)
    )(params, probe)
    f_res = np.asarray(
        jax.jit(lambda p, im: apply_result(p, im, cfg))(params, probe),
        np.float32,
    )
    print("float forward done")

    scales = Q.calibrate_activation_scales(params, calib, cfg, percentile=pct)
    print("calibrated: " + ", ".join(
        f"{k}={v:.3f}" for k, v in sorted(scales.items())[:6]) + " ...")

    qparams = Q.quantize_weights(params)
    q_maps = jax.jit(
        lambda qp, im: Q._feature_maps_q(qp, scales, im, cfg)
    )(qparams, probe)
    q_res = np.asarray(
        jax.jit(lambda qp, im: Q._forward(qp, scales, im, cfg))(
            qparams, probe
        ),
        np.float32,
    )

    errs = [rel_err(f, q) for f, q in zip(f_maps, q_maps)]
    print("per-map rel err: "
          + " ".join(f"m{i}={e:.4f}" for i, e in enumerate(errs)))

    K = cfg.num_classes  # foreground classes; bg one-hot index = K (last)
    f_bg = f_res[..., K]
    q_bg = q_res[..., K]
    f_cls = f_res[..., :K].argmax(-1)
    q_cls = q_res[..., :K].argmax(-1)
    # anchors the float net calls foreground with confidence
    fg = f_bg < 0.5
    n_fg = int(fg.sum())
    flips = float((q_bg[fg] > 0.5).mean()) if n_fg else 0.0
    agree = float((f_cls[fg] == q_cls[fg]).mean()) if n_fg else 1.0
    dconf = float(np.abs(f_bg - q_bg)[fg].mean()) if n_fg else 0.0
    dloc = float(
        np.abs(f_res[..., K + 1:] - q_res[..., K + 1:])[fg].mean()
    ) if n_fg else 0.0
    # and the reverse: anchors int8 newly promotes to foreground
    ghost = float(((f_bg > 0.9) & (q_bg < 0.5)).sum())
    print(f"fg anchors={n_fg} bg-flip-rate={flips:.3f} cls-agree={agree:.3f} "
          f"mean|d bg|={dconf:.4f} mean|d loc|={dloc:.4f} ghosts={ghost:.0f}")


if __name__ == "__main__":
    main()
