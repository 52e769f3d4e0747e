#!/usr/bin/env python3
"""QAT finetune demo: close the int8 gap of a trained checkpoint.

Loads a float checkpoint, calibrates int8 activation scales on held-out
validation images, finetunes through the fake-quant forward
(models/qat.py) for a few epochs, then reports mAP on the validation
set for: float baseline, post-training int8 (PTQ), and QAT int8 — the
last two evaluated through the REAL int8 deploy pipeline
(models/quantized._forward) with the same scales QAT trained against.

Example:
  python tools/qat_finetune.py --name run1 --data-dir pascal-voc \
      --epochs 10 --batch-size 32 --lr 1e-4 --output run1-qat
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def evaluate(result_fn, td, anchors, batch_size, threshold=0.01):
    """valid-set mAP of a `(images)->(B,A,K+5)` result function."""
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
    from ssd_tensorflow_tpu.ops.postprocess import (
        DetectionConfig,
        decode_detections,
        detections_to_boxes,
    )

    det_cfg = DetectionConfig(top_k=200, confidence_threshold=threshold)
    calc = APCalculator()
    for batch, gt_lists, n in td.valid_generator(batch_size, num_workers=0):
        r = result_fn(jnp.asarray(batch["images"]))
        K = r.shape[-1] - 5
        dets = decode_detections(r[..., : K + 1], r[..., K + 1 :], anchors, det_cfg)
        boxes_per_image = detections_to_boxes(dets, td.lid2name)
        for i in range(n):
            calc.add_detections(gt_lists[i], boxes_per_image[i])
    return APs2mAP(calc.compute_aps())


def main(argv=None):
    parser = argparse.ArgumentParser(description="QAT finetune")
    parser.add_argument("--name", required=True, help="project dir with checkpoints")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--output", default=None, help="dir for the QAT checkpoint")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--calib-images", type=int, default=32)
    parser.add_argument("--num-workers", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ssd_tensorflow_tpu.data.pipeline import TrainingData
    from ssd_tensorflow_tpu.models.qat import make_qat_train_step
    from ssd_tensorflow_tpu.models.quantized import (
        _forward,
        calibrate_activation_amax,
        calibrate_activation_scales,
        quantize_weights,
        quantize_weights_folded,
    )
    from ssd_tensorflow_tpu.models.ssd_vgg import (
        ModelConfig,
        apply_result,
        init_params,
    )
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_train_state,
    )
    from ssd_tensorflow_tpu.utils.checkpoint import (
        CheckpointManager,
        checkpoint_config,
        find_checkpoint,
        restore_checkpoint,
    )

    td = TrainingData(args.data_dir)
    ckpt, epoch = find_checkpoint(args.name)
    if ckpt is None:
        print("[!] no checkpoint in", args.name)
        return 1
    print(f"[i] Checkpoint: {ckpt} (epoch {epoch})")

    import dataclasses

    from ssd_tensorflow_tpu.inference import model_config_from_dict

    ckpt_cfg = checkpoint_config(ckpt)
    saved = ckpt_cfg.get("model", {})
    model_cfg = dataclasses.replace(
        model_config_from_dict(saved) if saved else ModelConfig(
            preset_name=td.preset.name, num_classes=td.num_classes
        ),
        compute_dtype="float32",  # QAT math is exact-integer-in-f32
        l2_norm_eps=1e-3,  # bounds the rsqrt backward, see models/qat.py
    )
    train_cfg = TrainConfig(
        model=model_cfg,
        lr_values=(args.lr,),
        lr_boundaries=(),
        detect=None,
    )
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    state = make_train_state(params, train_cfg)
    state = restore_checkpoint(ckpt, state)
    state = make_train_state(state.params, train_cfg)  # fresh momentum
    anchors = jnp.asarray(anchors_for_preset(model_cfg.preset))

    # -- calibration on held-out validation images (deterministic order,
    # same scheme as train.py --qat) ------------------------------------
    calib = []
    for batch, _, n in td.valid_generator(args.batch_size, num_workers=0):
        calib.append(np.asarray(batch["images"][:n]))
        if sum(c.shape[0] for c in calib) >= args.calib_images:
            break
    calib = jnp.asarray(np.concatenate(calib)[: args.calib_images])
    print(f"[i] Calibrating on {calib.shape[0]} images...")
    # the GN families quantize through per-input-channel amax grids
    # folded into the weights (models/quantized.quantize_weights_folded);
    # VGG through per-layer scales — mirror the train.py --qat split
    family = model_cfg.preset.backbone != "vgg"
    if family:
        scales = calibrate_activation_amax(state.params, calib, model_cfg)

        def deploy_int8(p):
            qp = quantize_weights_folded(p, scales)
            return jax.jit(lambda x: _forward(qp, {}, x, model_cfg))
    else:
        scales = calibrate_activation_scales(state.params, calib, model_cfg)

        def deploy_int8(p):
            qp = quantize_weights(p)
            return jax.jit(lambda x: _forward(qp, scales, x, model_cfg))

    # -- baselines ------------------------------------------------------
    float_fn = jax.jit(lambda x: apply_result(state.params, x, model_cfg))
    ptq_fn = deploy_int8(state.params)
    m_float = evaluate(float_fn, td, anchors, args.batch_size)
    m_ptq = evaluate(ptq_fn, td, anchors, args.batch_size)
    print(f"[i] valid mAP  float: {m_float:.4f}   PTQ int8: {m_ptq:.4f}")

    # -- QAT finetune ---------------------------------------------------
    step = make_qat_train_step(train_cfg, anchors, scales)
    for e in range(args.epochs):
        losses_acc = []
        for batch, _, n in td.train_generator(
            args.batch_size, num_workers=args.num_workers
        ):
            dev = {
                "images": jnp.asarray(batch["images"]),
                "gt_boxes": jnp.asarray(batch["gt_boxes"]),
                "gt_labels": jnp.asarray(batch["gt_labels"]),
                "gt_mask": jnp.asarray(batch["gt_mask"]),
            }
            state, losses, _ = step(state, dev)
            losses_acc.append(losses["total"])
        mean = float(np.mean(jax.device_get(losses_acc)))
        print(f"[i] QAT epoch {e + 1}/{args.epochs}: loss {mean:.4f}")

    # -- QAT int8 evaluation (same deploy pipeline, same scales) --------
    qat_fn = deploy_int8(state.params)
    m_qat = evaluate(qat_fn, td, anchors, args.batch_size)
    print(
        f"[i] valid mAP  float: {m_float:.4f}   PTQ int8: {m_ptq:.4f}   "
        f"QAT int8: {m_qat:.4f}"
    )

    if args.output:
        # carry the full original config (train params, label map) plus
        # the trained activation scales, so infer/export work on the QAT
        # checkpoint and export deploys the exact trained quantizer
        from ssd_tensorflow_tpu.inference import model_config_to_dict

        out_cfg = dict(
            ckpt_cfg,
            # rebuild the model dict from the actual model_cfg so it is
            # complete even when the source checkpoint config lacked one
            model=model_config_to_dict(model_cfg),
            lid2name=ckpt_cfg.get(
                "lid2name", {str(k): v for k, v in td.lid2name.items()}
            ),
            qat=True,
            **(
                {"qat_act_amax": {
                    k: np.asarray(v, np.float32).tolist()
                    for k, v in scales.items()
                }}
                if family
                else {"qat_act_scales": {
                    k: float(v) for k, v in scales.items()
                }}
            ),
        )
        mgr = CheckpointManager(args.output, out_cfg)
        path = mgr.save(args.epochs, state, final=True)
        mgr.wait()
        print("[i] QAT checkpoint saved:", os.path.join(args.output))
    return 0


if __name__ == "__main__":
    sys.exit(main())
