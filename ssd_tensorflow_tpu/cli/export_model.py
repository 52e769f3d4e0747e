"""Model export CLI (reference: export_model.py).

Freezes a training checkpoint into a standalone inference bundle — the
functional analog of convert_variables_to_constants + GraphDef
(export_model.py:62-72): a single npz with (params, model config, label
map) that detect.py runs without any training artifacts. Optionally
also emits a serialized StableHLO program via jax.export for
deployment to non-Python runtimes.
"""

from __future__ import annotations

import argparse
import sys

from ssd_tensorflow_tpu.inference import (
    load_params_from_train_checkpoint,
    save_bundle,
)


def build_parser():
    parser = argparse.ArgumentParser(description="Export a trained model")
    parser.add_argument(
        "--checkpoint-file", required=True, help="training checkpoint (.npz)"
    )
    parser.add_argument(
        "--output-file", default="model.ssdtpu.npz", help="output bundle file"
    )
    parser.add_argument(
        "--quantize", action="store_true",
        help="export an int8 W8A8 deploy bundle (models/quantized.py)",
    )
    parser.add_argument(
        "--calibration-images", nargs="*", default=None,
        help="images used to calibrate int8 activation scales",
    )
    parser.add_argument(
        "--calibration-percentile", type=float, default=100.0,
        help="activation amplitude percentile for int8 scales; the "
        "default 100 (max-abs) is measured best — value percentiles "
        "clip sparse post-ReLU maps (models/quantized.py docstring)",
    )
    parser.add_argument(
        "--allow-noise-calibration", action="store_true",
        help="permit calibrating on random noise when no images are "
        "given (deploy-quality scales need real images)",
    )
    parser.add_argument(
        "--stablehlo",
        default=None,
        help="also export a serialized StableHLO program to this path",
    )
    parser.add_argument(
        "--stablehlo-batch-size", type=int, default=32,
        help="batch size baked into the StableHLO export",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    print("[i] Checkpoint file:", args.checkpoint_file)
    print("[i] Output file:    ", args.output_file)

    params, model_cfg, lid2name = load_params_from_train_checkpoint(
        args.checkpoint_file
    )

    if args.quantize:
        import numpy as np

        from ssd_tensorflow_tpu.models.quantized import QuantizedModel
        from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config

        # a QAT checkpoint carries the activation scales it was trained
        # against — deploying with those exact scales is the QAT
        # contract; recalibrating would deploy a quantizer the finetune
        # never saw. VGG checkpoints carry per-layer scales
        # (qat_act_scales); the GN families carry per-input-channel
        # amax grids (qat_act_amax) that fold into the weights.
        ckpt_cfg = checkpoint_config(args.checkpoint_file)
        qat_scales = ckpt_cfg.get("qat_act_scales")
        qat_amax = ckpt_cfg.get("qat_act_amax")
        if qat_amax is not None:
            from ssd_tensorflow_tpu.models.quantized import (
                quantize_weights_folded,
            )

            print("[i] QAT checkpoint: exporting with the trained "
                  "per-channel activation grids (no recalibration)")
            amax = {
                k: np.asarray(v, np.float32) for k, v in qat_amax.items()
            }
            save_bundle(
                args.output_file, quantize_weights_folded(params, amax),
                model_cfg, lid2name, act_scales={},
            )
        elif qat_scales is not None:
            from ssd_tensorflow_tpu.models.quantized import quantize_weights

            print("[i] QAT checkpoint: exporting with the trained "
                  "activation scales (no recalibration)")
            save_bundle(
                args.output_file, quantize_weights(params), model_cfg,
                lid2name, act_scales=qat_scales,
            )
        else:
            h, w = (
                model_cfg.preset.image_size.h, model_cfg.preset.image_size.w
            )
            if args.calibration_images:
                from ssd_tensorflow_tpu.inference import (
                    load_calibration_images,
                )

                calib = load_calibration_images(
                    args.calibration_images, h, w
                )
            else:
                if not args.allow_noise_calibration:
                    print(
                        "[!] int8 export needs --calibration-images (real "
                        "images from the training distribution); pass "
                        "--allow-noise-calibration to override for testing"
                    )
                    return 1
                print("[!] no calibration images given; using random noise")
                calib = np.random.default_rng(0).integers(
                    0, 255, (2, h, w, 3), dtype=np.uint8
                )
            qm = QuantizedModel(
                params, model_cfg, calib,
                percentile=args.calibration_percentile,
            )
            save_bundle(
                args.output_file, qm.qparams, model_cfg, lid2name,
                act_scales=qm.act_scales,
            )
        print("[i] int8 bundle written:", args.output_file)
    else:
        save_bundle(args.output_file, params, model_cfg, lid2name)
        print("[i] Bundle written:", args.output_file)

    if args.stablehlo:
        import jax
        import jax.numpy as jnp

        from ssd_tensorflow_tpu.models.ssd_vgg import apply_result

        b = args.stablehlo_batch_size
        h, w = model_cfg.preset.image_size.h, model_cfg.preset.image_size.w

        def fn(images):
            return apply_result(params, images, model_cfg)

        exported = jax.export.export(jax.jit(fn))(
            jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
        )
        with open(args.stablehlo, "wb") as f:
            f.write(exported.serialize())
        print("[i] StableHLO written:", args.stablehlo)

    return 0


if __name__ == "__main__":
    sys.exit(main())
