#!/usr/bin/env python3
"""Headline benchmark: batch-64 fused-NMS inference throughput on one chip.

Measures the full deployed inference path — uint8 BGR batch in,
preprocess + SSD forward + softmax + top-k decode + class-aware NMS,
all inside one jitted program — and prints ONE JSON line. The default
invocation is the baseline's stated perf config (BASELINE.json
configs[4]): vgg512, batch 64, fused on-device NMS, target 1000
images/sec/chip on TPU v5e, measured on the **int8 W8A8 deploy path**
(models/quantized.py) — the configuration export_model.py --quantize
actually ships, with activation scales calibrated on real images:

  * if the deployable bundle ``assets/vgg512_int8_minivoc.ssdtpu.npz``
    exists (exported from the miniVOC-trained checkpoint with real
    calibration images; provenance in docs/PERFORMANCE.md), it is
    benchmarked as-is;
  * otherwise the quantized program is built on the spot, calibrating
    on committed real JPEGs (tests/fixtures/minivoc). Throughput is
    weight- and scale-insensitive, so both give the same number — but
    noise calibration (which cli/export_model.py refuses for deploys)
    is never used.

``--float`` measures the bf16 path instead (0.73x target on vgg512 —
within ~6% of that network's bf16 speed-of-light on this chip, see
docs/PERFORMANCE.md roofline). Accuracy parity evidence for int8 vs
float lives next to the numbers in docs/PERFORMANCE.md.

Methodology: N data-dependent iterations are chained inside a single
jitted fori_loop and the result fetched as a scalar, so the measurement
reflects pure device throughput and cannot be fooled by async dispatch
(the remote-TPU tunnel acks dispatches before execution completes, and
a per-call host sync would instead pay the ~34 ms tunnel round-trip).

Driver contract: the default invocation (and every non-matrix mode)
prints exactly ONE JSON line on stdout; auxiliary series go to stderr
as ``[secondary]`` lines. ``--mode matrix`` is the explicit exception —
one JSON line per swept configuration (use ``--out`` to also save them
as a file).
"""

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.abspath(__file__))
DEPLOY_BUNDLE = os.path.join(REPO, "assets", "vgg512_int8_minivoc.ssdtpu.npz")
CALIB_GLOB = os.path.join(
    REPO, "tests", "fixtures", "minivoc", "trainval",
    "VOCdevkit", "*", "JPEGImages", "*.jpg",
)

#: BASELINE.json configs[4]: vgg512 batch-64 fused-NMS inference,
#: 1000 images/sec/chip on TPU v5e.
INFERENCE_BASELINE = 1000.0


def _real_calibration_images(h, w, count=16):
    """Committed real JPEGs resized to the preset size (no noise)."""
    from ssd_tensorflow_tpu.inference import load_calibration_images

    files = sorted(glob.glob(CALIB_GLOB))[:count]
    if not files:
        raise FileNotFoundError(
            f"no calibration JPEGs under {CALIB_GLOB}; refusing to "
            "noise-calibrate (see cli/export_model.py)"
        )
    return load_calibration_images(files, h, w)


def _measure_inference(args, parser, *, float_path, bundle_path, pallas_stem):
    """Time one fused-inference configuration.

    Returns ``(metric, img/s, int8?, repeat_times)`` where
    ``repeat_times`` is the list of per-iteration seconds from each
    timing repeat (min of it is the throughput number; median of it is
    the honest p50 latency for small batches).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.ops.postprocess import (
        DetectionConfig,
        decode_scores,
    )

    det_cfg = DetectionConfig(top_k=200, confidence_threshold=0.01)
    rng = np.random.default_rng(0)

    if bundle_path is not None:
        from ssd_tensorflow_tpu.inference import load_bundle

        params, config, _, act_scales = load_bundle(bundle_path)
        quantized = act_scales is not None
        # the bundle determines the measured path: reject flag
        # combinations it cannot honor rather than silently
        # benchmarking something else
        if quantized and float_path:
            parser.error(f"{bundle_path} is int8-quantized; --float "
                         "cannot measure a float path from it")
        if quantized and pallas_stem:
            parser.error(f"{bundle_path} is int8-quantized; "
                         "--pallas-stem is a bf16 float-stem kernel")
        if pallas_stem and config.preset.backbone != "vgg":
            parser.error(f"{bundle_path} is a {config.preset.backbone} "
                         "bundle; --pallas-stem is a VGG stem kernel")
        overrides = {}
        if args.padded_heads:
            overrides["padded_heads"] = True
        if pallas_stem:
            overrides["pallas_stem"] = True
            overrides["pallas_stem_variant"] = args.stem_variant
        if overrides:
            import dataclasses

            config = dataclasses.replace(config, **overrides)
    else:
        from ssd_tensorflow_tpu.presets import get_preset_by_name

        if pallas_stem and get_preset_by_name(args.preset).backbone != "vgg":
            parser.error(f"--pallas-stem is a VGG stem kernel; "
                         f"{args.preset} is not a VGG preset")
        config = ModelConfig(
            preset_name=args.preset,
            num_classes=20,
            compute_dtype=args.compute_dtype,
            pallas_stem=pallas_stem,
            pallas_stem_variant=args.stem_variant,
            padded_heads=args.padded_heads,
        )
        params = init_params(jax.random.PRNGKey(0), config)
        quantized = not float_path
        act_scales = None

    h, w = config.preset.image_size.h, config.preset.image_size.w
    anchors = jnp.asarray(anchors_for_preset(config.preset))
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8)
    )

    if quantized:
        from ssd_tensorflow_tpu.models.quantized import (
            QuantizedModel,
            _forward_scores,
        )

        if act_scales is None:
            # same calibration class export_model.py ships: real
            # committed images, never noise
            qm = QuantizedModel(
                params, config, _real_calibration_images(h, w)
            )
            params, act_scales = qm.qparams, qm.act_scales

        scales = act_scales

        def one_step(p, x):
            conf, cls, locs = _forward_scores(p, scales, x, config)
            d = decode_scores(conf, cls, locs, anchors, det_cfg)
            return d.scores.sum()

    else:
        from ssd_tensorflow_tpu.models.ssd_vgg import apply_scores

        def one_step(p, x):
            conf, cls, locs = apply_scores(p, x, config)
            d = decode_scores(conf, cls, locs, anchors, det_cfg)
            return d.scores.sum()

    def chained(p, x):
        def body(i, acc):
            # data dependency forces sequential execution
            return acc + one_step(p, x + (acc * 0).astype(x.dtype))
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    # stage the weights ON DEVICE before timing: load_bundle returns
    # numpy arrays, and a numpy pytree passed to jit is re-uploaded
    # on every call — over the tunnel that silently halved the
    # measured bundle throughput (507 vs 1091 img/s) while the
    # program itself was identical
    params = jax.device_put(params)
    jax.block_until_ready(params)
    fn = jax.jit(chained)
    float(fn(params, images))  # compile + warm
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(fn(params, images))
        times.append((time.perf_counter() - t0) / args.iters)
    kind = "int8_" if quantized else ""
    metric = (
        f"{config.preset.name}_batch{args.batch_size}_"
        f"{kind}fused_nms_inference"
    )
    return metric, args.batch_size / min(times), quantized, times


def _measure_train(args):
    """Time one train-step configuration.

    Returns ``(metric, images/sec, flops_per_step)``. ``flops_per_step``
    comes from XLA's own cost analysis of the compiled program (fwd +
    bwd + optimizer as actually compiled, not an analytic estimate) and
    is ``None`` when the backend doesn't report it — it feeds the
    training-MFU numbers in docs/PERFORMANCE.md.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
    from ssd_tensorflow_tpu.parallel.train_step import (
        TrainConfig,
        make_train_state,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    config = ModelConfig(
        preset_name=args.preset,
        num_classes=20,
        compute_dtype=args.compute_dtype,
    )
    params = init_params(jax.random.PRNGKey(0), config)
    anchors = anchors_for_preset(config.preset)
    h, w = config.preset.image_size.h, config.preset.image_size.w
    images = jnp.asarray(
        rng.integers(0, 255, (args.batch_size, h, w, 3), dtype=np.uint8)
    )
    tcfg = TrainConfig(model=config, detect=None)
    state = make_train_state(params, tcfg)
    step = make_train_step(tcfg, np.asarray(anchors))
    batch = {
        "images": images,
        "gt_boxes": jnp.asarray(
            np.tile([[0.5, 0.5, 0.4, 0.4]], (args.batch_size, 8, 1)).astype(
                np.float32
            )
        ),
        "gt_labels": jnp.zeros((args.batch_size, 8), jnp.int32),
        "gt_mask": jnp.ones((args.batch_size, 8), bool),
    }

    flops, compiled = None, None
    try:
        compiled = step.lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if cost:
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        compiled = None  # cost analysis is best-effort; timing is the product

    if args.device_augment:
        from ssd_tensorflow_tpu.data.device_augment import (
            AugmentConfig,
            make_augment_fn,
        )

        augment = make_augment_fn(
            AugmentConfig(out_h=h, out_w=w), np.asarray(anchors)
        )
        raw_batch, base_key = batch, jax.random.PRNGKey(0)

        def run_once(state):
            # chain augment+train steps; the state dependency forces
            # sequential execution
            for i in range(args.iters):
                key = jax.random.fold_in(base_key, i)
                state, losses, _ = step(state, augment(key, raw_batch))
            return state, losses

        state, losses = run_once(state)  # compile + warm
        float(losses["total"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, losses = run_once(state)
            float(losses["total"])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        kind = "augmented_train_step"
    else:
        # reuse the cost-analysis executable — no second compile of the
        # identical fwd+bwd program (it only exists for this signature)
        runner = compiled if compiled is not None else step
        state, losses, _ = runner(state, batch)  # warm
        float(losses["total"])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, losses, _ = runner(state, batch)
            float(losses["total"])  # state chain forces sequencing
            best = min(best, (time.perf_counter() - t0) / args.iters)
        kind = "train_step"
    metric = f"{args.preset}_batch{args.batch_size}_{kind}"
    return metric, args.batch_size / best, flops


#: v5e bf16 peak (docs/PERFORMANCE.md "corrected peak"): MFU denominators
V5E_BF16_PEAK_FLOPS = 197e12


def _matrix_args(base, **over):
    """Clone the parsed args with per-config overrides."""
    ns = argparse.Namespace(**vars(base))
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def _run_matrix(args, parser):
    """One-process family x precision x mode sweep (VERDICT r4 item 6).

    Emits one JSON line per configuration on stdout:
      * inference throughput: {vgg512, vgg300, resnet320, mobilenet320}
        x {int8 deploy, bf16 float} at the headline batch 64
      * train-step throughput (+ MFU from XLA cost analysis):
        vgg512 b8/b16/b32, vgg300 b32, resnet320 b32, mobilenet320 b32
      * serving latency: per-family int8 batch-1 and batch-4 p50
        milliseconds per batch (chained-iteration timing — the ~34 ms
        tunnel round-trip is excluded by construction, CLAUDE.md)

    Round-over-round perf diffing is then a two-file diff of the saved
    JSON-lines files under docs/evidence/ instead of archaeology.
    """
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    families = ["vgg512", "vgg300", "resnet320", "mobilenet320"]

    for preset in families:
        for float_path in (False, True):
            a = _matrix_args(args, preset=preset, batch_size=64)
            bundle = (
                DEPLOY_BUNDLE
                if (preset == "vgg512" and not float_path
                    and os.path.exists(DEPLOY_BUNDLE))
                else None
            )
            metric, ips, _, _ = _measure_inference(
                a, parser, float_path=float_path, bundle_path=bundle,
                pallas_stem=False,
            )
            emit({
                "metric": metric, "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / INFERENCE_BASELINE, 4)
                if preset == "vgg512" and not float_path else None,
            })

    train_cfgs = [("vgg512", 8), ("vgg512", 16), ("vgg512", 32),
                  ("vgg300", 32), ("resnet320", 32), ("mobilenet320", 32)]
    for preset, bs in train_cfgs:
        a = _matrix_args(args, preset=preset, batch_size=bs,
                         device_augment=False)
        metric, ips, flops = _measure_train(a)
        row = {"metric": metric, "value": round(ips, 2),
               "unit": "images/sec/chip", "vs_baseline": None}
        if flops:
            row["flops_per_step"] = flops
            row["mfu"] = round(ips / bs * flops / V5E_BF16_PEAK_FLOPS, 4)
        emit(row)

    for preset in families:
        for bs in (1, 4):
            a = _matrix_args(args, preset=preset, batch_size=bs,
                             repeats=9, iters=20)
            metric, _, _, times = _measure_inference(
                a, parser, float_path=False, bundle_path=None,
                pallas_stem=False,
            )
            times.sort()
            p50_ms = times[len(times) // 2] * 1000.0
            emit({
                "metric": f"{preset}_batch{bs}_int8_serving_latency_p50",
                "value": round(p50_ms, 3), "unit": "ms/batch",
                "vs_baseline": None,
            })

    if args.out:
        with open(args.out, "w") as f:
            for row in results:
                f.write(json.dumps(row) + "\n")
        print(f"[i] matrix written to {args.out}", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--preset", default="vgg512")
    parser.add_argument("--iters", type=int, default=10, help="chained iterations per timing")
    parser.add_argument("--repeats", type=int, default=3, help="timings; best is reported")
    parser.add_argument("--compute-dtype", default="bfloat16")
    parser.add_argument(
        "--float", action="store_true",
        help="measure the bf16 path instead of the int8 deploy path",
    )
    parser.add_argument(
        "--pallas-stem", action="store_true",
        help="with --float: run conv1_2+pool1 as the manual-DMA Pallas "
        "kernel (ops/stem_pallas.py) instead of the packed XLA stem",
    )
    parser.add_argument(
        "--stem-variant", default="dma", choices=["dma", "uint8"],
        help="with --pallas-stem: which kernel (ops/stem_pallas.py) — "
        "'dma' = split stem, 'uint8' = whole-stem single kernel",
    )
    parser.add_argument(
        "--padded-heads", action="store_true",
        help="inference: lane-align the classifier output groups "
        "(ModelConfig.padded_heads) — same math, pads nv=25 -> 32",
    )
    parser.add_argument(
        "--bundle", default=None,
        help="benchmark this exported bundle (float or int8) instead of "
        "the default deploy configuration",
    )
    parser.add_argument(
        "--no-secondary", action="store_true",
        help="suppress the secondary bf16 stderr line the default int8 "
        "run also measures (kept for round-over-round comparability)",
    )
    parser.add_argument(
        "--mode", default="inference",
        choices=["inference", "train", "matrix"],
        help="matrix: the one-process family x precision x {infer, "
        "train, latency} sweep (JSON line per config; see --out)",
    )
    parser.add_argument(
        "--out", default=None,
        help="matrix mode: also save the JSON lines to this file",
    )
    parser.add_argument(
        "--device-augment", action="store_true",
        help="train mode: include the on-device augmentation stage "
        "(data/device_augment.py) in the timed step",
    )
    args = parser.parse_args()

    extra = {}  # optional fields (train mode: flops_per_step / mfu)

    if args.mode == "matrix":
        _run_matrix(args, parser)
        return

    if args.mode == "inference":
        if args.pallas_stem and not args.float and args.bundle is None:
            parser.error(
                "--pallas-stem is a bf16 stem kernel: the default int8 "
                "path has its own stem — pass --float with it"
            )
        bundle_path = args.bundle
        if (
            bundle_path is None
            and not args.float
            and args.preset == "vgg512"  # the committed bundle's preset
            and os.path.exists(DEPLOY_BUNDLE)
        ):
            bundle_path = DEPLOY_BUNDLE

        metric, images_per_sec, quantized, _ = _measure_inference(
            args, parser, float_path=args.float, bundle_path=bundle_path,
            pallas_stem=args.pallas_stem,
        )
        vs_baseline = round(images_per_sec / INFERENCE_BASELINE, 4)
        # The headline metric changed identity across rounds r01-r03
        # (vgg300 bf16 -> vgg512 bf16 -> vgg512 int8), making the driver
        # series non-comparable. From r04 the headline stays pinned to
        # the int8 deploy path, and the bf16 path of the same
        # preset/batch is ALSO measured and printed as a secondary
        # stderr line, so regressions on either path are visible
        # round-over-round while stdout keeps the one-JSON-line
        # contract.
        if quantized and args.bundle is None and not args.no_secondary:
            m2, ips2, _, _ = _measure_inference(
                args, parser, float_path=True, bundle_path=None,
                pallas_stem=False,
            )
            print(
                "[secondary] " + json.dumps(
                    {
                        "metric": m2,
                        "value": round(ips2, 2),
                        "unit": "images/sec/chip",
                        "vs_baseline": round(ips2 / INFERENCE_BASELINE, 4),
                    }
                ),
                file=sys.stderr,
            )
            # pinned train-step secondary (VERDICT r4 item 1): the
            # driver series tracks training regressions too — vgg512
            # b16, the accuracy-run configuration
            # (tools/train_v512_segmented.sh)
            m3, ips3, _ = _measure_train(
                _matrix_args(args, preset="vgg512", batch_size=16,
                             device_augment=False)
            )
            print(
                "[secondary] " + json.dumps(
                    {
                        "metric": m3,
                        "value": round(ips3, 2),
                        "unit": "images/sec/chip",
                        "vs_baseline": None,
                    }
                ),
                file=sys.stderr,
            )
    else:
        metric, images_per_sec, flops = _measure_train(args)
        # the reference publishes no training throughput (SURVEY.md §6)
        # and inventing a constant would launder a guess into a metric —
        # train mode reports the raw number with no ratio
        vs_baseline = None
        if flops:
            extra = {
                "flops_per_step": flops,
                "mfu": round(
                    images_per_sec / args.batch_size * flops
                    / V5E_BF16_PEAK_FLOPS, 4
                ),
            }

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": vs_baseline,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
