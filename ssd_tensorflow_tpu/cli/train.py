"""Training CLI (reference: train.py).

The same flag surface and epoch/summary/checkpoint behavior as the
reference, running on the TPU-native stack: device-side target
assignment, a jitted mesh-sharded train step, fused on-device
decode+NMS for the per-epoch mAP accounting, async npz checkpoints and
the dependency-free TensorBoard writer.
"""

from __future__ import annotations

import argparse
import math
import multiprocessing as mp
import os
import signal
import sys

import numpy as np

import jax

from ssd_tensorflow_tpu.data.pipeline import TrainingData
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
from ssd_tensorflow_tpu.models.vgg16 import load_pretrained_vgg
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, detections_to_boxes
from ssd_tensorflow_tpu.parallel.mesh import make_mesh
from ssd_tensorflow_tpu.parallel.prefetch import prefetch_to_device
from ssd_tensorflow_tpu.parallel.train_step import (
    TrainConfig,
    make_eval_step,
    make_train_state,
    make_train_step,
    shard_state,
)
from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
from ssd_tensorflow_tpu.types import str2bool
from ssd_tensorflow_tpu.utils.checkpoint import (
    CheckpointManager,
    find_checkpoint,
    restore_checkpoint,
)
from ssd_tensorflow_tpu.utils.profiling import StepTimer
from ssd_tensorflow_tpu.utils.summaries import (
    ImageSummary,
    LossSummary,
    NetSummary,
    PrecisionSummary,
)
from ssd_tensorflow_tpu.utils.tensorboard import SummaryWriter


def build_parser():
    parser = argparse.ArgumentParser(description="Train the SSD")
    parser.add_argument("--name", default="test", help="project name")
    parser.add_argument("--data-dir", default="pascal-voc", help="data directory")
    parser.add_argument(
        "--vgg-dir",
        default="vgg_graph",
        help="directory holding vgg16.npz pretrained weights (optional)",
    )
    parser.add_argument("--epochs", type=int, default=200, help="number of epochs")
    parser.add_argument(
        "--epochs-per-run", type=int, default=0,
        help="stop (with a resumable final checkpoint, exit 0) after this "
        "many epochs in this process; 0 = no per-process cap. For "
        "restart-resume training loops on hosts where the runtime leaks "
        "per-step host memory (e.g. remote-TPU tunnel clients that "
        "retain every H2D transfer, tools/leak_probe.py) — rerun with "
        "--continue-training until --epochs is reached",
    )
    parser.add_argument("--batch-size", type=int, default=8, help="batch size")
    parser.add_argument(
        "--tensorboard-dir", default="tb", help="tensorboard data directory"
    )
    parser.add_argument(
        "--checkpoint-interval", type=int, default=5, help="checkpoint interval"
    )
    parser.add_argument(
        "--checkpoint-backend", default="npz", choices=["npz", "orbax"],
        help="npz: single-file e{N}.ckpt.npz archives (default; what "
        "infer/export consume). orbax: async orbax.checkpoint directory "
        "layout (utils/checkpoint_orbax.py) — the final checkpoint is "
        "additionally written as final.ckpt.npz so the deploy chain "
        "keeps working",
    )
    parser.add_argument(
        "--lr-values", type=str, default="0.00075;0.0001;0.00001",
        help="learning rate values",
    )
    parser.add_argument(
        "--lr-boundaries", type=str, default="320000;400000",
        help="learning rate change boundaries (in batches)",
    )
    parser.add_argument("--momentum", type=float, default=0.9, help="momentum")
    parser.add_argument(
        "--weight-decay", type=float, default=0.0005, help="L2 normalization factor"
    )
    parser.add_argument(
        "--continue-training", type=str2bool, default="False",
        help="continue training from the latest checkpoint",
    )
    parser.add_argument(
        "--num-workers", type=int, default=mp.cpu_count(),
        help="number of parallel data workers",
    )
    # TPU-native extensions
    parser.add_argument(
        "--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"],
        help="conv compute precision",
    )
    parser.add_argument(
        "--data-parallel", type=int, default=0,
        help="data-parallel mesh size (0 = all devices)",
    )
    parser.add_argument(
        "--qat", type=str2bool, default="False",
        help="quantization-aware training: train through the int8 "
        "fake-quantizer (models/qat.py; forces --compute-dtype float32; "
        "activation scales calibrate on the first validation batches)",
    )
    parser.add_argument(
        "--device-augment", type=str2bool, default="False",
        help="run the SSD augmentation chain on device (the host only "
        "decodes + resizes; data/device_augment.py)",
    )
    parser.add_argument(
        "--augment-seed", type=int, default=0,
        help="PRNG seed for on-device augmentation",
    )
    parser.add_argument(
        "--cache-images", type=str2bool, default="False",
        help="cache decoded images in RAM across epochs (identical "
        "pixels, no re-decode; size the dataset's decoded bytes against "
        "available memory before enabling)",
    )
    parser.add_argument(
        "--profile-dir", default=None,
        help="write a jax profiler trace of a few steps to this directory",
    )
    parser.add_argument(
        "--profiler-port", type=int, default=0,
        help="start a jax.profiler server on this port (0 = off)",
    )
    return parser


def _gt_box_lists(gt_boxes, gt_labels, gt_mask, lid2name, num_real):
    """Fixed-shape (B, G, ...) gt arrays -> per-image Box lists (for the
    AP accounting when the ground truth was augmented on device)."""
    from ssd_tensorflow_tpu.types import Box, Point, Size

    out = []
    for i in range(num_real):
        boxes = []
        for j in np.nonzero(gt_mask[i])[0]:
            cx, cy, w, h = (float(v) for v in gt_boxes[i, j])
            lid = int(gt_labels[i, j])
            boxes.append(Box(lid2name[lid], lid, Point(cx, cy), Size(w, h)))
        out.append(boxes)
    return out


def _losses_for_summary(losses, batch_size, num_real):
    """Rescale batch-mean losses to per-real-sample means (padded rows
    contribute zero conf/loc; l2 is batch-independent)."""
    a = batch_size / max(num_real, 1)
    conf = float(losses["confidence"]) * a
    loc = float(losses["localization"]) * a
    l2 = float(losses["l2"])
    return {
        "confidence": conf,
        "localization": loc,
        "l2": l2,
        "total": conf + loc + l2,
    }


def main(argv=None):
    args = build_parser().parse_args(argv)

    for k, v in sorted(vars(args).items()):
        print(f"[i] {k.replace('_', ' ').capitalize():24s}: {v}")

    # ------------------------------------------------------------------
    # Resume or fresh start (reference: train.py:98-147)
    # ------------------------------------------------------------------
    start_epoch = 0
    checkpoint_file = None
    orbax_mgr = None
    if args.checkpoint_backend == "orbax":
        from ssd_tensorflow_tpu.utils.checkpoint_orbax import (
            OrbaxCheckpointManager,
        )
    if args.continue_training:
        if args.checkpoint_backend == "orbax":
            orbax_mgr = OrbaxCheckpointManager(args.name, max_to_keep=20)
            last_epoch = orbax_mgr.latest_epoch()
            checkpoint_file = (
                None if last_epoch is None
                else os.path.join(args.name, str(last_epoch))
            )
        else:
            checkpoint_file, last_epoch = find_checkpoint(args.name)
        if checkpoint_file is None or last_epoch is None:
            print("[!] No network state found in " + args.name)
            return 1
        start_epoch = last_epoch
    else:
        os.makedirs(args.name, exist_ok=True)

    print("[i] Starting at epoch:    ", start_epoch + 1)

    # ------------------------------------------------------------------
    # Training data
    # ------------------------------------------------------------------
    if args.cache_images:
        from ssd_tensorflow_tpu.data.transforms import enable_decode_cache

        enable_decode_cache(True)
        print("[i] Decode cache:          enabled (serial pipeline "
              "benefits most; fork workers each hold their own copy)")
    try:
        td = TrainingData(args.data_dir)
        print("[i] # training samples:   ", td.num_train)
        print("[i] # validation samples: ", td.num_valid)
        print("[i] # classes:            ", td.num_classes)
        print("[i] Image size:           ", td.preset.image_size)
    except (AttributeError, RuntimeError) as e:
        print("[!] Unable to load training data:", str(e))
        return 1

    # ------------------------------------------------------------------
    # Multi-host: each process owns a contiguous shard of the sample
    # lists and produces batch_size/process_count local rows; the rows
    # assemble into one global data-sharded jax.Array per step
    # (SURVEY §2.4 "per-host data feeding sharded by jax.process_index").
    # ------------------------------------------------------------------
    n_proc = jax.process_count()
    local_batch_size = args.batch_size
    pre_shard_valid = td.valid_samples
    if n_proc > 1:
        from ssd_tensorflow_tpu.parallel.multihost import process_shard

        if args.batch_size % n_proc:
            print(f"[!] batch size {args.batch_size} not divisible by "
                  f"{n_proc} processes")
            return 1
        local_batch_size = args.batch_size // n_proc
        # every process MUST produce the same number of batches per
        # epoch — the train/eval steps are collective SPMD programs, so
        # one process dispatching an extra step hangs the job. Truncate
        # all shards to the minimum shard length (drops < n_proc
        # samples per epoch).
        train_len = len(td.train_samples) // n_proc
        valid_len = len(td.valid_samples) // n_proc
        td.train_samples = process_shard(td.train_samples)[:train_len]
        td.valid_samples = process_shard(td.valid_samples)[:valid_len]
        td.num_train = len(td.train_samples)
        td.num_valid = len(td.valid_samples)
        print(f"[i] Multi-host: process {jax.process_index()}/{n_proc}, "
              f"{td.num_train} local train samples, "
              f"local batch {local_batch_size}")

    # ------------------------------------------------------------------
    # Model + train step
    # ------------------------------------------------------------------
    lr_values = tuple(float(x) for x in args.lr_values.split(";") if x)
    lr_boundaries = tuple(int(x) for x in args.lr_boundaries.split(";") if x)
    if len(lr_values) != len(lr_boundaries) + 1:
        print("[!] need one more lr value than boundaries")
        return 1

    if args.qat and args.compute_dtype != "float32":
        print("[i] QAT forces --compute-dtype float32 (exact-integer math)")
        args.compute_dtype = "float32"
    model_cfg = ModelConfig(
        preset_name=td.preset.name,
        num_classes=td.num_classes,
        compute_dtype=args.compute_dtype,
        # QAT needs the large eps (see models/qat.py); the value rides
        # in the checkpoint config so deploy computes what QAT trained
        l2_norm_eps=1e-3 if args.qat else 1e-12,
    )
    train_cfg = TrainConfig(
        model=model_cfg,
        lr_values=lr_values,
        lr_boundaries=lr_boundaries,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        detect=DetectionConfig(confidence_threshold=0.5),
    )
    anchors = anchors_for_preset(td.preset)

    from ssd_tensorflow_tpu.inference import model_config_to_dict

    config_dict = {
        "model": model_config_to_dict(model_cfg),
        "train": {
            "lr_values": list(lr_values),
            "lr_boundaries": list(lr_boundaries),
            "momentum": args.momentum,
            "weight_decay": args.weight_decay,
        },
        "lid2name": {str(k): v for k, v in td.lid2name.items()},
    }

    if args.profiler_port:
        # live trace server — connect TensorBoard's profiler to it
        jax.profiler.start_server(args.profiler_port)
        print(f"[i] jax.profiler server on port {args.profiler_port}")

    print("[i] Creating the model...")
    params = init_params(jax.random.PRNGKey(0), model_cfg)
    vgg_npz = os.path.join(args.vgg_dir, "vgg16.npz")
    if model_cfg.preset.backbone != "vgg":
        pass  # --vgg-dir bootstrap only applies to the VGG family
    elif start_epoch == 0 and os.path.exists(vgg_npz):
        print("[i] Loading pretrained VGG weights from", vgg_npz)
        params = load_pretrained_vgg(vgg_npz, params)
    elif start_epoch == 0:
        print(f"[!] {vgg_npz} not found — training from random init")

    state = make_train_state(params, train_cfg)
    if checkpoint_file is not None:
        print("[i] Restoring checkpoint", checkpoint_file)
        if orbax_mgr is not None:
            state = orbax_mgr.restore(state, start_epoch)
        else:
            state = restore_checkpoint(checkpoint_file, state)

    if args.data_parallel:
        data_size = args.data_parallel
    else:
        # the data axis must divide the batch; use the largest power
        # of available devices that does
        data_size = math.gcd(args.batch_size, len(jax.devices()))
    mesh = make_mesh(data=data_size)
    from jax.sharding import NamedSharding, PartitionSpec

    batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
    print(f"[i] Mesh: {dict(mesh.shape)} over {len(mesh.devices.ravel())} device(s)")
    state = shard_state(state, mesh)

    if n_proc > 1:
        from ssd_tensorflow_tpu.parallel.multihost import make_global_batch

        def global_put(batch):
            return make_global_batch(batch, mesh)
    else:
        global_put = None

    if args.qat:
        from ssd_tensorflow_tpu.models.qat import make_qat_train_step
        from ssd_tensorflow_tpu.models.quantized import (
            calibrate_activation_amax,
            calibrate_activation_scales,
        )

        # the GN families train against per-input-channel amax grids
        # (the quantize_weights_folded quantizer); VGG against per-layer
        # scales — different checkpoint keys because the units differ
        qat_family = model_cfg.preset.backbone != "vgg"
        qat_key = "qat_act_amax" if qat_family else "qat_act_scales"

        saved_scales = None
        if checkpoint_file is not None:
            if orbax_mgr is not None:
                from ssd_tensorflow_tpu.utils.checkpoint_orbax import (
                    stored_config,
                )

                saved_scales = stored_config(args.name).get(qat_key)
            else:
                from ssd_tensorflow_tpu.utils.checkpoint import (
                    checkpoint_config,
                )

                saved_scales = checkpoint_config(checkpoint_file).get(
                    qat_key
                )
        if saved_scales is not None:
            # resume: keep training against the SAME quantizer the
            # earlier epochs optimized — recalibrating on the finetuned
            # params would silently change it mid-run
            print("[i] QAT: resuming with the checkpoint's activation "
                  "scales")
            act_scales = saved_scales
        else:
            if not pre_shard_valid:
                print("[!] QAT needs validation images to calibrate int8 "
                      "scales; re-run process_dataset with "
                      "--validation-fraction > 0")
                return 1
            # calibrate on the UN-sharded validation list: the scales
            # become compile-time constants of the SPMD step, so every
            # process must derive identical values (valid_generator is
            # deterministic)
            sharded_valid = td.valid_samples
            td.valid_samples = pre_shard_valid
            calib = []
            for batch, _, n in td.valid_generator(
                local_batch_size, num_workers=0
            ):
                calib.append(batch["images"][:n])
                if sum(c.shape[0] for c in calib) >= 32:
                    break
            td.valid_samples = sharded_valid
            calib = np.concatenate(calib)[:32]
            print(f"[i] QAT: calibrating int8 scales on "
                  f"{calib.shape[0]} images")
            if qat_family:
                act_scales = calibrate_activation_amax(
                    state.params, calib, model_cfg
                )
            else:
                act_scales = calibrate_activation_scales(
                    state.params, calib, model_cfg
                )
        # persist the scales: "deploy with the SAME scales QAT trained
        # against" only works if checkpoints carry them
        # (export_model.py --quantize picks them up instead of
        # recalibrating). Family amax grids are per-input-channel
        # vectors; the config is JSON, so they store as lists.
        if qat_family:
            config_dict[qat_key] = {
                k: np.asarray(v, np.float32).tolist()
                for k, v in act_scales.items()
            }
        else:
            config_dict[qat_key] = {
                k: float(v) for k, v in act_scales.items()
            }
        from ssd_tensorflow_tpu.models.qat import make_qat_forward

        qat_fwd = make_qat_forward(model_cfg, act_scales)
        train_step = make_qat_train_step(train_cfg, anchors, act_scales)
        # evaluate the network QAT actually optimizes, not the float one
        eval_step = make_eval_step(train_cfg, anchors, forward=qat_fwd)
    else:
        train_step = make_train_step(train_cfg, anchors)
        eval_step = make_eval_step(train_cfg, anchors)

    augment_fn = None
    if args.device_augment:
        import jax.random as jrandom

        from ssd_tensorflow_tpu.data.device_augment import (
            augment_config_for,
            make_augment_fn,
        )

        aug_cfg = augment_config_for(td.preset, td.augmentation)
        augment_fn = make_augment_fn(aug_cfg, anchors)
        aug_base_key = jrandom.PRNGKey(args.augment_seed)
        print("[i] On-device augmentation:  enabled")

    # ------------------------------------------------------------------
    # Summaries + checkpoints (reference: train.py:203-241)
    # ------------------------------------------------------------------
    writer = SummaryWriter(args.tensorboard_dir)
    if args.checkpoint_backend == "orbax":
        if orbax_mgr is None:
            orbax_mgr = OrbaxCheckpointManager(
                args.name, config_dict, max_to_keep=20
            )
        else:
            orbax_mgr.set_config(config_dict)
        ckpt_mgr = orbax_mgr
        print("[i] Checkpoint backend:    orbax")
    else:
        ckpt_mgr = CheckpointManager(args.name, config_dict, max_to_keep=20)

    training_ap_calc = APCalculator()
    validation_ap_calc = APCalculator()
    labels = list(td.lname2id.keys())
    training_ap = PrecisionSummary(writer, "training", labels)
    validation_ap = PrecisionSummary(writer, "validation", labels)
    training_imgs = ImageSummary(writer, "training", td.label_colors)
    validation_imgs = ImageSummary(writer, "validation", td.label_colors)
    training_loss = LossSummary(writer, "training", td.num_train)
    validation_loss = LossSummary(writer, "validation", td.num_valid)
    net_summary = NetSummary(writer)

    if start_epoch == 0:
        net_summary.push(0, jax.device_get(state.params))
        writer.flush()

    try:
        from tqdm import tqdm
    except ImportError:
        def tqdm(x, **kw):
            return x

    n_train_batches = td.num_train_batches(local_batch_size)
    n_valid_batches = td.num_valid_batches(local_batch_size)

    # Remote-tunnel backends retain every H2D transfer in host memory
    # (docs/ENVIRONMENT.md, tools/leak_probe.py): a long run accumulates
    # ~one staged batch per step until the OOM killer ends it. Estimate
    # the exposure and point at --epochs-per-run before it happens.
    if not args.epochs_per_run and jax.default_backend() == "tpu":
        h_img, w_img = model_cfg.preset.image_size.h, model_cfg.preset.image_size.w
        batch_bytes = local_batch_size * h_img * w_img * 3
        leak = (args.epochs - start_epoch) * n_train_batches * batch_bytes
        try:
            ram = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError):
            ram = 0
        if ram and leak > ram // 2:
            print(
                f"[!] This run stages ~{leak / 2**30:.0f} GiB of batches; "
                "remote-TPU tunnel clients retain every transfer "
                "(docs/ENVIRONMENT.md) and this host has "
                f"{ram / 2**30:.0f} GiB. Consider --epochs-per-run "
                "with a restart-resume loop "
                "(tools/train_v512_segmented.sh)."
            )

    profiled = False
    # profile the second trained epoch (the first is compile noise) —
    # unless the run only spans one epoch, which would otherwise never
    # trace at all
    profile_epoch = (
        start_epoch + 1 if args.epochs - start_epoch > 1 else start_epoch
    )

    # ------------------------------------------------------------------
    # Epoch loop (reference: train.py:243-343)
    # ------------------------------------------------------------------
    # Graceful shutdown: SIGTERM/SIGUSR1 finish the current epoch, write
    # final.ckpt.npz stamped with the reached epoch (resume picks it up,
    # utils/checkpoint.py:87-100) and exit 0 — a preempted run loses
    # nothing instead of up to checkpoint_interval epochs. The handler
    # only sets a flag; the loop breaks at an epoch boundary where the
    # data generators are exhausted and the train state is consistent.
    stop_requested = []

    def _request_stop(signum, frame):  # noqa: ARG001
        stop_requested.append(signum)
        print(
            f"\n[!] Signal {signum}: will checkpoint and exit after "
            "this epoch"
        )

    for sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            signal.signal(sig, _request_stop)
        except ValueError:  # not the main thread (tests drive main())
            break

    print("[i] Training...")
    completed_epoch = start_epoch
    for e in range(start_epoch, args.epochs):
        training_imgs_samples = []
        validation_imgs_samples = []

        timer = StepTimer()
        pending_losses = []  # device scalars; fetched once per epoch
        # producer thread overlaps augmentation + H2D with device compute
        generator = prefetch_to_device(
            td.train_generator(
                local_batch_size, args.num_workers,
                raw=augment_fn is not None,
            ),
            size=2,
            sharding=batch_sharding,
            transform=lambda item: (item[0], (item[1], item[2])),
            put_fn=global_put,
        )
        description = "[i] Train {:>2}/{}".format(e + 1, args.epochs)
        for batch_i, (dev_batch, (gt_lists, num_real)) in enumerate(tqdm(
            generator, total=n_train_batches, desc=description, unit="batches"
        )):
            if args.profile_dir and not profiled and e >= profile_epoch:
                jax.profiler.start_trace(args.profile_dir)

            if augment_fn is not None:
                step_key = jrandom.fold_in(
                    jrandom.fold_in(aug_base_key, e), batch_i
                )
                dev_batch = augment_fn(step_key, dev_batch)

            # (epoch 0 skips the AP/image accounting entirely — don't pay
            # a host sync per batch for images that are never used; under
            # multi-host, only this process's rows are addressable)
            saved_images = None
            if e > 0 and len(training_imgs_samples) < 3:
                if n_proc > 1:
                    from ssd_tensorflow_tpu.parallel.multihost import (
                        local_rows,
                    )

                    saved_images = local_rows(dev_batch["images"])[:3]
                else:
                    saved_images = np.asarray(dev_batch["images"][:3])
            state, losses, dets = train_step(state, dev_batch)
            timer.step(num_real)

            if args.profile_dir and not profiled and e >= profile_epoch:
                jax.block_until_ready(losses["total"])
                jax.profiler.stop_trace()
                profiled = True
                print("[i] Profiler trace written to", args.profile_dir)

            # defer the host fetch: a per-step float() sync would stall
            # the dispatch pipeline (CLAUDE.md: honest-timing notes)
            pending_losses.append((losses, num_real))

            if e == 0:
                continue

            if n_proc > 1:
                from ssd_tensorflow_tpu.parallel.multihost import local_rows

                dets = jax.tree_util.tree_map(local_rows, dets)
            if augment_fn is not None:
                # the augmented geometry lives on device; rebuild the
                # per-image gt lists for the AP accounting (one combined
                # fetch — every host sync pays a full tunnel round trip;
                # under multi-host only local rows are addressable)
                if n_proc > 1:
                    from ssd_tensorflow_tpu.parallel.multihost import (
                        local_rows_many,
                    )

                    gt_host = tuple(local_rows_many([
                        dev_batch["gt_boxes"], dev_batch["gt_labels"],
                        dev_batch["gt_mask"],
                    ]))
                else:
                    gt_host = jax.device_get(
                        (dev_batch["gt_boxes"], dev_batch["gt_labels"],
                         dev_batch["gt_mask"])
                    )
                gt_lists = _gt_box_lists(*gt_host, td.lid2name, num_real)
            boxes_per_image = detections_to_boxes(dets, td.lid2name)
            for i in range(num_real):
                boxes = boxes_per_image[i]
                training_ap_calc.add_detections(gt_lists[i], boxes)
                if len(training_imgs_samples) < 3 and saved_images is not None:
                    training_imgs_samples.append((saved_images[i], boxes))

        for losses, num_real in jax.device_get(pending_losses):
            if math.isnan(float(losses["confidence"])):
                print("[!] Confidence loss is NaN.")
            # losses are means over the GLOBAL batch; scale by the global
            # real count (shards are equalized, so local*n_proc is exact
            # for full train batches)
            training_loss.add(
                _losses_for_summary(
                    losses, args.batch_size, num_real * n_proc
                ),
                num_real,
            )
        steps_s, imgs_s = timer.rates()
        print(
            f"[i] Epoch {e + 1} train throughput: {imgs_s:.1f} img/s "
            f"({steps_s:.2f} steps/s)"
        )

        pending_losses = []
        generator = prefetch_to_device(
            td.valid_generator(local_batch_size, args.num_workers),
            size=2,
            sharding=batch_sharding,
            transform=lambda item: (item[0], (item[1], item[2])),
            put_fn=global_put,
        )
        description = "[i] Valid {:>2}/{}".format(e + 1, args.epochs)
        for dev_batch, (gt_lists, num_real) in tqdm(
            generator, total=n_valid_batches, desc=description, unit="batches"
        ):
            losses, dets = eval_step(state.params, dev_batch)
            pending_losses.append((losses, num_real))

            if e == 0:
                continue

            if n_proc > 1:
                from ssd_tensorflow_tpu.parallel.multihost import local_rows

                dets = jax.tree_util.tree_map(local_rows, dets)
                # only fetch images while summary slots remain
                host_images = (
                    local_rows(dev_batch["images"])
                    if len(validation_imgs_samples) < 3
                    else None
                )
            else:
                host_images = None
            boxes_per_image = detections_to_boxes(dets, td.lid2name)
            for i in range(num_real):
                boxes = boxes_per_image[i]
                validation_ap_calc.add_detections(gt_lists[i], boxes)
                if len(validation_imgs_samples) < 3:
                    img_i = (
                        host_images[i]
                        if host_images is not None
                        else np.asarray(dev_batch["images"][i])
                    )
                    validation_imgs_samples.append((img_i, boxes))

        for losses, num_real in jax.device_get(pending_losses):
            validation_loss.add(
                _losses_for_summary(
                    losses, args.batch_size, num_real * n_proc
                ),
                num_real,
            )

        # -- summaries (reference: train.py:308-331) --------------------
        training_loss.push(e + 1)
        validation_loss.push(e + 1)
        net_summary.push(e + 1, jax.device_get(state.params))

        APs = training_ap_calc.compute_aps()
        mAP = APs2mAP(APs)
        training_ap.push(e + 1, mAP, APs)
        if e > 0:
            print(f"[i] Epoch {e + 1}: train mAP {mAP:.4f}", end="")

        APs = validation_ap_calc.compute_aps()
        mAP = APs2mAP(APs)
        validation_ap.push(e + 1, mAP, APs)
        if e > 0:
            print(f", valid mAP {mAP:.4f}")

        training_ap_calc.clear()
        validation_ap_calc.clear()
        training_imgs.push(e + 1, training_imgs_samples)
        validation_imgs.push(e + 1, validation_imgs_samples)
        writer.flush()

        if (e + 1) % args.checkpoint_interval == 0:
            path = ckpt_mgr.save(e + 1, state)
            print("[i] Checkpoint saved:", path)

        completed_epoch = e + 1
        if stop_requested:
            break
        if (
            args.epochs_per_run
            and completed_epoch - start_epoch >= args.epochs_per_run
        ):
            print(
                f"[i] Per-process epoch budget reached "
                f"({args.epochs_per_run}); writing a resumable checkpoint "
                f"at epoch {completed_epoch} (restart with "
                "--continue-training)"
            )
            break

    ckpt_mgr.save(completed_epoch, state, final=True)
    ckpt_mgr.wait()
    if orbax_mgr is not None:
        # the deploy chain (infer --checkpoint / export_model) consumes
        # npz — mirror the final state there (flag help promises this)
        from ssd_tensorflow_tpu.utils.checkpoint import save_checkpoint

        host_state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        save_checkpoint(
            os.path.join(args.name, "final.ckpt.npz"),
            host_state,
            dict(config_dict, epoch=int(completed_epoch)),
        )
    print("[i] Checkpoint saved:", os.path.join(args.name, "final.ckpt.npz"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
