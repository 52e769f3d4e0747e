"""Inference / evaluation CLI (reference: infer.py).

Runs a trained model over explicit files or a dataset sample, and per
flags: annotates images, dumps raw predictions, computes VOC AP/mAP,
and writes Pascal eval-server submission files.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

from ssd_tensorflow_tpu.data.sources import load_data_source
from ssd_tensorflow_tpu.eval.average_precision import APCalculator, APs2mAP
from ssd_tensorflow_tpu.eval.pascal_summary import PascalSummary
from ssd_tensorflow_tpu.inference import InferenceModel
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
from ssd_tensorflow_tpu.types import Size, str2bool
from ssd_tensorflow_tpu.utils.checkpoint import find_checkpoint


def build_parser():
    parser = argparse.ArgumentParser(description="SSD inference")
    parser.add_argument("files", nargs="*", help="files to infer on")
    parser.add_argument("--name", default="test", help="project name")
    parser.add_argument(
        "--checkpoint", type=int, default=-1, help="checkpoint to restore; -1 is the most recent"
    )
    parser.add_argument(
        "--bundle", default=None,
        help="evaluate an exported inference bundle (float or int8, "
        "export_model.py output) instead of a training checkpoint — "
        "runs the exact deployed program through the same mAP/"
        "pascal-summary machinery",
    )
    parser.add_argument(
        "--training-data",
        default="pascal-voc/training-data.json",
        help="training data artifact (for label names and colors)",
    )
    parser.add_argument("--output-dir", default="test-output", help="output directory")
    parser.add_argument("--annotate", type=str2bool, default="False", help="annotate images")
    parser.add_argument(
        "--dump-predictions", type=str2bool, default="False",
        help="dump raw predictions as .npy",
    )
    parser.add_argument(
        "--compute-stats", type=str2bool, default="True",
        help="compute AP/mAP (requires --data-source)",
    )
    parser.add_argument("--data-source", default=None, help="dataset source")
    parser.add_argument("--data-dir", default="pascal-voc", help="dataset directory")
    parser.add_argument("--batch-size", type=int, default=32, help="batch size")
    parser.add_argument(
        "--sample", default="test", choices=["test", "trainval"], help="dataset sample"
    )
    parser.add_argument("--threshold", type=float, default=0.5, help="confidence threshold")
    parser.add_argument(
        "--padded-heads", action="store_true",
        help="lane-align the classifier head groups on TPU — same math, "
        "often faster (ModelConfig.padded_heads)",
    )
    parser.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="shard each batch over N devices (params replicated, batch "
        "split on a 1-D data mesh); 0 = single device. Batch size must "
        "be divisible by N",
    )
    parser.add_argument(
        "--pascal-summary", type=str2bool, default="False",
        help="write Pascal eval-server submission files",
    )
    parser.add_argument(
        "--coco-results", type=str2bool, default="False",
        help="write detections as a COCO results JSON "
        "(<output-dir>/coco_results.json, COCOeval-consumable; image "
        "and category ids come from the --data-source coco maps)",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    for k, v in sorted(vars(args).items()):
        print(f"[i] {k.replace('_', ' ').capitalize():24s}: {v}")

    # checkpoint (reference: infer.py:107-126)
    if args.bundle:
        ckpt_path = None
        print("[i] Bundle:", args.bundle)
    else:
        ckpt_path, epoch = find_checkpoint(args.name, args.checkpoint)
        if ckpt_path is None:
            print("[!] No checkpoints found in", args.name)
            return 1
        print("[i] Checkpoint:", ckpt_path)

    # label colors/names from the training-data artifact — the fallback
    # when no --data-source is given (reference: infer.py:131-142 always
    # reads them from training-data.pkl)
    td_colors = {}
    if args.training_data and os.path.exists(args.training_data):
        try:
            with open(args.training_data) as f:
                td = json.load(f)
            td_colors = {k: tuple(v) for k, v in td.get("colors", {}).items()}
            print("[i] Label colors loaded from", args.training_data)
        except (OSError, ValueError) as e:
            print(f"[!] Could not read {args.training_data}: {e}")

    # dataset-provided files + ground truth
    source = None
    gt_by_file = {}
    files = list(args.files)
    if args.data_source:
        print("[i] Configuring the data source...")
        source = load_data_source(args.data_source)
        if args.sample == "test":
            source.load_test_data(args.data_dir)
            samples = source.test_samples
        else:
            source.load_trainval_data(args.data_dir, 0)
            samples = source.train_samples
        for s in samples:
            gt_by_file[s.filename] = s.boxes
        # skip sample files already passed explicitly — processing a
        # file twice would double-register its gt in APCalculator and
        # skew mAP
        explicit = set(files)
        files += [s.filename for s in samples if s.filename not in explicit]

    if not files:
        print("[!] No files to process")
        return 1

    detection = DetectionConfig(top_k=200, confidence_threshold=args.threshold)
    overrides = {"padded_heads": True} if args.padded_heads else {}
    mesh = None
    if args.data_parallel:
        from ssd_tensorflow_tpu.parallel.mesh import make_mesh

        if args.batch_size % args.data_parallel:
            print(f"[!] --batch-size {args.batch_size} not divisible by "
                  f"--data-parallel {args.data_parallel}")
            return 1
        mesh = make_mesh(data=args.data_parallel)
        print(f"[i] Data-parallel mesh:    {args.data_parallel} devices")
    if args.bundle:
        model = InferenceModel.from_bundle(
            args.bundle, detection=detection, overrides=overrides, mesh=mesh
        )
    else:
        model = InferenceModel.from_checkpoint(
            ckpt_path, detection=detection, overrides=overrides, mesh=mesh
        )

    os.makedirs(args.output_dir, exist_ok=True)

    ap_calc = APCalculator() if (args.compute_stats and gt_by_file) else None
    summary = PascalSummary() if args.pascal_summary else None
    coco_results = None
    if args.coco_results:
        from ssd_tensorflow_tpu.eval.coco_results import CocoResultsWriter

        coco_results = CocoResultsWriter(
            image_ids=getattr(source, "image_ids", None),
            cat_ids=getattr(source, "cat_ids", None),
        )

    try:
        from tqdm import tqdm
    except ImportError:
        def tqdm(x, **kw):
            return x

    n_batches = math.ceil(len(files) / args.batch_size)
    for off in tqdm(
        range(0, len(files), args.batch_size),
        total=n_batches,
        desc="[i] Processing",
        unit="batches",
    ):
        chunk = files[off : off + args.batch_size]
        # fixed-shape batches keep one compiled program: pad + trim
        padded = chunk + [chunk[-1]] * (args.batch_size - len(chunk))
        images, sizes = model.preprocess_files(padded)
        if args.dump_predictions:
            # raw (B, A, K+5) result tensor needed — the full-softmax path
            result, dets = model.run(images)
            from ssd_tensorflow_tpu.ops.postprocess import (
                detections_to_boxes,
            )

            boxes_list = detections_to_boxes(dets, model.lid2name)
        else:
            # throughput scores path (lazy softmax, cells-minor; honors
            # --padded-heads) — decode parity with the result path is
            # oracle-tested (tests/test_reference_parity.py)
            boxes_list = model.detect_boxes(images)

        for i, fname in enumerate(chunk):
            boxes = boxes_list[i]
            base = os.path.basename(fname)
            if args.annotate:
                import cv2

                from ssd_tensorflow_tpu.utils.summaries import draw_box

                img = cv2.imread(fname)
                # colors from the source when available, else from the
                # training-data artifact
                colors = getattr(source, "colors", None) or td_colors
                for conf, box in boxes:
                    draw_box(img, box, colors.get(box.label, (0, 255, 0)))
                cv2.imwrite(os.path.join(args.output_dir, base), img)
            if args.dump_predictions:
                np.save(
                    os.path.join(args.output_dir, base + ".npy"),
                    np.asarray(result[i]),
                )
            if ap_calc is not None and fname in gt_by_file:
                ap_calc.add_detections(gt_by_file[fname], boxes)
            if summary is not None:
                summary.add_detections(fname, boxes)
            if coco_results is not None:
                # true size already known from preprocess — no second
                # cv2 decode (host JPEG decode is the 1-core ceiling)
                coco_results.add_detections(fname, boxes, Size(*sizes[i]))

    if ap_calc is not None:
        aps = ap_calc.compute_aps()
        for k in sorted(aps):
            print(f"[i] AP [{k}]: {aps[k]:.4f}")
        print(f"[i] mAP: {APs2mAP(aps):.4f}")

    if summary is not None:
        summary.write_summary(args.output_dir)
        print("[i] Pascal summary written to", args.output_dir)

    if coco_results is not None:
        results_path = os.path.join(args.output_dir, "coco_results.json")
        coco_results.write_results(results_path)
        print("[i] COCO results written to", results_path)

    print("[i] All done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
