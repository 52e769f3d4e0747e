"""Standalone detection CLI (reference: detect.py).

Runs an exported bundle over image files, writing annotated images and
per-image ``.txt`` box dumps (``label labelid cx cy w h`` — the
reference's format, detect.py:110-125). Needs only the bundle — no
training artifacts. (The reference's equivalent consumed a frozen
GraphDef + the pickled training data for label colors; the bundle
carries the label map itself.)
"""

from __future__ import annotations

import argparse
import math
import os
import sys


def build_parser():
    parser = argparse.ArgumentParser(description="Detect objects in images")
    parser.add_argument("files", nargs="+", help="image files")
    parser.add_argument(
        "--model", default="model.ssdtpu.npz", help="exported model bundle"
    )
    parser.add_argument(
        "--training-data",
        default=None,
        help="optional training-data.json for label colors",
    )
    parser.add_argument("--output-dir", default="detect-output", help="output directory")
    parser.add_argument("--batch-size", type=int, default=32, help="batch size")
    parser.add_argument("--threshold", type=float, default=0.5, help="confidence threshold")
    parser.add_argument(
        "--padded-heads", action="store_true",
        help="lane-align the classifier head groups on TPU — same math, "
        "often faster (ModelConfig.padded_heads)",
    )
    parser.add_argument(
        "--pallas-stem", action="store_true",
        help="run conv1_2+pool1 as the manual-DMA Pallas kernel "
        "(bf16 float bundles only; ops/stem_pallas.py)",
    )
    parser.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="shard each batch over N devices (params replicated, batch "
        "split on a 1-D data mesh); 0 = single device. Batch size must "
        "be divisible by N",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import cv2

    from ssd_tensorflow_tpu.inference import InferenceModel
    from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig
    from ssd_tensorflow_tpu.utils.summaries import draw_box

    print("[i] Model:      ", args.model)
    print("[i] Output dir: ", args.output_dir)
    print("[i] Batch size: ", args.batch_size)

    overrides = {}
    if args.padded_heads:
        overrides["padded_heads"] = True
    if args.pallas_stem:
        overrides["pallas_stem"] = True
    mesh = None
    if args.data_parallel:
        from ssd_tensorflow_tpu.parallel.mesh import make_mesh

        if args.batch_size % args.data_parallel:
            print(f"[!] --batch-size {args.batch_size} not divisible by "
                  f"--data-parallel {args.data_parallel}")
            return 1
        mesh = make_mesh(data=args.data_parallel)
        print(f"[i] Data-parallel mesh: {args.data_parallel} devices")
    model = InferenceModel.from_bundle(
        args.model,
        detection=DetectionConfig(
            top_k=200, confidence_threshold=args.threshold
        ),
        overrides=overrides,
        mesh=mesh,
    )
    # (incompatible --pallas-stem combinations are reported and dropped
    # by InferenceModel itself)

    colors = {}
    if args.training_data:
        import json

        with open(args.training_data) as f:
            colors = {
                k: tuple(v) for k, v in json.load(f)["colors"].items()
            }

    os.makedirs(args.output_dir, exist_ok=True)

    files = args.files
    n_batches = math.ceil(len(files) / args.batch_size)
    for off in range(0, len(files), args.batch_size):
        chunk = files[off : off + args.batch_size]
        padded = chunk + [chunk[-1]] * (args.batch_size - len(chunk))
        images, _ = model.preprocess_files(padded)
        boxes_list = model.detect_boxes(images)

        for i, fname in enumerate(chunk):
            boxes = boxes_list[i]
            base = os.path.basename(fname)
            img = cv2.imread(fname)
            lines = []
            for conf, box in boxes:
                draw_box(img, box, colors.get(box.label, (0, 255, 0)))
                lines.append(
                    f"{box.label} {box.labelid} {box.center.x} "
                    f"{box.center.y} {box.size.w} {box.size.h}\n"
                )
            cv2.imwrite(os.path.join(args.output_dir, base), img)
            with open(
                os.path.join(args.output_dir, base + ".txt"), "w"
            ) as f:
                f.writelines(lines)
            print(f"[i] {fname}: {len(boxes)} detections")

    print("[i] All done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
