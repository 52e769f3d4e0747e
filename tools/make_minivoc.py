#!/usr/bin/env python3
"""Generate the miniVOC fixture: a tiny Pascal-VOC-format dataset.

Real VOC is not fetchable from this environment (docs/DATA_ACCESS.md),
so this builds a deterministic ~200-image dataset in the genuine
VOCdevkit on-disk format — directory layout, XML annotation schema
(1-based inclusive pixel boxes, <size>, <difficult>), ImageSets/Main
lists — with synthetic-but-learnable content: each of the 20 VOC classes
has a unique color+shape signature. The pascal_voc source, the split
policy (VOC07-test used as training data, unlisted VOC12 annotations as
validation — reference source_pascal_voc.py:150-171), and the
eval-server summary writer are thereby exercised end-to-end on real
VOC-format data.

Layout produced under --out:
  trainval/VOCdevkit/VOC2007/{Annotations,ImageSets/Main,JPEGImages}
  trainval/VOCdevkit/VOC2012/...   (some annotations unlisted -> valid)
  test/VOCdevkit/VOC2007/...       (test.txt -> becomes training data)
  test/VOCdevkit/VOC2012/...       (test.txt -> the eval set)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

# class -> (BGR fill color, shape) — 20 visually distinct signatures
_SHAPES = ("rect", "ellipse", "triangle", "cross")
_COLORS = [
    (40, 40, 230), (40, 230, 40), (230, 40, 40), (40, 230, 230),
    (230, 40, 230), (230, 230, 40), (20, 120, 240), (240, 120, 20),
    (120, 240, 20), (150, 150, 240), (240, 150, 150), (150, 240, 150),
    (60, 60, 120), (120, 60, 60), (60, 120, 60), (200, 200, 200),
    (30, 200, 140), (140, 30, 200), (200, 140, 30), (90, 90, 90),
]
CLASS_STYLE = {
    name: (_COLORS[i], _SHAPES[i % len(_SHAPES)])
    for i, name in enumerate(VOC_CLASSES)
}

_IMAGE_DIMS = [(500, 375), (375, 500), (500, 333), (333, 500), (500, 500)]

_XML_TEMPLATE = """<annotation>
\t<folder>{folder}</folder>
\t<filename>{filename}</filename>
\t<source>
\t\t<database>The miniVOC synthetic Database</database>
\t\t<annotation>PASCAL VOC2007</annotation>
\t</source>
\t<size>
\t\t<width>{width}</width>
\t\t<height>{height}</height>
\t\t<depth>3</depth>
\t</size>
\t<segmented>0</segmented>
{objects}</annotation>
"""

_OBJ_TEMPLATE = """\t<object>
\t\t<name>{name}</name>
\t\t<pose>Unspecified</pose>
\t\t<truncated>0</truncated>
\t\t<difficult>0</difficult>
\t\t<bndbox>
\t\t\t<xmin>{xmin}</xmin>
\t\t\t<ymin>{ymin}</ymin>
\t\t\t<xmax>{xmax}</xmax>
\t\t\t<ymax>{ymax}</ymax>
\t\t</bndbox>
\t</object>
"""


def _draw_object(img, cls, x0, y0, x1, y1, rng):
    import cv2

    color, shape = CLASS_STYLE[cls]
    jitter = rng.integers(-15, 16, 3)
    color = tuple(int(np.clip(c + j, 0, 255)) for c, j in zip(color, jitter))
    if shape == "rect":
        cv2.rectangle(img, (x0, y0), (x1, y1), color, -1)
    elif shape == "ellipse":
        cv2.ellipse(
            img, ((x0 + x1) // 2, (y0 + y1) // 2),
            ((x1 - x0) // 2, (y1 - y0) // 2), 0, 0, 360, color, -1,
        )
    elif shape == "triangle":
        pts = np.array(
            [[(x0 + x1) // 2, y0], [x0, y1], [x1, y1]], np.int32
        )
        cv2.fillPoly(img, [pts], color)
    else:  # cross
        w3, h3 = max((x1 - x0) // 3, 1), max((y1 - y0) // 3, 1)
        cv2.rectangle(img, (x0 + w3, y0), (x1 - w3, y1), color, -1)
        cv2.rectangle(img, (x0, y0 + h3), (x1, y1 - h3), color, -1)


def _make_image(rng, width, height, max_objects):
    import cv2

    img = rng.integers(0, 60, (height, width, 3)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 0)
    objects = []
    for _ in range(int(rng.integers(1, max_objects + 1))):
        cls = VOC_CLASSES[int(rng.integers(0, len(VOC_CLASSES)))]
        bw = int(rng.uniform(0.18, 0.55) * width)
        bh = int(rng.uniform(0.18, 0.55) * height)
        x0 = int(rng.integers(0, width - bw))
        y0 = int(rng.integers(0, height - bh))
        _draw_object(img, cls, x0, y0, x0 + bw, y0 + bh, rng)
        # VOC bndbox is 1-based inclusive
        objects.append((cls, x0 + 1, y0 + 1, x0 + bw, y0 + bh))
    return img, objects


def _write_split(root, folder, ids_content, rng, max_objects, quality=92):
    """ids_content: list of (image_id, listed: bool)."""
    import cv2

    annot = os.path.join(root, "Annotations")
    imgs = os.path.join(root, "JPEGImages")
    sets = os.path.join(root, "ImageSets", "Main")
    for d in (annot, imgs, sets):
        os.makedirs(d, exist_ok=True)

    listed = []
    for image_id, is_listed in ids_content:
        width, height = _IMAGE_DIMS[int(rng.integers(0, len(_IMAGE_DIMS)))]
        img, objects = _make_image(rng, width, height, max_objects)
        fname = image_id + ".jpg"
        cv2.imwrite(
            os.path.join(imgs, fname), img,
            [cv2.IMWRITE_JPEG_QUALITY, quality],
        )
        objs = "".join(
            _OBJ_TEMPLATE.format(name=c, xmin=a, ymin=b, xmax=cc, ymax=d)
            for c, a, b, cc, d in objects
        )
        with open(os.path.join(annot, image_id + ".xml"), "w") as f:
            f.write(
                _XML_TEMPLATE.format(
                    folder=folder, filename=fname,
                    width=width, height=height, objects=objs,
                )
            )
        if is_listed:
            listed.append(image_id)
    return listed


def generate(out_dir, n07_trainval=60, n12_trainval=60, n12_unlisted=20,
             n07_test=30, n12_test=30, max_objects=3, seed=7):
    rng = np.random.default_rng(seed)

    # VOC2007 trainval
    root = os.path.join(out_dir, "trainval", "VOCdevkit", "VOC2007")
    ids = [(f"00{i:04d}", True) for i in range(n07_trainval)]
    listed = _write_split(root, "VOC2007", ids, rng, max_objects)
    with open(os.path.join(root, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(listed) + "\n")

    # VOC2012 trainval: n12_trainval listed + n12_unlisted annotated but
    # absent from the list -> they become the validation set under the
    # reference split policy
    root = os.path.join(out_dir, "trainval", "VOCdevkit", "VOC2012")
    ids = [(f"2012_00{i:04d}", i < n12_trainval)
           for i in range(n12_trainval + n12_unlisted)]
    listed = _write_split(root, "VOC2012", ids, rng, max_objects)
    with open(os.path.join(root, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(listed) + "\n")

    # VOC2007 test (becomes training data under the split policy)
    root = os.path.join(out_dir, "test", "VOCdevkit", "VOC2007")
    ids = [(f"00{i:04d}", True) for i in range(9000, 9000 + n07_test)]
    listed = _write_split(root, "VOC2007", ids, rng, max_objects)
    with open(os.path.join(root, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(listed) + "\n")

    # VOC2012 test (the eval set)
    root = os.path.join(out_dir, "test", "VOCdevkit", "VOC2012")
    ids = [(f"2012_00{i:04d}", True) for i in range(9000, 9000 + n12_test)]
    listed = _write_split(root, "VOC2012", ids, rng, max_objects)
    with open(os.path.join(root, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(listed) + "\n")

    total = n07_trainval + n12_trainval + n12_unlisted + n07_test + n12_test
    print(f"[i] miniVOC written to {out_dir}: {total} images")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="tests/fixtures/minivoc")
    ap.add_argument("--n07-trainval", type=int, default=60)
    ap.add_argument("--n12-trainval", type=int, default=60)
    ap.add_argument("--n12-unlisted", type=int, default=20)
    ap.add_argument("--n07-test", type=int, default=30)
    ap.add_argument("--n12-test", type=int, default=30)
    ap.add_argument("--max-objects", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args(argv)
    generate(
        args.out, args.n07_trainval, args.n12_trainval, args.n12_unlisted,
        args.n07_test, args.n12_test, args.max_objects, args.seed,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
