"""COCO source through the real CLI chain (VERDICT r3 item 7).

``test_coco_source.py`` proves the COCO plugin's parsing/split policy at
the unit level; this module proves the *contract* end to end — a second
real annotation format (COCO instances JSON, the reference's documented
extension point, reference utils.py:48-54 / README.md:12-14) driving the
same process_dataset → train → infer chain VOC does, with zero
source-specific branches downstream.

The fixture is a learnable mini-COCO: two classes with distinct
color+shape signatures (like tools/make_minivoc.py, but in the COCO
on-disk layout: annotations/instances_<split>.json + split image dirs,
0-based [x, y, w, h] boxes).
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

# COCO class names the fixture uses (the source maps categories by name)
_CLASSES = {"person": (40, 40, 230), "dog": (40, 230, 40)}


def _make_split(root, split, n_images, rng, with_boxes=True):
    img_dir = os.path.join(root, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        w, h = 160, 120
        img = rng.integers(0, 50, (h, w, 3)).astype(np.uint8)
        boxes = []
        for _ in range(int(rng.integers(1, 3))):
            name = list(_CLASSES)[int(rng.integers(0, len(_CLASSES)))]
            bw = int(rng.uniform(0.25, 0.5) * w)
            bh = int(rng.uniform(0.25, 0.5) * h)
            x0 = int(rng.integers(0, w - bw))
            y0 = int(rng.integers(0, h - bh))
            color = _CLASSES[name]
            if name == "person":
                cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), color, -1)
            else:
                cv2.ellipse(
                    img, (x0 + bw // 2, y0 + bh // 2), (bw // 2, bh // 2),
                    0, 0, 360, color, -1,
                )
            boxes.append((name, x0, y0, bw, bh))
        fn = f"{split}_{i:03d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn), img)
        images.append({"id": i, "file_name": fn, "width": w, "height": h})
        if with_boxes:
            for name, x0, y0, bw, bh in boxes:
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": i,
                        "category_id": 1 if name == "person" else 18,
                        "bbox": [x0, y0, bw, bh],
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
    doc = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 18, "name": "dog"},
        ],
    }
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, f"instances_{split}.json"), "w") as f:
        json.dump(doc, f)


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_coco"))
    rng = np.random.default_rng(3)
    _make_split(root, "train2017", 16, rng)
    _make_split(root, "val2017", 4, rng)
    # unlike COCO's public test set, the fixture test split keeps its
    # boxes so infer --compute-stats has ground truth to score against
    _make_split(root, "test2017", 4, rng)
    return root


@pytest.mark.e2e
@pytest.mark.slow
def test_coco_cli_chain(mini_coco, tmp_path):
    """process_dataset → train → infer, all with --data-source coco."""
    from ssd_tensorflow_tpu.cli.infer import main as infer_main
    from ssd_tensorflow_tpu.cli.process_dataset import main as process_main
    from ssd_tensorflow_tpu.cli.train import main as train_main

    rc = process_main(
        [
            "--data-source", "coco",
            "--data-dir", mini_coco,
            "--preset", "test64",
            "--compute-td", "True",
            "--process-test", "True",
            "--sampler-trials", "3",
        ]
    )
    assert rc in (0, None)
    with open(os.path.join(mini_coco, "training-data.json")) as f:
        td = json.load(f)
    assert td["num-classes"] == 80
    assert td["preset"]["name"] == "test64"

    name = str(tmp_path / "coco-proj")
    rc = train_main(
        [
            "--name", name,
            "--data-dir", mini_coco,
            "--epochs", "3",
            "--batch-size", "4",
            "--tensorboard-dir", str(tmp_path / "coco-tb"),
            "--checkpoint-interval", "3",
            "--num-workers", "0",
            "--compute-dtype", "float32",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(name, "final.ckpt.npz"))

    out_dir = str(tmp_path / "coco-infer")
    rc = infer_main(
        [
            "--name", name,
            "--training-data", os.path.join(mini_coco, "training-data.json"),
            "--data-source", "coco",
            "--data-dir", mini_coco,
            "--sample", "test",
            "--compute-stats", "yes",
            "--annotate", "yes",
            "--threshold", "0.01",
            "--batch-size", "4",
            "--output-dir", out_dir,
            "--coco-results", "yes",
        ]
    )
    assert rc == 0
    # every test image was annotated (the chain saw all 4 COCO test files)
    annotated = [f for f in os.listdir(out_dir) if f.endswith(".jpg")]
    assert len(annotated) == 4
    # the COCO results JSON is written and references only known image
    # ids / category ids (eval/coco_results.py — COCOeval-consumable)
    with open(os.path.join(out_dir, "coco_results.json")) as f:
        results = json.load(f)
    assert isinstance(results, list)
    from ssd_tensorflow_tpu.data.source_coco import COCO_CATEGORY_IDS

    test_image_ids = set(range(4))
    for r in results:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert r["image_id"] in test_image_ids
        assert r["category_id"] in COCO_CATEGORY_IDS
        x, y, w, h = r["bbox"]
        assert w > 0 and h > 0
