"""Training-data facade and batch generators.

Replaces the reference's pickled-transform artifact + fork-worker +
shared-memory-queue machinery (training_data.py, data_queue.py) with:

* a **declarative JSON artifact** (``training-data.json``) holding the
  preset and augmentation parameters — transforms are rebuilt from
  config, not unpickled as live objects;
* fixed-shape batches: images stay uint8 on the host (4x less
  host->device traffic; the jitted step casts + mean-subtracts on
  device) and ground truth ships as padded ``(B, G, 4)`` arrays because
  target assignment runs on device;
* a multiprocessing pool for augmentation workers (the rejection loops
  are the host-side hot path) with a serial fallback at
  ``num_workers=0``.

The >=1-positive resampling rule is preserved: a sample's augmentation
chain re-runs up to 50x until some anchor matches
(training_data.py:92-98), via the cheap host-side max-IoU check.
"""

from __future__ import annotations

import json
import math
import os
import pickle
import random

import numpy as np

from ssd_tensorflow_tpu.data import transforms as T
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.iou_np import canvas_corners_np
from ssd_tensorflow_tpu.presets import preset_from_dict

#: default cap on ground-truth boxes per image; VOC maxes out around 40.
MAX_GT = 60

#: resample attempts (training_data.py:94).
MAX_RESAMPLE = 50

#: the full schema of training-data.json's "augmentation" section — the
#: two knobs process_dataset exposes (matching the reference's flags,
#: process_dataset.py:178-183). Consumers (`_SampleProcessor`,
#: `device_augment.augment_config_for`) read these by name with
#: defaults, so an unknown key would silently do nothing; reject it
#: loudly instead.
AUGMENTATION_KEYS = frozenset({"sampler_trials", "expand_probability"})


def validate_augmentation_config(aug: dict, where: str) -> dict:
    """Reject unknown keys in a declarative augmentation dict."""
    unknown = set(aug) - AUGMENTATION_KEYS
    if unknown:
        raise ValueError(
            f"unknown augmentation key(s) {sorted(unknown)} in {where}; "
            f"known keys: {sorted(AUGMENTATION_KEYS)}"
        )
    return aug


# the padded-gt array layout has a single definition (transforms.py)
_boxes_to_arrays = T.boxes_to_arrays


class _SampleProcessor:
    """Runs the augmentation chain for one sample with resampling.

    Picklable (built from config) so it can cross a fork boundary into
    pool workers.
    """

    def __init__(self, preset, num_classes, aug_config, train: bool, max_gt=MAX_GT):
        self.preset = preset
        self.num_classes = num_classes
        self.train = train
        self.max_gt = max_gt
        if train:
            self.transforms = T.build_train_transforms(
                preset,
                num_classes,
                sampler_trials=aug_config.get("sampler_trials", 50),
                expand_prob=aug_config.get("expand_probability", 0.5),
            )
        else:
            self.transforms = T.build_valid_transforms(preset, num_classes)
        # anchor canvas corners for the fast positive check
        anchors = anchors_for_preset(preset)
        self._anchor_corners = canvas_corners_np(anchors)

    def _has_positive(self, boxes) -> bool:
        # ops.matching.has_positive_anchor with the corners precomputed
        # once per worker (imported lazily: matching.py pulls in jax,
        # which the host-only pipeline path doesn't otherwise need)
        from ssd_tensorflow_tpu.ops.matching import has_positive_anchor

        if not boxes:
            return False
        arr = np.array(
            [[b.center.x, b.center.y, b.size.w, b.size.h] for b in boxes]
        )
        return has_positive_anchor(
            arr, None, None, anchor_corners_np=self._anchor_corners
        )

    def __call__(self, sample):
        if self.train:
            image, gt = None, sample
            for _ in range(MAX_RESAMPLE):
                image, _, gt = T.run_transforms(sample, self.transforms)
                if self._has_positive(gt.boxes):
                    break
        else:
            image, _, gt = T.run_transforms(sample, self.transforms)
        boxes, labels, mask = _boxes_to_arrays(gt.boxes, self.max_gt)
        return image.astype(np.uint8), boxes, labels, mask, gt.boxes


_WORKER_PROC = None


def _pool_init(processor, seed_base):
    global _WORKER_PROC
    _WORKER_PROC = processor
    random.seed(seed_base + os.getpid())
    np.random.seed((seed_base + os.getpid()) % 2**31)


def _pool_process_batch(samples):
    return [_WORKER_PROC(s) for s in samples]


def _shm_producer(processor, seed_base, sample_queue, batch_queue, image_size, batch_size):
    """Worker loop: augment sample chunks, publish fixed-shape batches
    into shared memory (the reference's batch_producer,
    training_data.py:109-134). Chunk ids travel with each batch so the
    consumer can detect and re-queue work lost to a dead worker."""
    import queue as q

    random.seed(seed_base + os.getpid())
    np.random.seed((seed_base + os.getpid()) % 2**31)
    try:
        import cv2

        cv2.setNumThreads(1)
    except ImportError:
        pass
    while True:
        try:
            idx, chunk = sample_queue.get(timeout=1)
        except q.Empty:
            break
        results = [processor(s) for s in chunk]
        batch, gt_lists, n = _collate(results, batch_size, image_size)
        batch_queue.put(batch, aux=(idx, gt_lists, n))


def _collate(results, batch_size, image_size):
    """Stack per-sample results into a fixed-shape batch dict."""
    n = len(results)
    h, w = image_size.h, image_size.w
    g = results[0][1].shape[0]
    batch = {
        "images": np.zeros((batch_size, h, w, 3), dtype=np.uint8),
        "gt_boxes": np.zeros((batch_size, g, 4), dtype=np.float32),
        "gt_labels": np.zeros((batch_size, g), dtype=np.int32),
        "gt_mask": np.zeros((batch_size, g), dtype=bool),
    }
    gt_lists = []
    for i, (img, boxes, labels, mask, gt_boxes) in enumerate(results):
        batch["images"][i] = img
        batch["gt_boxes"][i] = boxes
        batch["gt_labels"][i] = labels
        batch["gt_mask"][i] = mask
        gt_lists.append(gt_boxes)
    return batch, gt_lists, n


class TrainingData:
    """Facade over the prepared dataset artifacts.

    Reads ``training-data.json`` + ``{train,valid}-samples.pkl`` written
    by the process_dataset CLI and exposes the same metadata surface as
    the reference (training_data.py:35-74): ``preset, num_classes,
    label_colors, lid2name, lname2id, num_train, num_valid,
    train_samples, valid_samples`` plus generator factories.
    """

    def __init__(self, data_dir, max_gt: int = MAX_GT):
        try:
            with open(os.path.join(data_dir, "training-data.json")) as f:
                data = json.load(f)
            with open(os.path.join(data_dir, "train-samples.pkl"), "rb") as f:
                self.train_samples = pickle.load(f)
            with open(os.path.join(data_dir, "valid-samples.pkl"), "rb") as f:
                self.valid_samples = pickle.load(f)
        except (FileNotFoundError, IOError) as e:
            raise RuntimeError(str(e))

        self.preset = preset_from_dict(data["preset"])
        self.num_classes = data["num-classes"]
        self.label_colors = {
            k: tuple(v) for k, v in data["colors"].items()
        }
        self.lid2name = {int(k): v for k, v in data["lid2name"].items()}
        self.lname2id = data["lname2id"]
        self.augmentation = validate_augmentation_config(
            data.get("augmentation", {}),
            os.path.join(data_dir, "training-data.json"),
        )
        self.max_gt = max_gt
        self.num_train = len(self.train_samples)
        self.num_valid = len(self.valid_samples)

    # -- generators -----------------------------------------------------

    def train_generator(
        self, batch_size, num_workers=0, drop_last=True, use_shm=True,
        raw=False,
    ):
        """Training batches. With ``raw=True`` the host only stages
        (decode + resize, no augmentation, no resampling) — for the
        on-device augmentation path (data/device_augment.py), which
        runs the SSD chain on the TPU instead."""
        return self.__generate(
            self.train_samples, not raw, batch_size, num_workers, drop_last,
            shuffle=True, use_shm=use_shm,
        )

    def valid_generator(self, batch_size, num_workers=0, use_shm=True):
        return self.__generate(
            self.valid_samples, False, batch_size, num_workers,
            drop_last=False, shuffle=False, use_shm=use_shm,
        )

    def num_train_batches(self, batch_size, drop_last=True):
        if drop_last:
            return self.num_train // batch_size
        return math.ceil(self.num_train / batch_size)

    def num_valid_batches(self, batch_size):
        return math.ceil(self.num_valid / batch_size)

    def __generate(
        self, samples, train, batch_size, num_workers, drop_last, shuffle,
        use_shm=True,
    ):
        processor = _SampleProcessor(
            self.preset, self.num_classes, self.augmentation, train, self.max_gt
        )
        order = list(samples)
        if shuffle:
            random.shuffle(order)
        if drop_last:
            usable = len(order) - (len(order) % batch_size)
            order = order[:usable]

        chunks = [
            order[off : off + batch_size]
            for off in range(0, len(order), batch_size)
        ]

        if num_workers > 0 and use_shm:
            yield from self.__generate_shm(
                processor, chunks, batch_size, num_workers
            )
        elif num_workers > 0:
            import multiprocessing as mp

            ctx = mp.get_context("fork")
            seed = random.randint(0, 2**30)
            try:
                import cv2

                prev_threads = cv2.getNumThreads()
                cv2.setNumThreads(1)
            except ImportError:
                prev_threads = None
            pool = ctx.Pool(
                num_workers, initializer=_pool_init, initargs=(processor, seed)
            )
            if prev_threads is not None:
                cv2.setNumThreads(prev_threads)
            try:
                for results in pool.imap(_pool_process_batch, chunks):
                    yield _collate(results, batch_size, self.preset.image_size)
            finally:
                pool.terminate()
                pool.join()
        else:
            for chunk in chunks:
                results = [processor(s) for s in chunk]
                yield _collate(results, batch_size, self.preset.image_size)

    def __generate_shm(self, processor, chunks, batch_size, num_workers):
        """Process workers + shared-memory batch transport (the
        reference's parallel path, training_data.py:144-195)."""
        import multiprocessing as mp

        from ssd_tensorflow_tpu.data.shm_queue import ShmBatchQueue

        ctx = mp.get_context("fork")
        h, w = self.preset.image_size.h, self.preset.image_size.w
        g = self.max_gt
        specs = {
            "images": ((batch_size, h, w, 3), np.uint8),
            "gt_boxes": ((batch_size, g, 4), np.float32),
            "gt_labels": ((batch_size, g), np.int32),
            "gt_mask": ((batch_size, g), np.bool_),
        }
        batch_queue = ShmBatchQueue(specs, maxsize=num_workers * 5, ctx=ctx)
        # capacity for one full re-queue of every chunk after worker loss
        sample_queue = ctx.Queue(max(2 * len(chunks), 1))
        for item in enumerate(chunks):
            sample_queue.put(item)

        seed = random.randint(0, 2**30)
        try:
            import cv2

            prev_threads = cv2.getNumThreads()
            cv2.setNumThreads(1)
        except ImportError:
            prev_threads = None

        def spawn(i):
            p = ctx.Process(
                target=_shm_producer,
                args=(
                    processor, seed + i, sample_queue, batch_queue,
                    self.preset.image_size, batch_size,
                ),
                daemon=True,
            )
            p.start()
            return p

        workers = [spawn(i) for i in range(num_workers)]
        if prev_threads is not None:
            cv2.setNumThreads(prev_threads)

        # Consumer with worker supervision. The reference blocks forever
        # if a producer dies mid-epoch (training_data.py:186-189 — the
        # dead worker "silently shrinks the epoch"; SURVEY §5). Here a
        # get() timeout triggers liveness checks: undelivered chunks are
        # re-queued and dead workers replaced; duplicate deliveries
        # (a slow-but-alive worker racing a re-queue) are dropped by the
        # pending-id check.
        import queue as q

        pending = set(range(len(chunks)))
        respawns = 0
        try:
            while pending:
                try:
                    batch, (idx, gt_lists, n) = batch_queue.get(timeout=5)
                except q.Empty:
                    # a worker that drained the sample queue exits 0 —
                    # that's completion, not death; only respawn for
                    # abnormal exits (crash/SIGKILL)
                    dead = [
                        p for p in workers
                        if not p.is_alive() and p.exitcode not in (0, None)
                    ]
                    alive = [p for p in workers if p.is_alive()]
                    if not dead:
                        continue  # just a slow batch (or clean exits)
                    if respawns >= 3 * num_workers:
                        raise RuntimeError(
                            "augmentation workers keep dying "
                            f"({respawns} respawns); giving up"
                        )
                    print(
                        f"[!] {len(dead)} augmentation worker(s) died; "
                        f"re-queueing {len(pending)} undelivered chunks"
                    )
                    for i in sorted(pending):
                        try:
                            sample_queue.put((i, chunks[i]), timeout=1)
                        except q.Full:
                            break  # retried on the next timeout round
                    new = [spawn(1000 + respawns + k) for k in range(len(dead))]
                    respawns += len(dead)
                    workers = alive + new
                    continue
                if idx in pending:
                    pending.discard(idx)
                    yield batch, gt_lists, n
            for p in workers:
                p.join(timeout=10)
        finally:
            for p in workers:
                if p.is_alive():
                    p.terminate()
            batch_queue.close()
