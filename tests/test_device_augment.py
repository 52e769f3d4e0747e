"""On-device augmentation: color math vs OpenCV, window resampling vs a
numpy bilinear oracle, box remapping, sampler accept rule, the identity
path, determinism and the >=1-positive fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssd_tensorflow_tpu.data.device_augment import (
    AugmentConfig,
    augment_config_for,
    augment_image,
    bgr_to_hsv,
    hsv_to_bgr,
    make_augment_fn,
    remap_boxes,
    resample_window,
    _corner_iou,
    _sampler_windows,
)
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.presets import get_preset_by_name

cv2 = pytest.importorskip("cv2")


def small_cfg(**kw):
    defaults = dict(out_h=32, out_w=32, sampler_trials=8)
    defaults.update(kw)
    return AugmentConfig(**defaults)


def identity_cfg(**kw):
    """All random branches off: the chain must be a pure resize.
    Keyword overrides re-enable individual branches."""
    defaults = dict(
        brightness_prob=0.0, contrast_prob=0.0, hue_prob=0.0,
        saturation_prob=0.0, reorder_prob=0.0, expand_prob=0.0,
        sampler_overlaps=(), flip_prob=0.0, ensure_positive=False,
    )
    defaults.update(kw)
    return small_cfg(**defaults)


# ---------------------------------------------------------------------------
# Color space
# ---------------------------------------------------------------------------


class TestHSV:
    def test_roundtrip(self, rng):
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.float32)
        back = np.asarray(hsv_to_bgr(bgr_to_hsv(jnp.asarray(img))))
        np.testing.assert_allclose(back, img, atol=1e-3)

    def test_matches_opencv(self, rng):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        ours = np.asarray(bgr_to_hsv(jnp.asarray(img, jnp.float32)))
        ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
        # OpenCV quantizes H to uint8 steps and rounds S; hue wraps at 180
        dh = np.abs(ours[..., 0] - ref[..., 0])
        dh = np.minimum(dh, 180.0 - dh)
        assert dh.max() <= 1.0
        np.testing.assert_allclose(ours[..., 1], ref[..., 1], atol=1.0)
        np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=0.0)


# ---------------------------------------------------------------------------
# Window resampling
# ---------------------------------------------------------------------------


def np_bilinear_window(img, window, out_h, out_w, mean):
    """Reference resampler: per-pixel bilinear with mean fill."""
    H, W, _ = img.shape
    x0, y0, x1, y1 = window
    out = np.empty((out_h, out_w, 3), np.float64)
    for o in range(out_h):
        sy = (y0 + (o + 0.5) / out_h * (y1 - y0)) * H - 0.5
        for p in range(out_w):
            sx = (x0 + (p + 0.5) / out_w * (x1 - x0)) * W - 0.5
            acc = np.zeros(3)
            wsum = 0.0
            for iy in (int(np.floor(sy)), int(np.floor(sy)) + 1):
                for ix in (int(np.floor(sx)), int(np.floor(sx)) + 1):
                    wgt = max(0.0, 1 - abs(sy - iy)) * max(0.0, 1 - abs(sx - ix))
                    if wgt == 0.0:
                        continue
                    if 0 <= iy < H and 0 <= ix < W:
                        acc += wgt * img[iy, ix]
                        wsum += wgt
            out[o, p] = acc + (1 - wsum) * np.asarray(mean)
    return out


class TestResample:
    MEAN = (104.0, 117.0, 123.0)

    def test_identity_window_is_exact(self, rng):
        img = rng.integers(0, 256, (24, 24, 3)).astype(np.float32)
        out = resample_window(
            jnp.asarray(img), jnp.asarray([0.0, 0.0, 1.0, 1.0]),
            jnp.asarray(False), 24, 24, self.MEAN,
        )
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-3)

    def test_crop_matches_oracle(self, rng):
        img = rng.integers(0, 256, (20, 16, 3)).astype(np.float32)
        window = (0.1, 0.25, 0.7, 0.9)
        out = resample_window(
            jnp.asarray(img), jnp.asarray(window), jnp.asarray(False),
            8, 10, self.MEAN,
        )
        ref = np_bilinear_window(img, window, 8, 10, self.MEAN)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-2)

    def test_expand_window_mean_fill(self, rng):
        img = rng.integers(0, 256, (12, 12, 3)).astype(np.float32)
        # window entirely left of the image -> pure mean
        out = resample_window(
            jnp.asarray(img), jnp.asarray([-3.0, 0.0, -2.0, 1.0]),
            jnp.asarray(False), 6, 6, self.MEAN,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(self.MEAN, (6, 6, 3)), atol=1e-3
        )

    def test_oob_window_matches_oracle(self, rng):
        img = rng.integers(0, 256, (10, 10, 3)).astype(np.float32)
        window = (-0.5, -0.25, 1.2, 1.0)  # expand-style canvas
        out = resample_window(
            jnp.asarray(img), jnp.asarray(window), jnp.asarray(False),
            9, 9, self.MEAN,
        )
        ref = np_bilinear_window(img, window, 9, 9, self.MEAN)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-2)

    def test_flip(self, rng):
        img = rng.integers(0, 256, (8, 8, 3)).astype(np.float32)
        out = resample_window(
            jnp.asarray(img), jnp.asarray([0.0, 0.0, 1.0, 1.0]),
            jnp.asarray(True), 8, 8, self.MEAN,
        )
        np.testing.assert_allclose(np.asarray(out), img[:, ::-1], atol=1e-3)


# ---------------------------------------------------------------------------
# Box remapping
# ---------------------------------------------------------------------------


class TestRemapBoxes:
    def test_crop_and_center_drop(self):
        boxes = jnp.asarray(
            [
                [0.5, 0.5, 0.2, 0.2],   # center inside the window
                [0.05, 0.05, 0.1, 0.1], # center outside -> dropped
            ]
        )
        mask = jnp.asarray([True, True])
        window = jnp.asarray([0.25, 0.25, 0.75, 0.75])
        out, keep = remap_boxes(boxes, mask, window, jnp.asarray(False))
        assert bool(keep[0]) and not bool(keep[1])
        np.testing.assert_allclose(
            np.asarray(out[0]), [0.5, 0.5, 0.4, 0.4], atol=1e-6
        )

    def test_expand_shrinks(self):
        boxes = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
        mask = jnp.asarray([True])
        # 2x canvas with the image at offset (0.5, 0.5) image-units:
        # window = canvas in image coords
        window = jnp.asarray([-0.5, -0.5, 1.5, 1.5])
        out, keep = remap_boxes(boxes, mask, window, jnp.asarray(False))
        assert bool(keep[0])
        np.testing.assert_allclose(
            np.asarray(out[0]), [0.5, 0.5, 0.25, 0.25], atol=1e-6
        )

    def test_flip_mirrors_cx(self):
        boxes = jnp.asarray([[0.3, 0.6, 0.2, 0.2]])
        mask = jnp.asarray([True])
        window = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        out, _ = remap_boxes(boxes, mask, window, jnp.asarray(True))
        np.testing.assert_allclose(
            np.asarray(out[0]), [0.7, 0.6, 0.2, 0.2], atol=1e-6
        )

    def test_padded_rows_stay_dropped(self):
        boxes = jnp.zeros((3, 4))
        mask = jnp.asarray([False, False, False])
        _, keep = remap_boxes(
            boxes, mask, jnp.asarray([0.0, 0.0, 1.0, 1.0]), jnp.asarray(False)
        )
        assert not np.asarray(keep).any()


# ---------------------------------------------------------------------------
# Sampler accept rule
# ---------------------------------------------------------------------------


class TestSampler:
    def test_accepted_windows_meet_their_threshold(self):
        cfg = small_cfg(sampler_trials=64)
        # one gt box in canvas corner form via center-form in [0,1]
        boxes_c = jnp.asarray([[0.3, 0.3, 0.7, 0.7]])
        mask = jnp.asarray([True])
        hits = 0
        for seed in range(8):
            ok, windows = _sampler_windows(
                jax.random.PRNGKey(seed), boxes_c, mask, cfg
            )
            iou = np.asarray(_corner_iou(windows, boxes_c))[:, 0]
            for s, overlap in enumerate(cfg.sampler_overlaps):
                if bool(ok[s]):
                    hits += 1
                    assert iou[s] >= overlap - 1e-6
        assert hits > 0  # low thresholds accept easily

    def test_no_gt_rejects_all(self):
        cfg = small_cfg()
        ok, _ = _sampler_windows(
            jax.random.PRNGKey(0), jnp.zeros((1, 4)), jnp.asarray([False]), cfg
        )
        assert not np.asarray(ok).any()


# ---------------------------------------------------------------------------
# Full chain
# ---------------------------------------------------------------------------


class TestAugmentImage:
    ANCHORS = np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32)

    def test_identity_config_is_pure_passthrough(self, rng):
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        boxes = jnp.asarray([[0.5, 0.5, 0.4, 0.4]])
        out_img, out_boxes, _, out_mask = augment_image(
            jax.random.PRNGKey(3), jnp.asarray(img), boxes,
            jnp.asarray([2]), jnp.asarray([True]),
            jnp.asarray(self.ANCHORS), identity_cfg(),
        )
        np.testing.assert_array_equal(np.asarray(out_img), img)
        np.testing.assert_allclose(np.asarray(out_boxes), np.asarray(boxes))
        assert bool(out_mask[0])

    def test_deterministic_under_key(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        boxes = jnp.asarray([[0.5, 0.5, 0.4, 0.4]])
        args = (img, boxes, jnp.asarray([2]), jnp.asarray([True]),
                jnp.asarray(self.ANCHORS), small_cfg())
        a = augment_image(jax.random.PRNGKey(7), *args)
        b = augment_image(jax.random.PRNGKey(7), *args)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_boxes_stay_normalized(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        boxes = jnp.asarray([[0.5, 0.5, 0.4, 0.4], [0.2, 0.8, 0.1, 0.15]])
        labels = jnp.asarray([1, 2])
        mask = jnp.asarray([True, True])
        fn = jax.jit(augment_image, static_argnums=(6,))
        for seed in range(16):
            _, out_boxes, _, out_mask = fn(
                jax.random.PRNGKey(seed), img, boxes, labels, mask,
                jnp.asarray(self.ANCHORS), small_cfg(ensure_positive=False),
            )
            ob = np.asarray(out_boxes)[np.asarray(out_mask)]
            if ob.size:
                assert (ob[:, 0] >= 0).all() and (ob[:, 0] < 1).all()
                assert (ob[:, 1] >= 0).all() and (ob[:, 1] < 1).all()
                assert (ob[:, 2:] > 0).all()

    def test_ensure_positive_fallback(self, rng):
        """With anchors only matching the full-image box, every draw must
        keep at least one positive via the identity fallback."""
        img = jnp.asarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        boxes = jnp.asarray([[0.5, 0.5, 0.9, 0.9]])
        labels = jnp.asarray([0])
        mask = jnp.asarray([True])
        anchors = jnp.asarray([[0.5, 0.5, 0.9, 0.9]], jnp.float32)
        from ssd_tensorflow_tpu.ops.matching import has_positive_anchor

        cfg = small_cfg(expand_prob=1.0)  # aggressive shrink without fallback
        fn = jax.jit(augment_image, static_argnums=(6,))
        for seed in range(12):
            _, out_boxes, _, out_mask = fn(
                jax.random.PRNGKey(seed), img, boxes, labels, mask,
                anchors, cfg,
            )
            assert has_positive_anchor(
                np.asarray(out_boxes), np.asarray(out_mask), np.asarray(anchors)
            )


class TestAugmentBatch:
    def test_shapes_dtypes_and_vmap_consistency(self, rng):
        preset = get_preset_by_name("test64")
        anchors = anchors_for_preset(preset)
        cfg = augment_config_for(preset, {"sampler_trials": 8})
        assert cfg.out_h == 64 and cfg.expand_prob == 0.5
        fn = make_augment_fn(cfg, anchors)
        B, G = 4, 5
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 256, (B, 64, 64, 3), dtype=np.uint8)
            ),
            "gt_boxes": jnp.asarray(
                np.tile([[0.5, 0.5, 0.5, 0.5]], (B, G, 1)).astype(np.float32)
            ),
            "gt_labels": jnp.zeros((B, G), jnp.int32),
            "gt_mask": jnp.asarray(np.tile([True] + [False] * (G - 1), (B, 1))),
        }
        out = fn(jax.random.PRNGKey(0), batch)
        assert out["images"].shape == (B, 64, 64, 3)
        assert out["images"].dtype == jnp.uint8
        assert out["gt_boxes"].shape == (B, G, 4)
        assert out["gt_mask"].dtype == bool
        # per-image results match a direct augment_image call with the
        # same folded key
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        ref_img, ref_boxes, _, ref_mask = augment_image(
            keys[1], batch["images"][1], batch["gt_boxes"][1],
            batch["gt_labels"][1], batch["gt_mask"][1],
            jnp.asarray(anchors), cfg,
        )
        # jit+vmap may reassociate f32 math vs the eager call; allow the
        # resulting off-by-one uint8 rounding flips
        np.testing.assert_allclose(
            np.asarray(out["images"][1]).astype(int),
            np.asarray(ref_img).astype(int),
            atol=1,
        )
        np.testing.assert_allclose(
            np.asarray(out["gt_boxes"][1]), np.asarray(ref_boxes), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(out["gt_mask"][1]), np.asarray(ref_mask)
        )


class TestShardedAugment:
    def test_augment_on_8way_mesh_matches_single_device(self, rng):
        """The augmentation stage partitions over the data axis of a mesh
        with no semantic change (SPMD: per-image keys, no cross-image
        communication)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ssd_tensorflow_tpu.parallel.mesh import make_mesh

        preset = get_preset_by_name("test64")
        anchors = anchors_for_preset(preset)
        cfg = augment_config_for(preset, {"sampler_trials": 4})
        fn = make_augment_fn(cfg, anchors)
        B, G = 8, 3
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 256, (B, 64, 64, 3), dtype=np.uint8)
            ),
            "gt_boxes": jnp.asarray(
                rng.uniform(0.3, 0.6, (B, G, 4)).astype(np.float32)
            ),
            "gt_labels": jnp.zeros((B, G), jnp.int32),
            "gt_mask": jnp.ones((B, G), bool),
        }
        want = jax.tree_util.tree_map(np.asarray, fn(jax.random.PRNGKey(5), batch))

        mesh = make_mesh(data=8)
        sharding = NamedSharding(mesh, P("data"))
        sharded = jax.device_put(batch, sharding)
        got = fn(jax.random.PRNGKey(5), sharded)
        assert len(got["images"].sharding.device_set) == 8
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]).astype(np.float32),
                want[k].astype(np.float32),
                atol=1.0 if k == "images" else 1e-5,
            )


class TestDistributions:
    """Statistical checks that the random branches fire at their
    configured rates (vmapped over many images, one compile)."""

    def _run_many(self, cfg, n=256, hw=16, seed=0):
        rng = np.random.default_rng(seed)
        imgs = jnp.asarray(rng.integers(0, 256, (n, hw, hw, 3), dtype=np.uint8))
        boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.6, 0.6]]), (n, 1, 1))
        labels = jnp.zeros((n, 1), jnp.int32)
        mask = jnp.ones((n, 1), bool)
        anchors = jnp.asarray([[0.5, 0.5, 0.6, 0.6]], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        fn = jax.jit(jax.vmap(
            lambda k, i, b, l, m: augment_image(k, i, b, l, m, anchors, cfg)
        ))
        return fn(keys, imgs, boxes, labels, mask)

    def test_flip_rate_is_half(self):
        cfg = identity_cfg(flip_prob=0.5)
        # a box off-center: cx flips 0.3 <-> 0.7
        n = 256
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8))
        boxes = jnp.tile(jnp.asarray([[0.3, 0.5, 0.2, 0.2]]), (n, 1, 1))
        keys = jax.random.split(jax.random.PRNGKey(2), n)
        fn = jax.jit(jax.vmap(
            lambda k, i, b: augment_image(
                k, i, b, jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                jnp.asarray([[0.5, 0.5, 0.6, 0.6]], jnp.float32), cfg,
            )
        ))
        _, out_boxes, _, _ = fn(keys, imgs, boxes)
        cx = np.asarray(out_boxes)[:, 0, 0]
        flipped = np.isclose(cx, 0.7).mean()
        assert 0.35 < flipped < 0.65, flipped

    def test_expand_shrinks_boxes_at_configured_rate(self):
        cfg = identity_cfg(expand_prob=0.5, ensure_positive=False)
        _, out_boxes, _, out_mask = self._run_many(cfg)
        w = np.asarray(out_boxes)[:, 0, 2]
        kept = np.asarray(out_mask)[:, 0]
        # expanded images have w < 0.6 (canvas ratio > 1); identity keeps 0.6
        shrunk = (w[kept] < 0.6 - 1e-6).mean()
        assert 0.3 < shrunk < 0.7, shrunk
        # ratio <= 4 bounds the shrink
        assert (w[kept] >= 0.6 / 4.0 - 1e-6).all()

    def test_brightness_stays_within_delta(self):
        cfg = identity_cfg(brightness_prob=1.0)
        n = 64
        rng = np.random.default_rng(3)
        img = rng.integers(100, 150, (32, 32, 3), dtype=np.uint8)
        imgs = jnp.asarray(np.tile(img, (n, 1, 1, 1)))
        boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.6, 0.6]]), (n, 1, 1))
        keys = jax.random.split(jax.random.PRNGKey(4), n)
        fn = jax.jit(jax.vmap(
            lambda k, i, b: augment_image(
                k, i, b, jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
                jnp.asarray([[0.5, 0.5, 0.6, 0.6]], jnp.float32), cfg,
            )
        ))
        out, _, _, _ = fn(keys, imgs, boxes)
        deltas = np.asarray(out).astype(int) - img.astype(int)
        per_image = deltas.reshape(n, -1)
        # each image shifts uniformly by one integer delta in [-32, 32]
        assert (per_image.max(1) == per_image.min(1)).all()
        assert per_image.max() <= 32 and per_image.min() >= -32
        assert per_image.std() > 5  # and the deltas actually vary
