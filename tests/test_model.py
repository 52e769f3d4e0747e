"""Model tests: forward shapes, head/anchor ordering contract, loss math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.loss import (
    l2_regularizer,
    multibox_loss,
    smooth_l1,
    total_loss,
)
from ssd_tensorflow_tpu.models.ssd_vgg import (
    ModelConfig,
    apply_model,
    apply_result,
    init_params,
)
from ssd_tensorflow_tpu.models.vgg16 import decimate_fc6, decimate_fc7


@pytest.fixture(scope="module")
def test64_setup():
    """Tiny 4-map preset: exercises every model contract in seconds."""
    cfg = ModelConfig(
        preset_name="test64", num_classes=20, compute_dtype="float32"
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestForward:
    def test_test64_shapes(self, test64_setup):
        cfg, params = test64_setup
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        logits, locs = apply_model(params, x, cfg)
        assert logits.shape == (1, 372, 21)
        assert locs.shape == (1, 372, 4)
        assert logits.dtype == jnp.float32

    @pytest.mark.slow
    def test_vgg300_shapes(self):
        cfg = ModelConfig(
            preset_name="vgg300", num_classes=20, compute_dtype="float32"
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 300, 300, 3), jnp.float32)
        logits, locs = apply_model(params, x, cfg)
        assert logits.shape == (1, 8732, 21)
        assert locs.shape == (1, 8732, 4)
        assert logits.dtype == jnp.float32

    @pytest.mark.slow
    def test_vgg512_shapes(self):
        cfg = ModelConfig(
            preset_name="vgg512", num_classes=20, compute_dtype="float32"
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 512, 512, 3), jnp.float32)
        logits, locs = apply_model(params, x, cfg)
        assert logits.shape == (1, 24564, 21)
        assert locs.shape == (1, 24564, 4)

    def test_result_tensor(self, test64_setup):
        cfg, params = test64_setup
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        result = apply_result(params, x, cfg)
        assert result.shape == (1, 372, 25)
        probs = np.asarray(result[..., :21])
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    def test_bfloat16_compute(self, test64_setup):
        _, params = test64_setup
        cfg = ModelConfig(
            preset_name="test64", num_classes=20, compute_dtype="bfloat16"
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        logits, locs = apply_model(params, x, cfg)
        assert logits.dtype == jnp.float32  # outputs promoted back

    def test_head_ordering_contract(self, test64_setup):
        """Perturbing head j of map m must only move predictions in that
        head's anchor slice — locks the heads-major concat order against
        the anchor generator."""
        from ssd_tensorflow_tpu.presets import get_preset_by_name

        cfg, params = test64_setup
        preset = get_preset_by_name("test64")
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 50

        base_logits, _ = apply_model(params, x, cfg)
        base = np.asarray(base_logits[0])

        map_i, head_j = 2, 1  # conv8_2 map, second anchor shape
        nv = cfg.num_vars
        p2 = jax.tree_util.tree_map(lambda a: a, params)
        w = p2[f"classifier{map_i}"]["w"]
        w = w.at[..., head_j * nv : (head_j + 1) * nv].add(0.5)
        p2[f"classifier{map_i}"] = {
            "w": w,
            "b": p2[f"classifier{map_i}"]["b"],
        }
        new_logits, _ = apply_model(p2, x, cfg)
        new = np.asarray(new_logits[0])

        changed = np.any(np.abs(new - base) > 1e-5, axis=-1)
        # expected anchor slice for (map_i, head_j)
        start = 0
        for k in range(map_i):
            m = preset.maps[k]
            start += m.num_shapes * m.size.w * m.size.h
        cells = preset.maps[map_i].size.w * preset.maps[map_i].size.h
        lo = start + head_j * cells
        hi = lo + cells
        assert changed[lo:hi].all()
        changed[lo:hi] = False
        assert not changed.any(), "perturbation leaked outside the head slice"


class TestDecimation:
    def test_fc6(self):
        w = np.arange(7 * 7 * 512 * 4096, dtype=np.float32).reshape(
            7, 7, 512, 4096
        )
        b = np.arange(4096, dtype=np.float32)
        mw, mb = decimate_fc6(w, b)
        assert mw.shape == (3, 3, 512, 1024)
        assert mb.shape == (1024,)
        # spot-check the reference's index map: mod_w[h,w,:,i] = orig[3h,3w,:,4i]
        assert mw[1, 2, 17, 5] == w[3, 6, 17, 20]
        assert mb[7] == b[28]

    def test_fc7(self):
        w = np.arange(4096 * 4096, dtype=np.float32).reshape(1, 1, 4096, 4096)
        b = np.arange(4096, dtype=np.float32)
        mw, mb = decimate_fc7(w, b)
        assert mw.shape == (1, 1, 1024, 1024)
        assert mw[0, 0, 3, 5] == w[0, 0, 12, 20]
        assert mb[9] == b[36]


def _reference_loss_np(logits, locs, labels, K):
    """From-spec numpy oracle of the multibox loss (ssdvgg.py:375-560)."""
    B, A = logits.shape[:2]
    gt_cl = labels[:, :, : K + 1]
    gt_loc = labels[:, :, K + 1 :]
    neg_num = (gt_cl[:, :, -1] != 0).sum(1)
    pos_num = A - neg_num
    pos_mask = gt_cl[:, :, -1] == 0

    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    ce = -(gt_cl * logp).sum(-1)

    conf = np.zeros(B)
    locl = np.zeros(B)
    for b in range(B):
        if pos_num[b] == 0:
            continue
        pos_sum = ce[b][pos_mask[b]].sum()
        negs = np.sort(ce[b][~pos_mask[b]])[::-1]
        keep = min(neg_num[b], 3 * pos_num[b])
        conf[b] = (pos_sum + negs[:keep].sum()) / pos_num[b]

        diff = locs[b] - gt_loc[b]
        sl1 = np.where(np.abs(diff) < 1, 0.5 * diff**2, np.abs(diff) - 0.5)
        locl[b] = sl1.sum(-1)[pos_mask[b]].sum() / pos_num[b]
    return conf.mean(), locl.mean()


class TestLoss:
    def _random_labels(self, rng, B, A, K, frac_pos=0.05):
        labels = np.zeros((B, A, K + 5), dtype=np.float32)
        labels[:, :, K] = 1.0
        for b in range(B):
            npos = int(A * frac_pos) if b != 1 else 0  # sample 1: no positives
            idx = rng.choice(A, npos, replace=False)
            cls = rng.integers(0, K, npos)
            labels[b, idx, K] = 0.0
            labels[b, idx, cls] = 1.0
            labels[b, idx, K + 1 :] = rng.normal(0, 1, (npos, 4))
        return labels

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(5)
        B, A, K = 3, 128, 20
        logits = rng.normal(0, 2, (B, A, K + 1)).astype(np.float32)
        locs = rng.normal(0, 1, (B, A, 4)).astype(np.float32)
        labels = self._random_labels(rng, B, A, K)

        got = multibox_loss(
            jnp.asarray(logits), jnp.asarray(locs), jnp.asarray(labels), K
        )
        want_conf, want_loc = _reference_loss_np(logits, locs, labels, K)
        np.testing.assert_allclose(got["confidence"], want_conf, rtol=1e-4)
        np.testing.assert_allclose(got["localization"], want_loc, rtol=1e-4)

    def test_no_positives_gives_zero(self):
        K, A = 20, 64
        labels = np.zeros((2, A, K + 5), dtype=np.float32)
        labels[:, :, K] = 1.0
        logits = np.random.default_rng(0).normal(size=(2, A, K + 1)).astype(
            np.float32
        )
        locs = np.zeros((2, A, 4), dtype=np.float32)
        got = multibox_loss(jnp.asarray(logits), jnp.asarray(locs), jnp.asarray(labels), K)
        assert float(got["confidence"]) == 0.0
        assert float(got["localization"]) == 0.0

    def test_l2_covers_all_filters(self, test64_setup):
        cfg, params = test64_setup
        l2 = float(l2_regularizer(params))
        manual = 0.0
        for name, leaf in params.items():
            if isinstance(leaf, dict) and "w" in leaf:
                manual += 0.5 * float(np.sum(np.asarray(leaf["w"]) ** 2))
        np.testing.assert_allclose(l2, manual, rtol=1e-5)
        # the l2-norm scale must NOT be regularized
        assert "w" not in params["l2_norm_conv4_3"]

    def test_total_loss_composition(self):
        rng = np.random.default_rng(6)
        B, A, K = 2, 64, 20
        logits = jnp.asarray(rng.normal(0, 1, (B, A, K + 1)), jnp.float32)
        locs = jnp.zeros((B, A, 4), jnp.float32)
        labels = jnp.asarray(self._random_labels(rng, B, A, K))
        params = {"conv": {"w": jnp.ones((3, 3, 4, 4)), "b": jnp.zeros(4)}}
        out = total_loss(logits, locs, labels, params, K, weight_decay=0.0005)
        np.testing.assert_allclose(
            out["total"],
            out["confidence"] + out["localization"] + out["l2"],
            rtol=1e-6,
        )
        np.testing.assert_allclose(out["l2"], 0.0005 * 0.5 * 144, rtol=1e-6)

    def test_smooth_l1(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        np.testing.assert_allclose(
            smooth_l1(x), [1.5, 0.125, 0.0, 0.125, 1.5], rtol=1e-6
        )

    def test_loss_gradient_flows(self, test64_setup):
        """Gradient of the total loss w.r.t. params is finite and nonzero."""
        cfg, params = test64_setup
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        labels = np.zeros((1, 372, 25), dtype=np.float32)
        labels[:, :, 20] = 1.0
        labels[0, :40, 20] = 0.0
        labels[0, :40, 3] = 1.0  # 40 positive anchors of class 3
        labels = jnp.asarray(labels)

        def loss_fn(p):
            logits, locs = apply_model(p, x, cfg)
            out = total_loss(logits, locs, labels, p, 20, 0.0005)
            return out["total"]

        val, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(val))
        g = np.asarray(grads["conv4_3"]["w"])
        assert np.isfinite(g).all() and np.abs(g).max() > 0
