"""VGG weight converter tests: preprocessing absorption must be exact."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from convert_vgg_weights import (
    _BGR_MEAN,
    _TV_MEAN,
    _TV_STD,
    _absorb_preprocessing,
    _oihw_to_hwio,
)


def _conv2d_np(x, w, b):
    """Tiny valid-padding conv for verification. x: HWC, w: HWIO."""
    kh, kw, ci, co = w.shape
    oh, ow = x.shape[0] - kh + 1, x.shape[1] - kw + 1
    out = np.zeros((oh, ow, co))
    for i in range(oh):
        for j in range(ow):
            patch = x[i : i + kh, j : j + kw]  # (kh,kw,ci)
            out[i, j] = np.einsum("hwi,hwio->o", patch, w) + b
    return out


class TestAbsorbPreprocessing:
    def test_equivalent_function(self):
        rng = np.random.default_rng(0)
        w_rgb = rng.normal(0, 0.1, (3, 3, 3, 4))  # HWIO, RGB input
        b = rng.normal(0, 0.1, 4)

        w_new, b_new = _absorb_preprocessing(
            w_rgb.astype(np.float32), b.astype(np.float32)
        )

        # a random image, as raw uint8-scale BGR
        bgr = rng.uniform(0, 255, (6, 6, 3))
        rgb = bgr[..., ::-1]

        # torchvision convention input
        tv_in = (rgb / 255.0 - _TV_MEAN) / _TV_STD
        want = _conv2d_np(tv_in, w_rgb, b)

        # our convention input
        our_in = bgr - _BGR_MEAN
        got = _conv2d_np(our_in, w_new.astype(np.float64), b_new.astype(np.float64))

        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_oihw_to_hwio(self):
        w = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)  # OIHW
        h = _oihw_to_hwio(w)
        assert h.shape == (4, 5, 3, 2)
        assert h[1, 2, 0, 1] == w[1, 0, 1, 2]


class TestTorchPathEndToEnd:
    """Exercise the real torch.load path: a torch.save'd state dict in
    the exact torchvision vgg16 layout -> converter CLI -> npz ->
    load_pretrained_vgg overlay. No network; weights are random but the
    shapes, key names, tensor types and transposes are the real deal."""

    @pytest.mark.slow
    def test_pth_to_npz_to_params(self, tmp_path):
        import torch

        torch.manual_seed(0)
        layer_channels = [
            (0, 3, 64), (2, 64, 64),
            (5, 64, 128), (7, 128, 128),
            (10, 128, 256), (12, 256, 256), (14, 256, 256),
            (17, 256, 512), (19, 512, 512), (21, 512, 512),
            (24, 512, 512), (26, 512, 512), (28, 512, 512),
        ]
        sd = {}
        for idx, cin, cout in layer_channels:
            sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
            sd[f"features.{idx}.bias"] = torch.randn(cout) * 0.05
        sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7) * 0.01
        sd["classifier.0.bias"] = torch.randn(4096) * 0.01
        sd["classifier.3.weight"] = torch.randn(4096, 4096) * 0.01
        sd["classifier.3.bias"] = torch.randn(4096) * 0.01
        # real torchvision state dicts also carry classifier.6 (the
        # 1000-way head); the converter must ignore it
        sd["classifier.6.weight"] = torch.randn(1000, 4096) * 0.01
        sd["classifier.6.bias"] = torch.randn(1000) * 0.01

        pth = tmp_path / "vgg16_fake.pth"
        torch.save(sd, str(pth))

        from convert_vgg_weights import main as convert_main

        npz = tmp_path / "vgg16.npz"
        assert convert_main([str(pth), "--output", str(npz)]) == 0

        data = np.load(npz)
        assert data["conv1_1/w"].shape == (3, 3, 3, 64)
        assert data["conv5_3/w"].shape == (3, 3, 512, 512)
        assert data["mod_conv6/w"].shape == (3, 3, 512, 1024)
        assert data["mod_conv7/w"].shape == (1, 1, 1024, 1024)

        # decimation provenance: mod_conv6 tap (0,0,:,0) is fc6 output
        # unit 0's weight for spatial tap (0,0) -> classifier.0 row 0,
        # flattened CHW index c*49 + 0*7 + 0
        fc6 = sd["classifier.0.weight"].numpy()
        np.testing.assert_allclose(
            data["mod_conv6/w"][0, 0, :, 0],
            fc6[0].reshape(512, 7, 7)[:, 0, 0],
            rtol=1e-6,
        )

        # overlay into model params and run a forward
        import jax
        import jax.numpy as jnp

        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
        from ssd_tensorflow_tpu.models.vgg16 import (
            apply_backbone,
            load_pretrained_vgg,
        )

        config = ModelConfig(preset_name="vgg300", compute_dtype="float32")
        params = init_params(jax.random.PRNGKey(0), config)
        loaded = load_pretrained_vgg(str(npz), params)
        np.testing.assert_array_equal(
            np.asarray(loaded["conv2_1"]["w"]),
            _oihw_to_hwio(sd["features.5.weight"].numpy()),
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        conv4_3, out = apply_backbone(loaded, x)
        assert conv4_3.shape == (1, 8, 8, 512)
        assert out.shape == (1, 4, 4, 1024)
