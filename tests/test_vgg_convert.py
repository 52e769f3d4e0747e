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
