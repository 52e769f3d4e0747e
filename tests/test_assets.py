"""Committed deploy bundles stay loadable and internally consistent.

The repo ships trained int8 deploy bundles under assets/ (the
functional analog of the reference's committed model300.pb —
reference detect.py:45-55 defaults to one). These tests guard the
artifact contract — a bundle must load through
``inference.load_bundle`` with a quantized param pytree, carry the
activation-scale structures its family's deploy path needs, and keep
the 20-label VOC map — without running a forward pass (full-res CPU
forwards are minutes each on the 1-core CI box; detect-level coverage
lives in the e2e tests).
"""

import glob
import os

import numpy as np
import pytest

from ssd_tensorflow_tpu.inference import load_bundle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLES = sorted(glob.glob(os.path.join(REPO, "assets", "*.ssdtpu.npz")))


def test_assets_present():
    names = [os.path.basename(b) for b in BUNDLES]
    assert "vgg512_int8_minivoc.ssdtpu.npz" in names
    assert "mobilenet320_int8_qat_minivoc.ssdtpu.npz" in names
    assert "resnet320_int8_minicoco.ssdtpu.npz" in names


@pytest.mark.parametrize(
    "path", BUNDLES, ids=[os.path.basename(b) for b in BUNDLES]
)
def test_bundle_loads_quantized(path):
    params, config, lid2name, act_scales = load_bundle(path)
    assert act_scales is not None, "shipped bundles are int8 deploys"
    # minivoc bundles carry the 20 VOC labels, minicoco the 80 COCO ones
    assert len(lid2name) == (80 if "coco" in os.path.basename(path) else 20)
    assert config.preset.name in os.path.basename(path)

    # quantized weights are int8 on disk
    leaves = []

    def walk(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        else:
            leaves.append(np.asarray(tree))

    walk(params)
    int8_leaves = [a for a in leaves if a.dtype == np.int8]
    assert int8_leaves, "no int8 weight leaves in a quantized bundle"

    if config.preset.backbone == "vgg":
        # per-layer scalar activation scales, applied at runtime
        assert act_scales and all(
            np.ndim(v) == 0 for v in act_scales.values()
        )
    else:
        # GN families: the per-input-channel activation grids are
        # folded INTO the int8 weights at export
        # (quantized.quantize_weights_folded), so the bundle carries an
        # empty — but non-None — scales dict as the "quantized" marker
        assert act_scales == {}
