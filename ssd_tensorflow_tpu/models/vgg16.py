"""VGG-16 backbone: definition, init, pretrained import + fc decimation.

The reference bootstraps from a TF SavedModel download and performs the
"a-trous surgery": fc6 (7x7x512x4096) is decimated to a 3x3x512x1024
rate-6 dilated conv by taking every 3rd spatial tap and every 4th output
channel, and fc7 to 1x1x1024x1024 (reference: ssdvgg.py:231-292). Here
the backbone is a pure function over a param dict; the same decimation
is implemented as a vectorized numpy transform over any VGG16 weight set
(e.g. exported from torchvision via tools/convert_vgg_weights.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ssd_tensorflow_tpu.models.layers import conv_relu, init_conv, max_pool

#: (name, out_channels) for the 13 conv layers, pools implied after each
#: block (reference: ssdvgg.py:202-204).
VGG_CONV_LAYERS = (
    ("conv1_1", 64),
    ("conv1_2", 64),
    ("conv2_1", 128),
    ("conv2_2", 128),
    ("conv3_1", 256),
    ("conv3_2", 256),
    ("conv3_3", 256),
    ("conv4_1", 512),
    ("conv4_2", 512),
    ("conv4_3", 512),
    ("conv5_1", 512),
    ("conv5_2", 512),
    ("conv5_3", 512),
)

_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3", "conv4_3"}


def init_vgg_params(key, dtype=jnp.float32):
    """Random (Xavier) init of the 13 conv layers + mod_conv6/7."""
    names = [n for n, _ in VGG_CONV_LAYERS]
    keys = jax.random.split(key, len(names) + 2)
    params = {}
    cin = 3
    for k, (name, cout) in zip(keys, VGG_CONV_LAYERS):
        params[name] = init_conv(k, 3, 3, cin, cout, dtype)
        cin = cout
    # the a-trous replacements for fc6/fc7 (ssdvgg.py:241-292)
    params["mod_conv6"] = init_conv(keys[-2], 3, 3, 512, 1024, dtype)
    params["mod_conv7"] = init_conv(keys[-1], 1, 1, 1024, 1024, dtype)
    return params


def apply_backbone(
    params,
    x,
    a_trous: bool = True,
    f32_out: bool = False,
    from_pool1: bool = False,
):
    """VGG-16 trunk -> (conv4_3 relu, mod_conv7 relu).

    Feature taps mirror the reference: conv4_3's ReLU output (pre-pool4,
    ssdvgg.py:195) and the modified conv7 (ssdvgg.py:222-292). pool5 is
    3x3 stride-1 SAME (ssdvgg.py:234-236).

    ``from_pool1=True`` means ``x`` is already the pool1 output (e.g.
    from the width-packed stem, models/packed_conv.py) and the conv1
    block is skipped.
    """
    conv4_3 = None
    for name, _ in VGG_CONV_LAYERS:
        if from_pool1 and name in ("conv1_1", "conv1_2"):
            continue
        x = conv_relu(params[name], x, f32_out=f32_out)
        if name == "conv4_3":
            conv4_3 = x
        if name in _POOL_AFTER:
            x = max_pool(x, 2, 2)
    x = max_pool(x, 3, 1)  # mod_pool5
    x = conv_relu(
        params["mod_conv6"], x, dilation=6 if a_trous else 1, f32_out=f32_out
    )
    x = conv_relu(params["mod_conv7"], x, f32_out=f32_out)
    return conv4_3, x


def decimate_fc6(fc6_w: np.ndarray, fc6_b: np.ndarray):
    """7x7x512x4096 fc6 conv weights -> 3x3x512x1024 a-trous weights.

    Every 3rd spatial tap, every 4th output channel
    (reference: ssdvgg.py:245-264), vectorized.
    """
    assert fc6_w.shape == (7, 7, 512, 4096), fc6_w.shape
    w = fc6_w[::3, ::3, :, ::4]  # (3, 3, 512, 1024)
    b = fc6_b[::4]
    return np.ascontiguousarray(w), np.ascontiguousarray(b)


def decimate_fc7(fc7_w: np.ndarray, fc7_b: np.ndarray):
    """1x1x4096x4096 fc7 conv weights -> 1x1x1024x1024.

    Every 4th input and output channel (reference: ssdvgg.py:273-292).
    """
    assert fc7_w.shape == (1, 1, 4096, 4096), fc7_w.shape
    w = fc7_w[:, :, ::4, ::4]
    b = fc7_b[::4]
    return np.ascontiguousarray(w), np.ascontiguousarray(b)


def load_pretrained_vgg(npz_path: str, params: dict) -> dict:
    """Overlay pretrained VGG16 weights from an npz archive.

    Expected keys: ``conv{i}_{j}/w`` (HWIO) and ``conv{i}_{j}/b`` for the
    13 conv layers, plus either pre-decimated ``mod_conv6/...`` /
    ``mod_conv7/...`` or raw ``fc6/w`` (7,7,512,4096), ``fc6/b``,
    ``fc7/w`` (1,1,4096,4096), ``fc7/b`` which get decimated here.
    Missing keys keep their random init (a warning is printed).
    """
    data = np.load(npz_path)
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy

    for name, _ in VGG_CONV_LAYERS:
        wk, bk = f"{name}/w", f"{name}/b"
        if wk in data:
            out[name] = {"w": jnp.asarray(data[wk]), "b": jnp.asarray(data[bk])}
        else:
            print(f"[!] pretrained archive missing {wk}; keeping random init")

    if "mod_conv6/w" in data:
        out["mod_conv6"] = {
            "w": jnp.asarray(data["mod_conv6/w"]),
            "b": jnp.asarray(data["mod_conv6/b"]),
        }
        out["mod_conv7"] = {
            "w": jnp.asarray(data["mod_conv7/w"]),
            "b": jnp.asarray(data["mod_conv7/b"]),
        }
    elif "fc6/w" in data:
        w6, b6 = decimate_fc6(data["fc6/w"], data["fc6/b"])
        w7, b7 = decimate_fc7(data["fc7/w"], data["fc7/b"])
        out["mod_conv6"] = {"w": jnp.asarray(w6), "b": jnp.asarray(b6)}
        out["mod_conv7"] = {"w": jnp.asarray(w7), "b": jnp.asarray(b7)}
    else:
        print("[!] pretrained archive has no fc6/fc7; keeping random init")
    return out
