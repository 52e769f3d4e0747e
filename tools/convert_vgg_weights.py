#!/usr/bin/env python3
"""Convert pretrained VGG16 weights into this framework's npz format.

The reference bootstraps from a TF1 SavedModel download
(ssdvgg.py:153-207); this tool fills the same role from sources that are
actually obtainable today:

* a torchvision ``vgg16`` state_dict (``.pth``, loaded with torch CPU),
* a caffe-style npz with conv weights in HWIO.

Output keys: ``conv{i}_{j}/w`` (HWIO), ``conv{i}_{j}/b`` for the 13 conv
layers plus decimated ``mod_conv6/{w,b}`` (3x3x512x1024, a-trous rate 6)
and ``mod_conv7/{w,b}`` (1x1x1024x1024), following the reference's
decimation exactly (ssdvgg.py:245-292).

Note on preprocessing: torchvision VGG16 was trained on RGB [0,1]
ImageNet-normalized input, while this framework (like the original
SSD/caffe lineage) feeds BGR with mean [104,117,123] subtracted. The
converter rewrites conv1_1 to absorb the difference: channel order is
swapped and the kernel/bias rescaled so the network computes the same
function on caffe-convention input.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

#: torchvision features.{idx} -> our layer names
TORCH_LAYER_MAP = {
    0: "conv1_1",
    2: "conv1_2",
    5: "conv2_1",
    7: "conv2_2",
    10: "conv3_1",
    12: "conv3_2",
    14: "conv3_3",
    17: "conv4_1",
    19: "conv4_2",
    21: "conv4_3",
    24: "conv5_1",
    26: "conv5_2",
    28: "conv5_3",
}

# ImageNet RGB normalization used by torchvision models
_TV_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float64)
_TV_STD = np.array([0.229, 0.224, 0.225], dtype=np.float64)
# caffe-convention BGR means this framework subtracts on device
_BGR_MEAN = np.array([104.0, 117.0, 123.0], dtype=np.float64)


def _oihw_to_hwio(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _absorb_preprocessing(w1, b1):
    """Rewrite conv1_1 so that a torchvision-trained network accepts
    BGR-mean-subtracted input instead of RGB ImageNet-normalized input.

    torchvision computes conv(w, (rgb/255 - m) / s). Our input is
    x_bgr = bgr - mean_bgr, i.e. rgb = x_bgr[::-1] + mean_bgr[::-1].
    Substitute: (rgb/255 - m)/s = (x_bgr[::-1] + mean_bgr[::-1])/255/s - m/s
    => absorb the 1/(255*s) scale and channel flip into the kernel, and
    the constant offset into the bias.
    """
    # w1: HWIO with I=3 in RGB order
    w = w1.astype(np.float64)
    # flip input channels: new input channel c (BGR) feeds old channel 2-c (RGB)
    w = w[:, :, ::-1, :]
    # scale per (new) input channel: 1 / (255 * std[rgb_channel])
    scale = 1.0 / (255.0 * _TV_STD[::-1])
    w = w * scale[None, None, :, None]
    # constant input offset per new channel:
    #   mean_bgr_flipped/255/s - m/s  evaluated per RGB channel then flipped
    const_rgb = (_BGR_MEAN[::-1] / 255.0 - _TV_MEAN) / _TV_STD  # per RGB ch
    # bias correction: sum over taps of original w * const
    b = b1.astype(np.float64) + np.einsum(
        "hwio,i->o", w1.astype(np.float64), const_rgb
    )
    return w.astype(np.float32), b.astype(np.float32)


def convert_torchvision(state_dict):
    out = {}
    for idx, name in TORCH_LAYER_MAP.items():
        w = state_dict[f"features.{idx}.weight"].numpy()
        b = state_dict[f"features.{idx}.bias"].numpy()
        out[f"{name}/w"] = _oihw_to_hwio(w)
        out[f"{name}/b"] = b
    out["conv1_1/w"], out["conv1_1/b"] = _absorb_preprocessing(
        out["conv1_1/w"], out["conv1_1/b"]
    )

    # classifier.0: Linear(25088 -> 4096) over flattened (512,7,7) CHW
    fc6_w = state_dict["classifier.0.weight"].numpy()  # (4096, 25088)
    fc6_b = state_dict["classifier.0.bias"].numpy()
    fc6_w = fc6_w.reshape(4096, 512, 7, 7)
    fc6_w = np.transpose(fc6_w, (2, 3, 1, 0))  # HWIO (7,7,512,4096)

    fc7_w = state_dict["classifier.3.weight"].numpy()  # (4096, 4096)
    fc7_b = state_dict["classifier.3.bias"].numpy()
    fc7_w = fc7_w.T[None, None]  # (1,1,4096,4096) HWIO

    from ssd_tensorflow_tpu.models.vgg16 import decimate_fc6, decimate_fc7

    w6, b6 = decimate_fc6(fc6_w, fc6_b)
    w7, b7 = decimate_fc7(fc7_w, fc7_b)
    out["mod_conv6/w"], out["mod_conv6/b"] = w6, b6
    out["mod_conv7/w"], out["mod_conv7/b"] = w7, b7
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert VGG16 weights")
    parser.add_argument("input", help=".pth state_dict or .npz archive")
    parser.add_argument("--output", default="vgg16.npz", help="output npz")
    args = parser.parse_args(argv)

    if args.input.endswith(".npz"):
        data = dict(np.load(args.input))
        # assume already in our naming; just decimate fc if raw
        if "fc6/w" in data:
            from ssd_tensorflow_tpu.models.vgg16 import decimate_fc6, decimate_fc7

            data["mod_conv6/w"], data["mod_conv6/b"] = decimate_fc6(
                data.pop("fc6/w"), data.pop("fc6/b")
            )
            data["mod_conv7/w"], data["mod_conv7/b"] = decimate_fc7(
                data.pop("fc7/w"), data.pop("fc7/b")
            )
        out = data
    else:
        import torch

        state_dict = torch.load(args.input, map_location="cpu", weights_only=True)
        if hasattr(state_dict, "state_dict"):
            state_dict = state_dict.state_dict()
        out = convert_torchvision(state_dict)

    np.savez(args.output, **out)
    print(f"[i] wrote {args.output} with {len(out)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
