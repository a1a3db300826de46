"""torch -> JAX weight conversion.

The reference initializes from torchvision-pretrained ResNet-50 / VGG-16
(models/encoder.py:72, models/pose_estimator_2d.py:197, models/perceptual_loss.py:11-14)
and its curriculum moves weights between checkpoints. These converters map
torch state dicts onto forge_tpu parameter/batch-stat trees.

Layout transforms:
  - ConvNd weight (out, in, *k)   -> (*k, in, out)
  - ConvTransposeNd (in, out, *k) -> (*k, out, in)   (transpose_kernel=True)
  - Linear weight (out, in)       -> (in, out)
  - BatchNorm weight/bias/running_mean/running_var -> scale/bias + mean/var

State dicts are plain {name: numpy array}; no torch import is required here
(pass `{k: v.numpy() for k, v in sd.items()}`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


Arrays = Dict[str, np.ndarray]


def _conv(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    # (out, in, *k) -> (*k, in, out)
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:
    nd = w.ndim
    # (in, out, *k) -> (*k, out, in)
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class TreeBuilder:
    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, tree: dict, path: str, value: np.ndarray):
        keys = path.split("/")
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = np.asarray(value)

    def conv(self, dst: str, sd: Arrays, src: str, bias: bool = False):
        self._set(self.params, f"{dst}/Conv_0/kernel", _conv(sd[f"{src}.weight"]))
        if bias:
            self._set(self.params, f"{dst}/Conv_0/bias", sd[f"{src}.bias"])

    def deconv(self, dst: str, sd: Arrays, src: str, bias: bool = True):
        self._set(self.params, f"{dst}/ConvTranspose_0/kernel", _deconv(sd[f"{src}.weight"]))
        if bias:
            self._set(self.params, f"{dst}/ConvTranspose_0/bias", sd[f"{src}.bias"])

    def bn(self, dst: str, sd: Arrays, src: str):
        self._set(self.params, f"{dst}/scale", sd[f"{src}.weight"])
        self._set(self.params, f"{dst}/bias", sd[f"{src}.bias"])
        self._set(self.stats, f"{dst}/mean", sd[f"{src}.running_mean"])
        self._set(self.stats, f"{dst}/var", sd[f"{src}.running_var"])

    def linear(self, dst: str, sd: Arrays, src: str, bias: bool = True):
        self._set(self.params, f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
        if bias:
            self._set(self.params, f"{dst}/bias", sd[f"{src}.bias"])

    def layernorm(self, dst: str, sd: Arrays, src: str):
        self._set(self.params, f"{dst}/scale", sd[f"{src}.weight"])
        self._set(self.params, f"{dst}/bias", sd[f"{src}.bias"])


# resnet50 stage structure: (planes, blocks)
_RESNET50_STAGES = ((64, 3), (128, 4), (256, 6), (512, 3))


def convert_resnet50_features(
    sd: Arrays, prefix: str = ""
) -> Tuple[dict, dict]:
    """torchvision resnet50 state dict -> ResNet50Features (params, batch_stats).

    `prefix` selects a sub-tree of the source dict (e.g. 'backbone.' when the
    resnet lives inside a larger checkpoint).
    """
    b = TreeBuilder()
    p = prefix
    b.conv("conv1", sd, f"{p}conv1")
    b.bn("bn1", sd, f"{p}bn1")
    for li, (planes, blocks) in enumerate(_RESNET50_STAGES):
        for bi in range(blocks):
            dst = f"layer{li + 1}_{bi}"
            src = f"{p}layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                b.conv(f"{dst}/conv{ci}", sd, f"{src}.conv{ci}")
                b.bn(f"{dst}/bn{ci}", sd, f"{src}.bn{ci}")
            if bi == 0:
                b.conv(f"{dst}/downsample_conv", sd, f"{src}.downsample.0")
                b.bn(f"{dst}/downsample_bn", sd, f"{src}.downsample.1")
    return b.params, b.stats


# torchvision vgg16 'features' conv layer indices for the first 4 blocks
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


def convert_vgg16_blocks(sd: Arrays, prefix: str = "features.") -> dict:
    """torchvision vgg16 state dict -> VGG16Blocks params (convs carry bias)."""
    b = TreeBuilder()
    for ci, li in enumerate(_VGG16_CONV_IDX):
        b.conv(f"conv_{ci}", sd, f"{prefix}{li}", bias=True)
    return b.params


# all 13 vgg16 'features' convs — LPIPS uses 5 blocks (eval/lpips.py)
_VGG16_LPIPS_CONV_IDX = _VGG16_CONV_IDX + (24, 26, 28)


def convert_lpips_vgg(sd: Arrays, prefix: str = "features.") -> dict:
    """torchvision vgg16 state dict -> LPIPS backbone params (vgg_conv_*)."""
    b = TreeBuilder()
    for ci, li in enumerate(_VGG16_LPIPS_CONV_IDX):
        b.conv(f"vgg_conv_{ci}", sd, f"{prefix}{li}", bias=True)
    return b.params


def convert_lpips_lin(sd: Arrays, prefix: str = "") -> dict:
    """lpips 'vgg.pth' lin weights (lin{i}.model.1.weight [1,C,1,1]) ->
    LPIPS lin_* params (reference metric: kubric_eval.py:16,623)."""
    b = TreeBuilder()
    for si in range(5):
        for src in (f"{prefix}lin{si}.model.1",
                    f"{prefix}lins.{si}.model.1"):
            if f"{src}.weight" in sd:
                b.conv(f"lin_{si}", sd, src, bias=False)
                break
        else:
            raise KeyError(f"LPIPS lin weights for slice {si} not in dict")
    return b.params


def merge_into(variables: dict, params: dict, batch_stats: dict, path: str) -> dict:
    """Insert converted subtrees at `path` (slash-separated) of a variables dict.

    Returns a new variables dict {params, batch_stats}; used for the
    curriculum's partial-load surgery (reference: utils/exp_utils.py:185-422).
    """
    import jax

    def set_sub(tree, keys, sub):
        tree = dict(tree)
        if len(keys) == 1:
            tree[keys[0]] = sub
        else:
            tree[keys[0]] = set_sub(dict(tree.get(keys[0], {})), keys[1:], sub)
        return tree

    keys = path.split("/") if path else []
    out = {k: v for k, v in variables.items()}
    if params:
        out["params"] = set_sub(dict(out.get("params", {})), keys, params) if keys else params
    if batch_stats:
        out["batch_stats"] = (
            set_sub(dict(out.get("batch_stats", {})), keys, batch_stats)
            if keys else batch_stats
        )
    return out
