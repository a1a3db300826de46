"""VGG16 perceptual loss.

Functional parity with the reference VGGPerceptualLoss
(models/perceptual_loss.py:7-45): frozen VGG16 conv features at 4 depths
(torchvision `features[:4]`, `[4:9]`, `[9:16]`, `[16:23]`), inputs
ImageNet-normalized and bilinearly resized to 224, L1 summed across blocks.
Weights convert from torchvision via utils/convert_torch.py; random init
otherwise (this image has no network access for the model zoo).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, torch_max_pool

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# (channels per conv) for the first 4 VGG16 blocks; 'M' = maxpool before.
_BLOCKS = (
    (64, 64),            # features[0:4]
    ("M", 128, 128),     # features[4:9]
    ("M", 256, 256, 256),  # features[9:16]
    ("M", 512, 512, 512),  # features[16:23]
)


class VGG16Blocks(nn.Module):
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        outs = []
        ci = 0
        for block in _BLOCKS:
            for item in block:
                if item == "M":
                    x = torch_max_pool(x, 2, 2, 0)
                else:
                    x = TorchConv(item, 3, 1, 1, name=f"conv_{ci}", **kw)(x)
                    x = jax.nn.relu(x)
                    ci += 1
            outs.append(x)
        return outs


class VGGPerceptualLoss(nn.Module):
    resize: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, inputs: jnp.ndarray, target: jnp.ndarray, only_deepest: bool = False
    ) -> jnp.ndarray:
        """inputs/target: [B, H, W, 3] in [0, 1]."""
        mean = jnp.asarray(IMAGENET_MEAN, dtype=inputs.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=inputs.dtype)
        x = (inputs - mean) / std
        y = (target - mean) / std
        if self.resize:
            shape = (x.shape[0], 224, 224, 3)
            x = jax.image.resize(x, shape, method="bilinear")
            y = jax.image.resize(y, shape, method="bilinear")
        vgg = VGG16Blocks(name="vgg", dtype=self.dtype, param_dtype=self.param_dtype)
        xs = vgg(x)
        ys = vgg(y)
        if only_deepest:
            return jnp.mean(jnp.abs(xs[-1] - ys[-1]))
        loss = 0.0
        for a, b in zip(xs, ys):
            loss = loss + jnp.mean(jnp.abs(a - b))
        return loss
