"""LPIPS (VGG variant) perceptual metric.

Rebuild of the `lpips.LPIPS(net='vgg')` metric the reference uses at eval time
(kubric_eval.py:16,623): VGG16 conv features at 5 depths, channel-unit
normalization, learned 1x1 linear weights, spatial mean, summed across layers.
Weights convert from the torchvision VGG16 + lpips 'vgg.pth' checkpoints via
utils/convert_torch.py; without them (no network in this image) the metric
runs with unit lin weights — structurally identical, documented divergence.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, torch_max_pool

# imagenet 'scaling layer' constants used by lpips
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_VGG_SLICES = (
    (64, 64),
    ("M", 128, 128),
    ("M", 256, 256, 256),
    ("M", 512, 512, 512),
    ("M", 512, 512, 512),
)
_CHANNELS = (64, 128, 256, 512, 512)


class LPIPS(nn.Module):
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: [B, H, W, 3] in [0, 1] -> [B] distances."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        # lpips expects [-1, 1] inputs then applies the scaling layer
        h = ((2 * x - 1) - shift) / scale
        g = ((2 * y - 1) - shift) / scale

        total = 0.0
        ci = 0
        for si, block in enumerate(_VGG_SLICES):
            for item in block:
                if item == "M":
                    h = torch_max_pool(h, 2, 2, 0)
                    g = torch_max_pool(g, 2, 2, 0)
                else:
                    conv = TorchConv(item, 3, 1, 1, name=f"vgg_conv_{ci}", **kw)
                    h = jax.nn.relu(conv(h))
                    g = jax.nn.relu(conv(g))
                    ci += 1
            hn = h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-10)
            gn = g / jnp.maximum(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-10)
            diff = jnp.square(hn - gn)                           # [B,H,W,C]
            lin = TorchConv(1, 1, 1, 0, use_bias=False, name=f"lin_{si}", **kw)
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total


def init_lpips(rng, img_size: int = 64):
    """Initialize an LPIPS module (unit lin weights unless converted)."""
    m = LPIPS()
    x = jnp.zeros((1, img_size, img_size, 3))
    variables = m.init(rng, x, x)
    # set lin weights to 1/C (a fixed, documented fallback)
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    for si, c in enumerate(_CHANNELS):
        params[f"lin_{si}"]["Conv_0"]["kernel"] = jnp.full(
            (1, 1, c, 1), 1.0 / c, jnp.float32)
    return m, {"params": params}
