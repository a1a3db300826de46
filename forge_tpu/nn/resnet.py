"""ResNet-50 feature backbones, flax.linen, channels-last.

Two variants used by the reference:
  - the 2D->3D encoder backbone: torchvision resnet50 with the stride-2 convs
    of layer3[0]/layer4[0] (and their downsample) set to stride 1, giving an
    8x-downsampled 2048-channel feature map (reference: models/encoder.py:71-78);
  - the 2D pose estimator's FPN backbone: the same architecture with LeakyReLU
    activations (reference: models/pose_estimator_2d.py:139-198).

Structure and parameter naming mirror torchvision's `resnet50` so the
torch->jax converter (utils/convert_torch.py) is a mechanical key map.
ImageNet-pretrained initialization is loaded through that converter when
available (the reference downloads weights from the torchvision model zoo,
models/encoder.py:72; this environment has no network access so random
initialization is the default).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchBatchNorm, torch_max_pool, leaky_relu

Dtype = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    downsample_stride: Optional[int] = None  # may differ from stride after surgery
    conv2_stride: Optional[int] = None
    act: Callable = jax.nn.relu
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        s2 = self.conv2_stride if self.conv2_stride is not None else self.stride
        residual = x
        out = TorchConv(self.planes, 1, 1, 0, use_bias=False, name="conv1", **kw)(x)
        out = TorchBatchNorm(name="bn1", **kw)(out, train)
        out = self.act(out)
        out = TorchConv(self.planes, 3, s2, 1, use_bias=False, name="conv2", **kw)(out)
        out = TorchBatchNorm(name="bn2", **kw)(out, train)
        out = self.act(out)
        out = TorchConv(self.planes * 4, 1, 1, 0, use_bias=False, name="conv3", **kw)(out)
        out = TorchBatchNorm(name="bn3", **kw)(out, train)
        if self.has_downsample:
            ds = (
                self.downsample_stride
                if self.downsample_stride is not None
                else self.stride
            )
            residual = TorchConv(
                self.planes * 4, 1, ds, 0, use_bias=False, name="downsample_conv", **kw
            )(x)
            residual = TorchBatchNorm(name="downsample_bn", **kw)(residual, train)
        return self.act(out + residual)


class ResNet50Features(nn.Module):
    """conv1..layer4 trunk of resnet50 (no avgpool/fc).

    `stride_surgery=True` reproduces the encoder's modification
    (models/encoder.py:74-77): layer3[0] and layer4[0] keep their stride-2
    *declaration* but run conv2/downsample at stride 1 -> output stride 8.
    """

    stride_surgery: bool = False
    leaky: bool = False  # LeakyReLU variant for the FPN backbone
    remat: bool = True   # rematerialize each bottleneck in the backward
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    # (planes, blocks, stride) for layer1..4 of resnet50
    STAGES: Sequence[Tuple[int, int, int]] = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, return_stages: bool = False
    ):
        act = leaky_relu if self.leaky else jax.nn.relu
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = TorchConv(64, 7, 2, 3, use_bias=False, name="conv1", **kw)(x)
        x = TorchBatchNorm(name="bn1", **kw)(x, train)
        x = act(x)
        x = torch_max_pool(x, 3, 2, 1)

        block_cls = (
            nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        )
        stages = []
        for li, (planes, blocks, stride) in enumerate(self.STAGES):
            surgered = self.stride_surgery and li >= 2  # layer3, layer4
            for bi in range(blocks):
                first = bi == 0
                x = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    has_downsample=first,
                    conv2_stride=(1 if (first and surgered) else None),
                    downsample_stride=(1 if (first and surgered) else None),
                    act=act,
                    name=f"layer{li + 1}_{bi}",
                    **kw,
                )(x, train)
            stages.append(x)

        if return_stages:
            return stages  # [c2, c3, c4, c5]
        return x
