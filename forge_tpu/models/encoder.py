"""2D image -> 3D voxel feature encoder and decoder heads.

Functional parity with the reference Encoder3D (models/encoder.py:8-78):
a stride-modified ResNet-50 produces a [32, 32, 2048] feature map that is
reinterpreted as a [32(D), 32, 32, 64] voxel grid (channel dim folded into
depth), refined by a Conv3d to 128 channels; separate heads decode the fused
volume to a 64-cube of render features (16ch) and density (1ch, ReLU).

Layouts are channels-last; the channel->depth fold is written so that voxel
(d, h, w, c) holds the same value as the reference's NCDHW view
(torch channel index c*32 + d), keeping converted weights bit-compatible.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchConvTranspose, TorchBatchNorm, leaky_relu
from forge_tpu.nn.resnet import ResNet50Features
from forge_tpu.models.fusion import ConvGRU3D

Dtype = Any


class Encoder3D(nn.Module):
    depth_fold: int = 32  # 32 for img_size 256; img_size//8 generally
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # reference: models/encoder.py:71-78 (stride surgery -> 8x downsample)
        self.feature_extraction = ResNet50Features(
            stride_surgery=True, name="feature_extraction", **kw
        )
        self.conv1 = TorchConv(128, 3, 1, 1, name="conv1_conv", **kw)
        self.conv1_bn = TorchBatchNorm(name="conv1_bn", **kw)

        # reference: models/encoder.py:16-22
        self.features_head_deconv = TorchConvTranspose(32, 4, 2, 1, name="fh_deconv", **kw)
        self.features_head_bn1 = TorchBatchNorm(name="fh_bn1", **kw)
        self.features_head_conv = TorchConv(16, 3, 1, 1, name="fh_conv", **kw)
        self.features_head_bn2 = TorchBatchNorm(name="fh_bn2", **kw)

        # reference: models/encoder.py:25-34
        self.density_head_deconv = TorchConvTranspose(32, 4, 2, 1, name="dh_deconv", **kw)
        self.density_head_bn1 = TorchBatchNorm(name="dh_bn1", **kw)
        self.density_head_conv1 = TorchConv(8, 3, 1, 1, name="dh_conv1", **kw)
        self.density_head_bn2 = TorchBatchNorm(name="dh_bn2", **kw)
        self.density_head_conv2 = TorchConv(1, 3, 1, 1, name="dh_conv2", **kw)

        # reference: models/encoder.py:43
        self.fusion_feature = ConvGRU3D(
            n_layers=1, input_size=128, hidden_size=128, name="fusion_feature", **kw
        )

    def get_feat3d(self, img: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, H, W, 3] images -> [B, 32, 32, 32, 128] voxel features.

        reference: models/encoder.py:46-51.
        """
        z2d = self.feature_extraction(img, train)          # [B, 32, 32, 2048]
        B, H, W, C = z2d.shape
        D = self.depth_fold
        # torch: view [B, 2048, H, W] -> [B, 64, 32, H, W]; channel c*32+d -> (c, d).
        z3d = z2d.reshape(B, H, W, C // D, D)
        z3d = jnp.transpose(z3d, (0, 4, 1, 2, 3))          # [B, D, H, W, 64]
        z3d = leaky_relu(self.conv1_bn(self.conv1(z3d), train))
        return z3d

    def get_density3d(self, z3d: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, 32, 32, 32, 128] -> [B, 64, 64, 64, 1] ReLU density."""
        x = self.density_head_deconv(z3d)
        x = leaky_relu(self.density_head_bn1(x, train))
        x = self.density_head_conv1(x)
        x = leaky_relu(self.density_head_bn2(x, train))
        x = self.density_head_conv2(x)
        return jax.nn.relu(x)

    def get_render_features(self, z3d: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, 32, 32, 32, 128] -> [B, 64, 64, 64, 16]."""
        x = self.features_head_deconv(z3d)
        x = leaky_relu(self.features_head_bn1(x, train))
        x = self.features_head_conv(x)
        return self.features_head_bn2(x, train)

    def fuse(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, t, 32, 32, 32, 128] -> [B, 32, 32, 32, 128] (reference: encoder.py:59-63)."""
        return self.fusion_feature(x, train)

    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # convenience for initialization; the real paths use the named methods.
        return self.get_feat3d(img, train)
