"""2D FPN cross-attention pose estimator.

Functional parity with the reference PoseEstimator2D (models/pose_estimator_2d.py:10-136):
a LeakyReLU ResNet-50 inside a minimal FPN (top-down p5->p4 only, 256ch at
16x16), three Perceiver-style cross+self attention rounds where all non-canonical
view tokens attend to the canonical view, then a stride-2 conv pyramid to a
1024-d feature (or a 7-d pose via the `out` head).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchBatchNorm, leaky_relu
from forge_tpu.nn.resnet import ResNet50Features
from forge_tpu.nn.attention import CrossAttention, SelfAttention, get_2d_sincos_pos_embed

Dtype = Any


class FPN(nn.Module):
    """reference: models/pose_estimator_2d.py:91-136 (p4 output only)."""

    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        stages = ResNet50Features(
            stride_surgery=False, leaky=True, name="resnet", **kw
        )(x, train, return_stages=True)
        c4, c5 = stages[2], stages[3]
        p5 = TorchConv(256, 1, 1, 0, name="toplayer", **kw)(c5)
        lat = TorchConv(256, 1, 1, 0, name="latlayer1", **kw)(c4)
        p5_up = jax.image.resize(
            p5, lat.shape, method="bilinear"
        )  # torch F.interpolate align_corners=False == half-pixel bilinear
        p4 = p5_up + lat
        return TorchConv(256, 3, 1, 1, name="smooth1", **kw)(p4)


class PoseEstimator2D(nn.Module):
    grid_size: int = 16  # FPN p4 token grid; img_size//16
    cross_attn_layers: int = 3
    self_attn_layers: int = 3
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.backbone = FPN(name="backbone", **kw)
        self.cross_attn_blks = [
            CrossAttention(num_heads=4, q_channels=256, kv_channels=256,
                           mlp_ratio=4, name=f"cross_{i}", **kw)
            for i in range(self.cross_attn_layers)
        ]
        self.self_attn_blks = [
            SelfAttention(num_heads=4, channels=256, mlp_ratio=4,
                          name=f"self_{i}", **kw)
            for i in range(self.self_attn_layers)
        ]
        # conv pyramid (reference :28-41)
        self.pyr_conv1 = TorchConv(256, 3, 2, 1, name="pyr_conv1", **kw)
        self.pyr_bn1 = TorchBatchNorm(name="pyr_bn1", **kw)
        self.pyr_conv2 = TorchConv(512, 3, 2, 1, name="pyr_conv2", **kw)
        self.pyr_bn2 = TorchBatchNorm(name="pyr_bn2", **kw)
        self.pyr_conv3 = TorchConv(512, 3, 2, 1, name="pyr_conv3", **kw)
        self.pyr_bn3 = TorchBatchNorm(name="pyr_bn3", **kw)
        self.pyr_conv4 = TorchConv(1024, 3, 2, 1, name="pyr_conv4", **kw)
        self.pyr_bn4 = TorchBatchNorm(name="pyr_bn4", **kw)
        # out head (reference :43-48)
        self.out_fc1 = nn.Dense(256, name="out_fc1", **kw)
        self.out_bn = TorchBatchNorm(name="out_bn", **kw)
        self.out_fc2 = nn.Dense(7, name="out_fc2", **kw)
        # learnable pos-emb initialized from 2D sincos (reference :50-51)
        sincos = 0.05 * get_2d_sincos_pos_embed(256, self.grid_size)
        self.pos_emb = self.param(
            "pos_emb",
            lambda key: jnp.asarray(sincos, dtype=jnp.float32)[None],  # [1,256,256]
        )

    def features(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[b, t, H, W, 3] images -> [b*(t-1), 1024] pose features.

        reference: models/pose_estimator_2d.py:54-82.
        """
        b, t, H, W, C = x.shape
        feat = self.backbone(x.reshape(b * t, H, W, C), train)   # [b*t,16,16,256]
        h2, w2, c2 = feat.shape[1:]
        n = h2 * w2
        feat = feat.reshape(b, t, n, c2)

        pos = self.pos_emb.astype(feat.dtype)                    # [1,n,256]
        feat_canonical = feat[:, 0] + pos                        # [b,n,256]
        others = feat[:, 1:] + pos[:, None]                      # [b,t-1,n,256]
        tokens = others.reshape(b, (t - 1) * n, c2)

        for cross, self_blk in zip(self.cross_attn_blks, self.self_attn_blks):
            tokens = cross(x_q=tokens, x_k=feat_canonical, x_v=feat_canonical,
                           residual=tokens)
            tokens = self_blk(tokens)

        feat = tokens.reshape(b * (t - 1), h2, w2, c2)
        feat = leaky_relu(self.pyr_bn1(self.pyr_conv1(feat), train))
        feat = leaky_relu(self.pyr_bn2(self.pyr_conv2(feat), train))
        feat = leaky_relu(self.pyr_bn3(self.pyr_conv3(feat), train))
        feat = leaky_relu(self.pyr_bn4(self.pyr_conv4(feat), train))  # [B,1,1,1024]
        return feat.reshape(b * (t - 1), 1024)

    def __call__(self, x: jnp.ndarray, train: bool, return_features: bool = False):
        feat = self.features(x, train)
        if return_features:
            return feat
        h = self.out_fc1(feat)
        h = leaky_relu(self.out_bn(h, train))
        return self.out_fc2(h)                                   # [B,7]
