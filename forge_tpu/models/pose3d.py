"""3D voxel-correlation pose estimator.

Functional parity with the reference PoseEstimator3D + PoseTransformer
(models/pose_estimator_3d.py:9-144): canonical-view voxel tokens cross-attend
to each other view over N=16^3=4096 tokens; the raw softmax attention matrix is
multiplied against a 3D sincos positional code to produce per-token soft 3D
correspondence coordinates; a conv pyramid reduces to a 1024-d feature and a
small head regresses rotation (+translation, +confidence).

The [B, 4096, 4096] attention product is the model's hottest matmul; tokens are
channels-last so both einsums land on the MXU directly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchBatchNorm, leaky_relu
from forge_tpu.nn.attention import Block, get_3d_sincos_pos_embed
from forge_tpu.geometry import rotations as geo

Dtype = Any

ROT_DIMS = {"euler": 3, "quat": 4, "6D": 6, "9D": 9}


def to_se3(x: jnp.ndarray, rot_representation: str) -> jnp.ndarray:
    """Pose vector -> SE(3) (reference: models/pose_estimator_3d.py:104-113)."""
    if rot_representation == "euler":
        return geo.euler2mat(x)
    if rot_representation == "quat":
        return geo.quat2mat(x)
    if rot_representation == "6D":
        return geo.rot6d2mat(x)
    if rot_representation == "9D":
        return geo.rot9d2mat(x)
    raise ValueError(rot_representation)


class PoseTransformer(nn.Module):
    """reference: models/pose_estimator_3d.py:116-144."""

    inp_res: int = 16
    dim: int = 64
    mlp_ratio: float = 2.0
    coord_dim: int = 64
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.cross_transformer = Block(self.dim, self.mlp_ratio, name="cross", **kw)
        self.self_transformer = Block(self.dim, self.mlp_ratio, name="self", **kw)
        pe = get_3d_sincos_pos_embed(self.coord_dim, self.inp_res, self.inp_res) * 0.1
        self.pos_embed_3d = jnp.asarray(pe, dtype=jnp.float32)[None]   # [1,N,C]

    def __call__(self, q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """q, k: [B, N, C] tokens -> [B, N, C] coordinate features."""
        pe = self.pos_embed_3d.astype(q.dtype)
        attn = self.cross_transformer.get_attn(query=q, key=k)   # [B,N,N]
        coord = jnp.einsum("bnm,bmc->bnc", attn, jnp.broadcast_to(pe, (q.shape[0],) + pe.shape[1:]))
        return self.self_transformer(query=coord, key=coord)


class PoseEstimator3D(nn.Module):
    rot_representation: str = "quat"
    inp_res: int = 16  # token grid after the stride-2 conv; 16 for 32-cube volumes
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def pose_dim(self) -> int:
        return ROT_DIMS[self.rot_representation] + 3

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # reference :26-31
        self.conv3d_1a = TorchConv(64, 3, 2, 1, name="conv3d_1a", **kw)
        self.conv3d_1bn = TorchBatchNorm(name="conv3d_1bn", **kw)
        self.conv3d_1b = TorchConv(64, 3, 1, 1, name="conv3d_1b", **kw)

        self.pose_transformer = PoseTransformer(
            inp_res=self.inp_res, dim=64, mlp_ratio=2.0, coord_dim=64,
            name="pose_transformer", **kw,
        )

        # reference :36-43
        self.conv3d_2a = TorchConv(64, 3, 1, 1, name="conv3d_2a", **kw)
        self.conv3d_2abn = TorchBatchNorm(name="conv3d_2abn", **kw)
        self.conv3d_2b = TorchConv(128, 3, 2, 1, name="conv3d_2b", **kw)
        self.conv3d_2bbn = TorchBatchNorm(name="conv3d_2bbn", **kw)
        # reference :45-52
        self.conv3d_3a = TorchConv(256, 3, 1, 1, name="conv3d_3a", **kw)
        self.conv3d_3abn = TorchBatchNorm(name="conv3d_3abn", **kw)
        self.conv3d_3b = TorchConv(512, 3, 2, 1, name="conv3d_3b", **kw)
        self.conv3d_3bbn = TorchBatchNorm(name="conv3d_3bbn", **kw)
        # reference :54-59
        self.pose_head_1a = TorchConv(512, 3, 2, 1, name="pose_head_1a", **kw)
        self.pose_head_1bn = TorchBatchNorm(name="pose_head_1bn", **kw)
        self.pose_head_1b = TorchConv(1024, 3, 2, 1, name="pose_head_1b", **kw)
        # reference :60-64
        self.pose_head_2_norm = nn.LayerNorm(epsilon=1e-5, name="pose_head_2_norm", **kw)
        # reference :65-70
        self.out_fc1 = nn.Dense(256, name="out_fc1", **kw)
        self.out_bn = TorchBatchNorm(name="out_bn", **kw)
        self.out_fc2 = nn.Dense(self.pose_dim + 1, name="out_fc2", **kw)

    def features(self, features: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[b, t, 32, 32, 32, 128] voxel features -> [b*(t-1), 1024].

        reference: models/pose_estimator_3d.py:73-95.
        """
        b, t, D1, H1, W1, C1 = features.shape
        x = features.reshape(b * t, D1, H1, W1, C1)
        x = self.conv3d_1a(x)
        x = leaky_relu(self.conv3d_1bn(x, train))
        x = self.conv3d_1b(x)                                   # [b*t,16,16,16,64]
        _, D, H, W, C = x.shape
        N = D * H * W

        tokens = x.reshape(b, t, N, C)
        ref = jnp.broadcast_to(tokens[:, 0:1], (b, t - 1, N, C)).reshape(b * (t - 1), N, C)
        cur = tokens[:, 1:].reshape(b * (t - 1), N, C)

        coord = self.pose_transformer(q=ref, k=cur)             # [b*(t-1),N,C]
        x = coord.reshape(b * (t - 1), D, H, W, C)

        x = leaky_relu(self.conv3d_2abn(self.conv3d_2a(x), train))
        x = leaky_relu(self.conv3d_2bbn(self.conv3d_2b(x), train))
        x = leaky_relu(self.conv3d_3abn(self.conv3d_3a(x), train))
        x = leaky_relu(self.conv3d_3bbn(self.conv3d_3b(x), train))   # [B,4,4,4,512]
        x = leaky_relu(self.pose_head_1bn(self.pose_head_1a(x), train))
        x = self.pose_head_1b(x)                                 # [B,1,1,1,1024]
        x = x.reshape(b * (t - 1), 1024)
        x = leaky_relu(self.pose_head_2_norm(x))
        return x

    def __call__(
        self, features: jnp.ndarray, train: bool, return_features: bool = False
    ):
        x = self.features(features, train)
        if return_features:
            return x
        x = self.out_fc1(x)
        x = leaky_relu(self.out_bn(x, train))
        x = self.out_fc2(x)                                      # [B, pose_dim+1]
        return x[..., : self.pose_dim], x[..., self.pose_dim :]
