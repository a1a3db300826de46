"""Volume renderer module: ray-march + 2D feature->RGB decoder.

Functional parity with the reference VolRender (models/volume_render.py:11-103):
rendering happens at half the image resolution with halved intrinsics, the
16-channel feature image is decoded to RGB by a ConvTranspose/Conv stack
(ReLU-ed), and silhouette/depth are upsampled bilinearly to full resolution.
The ray-march itself is ops/ray_march.py ('xla' reference path or the
'packed' single-gather-per-sample backend); K-halving is functional here
instead of the reference's in-place mutation (models/volume_render.py:50-51).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchConvTranspose, TorchBatchNorm, leaky_relu
from forge_tpu.ops.ray_march import render_volume
from forge_tpu.geometry.cameras import project_points_screen

Dtype = Any


def halve_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """K/2 with K[2,2] restored to 1 (reference: models/volume_render.py:50-51)."""
    K = jnp.asarray(K) / 2.0
    return K.at[..., 2, 2].set(1.0)


class VolRender(nn.Module):
    img_size: int = 256
    volume_size: float = 1.0
    n_pts_per_ray: int = 64
    min_depth: float = 0.5
    max_depth: float = 2.0
    k_size: int = 5
    backend: str = "xla"
    camera_grads: bool = True  # False: GT-pose training (cameras are
                               # constants); skips the camera-gradient part
                               # of the pallas fused backward
    ray_parallel: bool = False
    render_chunk: int = 5   # cameras per lax.map chunk (0 = render all at once)
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pad = self.k_size // 2
        # reference: models/volume_render.py:29-37
        self.conv_rgb_deconv = TorchConvTranspose(
            16, self.k_size + 1, 2, pad, name="conv_rgb_deconv", **kw
        )
        self.conv_rgb_bn1 = TorchBatchNorm(name="conv_rgb_bn1", **kw)
        self.conv_rgb_conv1 = TorchConv(8, self.k_size, 1, pad, name="conv_rgb_conv1", **kw)
        self.conv_rgb_bn2 = TorchBatchNorm(name="conv_rgb_bn2", **kw)
        self.conv_rgb_conv2 = TorchConv(3, self.k_size, 1, pad, name="conv_rgb_conv2", **kw)

    def decode_rgb(self, feat_img: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = self.conv_rgb_deconv(feat_img)
        x = leaky_relu(self.conv_rgb_bn1(x, train))
        x = self.conv_rgb_conv1(x)
        x = leaky_relu(self.conv_rgb_bn2(x, train))
        x = self.conv_rgb_conv2(x)
        return jax.nn.relu(x)  # reference applies F.relu outside conv_rgb (:73)

    def __call__(
        self,
        camera_params: Dict[str, jnp.ndarray],
        feature_3d: jnp.ndarray,
        density_3d: jnp.ndarray,
        train: bool = False,
        render_depth: bool = False,
        return_origin_proj: bool = False,
    ):
        """camera_params: {'R': [B,3,3], 'T': [B,3], 'K': [B,3,3] full-res}.

        feature_3d: [B, D, H, W, 16]; density_3d: [B, D, H, W, 1].
        Returns (imgs [B,S,S,3], masks [B,S,S,1][, depth][, origin_proj]).
        """
        half = self.img_size // 2
        K = halve_intrinsics(camera_params["K"])
        R, T = camera_params["R"], camera_params["T"]

        # Rematerialize the ray march: the sampled tensor is
        # [B, half, half, n_pts, C] (~7.5 GB at the reference training batch)
        # — recompute it in the backward instead of storing it.
        def _render(feature_3d, density_3d, K, R, T):
            return render_volume(
                feature_3d, density_3d, K, R, T,
                image_size=half,
                n_pts_per_ray=self.n_pts_per_ray,
                min_depth=self.min_depth,
                max_depth=self.max_depth,
                volume_size=self.volume_size,
                backend=self.backend,
                camera_grads=self.camera_grads,
            )

        # Chunk cameras through lax.map: the render backward materializes an
        # f32 gradient of the packed corner table per chunk (~5.4 GB for 20
        # cameras unchunked — the joint train step OOMs without this); map's
        # backward accumulates volume gradients across chunks.
        B = feature_3d.shape[0]
        ck = self.render_chunk
        if self.backend == "pallas":
            # the fused kernel runs at full speed up to ~10 cameras per call
            # but degrades nonlinearly beyond (B=40 measured ~10x slower PER
            # CAMERA; B=10 control healthy — see OPTIMIZATION.md round 2).
            # Chunk to the largest divisor of B that is <= 10.
            if B > 10:
                ck = max(d for d in range(1, 11) if B % d == 0)
            else:
                ck = 0
        if ck and B > ck and B % ck == 0:
            def _chunk(args):
                return jax.checkpoint(_render)(*args)

            n = B // ck
            split = lambda x: x.reshape((n, ck) + x.shape[1:])
            raw = jax.lax.map(
                _chunk,
                (split(feature_3d), split(density_3d), split(K), split(R),
                 split(T)),
            )
            raw = raw.reshape((B,) + raw.shape[2:])
        else:
            raw = jax.checkpoint(_render)(
                feature_3d, density_3d, K, R, T
            )                                                   # [B,half,half,C+2]
        if self.ray_parallel:
            # sequence parallelism: image rows sharded over the 'ray' mesh
            # axis (XLA replicates the volume and splits the march; the
            # reference has no analogue — its only parallelism is DDP,
            # SURVEY.md §2.3)
            from jax.sharding import PartitionSpec as P

            # constrain only the row axis: the batch axis keeps whatever
            # ('data') sharding propagates from the inputs, and shapes with
            # tiny batches (init traces at b=1) stay legal.
            raw = jax.lax.with_sharding_constraint(
                raw, P(None, "ray", None, None))
        C = feature_3d.shape[-1]
        feat_img = raw[..., :C]
        sil = raw[..., C : C + 1]
        depth = raw[..., C + 1 : C + 2]

        imgs = self.decode_rgb(feat_img, train)                 # [B,S,S,3]
        full = (raw.shape[0], self.img_size, self.img_size, 1)
        masks = jax.image.resize(sil, full, method="bilinear")
        outs = [imgs, masks]
        if render_depth:
            outs.append(jax.image.resize(depth, full, method="bilinear"))
        if return_origin_proj:
            origin = jnp.zeros((1, 3), dtype=K.dtype)
            outs.append(project_points_screen(origin, K, R, T)[:, 0, :])  # [B,2]
        return tuple(outs)
