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
from forge_tpu.ops.ray_march import (
    pallas_supports, render_volume, resolve_backend)
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

    def march(
        self,
        camera_params: Dict[str, jnp.ndarray],
        feature_3d: jnp.ndarray,
        density_3d: jnp.ndarray,
        grad_cams_per_volume: Optional[int] = None,
    ) -> jnp.ndarray:
        """Ray-march only: raw half-res feature images [B, S/2, S/2, C+2].

        camera_params: {'R': [B,3,3], 'T': [B,3], 'K': [B,3,3] full-res}.

        feature_3d: [V, D, H, W, 16]; density_3d: [V, D, H, W, 1], where
        V == B (one volume per camera) or V divides B (each volume rendered
        by its B // V consecutive cameras — the model's broadcast-to-targets
        pattern, models/model.py:117-143; the pallas backend resolves the
        grouping in-kernel so the broadcast volumes and their stacked
        gradients never materialize).

        grad_cams_per_volume: only the FIRST k cameras of each volume group
        need camera gradients (the joint training graph renders t predicted
        input views + t_all - t GT-constant NVS views per volume; the fused
        backward's camera-gradient contractions are half its MXU work, so
        skipping them for the constant NVS half is a real cut). None = all
        cameras follow self.camera_grads.
        """
        half = self.img_size // 2
        K = halve_intrinsics(camera_params["K"])
        R, T = camera_params["R"], camera_params["T"]
        backend = resolve_backend(self.backend)
        if backend == "pallas" and not pallas_supports(feature_3d.shape, half):
            # the kernel's shape envelope (cubic volume, D in [32,128],
            # lane-aligned channels, rows % 8) — resolve the fallback HERE,
            # before the cpv/chunk decisions below, so an out-of-envelope
            # config never reaches the kernel with 'pallas' already baked in
            # (render_volume's own fallback only triggers on literal 'auto')
            backend = "xla"

        B = K.shape[0]
        V = feature_3d.shape[0]
        assert B % V == 0, (B, V)
        cpv = B // V
        if cpv > 1 and backend != "pallas":
            # gather backends take per-camera volumes; materialize the
            # broadcast outside the chunk loop (legacy behavior)
            feature_3d = jnp.repeat(feature_3d, cpv, axis=0)
            density_3d = jnp.repeat(density_3d, cpv, axis=0)
            cpv = 1

        # Rematerialize the ray march: the sampled tensor is
        # [B, half, half, n_pts, C] (~7.5 GB at the reference training batch)
        # — recompute it in the backward instead of storing it.
        def _render(feature_3d, density_3d, K, R, T,
                    camera_grads=self.camera_grads, cpv=cpv):
            return render_volume(
                feature_3d, density_3d, K, R, T,
                image_size=half,
                n_pts_per_ray=self.n_pts_per_ray,
                min_depth=self.min_depth,
                max_depth=self.max_depth,
                volume_size=self.volume_size,
                backend=backend,
                camera_grads=camera_grads,
                cams_per_volume=cpv,
            )

        k = grad_cams_per_volume
        if (k is not None and 0 < k < cpv and backend == "pallas"
                and self.camera_grads):
            # split marches: first k cameras of each group with camera
            # gradients, the trailing constant cameras without; one decode
            # batch downstream keeps reference BN parity (finish() is
            # unchanged). Outputs re-interleaved to the caller's order.
            def part(x, sl):
                return x.reshape((V, cpv) + x.shape[1:])[:, sl].reshape(
                    (-1,) + x.shape[1:])

            raw1 = _render(feature_3d, density_3d, part(K, slice(0, k)),
                           part(R, slice(0, k)), part(T, slice(0, k)),
                           camera_grads=True, cpv=k)
            raw2 = _render(feature_3d, density_3d, part(K, slice(k, cpv)),
                           part(R, slice(k, cpv)), part(T, slice(k, cpv)),
                           camera_grads=False, cpv=cpv - k)
            raw = jnp.concatenate(
                [raw1.reshape((V, k) + raw1.shape[1:]),
                 raw2.reshape((V, cpv - k) + raw2.shape[1:])], axis=1
            ).reshape((B,) + raw1.shape[1:])
            if self.ray_parallel:
                from jax.sharding import PartitionSpec as P

                raw = jax.lax.with_sharding_constraint(
                    raw, P(None, "ray", None, None))
            return raw

        # Chunk cameras through lax.map: the render backward materializes an
        # f32 gradient of the packed corner table per chunk (~5.4 GB for 20
        # cameras unchunked — the joint train step OOMs without this); map's
        # backward accumulates volume gradients across chunks.
        if cpv > 1:
            # grouped pallas render: one kernel launch, no chunking (the
            # grid is sequential; VMEM holds one volume at a time), no remat
            # needed (the fused kernel's VJP residuals are just its inputs)
            ck = 0
        elif backend == "pallas":
            # ungrouped: chunk to bound the per-call gradient stack
            ck = 0 if B <= 10 else max(d for d in range(1, 11) if B % d == 0)
        else:
            ck = self.render_chunk
        if cpv > 1:
            raw = _render(feature_3d, density_3d, K, R, T)
        elif ck and B > ck and B % ck == 0:
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
        return raw

    def __call__(
        self,
        camera_params: Dict[str, jnp.ndarray],
        feature_3d: jnp.ndarray,
        density_3d: jnp.ndarray,
        train: bool = False,
        render_depth: bool = False,
        return_origin_proj: bool = False,
        grad_cams_per_volume: Optional[int] = None,
    ):
        """March + decode. See `march` for volume/camera grouping semantics.

        Returns (imgs [B,S,S,3], masks [B,S,S,1][, depth][, origin_proj]).
        """
        raw = self.march(camera_params, feature_3d, density_3d,
                         grad_cams_per_volume=grad_cams_per_volume)
        return self.finish(raw, camera_params, train,
                           render_depth=render_depth,
                           return_origin_proj=return_origin_proj)

    def finish(
        self,
        raw: jnp.ndarray,
        camera_params: Dict[str, jnp.ndarray],
        train: bool,
        render_depth: bool = False,
        return_origin_proj: bool = False,
    ):
        """Decode raw marched feature images (possibly concatenated from
        several `march` calls — one decode keeps the BatchNorm batch identical
        to the reference's single VolRender forward over all renders)."""
        C = raw.shape[-1] - 2
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
            K = halve_intrinsics(camera_params["K"])
            R, T = camera_params["R"], camera_params["T"]
            origin = jnp.zeros((1, 3), dtype=K.dtype)
            outs.append(project_points_screen(origin, K, R, T)[:, 0, :])  # [B,2]
        return tuple(outs)
