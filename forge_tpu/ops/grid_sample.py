"""3D trilinear grid sampling with exact PyTorch semantics, pure XLA.

Replaces the two native grid-sample kernels the reference leans on:
  - ATen CUDA `F.grid_sample` for the SE(3) voxel resample
    (reference: models/rotate.py:137, align_corners=False, zero padding), and
  - PyTorch3D's VolumeSampler lookup inside the volume renderer
    (align_corners=True, zero padding).

Design: channels-last volumes ([B, D, H, W, C]) so the channel axis lands on
TPU lanes; the 8 corner fetches become flat gathers over the [D*H*W] axis,
which XLA lowers to efficient dynamic-gathers, and the trilinear blend is a
VPU-friendly fused multiply-add tree. For the renderer hot path a fused Pallas
kernel lives in ops/ray_march_pallas.py; this op is the general-purpose /
reference version and serves the 32-voxel rotate path, where XLA fusion is
already near bandwidth-bound.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] to voxel index space (torch grid_sample convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_3d(
    volume: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample of `volume` at normalized `grid` locations.

    Args:
      volume: [B, D, H, W, C] (channels-last).
      grid: [B, *S, 3] sample locations in [-1, 1]; the last axis is (x, y, z)
        with x indexing W, y indexing H, z indexing D — identical to
        `torch.nn.functional.grid_sample` on a 5-D input.
      align_corners: torch semantics (False = reference rotate path,
        True = PyTorch3D volume sampling).
      padding_mode: 'zeros' or 'border'.

    Returns: [B, *S, C].
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode}")
    B, D, H, W, C = volume.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 3)
    N = g.shape[1]

    ix = _unnormalize(g[..., 0], W, align_corners)
    iy = _unnormalize(g[..., 1], H, align_corners)
    iz = _unnormalize(g[..., 2], D, align_corners)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    iz0 = jnp.floor(iz)
    fx = ix - ix0
    fy = iy - iy0
    fz = iz - iz0

    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    iz0 = iz0.astype(jnp.int32)
    ix1, iy1, iz1 = ix0 + 1, iy0 + 1, iz0 + 1

    vol_flat = volume.reshape(B, D * H * W, C)

    def fetch(zz, yy, xx):
        if padding_mode == "zeros":
            valid = (
                (zz >= 0) & (zz < D) & (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            )
        else:  # border
            valid = None
        zc = jnp.clip(zz, 0, D - 1)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        flat = (zc * H + yc) * W + xc                               # [B,N]
        vals = jnp.take_along_axis(vol_flat, flat[..., None], axis=1)  # [B,N,C]
        if valid is not None:
            vals = vals * valid[..., None].astype(vals.dtype)
        return vals

    wx0, wx1 = (1.0 - fx), fx
    wy0, wy1 = (1.0 - fy), fy
    wz0, wz1 = (1.0 - fz), fz

    out = (
        fetch(iz0, iy0, ix0) * (wz0 * wy0 * wx0)[..., None]
        + fetch(iz0, iy0, ix1) * (wz0 * wy0 * wx1)[..., None]
        + fetch(iz0, iy1, ix0) * (wz0 * wy1 * wx0)[..., None]
        + fetch(iz0, iy1, ix1) * (wz0 * wy1 * wx1)[..., None]
        + fetch(iz1, iy0, ix0) * (wz1 * wy0 * wx0)[..., None]
        + fetch(iz1, iy0, ix1) * (wz1 * wy0 * wx1)[..., None]
        + fetch(iz1, iy1, ix0) * (wz1 * wy1 * wx0)[..., None]
        + fetch(iz1, iy1, ix1) * (wz1 * wy1 * wx1)[..., None]
    )
    return out.reshape(out_shape)
