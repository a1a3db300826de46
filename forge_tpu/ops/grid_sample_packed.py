"""Packed-corner 3D grid sampling: one gathered row per sample point.

Generalizes the renderer's packed-gather trick (ops/ray_march_packed.py) to
arbitrary sample grids with torch grid_sample semantics: a corner table whose
row at voxel v holds the full 2x2x2 neighborhood contiguously, making
trilinear interpolation a single row gather + an 8-weight contraction. TPU XLA
gathers cost ~25-32 ns per ROW nearly independent of row width (measured,
OPTIMIZATION.md), so this is ~8x faster than the 8-corner formulation for the
SE(3) voxel resample (models/rotate.py:137's CUDA grid_sample in the
reference), whose 128-channel rows (8*128 = 1024 lanes) pad nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from forge_tpu.ops.grid_sample import _unnormalize


def _expand_corners(vol: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, D*H*W, 8*C] corner table (+1 edges zero)."""
    B, D, H, W, C = vol.shape
    zero_z = jnp.zeros((B, 1, H, W, C), vol.dtype)
    zero_y = jnp.zeros((B, D, 1, W, C), vol.dtype)
    zero_x = jnp.zeros((B, D, H, 1, C), vol.dtype)

    def shift(v, dz, dy, dx):
        if dz:
            v = jnp.concatenate([v[:, 1:], zero_z], axis=1)
        if dy:
            v = jnp.concatenate([v[:, :, 1:], zero_y], axis=2)
        if dx:
            v = jnp.concatenate([v[:, :, :, 1:], zero_x], axis=3)
        return v

    corners = [shift(vol, dz, dy, dx)
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    return jnp.concatenate(corners, axis=-1).reshape(B, D * H * W, 8 * C)


def grid_sample_3d_packed(
    volume: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch-parity trilinear sampling with zero padding; see ops/grid_sample.

    volume: [B, D, H, W, C]; grid: [B, *S, 3] (x, y, z) in [-1, 1].
    """
    B, D, H, W, C = volume.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 3)
    N = g.shape[1]

    ix = _unnormalize(g[..., 0], W, align_corners)
    iy = _unnormalize(g[..., 1], H, align_corners)
    iz = _unnormalize(g[..., 2], D, align_corners)
    ix0 = jnp.floor(ix).astype(jnp.int32)
    iy0 = jnp.floor(iy).astype(jnp.int32)
    iz0 = jnp.floor(iz).astype(jnp.int32)
    fx, fy, fz = ix - ix0, iy - iy0, iz - iz0

    izc = jnp.clip(iz0, 0, D - 1)
    iyc = jnp.clip(iy0, 0, H - 1)
    ixc = jnp.clip(ix0, 0, W - 1)
    flat = (izc * H + iyc) * W + ixc

    # weight slot s by the tent weight of its ABSOLUTE index (handles base
    # clamping at boundaries; out-of-volume corners get zero — torch's
    # padding_mode='zeros')
    def slot_weights(base, base_c, f, size):
        def w_of(absidx):
            return (
                jnp.where(absidx == base, 1 - f, 0.0)
                + jnp.where(absidx == base + 1, f, 0.0)
            ) * ((absidx >= 0) & (absidx < size))

        return jnp.stack([w_of(base_c), w_of(base_c + 1)], -1)

    wz = slot_weights(iz0, izc, fz, D)
    wy = slot_weights(iy0, iyc, fy, H)
    wx = slot_weights(ix0, ixc, fx, W)
    w8 = (
        wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).reshape(B, N, 8)

    packed = _expand_corners(volume)
    rows = jnp.take_along_axis(packed, flat[..., None], axis=1)
    rows = rows.reshape(B, N, 8, C)
    out = jnp.einsum("bns,bnsc->bnc", w8.astype(volume.dtype), rows)
    return out.reshape(out_shape)
