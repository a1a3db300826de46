"""Packed-gather volume renderer backend ('packed').

XLA TPU gathers cost roughly a fixed amount PER ROW nearly independent of row
width (rows are (8,128)-tiled either way), so the reference formulation —
8 corner gathers per ray-sample — pays 8x the necessary op count. This backend
precomputes an expanded volume whose row at voxel (z, y, x) holds the full
2x2x2 corner neighborhood's channels contiguously, so trilinear sampling needs
ONE gathered row per ray-sample (8x fewer gather rows at 8x the row payload,
which rides in otherwise-padded lanes).

Numerics are identical to ops/ray_march.py (same sample positions, same
zero-padding, same emission-absorption compositing); parity is tested on CPU.
Extra cost: materializing the expanded volume (8x the volume bytes, built once
per forward with rolls — bandwidth-trivial next to the gather savings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march import emission_absorption, sample_points_world
from forge_tpu.ops.voxel import coord_grid_max


def _expand_corners(vol: jnp.ndarray) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B, D*H*W, 8*C]: row v holds the 2x2x2 neighborhood.

    Out-of-range neighbors (at the +1 edges) are ZERO — exactly the
    zero-padding contribution they would have had in the 8-gather version.
    """
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

    corners = [
        shift(vol, dz, dy, dx)
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    packed = jnp.concatenate(corners, axis=-1)            # [B,D,H,W,8C]
    return packed.reshape(B, D * H * W, 8 * C)


def render_volume_packed(
    features: jnp.ndarray,
    densities: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    image_size: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
    volume_size: float,
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Same contract as render_volume_xla; one gather row per ray-sample.

    table_dtype: dtype of the packed corner table. The 8C=136-lane rows pad to
    256 lanes in HBM, so f32 tables cost 2.7 GB for 10 cameras; bf16 halves
    both the table and the gathered bytes at ~1e-3 value precision (sample
    coordinates stay f32). Pass jnp.float32 for bit-parity with the XLA path.
    """
    B, D, H, W, C0 = features.shape
    vol = jnp.concatenate([features, densities], axis=-1)  # [B,D,H,W,C]
    C = C0 + 1
    packed = _expand_corners(vol.astype(table_dtype))      # [B,V,8C]

    pts, z = sample_points_world(
        K, R, t, image_size, n_pts_per_ray, min_depth, max_depth
    )                                                      # [B,h,w,n,3]
    cmax = coord_grid_max(D, volume_size)
    flip = jnp.array([-1.0, -1.0, 1.0], dtype=pts.dtype) / cmax
    g = (pts * flip).reshape(B, -1, 3)                     # normalized [-1,1]
    N = g.shape[1]

    # torch align_corners=True unnormalization (PyTorch3D volume lookup)
    ix = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    iy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    iz = (g[..., 2] + 1.0) * 0.5 * (D - 1)
    ix0f, iy0f, iz0f = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    fx, fy, fz = ix - ix0f, iy - iy0f, iz - iz0f
    ix0 = ix0f.astype(jnp.int32)
    iy0 = iy0f.astype(jnp.int32)
    iz0 = iz0f.astype(jnp.int32)

    # Each packed row covers corners (z0..z0+1, ...) with zero at +1 edges, so
    # clamp the BASE into [−1?, ...] — bases fully outside must contribute 0.
    # Validity per corner: base+d in range. Handle by zeroing weights of
    # corners whose absolute index is out of volume, and clamping the base row
    # index; a clamped base changes which corners the row holds, but those
    # corners then carry zero weight. Base index clamp range [0, S-1]: rows at
    # S-1 hold zeros in their +1 slots already.
    izc = jnp.clip(iz0, 0, D - 1)
    iyc = jnp.clip(iy0, 0, H - 1)
    ixc = jnp.clip(ix0, 0, W - 1)
    flat = (izc * H + iyc) * W + ixc                        # [B,N]

    # Slot s of the gathered row holds vol[base_clamped + s]. When the base
    # was clamped (sample near/over the boundary), the row's slots are not the
    # sample's corners — so weight each slot by the tent weight of its
    # ABSOLUTE index, zeroed outside the volume (zero-padding semantics).
    # E.g. ix0 == -1: row at x=0 holds vol[0] in slot 0, which must get the
    # `fx` (corner +1) weight; slot 1 holds vol[1] which gets 0.
    def slot_weights(base, base_c, f, size):
        def w_of(absidx):
            return (
                jnp.where(absidx == base, 1 - f, 0.0)
                + jnp.where(absidx == base + 1, f, 0.0)
            ) * ((absidx >= 0) & (absidx < size))

        return jnp.stack([w_of(base_c), w_of(base_c + 1)], -1)  # [B,N,2]

    wz = slot_weights(iz0, izc, fz, D)
    wy = slot_weights(iy0, iyc, fy, H)
    wx = slot_weights(ix0, ixc, fx, W)
    w8 = (
        wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).reshape(B, N, 8)

    # Chunk the gather: its [B, chunk, 8C] output pads 8C -> 256 lanes, so a
    # single full-size gather would materialize ~10 GB; lax.map bounds the
    # transient to one chunk.
    n_chunks = max(1, N // 65536)
    while N % n_chunks:
        n_chunks -= 1
    chunk = N // n_chunks

    def sample_chunk(args):
        flat_c, w8_c = args                                  # [B,chunk],[B,chunk,8]
        rows = jnp.take_along_axis(packed, flat_c[..., None], axis=1)
        rows = rows.reshape(B, chunk, 8, C)
        return jnp.einsum("bns,bnsc->bnc", w8_c, rows.astype(w8_c.dtype))

    flat_chunks = flat.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    w8_chunks = w8.reshape(B, n_chunks, chunk, 8).transpose(1, 0, 2, 3)
    sampled = jax.lax.map(sample_chunk, (flat_chunks, w8_chunks))
    sampled = sampled.transpose(1, 0, 2, 3).reshape(
        B, image_size, image_size, n_pts_per_ray, C)

    feat_s = sampled[..., :C0]
    dens_s = sampled[..., C0]
    lengths = jnp.broadcast_to(z, dens_s.shape)
    return emission_absorption(dens_s, feat_s, lengths)
