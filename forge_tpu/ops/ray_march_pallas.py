"""Fused Pallas ray-march kernel: brick-tile emission-absorption rendering.

The speed-of-light renderer keeps the volume VMEM-resident for a whole
camera and never issues HBM gathers (the XLA paths' cost: 84M gathered rows
per forward). Structure:

  grid = (camera, tile_row, tile_col); each program owns an 8x8-pixel tile
  and marches all depth planes with EA state in registers:
    - per depth plane, the tile's 64 samples fall inside a small brick
      (the tile frustum's footprint is ~10-13 voxels);
    - Mosaic requires sublane offsets % 8 and lane offsets % 128, so the
      feature volume is laid out [B, D, H, W*C] (C=16 -> a base aligned to
      8 voxels is 128-lane aligned) with brick bases rounded down to 8 and
      widths widened to cover (Z=20, H=24, X=24); the density volume keeps
      full-width rows [B, D, H, W] (W<=128 lanes, no x slicing at all);
    - exact trilinear interpolation is a tent-weight contraction on the MXU:
      ohzy [rays, Z*H] @ brick [Z*H, X*C], an x-tent expansion matmul, and a
      constant channel-select matmul — tents use ABSOLUTE voxel indices so
      alignment widening never changes the math;
    - volumes are bf16 (f32 accumulation); 64-cube * 17ch bf16 = 9.4 MB VMEM.

Semantics match ops/ray_march.py exactly (same sample positions, PyTorch3D
align_corners lookup, zero padding, shifted-cumprod EA with the patched depth
channel; reference: models/volume_render.py:18-24,63, README.md:26-33).
Parity is tested in interpret mode. In production (mm_dtype=bf16) BOTH the
volumes and the tent interpolation weights (and the m1 intermediate) are
bf16 on the MXU with f32 accumulation; sample COORDINATES stay f32. Measured
error vs the f32 XLA path is ~3.3e-2 max-abs on random dense volumes — if the
interpret parity test tolerance is tightened, grow the margin accordingly.

Validated on a real v5e chip (round 2): exact-parity vs render_volume_xla up
to bf16 volume quantization (3.3e-2 max abs on random dense volumes), and
164.6 ms for the flagship 10-camera 128^2x64 render vs 262 ms for the
'packed' gather backend and 2705 ms for 'xla'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forge_tpu.geometry.cameras import pixel_rays_cv2
from forge_tpu.ops.ray_march import EA_EPS
from forge_tpu.ops.voxel import coord_grid_max

TILE = 8        # pixels per tile side; rays per program = TILE * TILE
BZ = 20         # brick voxels along D (leading dim: no alignment constraint)
BH = 24         # brick voxels along H (sublane: base aligned to 8)
BX = 24         # brick voxels along W (lane via *C: base aligned to 8)


def _ray_march_kernel(
    origin_ref,    # SMEM [B, 3]
    dirs_ref,      # VMEM [1, TILE, TILE, 128] (3 used)
    feat_ref,      # VMEM [1, D, H, W*C] bf16
    dens_ref,      # VMEM [1, D, H, W] bf16
    out_ref,       # VMEM [1, TILE, TILE, C + 2]
    *,
    n_pts: int,
    min_depth: float,
    max_depth: float,
    cmax: float,
    D: int,
    C: int,
    mm_dtype=jnp.float32,
):
    R = TILE * TILE
    dirs = dirs_ref[0].reshape(R, 128)
    b = pl.program_id(0)
    ox = origin_ref[b, 0]
    oy = origin_ref[b, 1]
    oz = origin_ref[b, 2]

    step = (max_depth - min_depth) / (n_pts - 1)
    scale = 0.5 * (D - 1) / cmax
    half = 0.5 * (D - 1)

    def iota_f(n):
        return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)

    iota_z = iota_f(BZ)
    iota_h = iota_f(BH)
    iota_x = iota_f(BX)
    iota_w = iota_f(D)  # full width for the density pass

    def expand_mat(n, m, div):
        """[n, n*m]: E[i, j] = ((j // div if div else j % m) == i)."""
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n * m), 1)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n * m), 0)
        key = (j // div) if div else (j % n)
        return (key == i).astype(jnp.float32)

    # x-tent expansion [BX, BX*C]: E[i, j] = (j // C == i)
    expand_x = expand_mat(BX, C, C)
    # z/y expansions building ohzy[r, z*BH + h] = wz[r,z] * wy[r,h] without a
    # sublane->lane reshape (Mosaic rejects that shape cast)
    expand_z = expand_mat(BZ, BH, BH)          # [BZ, BZ*BH], key j // BH
    expand_y = expand_mat(BH, BZ, 0)           # [BH, BZ*BH], key j % BH
    # channel select [BX*C, C]: Sel[j, c] = (j % C == c)
    jc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 0) % C
    cc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 1)
    sel = (jc == cc).astype(jnp.float32)

    def tent(i_coord, base, iota):
        absidx = base.astype(jnp.float32) + iota           # [1, size]
        d = i_coord[:, None] - absidx                      # [R, size]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        return w * ((absidx >= 0) & (absidx <= D - 1))

    def body(s, carry):
        acc_feat, acc_depth, transmittance, survive_all = carry
        z = min_depth + step * s
        px = ox + z * dirs[:, 0]
        py = oy + z * dirs[:, 1]
        pz = oz + z * dirs[:, 2]
        ix = -px * scale + half                            # W axis [R]
        iy = -py * scale + half                            # H axis
        iz = pz * scale + half                             # D axis

        def base_of(i_coord, width, align):
            raw = jnp.floor(jnp.min(i_coord)).astype(jnp.int32) - 1
            if align > 1:
                raw = (raw // align) * align
            return jnp.clip(raw, 0, D - width)

        dbase = base_of(iz, BZ, 1)
        hbase = pl.multiple_of(base_of(iy, BH, 8), 8)
        xbase = pl.multiple_of(base_of(ix, BX, 8), 8)

        wz = tent(iz, dbase, iota_z)                       # [R, BZ]
        wy = tent(iy, hbase, iota_h)                       # [R, BH]
        wx = tent(ix, xbase, iota_x)                       # [R, BX]
        wx_full = tent(ix, jnp.zeros((), jnp.int32), iota_w)  # [R, D]

        # MXU contractions run in mm_dtype (bf16 in production: ~4x the f32
        # MXU rate; tent weights are in [0, 1] so bf16 costs ~2^-8 relative,
        # the same class as the bf16 volume quantization). f32 accumulate.
        mm = lambda a, b: jnp.dot(a.astype(mm_dtype), b.astype(mm_dtype),
                                  preferred_element_type=jnp.float32)
        ohzy = (
            mm(wz, expand_z) * mm(wy, expand_y)
        )                                                  # [R, BZ*BH]

        xoff = pl.multiple_of(xbase * C, 128)  # xbase % 8 == 0, C*8 % 128 == 0
        fbrick = feat_ref[0, pl.ds(dbase, BZ), pl.ds(hbase, BH),
                          pl.ds(xoff, BX * C)]             # [BZ, BH, BX*C]
        m1 = mm(ohzy, fbrick.reshape(BZ * BH, BX * C))     # [R, BX*C]
        wx_rep = mm(wx, expand_x)
        feat = mm(m1 * wx_rep, sel)                        # [R, C]

        dbrick = dens_ref[0, pl.ds(dbase, BZ), pl.ds(hbase, BH), :]  # [BZ,BH,D]
        d1 = mm(ohzy, dbrick.reshape(BZ * BH, D))          # [R, D]
        dens = jnp.sum(d1 * wx_full, axis=1)               # [R]

        w = dens * transmittance
        acc_feat = acc_feat + w[:, None] * feat
        acc_depth = acc_depth + w * z
        transmittance = transmittance * ((1.0 + EA_EPS) - dens)
        survive_all = survive_all * (1.0 - dens)
        return acc_feat, acc_depth, transmittance, survive_all

    init = (
        jnp.zeros((R, C), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.ones((R,), jnp.float32),
        jnp.ones((R,), jnp.float32),
    )
    acc_feat, acc_depth, _, survive_all = jax.lax.fori_loop(0, n_pts, body, init)
    opacity = 1.0 - survive_all
    out = jnp.concatenate(
        [acc_feat, opacity[:, None], acc_depth[:, None]], axis=1
    )
    out_ref[0] = out.reshape(TILE, TILE, C + 2)


def render_volume_pallas(
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
    interpret: bool = False,
    vol_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Same contract as render_volume_xla.

    Constraints: cubic volume with D == H == W <= 128 and >= brick sizes;
    image_size % TILE == 0; channel count C with (8 * C) % 128 == 0 (e.g. the
    model's 16) so brick lane offsets align.
    """
    B, D, H, W, C0 = features.shape
    assert D == H == W and D >= max(BZ, BH, BX) and W <= 128
    assert image_size % TILE == 0
    assert (8 * C0) % 128 == 0, "feature channels must align lanes (e.g. 16)"

    feat_vol = features.astype(vol_dtype).reshape(B, D, H, W * C0)
    dens_vol = densities[..., 0].astype(vol_dtype)

    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    # pad the direction channel dim to a full lane row
    dirs = jnp.pad(dirs.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 125)))
    cmax = coord_grid_max(D, volume_size)
    nt = image_size // TILE

    kernel = functools.partial(
        _ray_march_kernel,
        n_pts=n_pts_per_ray,
        min_depth=float(min_depth),
        max_depth=float(max_depth),
        cmax=float(cmax),
        D=D,
        C=C0,
        mm_dtype=vol_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nt, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE, TILE, 128), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            # single-buffered: the volume block only changes with the camera
            # index; double buffering it would blow the 16MB VMEM budget
            pl.BlockSpec((1, D, H, W * C0), lambda b, i, j: (b, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H, W), lambda b, i, j: (b, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, TILE, C0 + 2), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, image_size, image_size, C0 + 2), jnp.float32
        ),
        interpret=interpret,
    )(origins.astype(jnp.float32), dirs, feat_vol, dens_vol)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def render_volume_pallas_grad(
    features, densities, K, R, t,
    image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
):
    """Differentiable wrapper: Pallas forward, XLA-path backward.

    The kernel is numerically equivalent to `render_volume_xla`, so the exact
    VJP of the XLA formulation is the correct gradient; the backward
    rematerializes it (pose optimization and training differentiate through
    the renderer, kubric_eval.py:450-527).
    """
    return render_volume_pallas(
        features, densities, K, R, t, image_size, n_pts_per_ray,
        min_depth, max_depth, volume_size,
    )


def _rvp_fwd(features, densities, K, R, t,
             image_size, n_pts_per_ray, min_depth, max_depth, volume_size):
    out = render_volume_pallas(
        features, densities, K, R, t, image_size, n_pts_per_ray,
        min_depth, max_depth, volume_size,
    )
    return out, (features, densities, K, R, t)


def _rvp_bwd(image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
             res, g):
    from forge_tpu.ops.ray_march import render_volume_xla

    features, densities, K, R, t = res
    _, vjp = jax.vjp(
        lambda f, d, K_, R_, t_: render_volume_xla(
            f, d, K_, R_, t_, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size,
        ),
        features, densities, K, R, t,
    )
    return vjp(g)


render_volume_pallas_grad.defvjp(_rvp_fwd, _rvp_bwd)
