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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forge_tpu.geometry.cameras import pixel_rays_cv2
from forge_tpu.ops.ray_march import EA_EPS
from forge_tpu.ops.voxel import coord_grid_max

TILE = 8        # pixels per tile side; rays per program = TILE * TILE
BZ = 20         # brick voxels along D at small D (leading dim: no alignment
                # constraint). At D >= 64 the flagship envelope needs only
                # ~15.5 z-planes (check_brick_coverage), and 16 is -14% fwd /
                # -12% fwd+bwd (experiments/brick_probe.py); small volumes
                # (tests at D=32 with wide-FOV cameras) need the full 20.
BH = 24         # brick voxels along H (sublane: base aligned to 8)
BX = 24         # brick voxels along W (lane via *C: base aligned to 8)
SPI = 4         # depth samples per loop iteration sharing one brick (the
                # brick sizes must cover the tile frustum footprint PLUS the
                # (SPI-1)-sample depth advance; see _spi)

# Round-5 kernel restructures (exact same math, fewer MXU passes; one env
# kills all three for A/B, probes monkeypatch the individual flags):
#  SELSUM: forward accumulates features in the expanded x-layout [R, BX*C]
#    and collapses over x ONCE per tile after the depth loop (the x-sum
#    commutes with the EA accumulation) — removing the per-group channel-
#    select matmul, 6 of the forward's 30 per-live-group MXU pass-units.
#  DWT: backward A computes the four sigma row-dots off
#    dW = [wx_full; wxp_full] @ dbrick^T (K = D -> 12 pass-units) instead of
#    d_all = [ohzy; ohzy_dz; ohzy_dy] @ dbrick (K = bz*BH -> 18).
#  B1CHUNK: backward B runs all C=16 feature channels in ONE chunk (the
#    32 MB vmem limit fits the 16.8 MB f32 gradient block) — half the group
#    iterations and 18 instead of 24 pass-units per live group.
_V5 = os.environ.get("FORGE_RENDER_V5", "1") != "0"
SELSUM = _V5
DWT = _V5
B1CHUNK = _V5

# HS8: 8 h-shifted copies of the volumes remove the 8-row sublane-alignment
# tax on the h-brick (the fetch picks copy s = hbase % 8 at the aligned-down
# offset, so the contraction window is the TIGHT footprint): the zh
# contraction K drops bz*BH = 384 -> bz*BH_T = 256 — forward m1 18 -> 12 and
# d1 6 -> 4 MXU pass-units per live group, backward A's VVx 36 -> 24 and
# dd 6 -> 4. Costs 8x volume HBM/VMEM residency (67 MB bf16 feature copies
# at 64^3 x 16, under the raised vmem limit); only volumes with D >= 64 use
# it (smaller test volumes' tile frusta outgrow the 16-row window).
# Chip-validated round 5 (v5_probe + brick_probe random rotations + sparse):
# dense grouped fwd 38.9 -> 30.2 ms, fwd+bwd 200 -> 161.6 ms; parity
# maxabs 0.0027 vs f32 XLA, grads <= 0.14% rel. Default ON for D >= 64.
HS8 = os.environ.get("FORGE_RENDER_HS8", "1") != "0"
BH_T = 16       # tight h-window (footprint + tent reach, no alignment tax)
NSHIFT = 8


def _bh(D: int, hs8: bool) -> int:
    return BH_T if (hs8 and D >= 64) else BH


def _hs8(D: int, hs8=None) -> bool:
    hs8 = HS8 if hs8 is None else hs8
    return bool(hs8) and D >= 64


def _h_copies(vol):
    """[V, D, H, ...] -> [V, NSHIFT, D, H, ...]; copy s holds vol[h + s]
    (zero-padded past H-1), so window rows [hbase, hbase+BH_T) are copy
    (hbase % 8) rows [hbase - hbase % 8, ...) — an 8-aligned sublane
    offset for ANY hbase."""
    cops = [vol if s == 0 else jnp.pad(
        vol[:, :, s:],
        ((0, 0), (0, 0), (0, s)) + ((0, 0),) * (vol.ndim - 3))
        for s in range(NSHIFT)]
    return jnp.stack(cops, axis=1)
def _spi(n_pts: int) -> int:
    return max(k for k in (SPI, 2, 1) if n_pts % k == 0)


def _bz(D: int) -> int:
    """z-brick size: 16 covers the flagship D=64 envelope with margin;
    smaller volumes keep the conservative 20 (their tile frusta span more
    voxels relative to D)."""
    return 16 if D >= 64 else BZ


def _group_meta(origins, dirs, dens_vol, image_size, n_pts,
                min_depth, max_depth, cmax, D, cpv, skip_empty,
                hs8=False):
    """XLA-side per-(camera, tile, depth-group) brick metadata.

    Precomputes, OUTSIDE the kernels, everything the kernels' per-group
    dead path used to derive on-core: the (d, h, x) brick bases and the
    empty-brick occupancy gate. In-kernel these cost a vector min-reduce +
    scalar extraction per axis per group (~0.4 us/group even for groups the
    skip then drops — the dominant per-group floor on sparse scenes,
    OPTIMIZATION.md round-4 #5); as a host-graph precompute they are a few
    tiny fused XLA ops per render and reach the kernels as SMEM scalars.

    Exactness: bases here are floor(min)-1 of the per-group sample-coord
    minimum, evaluated at the group's two endpoint depths only (the coords
    are affine in depth, so interior samples can undercut the endpoint min
    by at most ~2 ulp of fp error — absorbed by the >= 0.4-voxel brick
    envelope slack that check_brick_coverage asserts). Occupancy is the max
    of the density volume over the EXACT (bz, BH, full-W) window the kernel
    fetches, so occ == 0 iff the kernel's max(dbrick) gate would skip.

    Returns int32 [B * nt * nt, 1, G * 8]; per group g, columns 8g..8g+4 =
    (dbase, hbase, xbase(BX,8), xbase2(BX2,16), occ).
    """
    B = dirs.shape[0]
    spi = _spi(n_pts)
    G = n_pts // spi
    bz = _bz(D)
    nt = image_size // TILE
    step = (max_depth - min_depth) / (n_pts - 1)
    scale = 0.5 * (D - 1) / cmax
    half = 0.5 * (D - 1)

    # group endpoint sample indices [G, 2] -> depths [2G]
    import numpy as np
    s_ends = np.stack([np.arange(G) * spi, np.arange(G) * spi + spi - 1], 1)
    z_ends = jnp.asarray(min_depth + step * s_ends.reshape(-1),
                         dtype=jnp.float32)                  # [2G]

    flipscale = jnp.asarray([-scale, -scale, scale], jnp.float32)

    def tile_min_at(z):
        # per-pixel index coords at depth z, min-reduced over each 8x8 tile
        # (sequential lax.map over the 2G depths keeps the peak intermediate
        # at one [B, img, img, 3] instead of 2G of them)
        p = origins[:, None, None, :] + z * dirs               # [B,img,img,3]
        idx = p * flipscale + half
        return idx.reshape(B, nt, TILE, nt, TILE, 3).min(axis=(2, 4))

    mins = jax.lax.map(tile_min_at, z_ends)                  # [2G,B,nt,nt,3]
    gmin = mins.reshape(G, 2, B, nt, nt, 3).min(axis=1)      # [G,B,nt,nt,3]
    gmin = jnp.moveaxis(gmin, 0, 3)                          # [B,nt,nt,G,3]

    xmin, ymin, zmin = gmin[..., 0], gmin[..., 1], gmin[..., 2]
    dbase = base_down(zmin, bz, 1, D)
    hbase = base_down(ymin, BH, 8, D)
    xbase = base_down(xmin, BX, 8, D)
    xbase2 = base_down(xmin, BX2, 16, D)
    # HS8: unaligned tight h-base (slot 5) — the h-shift copies absorb the
    # sublane alignment (copy hbase_t % 8, offset aligned down)
    bh_t = _bh(D, hs8)
    hbase_t = base_down(ymin, bh_t, 1, D) if hs8 else hbase

    if skip_empty:
        # occupancy of the exact window the fwd/bwd-A kernels fetch
        # (tight (bz, BH_T) under HS8 — it covers the sample support, so
        # gating on it is exact; kernel B gates on the w-stash anyway)
        occ_bh = bh_t if hs8 else BH
        occ_h = hbase_t if hs8 else hbase
        dmax = dens_vol.astype(jnp.float32).max(axis=3)      # [V, D, H]
        wmax = jax.lax.reduce_window(
            dmax, -jnp.inf, jax.lax.max,
            (1, bz, occ_bh), (1, 1, 1), "valid")          # [V,D-bz+1,H-bh+1]
        nh = D - occ_bh + 1
        flat = wmax.reshape(wmax.shape[0], -1)
        cam = jnp.arange(B, dtype=jnp.int32) // cpv          # [B]
        lin = dbase * nh + occ_h                             # [B,nt,nt,G]
        occ = (flat[cam[:, None, None, None], lin] > 0).astype(jnp.int32)
    else:
        occ = jnp.ones(dbase.shape, jnp.int32)

    zero = jnp.zeros(dbase.shape, jnp.int32)
    meta = jnp.stack(
        [dbase, hbase, xbase, xbase2, occ, hbase_t, zero, zero], axis=-1)
    # [rows, 1, G*8]: Mosaic requires the last two block dims to be
    # (divisible by (8, 128)) OR equal to the array dims — blocking only the
    # leading row axis satisfies the "equal" clause for any G
    return meta.reshape(B * nt * nt, 1, G * 8)


def _meta_spec(nt, G, grid4=False):
    """SMEM BlockSpec for the _group_meta array: one (1, 1, G*8) row per
    program (see _group_meta for the shape rationale)."""
    if grid4:
        return pl.BlockSpec((1, 1, G * 8),
                            lambda n, b, i, j: (b * nt * nt + i * nt + j, 0, 0),
                            memory_space=pltpu.SMEM)
    return pl.BlockSpec((1, 1, G * 8),
                        lambda b, i, j: (b * nt * nt + i * nt + j, 0, 0),
                        memory_space=pltpu.SMEM)


def _ray_march_kernel(
    origin_ref,    # SMEM [B, 3]
    dirs_ref,      # VMEM [1, TILE, TILE, 128] (3 used)
    meta_ref,      # SMEM [1, 1, G*8] per-group brick bases + occupancy
    feat_ref,      # VMEM [1, D, H, W*C] bf16 ([1, NSHIFT, ...] under hs8)
    dens_ref,      # VMEM [1, D, H, W] bf16 ([1, NSHIFT, ...] under hs8)
    out_ref,       # VMEM [1, TILE, TILE, C + 2]
    tp_ref=None,   # VMEM [1, 1, 1, 2*G, R] optional (T, P) group-start stash
    *,
    n_pts: int,
    min_depth: float,
    max_depth: float,
    cmax: float,
    D: int,
    C: int,
    mm_dtype=jnp.float32,
    skip_empty: bool = True,
    hs8: bool = False,
):
    R = TILE * TILE
    bz = _bz(D)
    bh = BH_T if hs8 else BH
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

    iota_w = iota_f(D)  # full width for the density pass

    # Expanded-layout iotas: column j of the [*, bz*BH] zh space indexes
    # voxel (z = j // BH, h = j % BH); column j of the [*, BX*C] xc space
    # indexes x = j // C. Tent weights are evaluated DIRECTLY in these
    # layouts on the VPU — the round-3 kernel built narrow [*, bz/BH/BX]
    # tents and broadcast them with three 0/1 "expand" matmuls, each of
    # which costs a full 128-lane MXU K-pass for K = 16..24 useful lanes:
    # those expands were 18 of the kernel's 48 MXU pass-units, as many as
    # the real volume contraction m1. Direct evaluation moves that work to
    # VPU elementwise ops (~0.6 us/group) that overlap with the MXU.
    def iota2(n_cols, div, mod):
        j = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
        j = (j // div) if div > 1 else j
        j = (j % mod) if mod else j
        return j.astype(jnp.float32)

    iota_zh_z = iota2(bz * bh, bh, 0)
    iota_zh_y = iota2(bz * bh, 1, bh)
    iota_xc_x = iota2(BX * C, C, 0)
    # channel select [BX*C, C]: Sel[j, c] = (j % C == c)
    jc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 0) % C
    cc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 1)
    sel = (jc == cc).astype(jnp.float32)

    def tent(i_coord, base, iota):
        absidx = base.astype(jnp.float32) + iota           # [1, size]
        d = i_coord[:, None] - absidx                      # [rows, size]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        return w * ((absidx >= 0) & (absidx <= D - 1))

    # SPI depth samples per iteration sharing one brick fetch: the stacked
    # tent contractions run with M = SPI*R rows (full MXU passes instead of
    # half-occupied ones, amortizing the brick operand load), while the
    # sequential EA state update stays per-sample on the VPU. Adjacent
    # samples advance ~1.5 voxels along the ray, inside the bricks'
    # alignment margins for SPI <= 4 at flagship geometry.
    spi = _spi(n_pts)

    n_groups = n_pts // spi

    def body(it, carry):
        # Stash this group's START (T, P) for the fused backward: kernel A's
        # reverse pass recomputes per-sample sigma/A from these boundaries,
        # eliminating its whole forward-order pass 1 (ray_march_pallas bwd).
        if tp_ref is not None:
            tp_ref[0, 0, 0, pl.ds(it, 1), :] = carry[2].reshape(1, R)
            tp_ref[0, 0, 0, pl.ds(n_groups + it, 1), :] = carry[3].reshape(1, R)
        s = it * spi
        # brick bases + occupancy from the host-side precompute (SMEM
        # scalars): the dead path of a skipped group is just these reads
        # plus the cond — no coordinate math, no vector reductions, no
        # density fetch (_group_meta)
        dbase = meta_ref[0, 0, it * 8 + 0]
        if hs8:
            hbase = meta_ref[0, 0, it * 8 + 5]       # tight, align 1
            hsel = hbase % NSHIFT                    # which h-shift copy
            hoff = pl.multiple_of(hbase - hsel, 8)   # aligned fetch offset
        else:
            hbase = pl.multiple_of(meta_ref[0, 0, it * 8 + 1], 8)
        xbase = pl.multiple_of(meta_ref[0, 0, it * 8 + 2], 8)
        occ = meta_ref[0, 0, it * 8 + 4]

        def cat(mats):
            return mats[0] if spi == 1 else jnp.concatenate(mats, axis=0)

        def live(carry):
            acc_feat, acc_depth, transmittance, survive_all = carry
            zs = [min_depth + step * (s + k) for k in range(spi)]
            # per-sample [R] coordinate vectors; only 2-D tent matrices are
            # concatenated (sublane axis) — Mosaic cannot concatenate 1-D
            # vectors beyond one 128-lane tile
            ixs, iys, izs = [], [], []
            for zk in zs:
                ixs.append(-(ox + zk * dirs[:, 0]) * scale + half)  # W [R]
                iys.append(-(oy + zk * dirs[:, 1]) * scale + half)  # H
                izs.append((oz + zk * dirs[:, 2]) * scale + half)   # D
            if hs8:
                dbrick = dens_ref[0, hsel, pl.ds(dbase, bz),
                                  pl.ds(hoff, bh), :]
            else:
                dbrick = dens_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh), :]
            wx_full = cat([tent(x, jnp.zeros((), jnp.int32), iota_w)
                           for x in ixs])                       # [spi*R, D]
            # separable tents evaluated directly in the expanded zh / xc
            # layouts (see iota2 above): pure VPU, no expand matmuls
            ohzy = cat([tent(z, dbase, iota_zh_z) * tent(y, hbase, iota_zh_y)
                        for z, y in zip(izs, iys)])            # [spi*R, bz*BH]
            wx_rep = cat([tent(x, xbase, iota_xc_x) for x in ixs])

            # MXU contractions run in mm_dtype (bf16 in production: ~4x the
            # f32 MXU rate; tent weights are in [0, 1] so bf16 costs ~2^-8
            # relative, the same class as the bf16 volume quantization).
            # f32 accumulate.
            mm = lambda a, b: jnp.dot(a.astype(mm_dtype), b.astype(mm_dtype),
                                      preferred_element_type=jnp.float32)

            xoff = pl.multiple_of(xbase * C, 128)  # xbase, C*8 both aligned
            if hs8:
                fbrick = feat_ref[0, hsel, pl.ds(dbase, bz),
                                  pl.ds(hoff, bh), pl.ds(xoff, BX * C)]
            else:
                fbrick = feat_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh),
                                  pl.ds(xoff, BX * C)]         # [bz, bh, BX*C]
            m1 = mm(ohzy, fbrick.reshape(bz * bh, BX * C))     # [spi*R, BX*C]
            if not SELSUM:
                # NOTE: a VPU reshape-sum over x instead of this select
                # matmul is NOT Mosaic-lowerable at C=16 (infer-vector-layout
                # rejects the (spi*R, BX*C) -> (spi*R, BX, C) cast;
                # AOT-verified) — the 0/1 matmul stays
                feat = mm(m1 * wx_rep, sel)                    # [spi*R, C]
            else:
                # SELSUM: no per-group select — the EA weights multiply the
                # expanded x-layout directly and the x-fold happens once per
                # tile after the loop (see the post-loop collapse)
                feat = m1 * wx_rep                             # [spi*R, BX*C]

            d1 = mm(ohzy, dbrick.reshape(bz * bh, D))          # [spi*R, D]
            dens_s = jnp.sum(d1 * wx_full, axis=1, keepdims=True)  # [spi*R, 1]

            for k in range(spi):
                dk = dens_s[k * R:(k + 1) * R]             # [R, 1] (sublane
                fk = feat[k * R:(k + 1) * R]               #  static slices)
                wk = dk * transmittance
                transmittance = transmittance * ((1.0 + EA_EPS) - dk)
                acc_feat = acc_feat + wk * fk
                acc_depth = acc_depth + wk * zs[k]
                survive_all = survive_all * (1.0 - dk)
            return acc_feat, acc_depth, transmittance, survive_all

        if not skip_empty:
            return live(carry)
        # Empty-brick skip: for sigma >= 0 volumes an all-zero density brick
        # contributes w = 0 to every sample it covers — accumulators and
        # survive_all are exactly unchanged, and transmittance differs only
        # by the dropped (1 + EA_EPS) factors (~1e-10/sample). Object scenes
        # are mostly empty space, so this skips most tent/matmul work. The
        # gate is the precomputed occupancy of the exact brick window.
        return jax.lax.cond(occ > 0, live, lambda c: c, carry)

    init = (
        jnp.zeros((R, BX * C if SELSUM else C), jnp.float32),
        jnp.zeros((R, 1), jnp.float32),
        jnp.ones((R, 1), jnp.float32),
        jnp.ones((R, 1), jnp.float32),
    )
    acc_feat, acc_depth, _, survive_all = jax.lax.fori_loop(
        0, n_pts // spi, body, init)
    if SELSUM:
        # collapse the expanded x-layout accumulator once per tile: sum the
        # 128-lane tiles (static aligned slices), then one tiny f32 select
        # matmul [R, 128] @ [128, C] folds the remaining 128 // C
        # x-positions — ~2 MXU passes per TILE (vs 6 per GROUP)
        ntile = (BX * C) // 128
        accf = acc_feat[:, :128]
        for i in range(1, ntile):
            accf = accf + acc_feat[:, i * 128:(i + 1) * 128]
        jc128 = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0) % C
        cc128 = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
        sel128 = (jc128 == cc128).astype(jnp.float32)
        acc_feat = jnp.dot(accf, sel128,
                           preferred_element_type=jnp.float32)  # [R, C]
    opacity = 1.0 - survive_all
    out = jnp.concatenate([acc_feat, opacity, acc_depth], axis=1)
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
    interpret: bool = None,
    vol_dtype=jnp.bfloat16,
    cams_per_volume: int = 1,
    skip_empty: bool = True,
    stash_tp: bool = False,
    return_meta: bool = False,
) -> jnp.ndarray:
    """Same contract as render_volume_xla.

    return_meta additionally appends the _group_meta array to the returns so
    the custom-VJP wrapper can hand it to the backward instead of relying on
    XLA CSE to deduplicate the recompute.

    stash_tp=True additionally returns the per-tile group-start (T, P) EA
    state [B, nt, nt, 2*G, TILE*TILE] f32 (rows 0..G-1 = transmittance T,
    rows G..2G-1 = survival P at each depth-group boundary) consumed by
    render_volume_pallas_bwd — the forward already holds this state in
    registers, so stashing it replaces the backward's pass-1 recompute.

    interpret=None auto-selects the Pallas interpreter off-TPU (CPU test
    runs) and the compiled Mosaic kernel on TPU.

    cams_per_volume=n renders n consecutive cameras per volume: features and
    densities carry V = B // n volumes and camera c reads volume c // n via
    the BlockSpec index map — the [B, ...] per-camera volume broadcast (and,
    in the backward, its stacked gradient) never materializes in HBM, and the
    VMEM-resident volume block is fetched once per n cameras instead of per
    camera. This is the model's render pattern: one fused volume rendered
    from t_all target views (models/model.py:117-143).

    Constraints: cubic volume with D == H == W <= 128 and >= brick sizes;
    image_size % TILE == 0; channel count C with (8 * C) % 128 == 0 (e.g. the
    model's 16) so brick lane offsets align.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, D, H, W, C0 = features.shape
    cpv = cams_per_volume
    B = V * cpv
    assert K.shape[0] == B, (K.shape, V, cpv)
    assert D == H == W and D >= max(BZ, BH, BX) and W <= 128
    assert image_size % TILE == 0
    assert (8 * C0) % 128 == 0, "feature channels must align lanes (e.g. 16)"
    hs8 = _hs8(D)

    feat_vol = features.astype(vol_dtype).reshape(V, D, H, W * C0)
    dens_vol = densities[..., 0].astype(vol_dtype)

    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    cmax = coord_grid_max(D, volume_size)
    nt = image_size // TILE
    meta = _group_meta(
        origins.astype(jnp.float32), dirs.astype(jnp.float32), dens_vol,
        image_size, n_pts_per_ray, float(min_depth), float(max_depth),
        float(cmax), D, cpv, skip_empty, hs8=hs8)
    ret_meta = meta
    if hs8:
        feat_vol = _h_copies(feat_vol)       # [V, NSHIFT, D, H, W*C0]
        dens_vol_k = _h_copies(dens_vol)     # [V, NSHIFT, D, H, W]
    else:
        dens_vol_k = dens_vol
    # pad the direction channel dim to a full lane row
    dirs = jnp.pad(dirs.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 125)))

    kernel = functools.partial(
        _ray_march_kernel,
        n_pts=n_pts_per_ray,
        min_depth=float(min_depth),
        max_depth=float(max_depth),
        cmax=float(cmax),
        D=D,
        C=C0,
        mm_dtype=vol_dtype,
        skip_empty=skip_empty,
        hs8=hs8,
    )
    out_specs = pl.BlockSpec(
        (1, TILE, TILE, C0 + 2), lambda b, i, j: (b, i, j, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (B, image_size, image_size, C0 + 2), jnp.float32
    )
    if stash_tp:
        G = n_pts_per_ray // _spi(n_pts_per_ray)
        out_specs = [out_specs, pl.BlockSpec(
            (1, 1, 1, 2 * G, TILE * TILE), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM)]
        out_shape = [out_shape, jax.ShapeDtypeStruct(
            (B, nt, nt, 2 * G, TILE * TILE), jnp.float32)]
    G = n_pts_per_ray // _spi(n_pts_per_ray)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE, TILE, 128), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            _meta_spec(nt, G),
            # single-buffered: the volume block only changes with the camera
            # group; double buffering it would blow the VMEM budget
            pl.BlockSpec(
                (1, NSHIFT, D, H, W * C0) if hs8 else (1, D, H, W * C0),
                (lambda b, i, j: (b // cpv, 0, 0, 0, 0)) if hs8
                else (lambda b, i, j: (b // cpv, 0, 0, 0)),
                pipeline_mode=pl.Buffered(buffer_count=1),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NSHIFT, D, H, W) if hs8 else (1, D, H, W),
                (lambda b, i, j: (b // cpv, 0, 0, 0, 0)) if hs8
                else (lambda b, i, j: (b // cpv, 0, 0, 0)),
                pipeline_mode=pl.Buffered(buffer_count=1),
                memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=(_HS8_PARAMS if hs8 else None),
        interpret=interpret,
    )(origins.astype(jnp.float32), dirs, meta, feat_vol, dens_vol_k)
    if return_meta:
        if isinstance(out, (list, tuple)):
            return (*out, ret_meta)
        return out, ret_meta
    return out


# ---------------------------------------------------------------------------
# Backward kernels
#
# The VJP of the emission-absorption march decomposes per ray (cotangents
# gF [C], gO, gD; A_s = gF.f_s + gD z_s; T_s = prod_{j<s}(1+eps-sigma_j),
# P_s = prod_{j<s}(1-sigma_j)):
#
#   dL/df_s     = w_s gF                      (w_s = sigma_s T_s)
#   dL/dsigma_s = T_s (A_s - B_s) + gO P_s Q_s
#     with the division-free reverse recurrences (no 1/(1+eps-sigma) blowups)
#       B_{s-1} = sigma_s A_s + (1+eps-sigma_s) B_s,  B_{n-1} = 0
#       Q_{s-1} = (1-sigma_s) Q_s,                    Q_{n-1} = 1
#
# Volume gradients are the TRANSPOSED tent contractions of the forward —
# pure MXU matmuls accumulated brick-by-brick into a VMEM-resident gradient
# volume over the sequential TPU grid (no HBM scatters, the XLA VJP's cost).
# Ray gradients (for pose optimization through the renderer,
# kubric_eval.py:450-527) use derivative tents w'(d) = -sign(d)|_{|d|<1} in
# one factor of the same contractions; d(origin)/d(dirs) chain to (K, R, t)
# through jax.vjp of pixel_rays_cv2 on the host graph (tiny).
#
# Split into two kernels to respect the ~16 MB VMEM budget:
#   A (_bwd_dens): feat+dens volumes resident -> d_dens [D,H,W] f32 +
#     per-ray d_origin/d_dirs. A single REVERSE pass: the forward kernel
#     stashes the group-start (T, P) EA state (stash_tp), and per-sample
#     sigma/A are recomputed inside the reverse loop from the same tent
#     contractions it already needs for the gradients — no forward-order
#     pass 1, no per-sample scratch.
#   B (_bwd_feat): d_feat is 64^3 x 16 f32 = 16.7 MB, so it runs per
#     8-channel chunk in a c-major layout [B, NC, D, H, W*CC] (8.4 MB blocks),
#     as a pure transposed tent scatter of kernel A's stashed per-sample EA
#     weights (no density march of its own).
# ---------------------------------------------------------------------------

BX2 = 32        # kernel-B brick voxels along W (base aligned to 16 so the
                # lane offset xbase*CC is 128-aligned for CC=8)
CC = 8          # feature channels per kernel-B chunk

# v5e has 128 MB physical VMEM; XLA's default scoped-vmem limit is 16 MB,
# which the 8.4 MB gradient block + compiler stack slightly exceeds. 64 MB
# also covers kernel B's single-chunk 16.8 MB f32 gradient block when the
# pipeliner double-buffers it (an AOT compile with a small grid measured
# 32.14 MB scoped, 144 KB over the old 32 MB limit).
_BWD_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
# HS8 keeps all 8 h-shift copies VMEM-resident (67 MB bf16 features +
# 4 MB densities at flagship 64^3 x 16). 112 MB: the ungrouped (cpv=1)
# backward measures 104.3 MB scoped (per-camera volume blocks re-buffer
# every program); v5e physical VMEM is 128 MB.
_HS8_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)


def _geometry(origin_ref, dirs_ref, b, n_pts, min_depth, max_depth, cmax, D):
    """Shared per-tile ray setup (identical to the forward kernel)."""
    R = TILE * TILE
    dirs = dirs_ref[0].reshape(R, 128)
    ox = origin_ref[b, 0]
    oy = origin_ref[b, 1]
    oz = origin_ref[b, 2]
    step = (max_depth - min_depth) / (n_pts - 1)
    scale = 0.5 * (D - 1) / cmax
    half = 0.5 * (D - 1)

    def coords(s):
        z = min_depth + step * s
        px = ox + z * dirs[:, 0]
        py = oy + z * dirs[:, 1]
        pz = oz + z * dirs[:, 2]
        ix = -px * scale + half
        iy = -py * scale + half
        iz = pz * scale + half
        return z, ix, iy, iz

    return coords, scale


def _iota_f(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)


def _iota2_f(n_cols, div, mod):
    """[1, n_cols] float of (j // div)[ % mod]: the tent-axis index of each
    column of an expanded zh (j//BH, j%BH) or xc (j//C) layout. Feeding these
    to _tent/_dtent evaluates separable tent weights DIRECTLY in the layout
    the volume contraction consumes — replacing the expand matmuls, whose
    K = 16..24 0/1 operands each cost a full 128-lane MXU K-pass (18 of the
    48 per-group MXU pass-units in the round-3 kernels) with overlappable
    VPU elementwise work."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    if div > 1:
        j = j // div
    if mod:
        j = j % mod
    return j.astype(jnp.float32)


def _sel_mat(bx, c):
    jc = jax.lax.broadcasted_iota(jnp.int32, (bx * c, c), 0) % c
    cc = jax.lax.broadcasted_iota(jnp.int32, (bx * c, c), 1)
    return (jc == cc).astype(jnp.float32)


def _tent(i_coord, base, iota, D):
    absidx = base.astype(jnp.float32) + iota
    d = i_coord[:, None] - absidx
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return w * ((absidx >= 0) & (absidx <= D - 1))


def _dtent(i_coord, base, iota, D):
    """d/d(i_coord) of _tent: -sign(d) on |d| < 1, 0 outside (the lerp slope
    F_{k+1} - F_k inside each cell; 0 exactly at integer coords)."""
    absidx = base.astype(jnp.float32) + iota
    d = i_coord[:, None] - absidx
    w = jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)
    return w * ((absidx >= 0) & (absidx <= D - 1))


def base_down(coord, width, align, size):
    """floor(coord) - 1 (tent reach + floor slack), aligned down, clipped so
    a `width`-wide brick fits in `size`. THE brick-base rule shared by the
    renderer meta (_group_meta) and the affine-resample meta
    (ops/affine_resample._affine_meta); elementwise over `coord`."""
    raw = jnp.floor(coord).astype(jnp.int32) - 1
    if align > 1:
        raw = (raw // align) * align
    return jnp.clip(raw, 0, size - width)


def _mmT(a, b, mm_dtype):
    """a [M, K], b [M, N] -> a^T @ b [K, N] (transposed-LHS MXU matmul)."""
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _ray_march_bwd_dens_kernel(
    origin_ref,   # SMEM [B, 3]
    dirs_ref,     # VMEM [1, TILE, TILE, 128]
    meta_ref,     # SMEM [1, 1, G*8] per-group brick bases + occupancy
    feat_ref,     # VMEM [1, D, H, W*C] bf16 ([1, NSHIFT, ...] under hs8)
    dens_ref,     # VMEM [1, D, H, W] bf16 ([1, NSHIFT, ...] under hs8)
    g_ref,        # VMEM [1, TILE, TILE, C + 2] f32 cotangent image
    tp_ref,       # VMEM [1, 1, 1, 2*G, R] f32 forward (T, P) group stash
    ddens_ref,    # VMEM out [1, D, H, W] f32, accumulated over tiles
                  # ([1, NSHIFT, ...] under hs8: per-copy-space gradients,
                  # un-shifted and summed on the host graph)
    dray_ref,     # VMEM out [1, TILE, TILE, 8] f32 (d_origin | d_dirs)
    w_ref,        # VMEM out [1, 1, 1, n_pts, R] f32 per-sample EA weights
    *,
    n_pts, min_depth, max_depth, cmax, D, C, mm_dtype, ray_grads, cpv,
    skip_empty, hs8=False,
):
    R = TILE * TILE
    bz = _bz(D)
    bh = BH_T if hs8 else BH
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    coords, scale = _geometry(
        origin_ref, dirs_ref, b, n_pts, min_depth, max_depth, cmax, D)
    spi = _spi(n_pts)

    iota_w = _iota_f(D)
    iota_zh_z = _iota2_f(bz * bh, bh, 0)
    iota_zh_y = _iota2_f(bz * bh, 1, bh)
    iota_xc_x = _iota2_f(BX * C, C, 0)
    sel = _sel_mat(BX, C)

    g = g_ref[0].reshape(R, C + 2)
    gF = g[:, :C]
    gO = g[:, C:C + 1]                                     # [R, 1]
    gD = g[:, C + 1:C + 2]
    cat = lambda ms: ms[0] if spi == 1 else jnp.concatenate(ms, axis=0)
    gF_rep = cat([gF] * spi)                               # [spi*R, C]

    # the gradient volume block is shared by the cpv cameras of this group:
    # zero it on the group's first program only, accumulate across the rest
    @pl.when(jnp.logical_and(b % cpv == 0,
                             jnp.logical_and(ti == 0, tj == 0)))
    def _():
        ddens_ref[...] = jnp.zeros(ddens_ref.shape, ddens_ref.dtype)

    mm = lambda a, b_: jnp.dot(a.astype(mm_dtype), b_.astype(mm_dtype),
                               preferred_element_type=jnp.float32)

    # gF replicated across the BX x-positions, hoisted out of the depth loop
    # (gF is fixed per tile). Every quantity this kernel needs from the
    # feature path is a ROW-DOT against gF — A = <gF, feat> and the three
    # <gF, df/d*> camera-gradient dots — so instead of materializing feat
    # and df via m1 = ohzy @ fbrick plus per-derivative @sel contractions
    # (the round-3 structure: m1 + m1y + m1z + 4 sel matmuls = 78 MXU
    # pass-units per live group), contract gF INTO the brick once:
    #   V  = (wx_rep  * gF_xrep) @ fbrick^T   -> A     = rowsum(ohzy    * V)
    #   Vx = (wxp_rep * gF_xrep) @ fbrick^T   -> <gF, df_dx> = rowsum(ohzy * Vx)
    #                                          <gF, df_dy> = rowsum(ohzy_dy * V)
    #                                          <gF, df_dz> = rowsum(ohzy_dz * V)
    # = two 18-unit contractions (one without ray grads) and VPU rowsums.
    gF_xrep = jax.lax.dot_general(
        gF_rep.astype(mm_dtype), sel.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [spi*R, BX*C]

    def group_tents(ixs, iys, izs, dbase, hbase, xbase):
        # per-sample expanded tents (lists kept for the derivative products
        # in the ray-grads branch)
        tz = [_tent(z, dbase, iota_zh_z, D) for z in izs]   # [R, ZH] each
        ty = [_tent(y, hbase, iota_zh_y, D) for y in iys]
        wx_full = cat([_tent(x, jnp.zeros((), jnp.int32), iota_w, D)
                       for x in ixs])
        wx_rep = cat([_tent(x, xbase, iota_xc_x, D) for x in ixs])
        ohzy = cat([a * b for a, b in zip(tz, ty)])        # [spi*R, ZH]
        return tz, ty, wx_full, wx_rep, ohzy

    def fbrick_of(dbase, hbase, xbase, hsel=None, hoff=None):
        xoff = pl.multiple_of(xbase * C, 128)
        if hs8:
            return feat_ref[0, hsel, pl.ds(dbase, bz), pl.ds(hoff, bh),
                            pl.ds(xoff, BX * C)].reshape(bz * bh, BX * C)
        return feat_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh),
                        pl.ds(xoff, BX * C)].reshape(bz * bh, BX * C)

    # ---- single reverse pass: d_sigma -> d_dens bricks + ray grads ----
    # Per-sample (sigma, A) are recomputed here from the SAME tent
    # contractions the gradients need anyway; per-sample (T, P) roll forward
    # within each group from the forward kernel's stashed group-start state.
    # Empty-brick skip: dsig is nonzero over empty space, but every voxel the
    # dd accumulation would touch (tent support of a sigma = 0 sample over a
    # sigma >= 0 volume) is exactly 0 — its gradient dies at the decode
    # head's ReLU upstream (models/encoder.py:25-34; omniobject clamp too).
    # Ray gradients of empty groups are exactly 0 (w = 0 and the derivative
    # tents share the value tents' support, so dsig_d* = 0). A dead group is
    # a no-op on the (B, Q) recurrences too: the skipping forward drops even
    # the (1 + eps) factors, so its exact VJP carries nothing across them.
    n_groups = n_pts // spi

    def body2(it, carry):
        s = n_pts - spi - it * spi
        gidx = n_groups - 1 - it
        # brick bases + occupancy precomputed host-side (_group_meta): the
        # dead path is two SMEM reads + the cond
        dbase = meta_ref[0, 0, gidx * 8 + 0]
        if hs8:
            hbase = meta_ref[0, 0, gidx * 8 + 5]     # tight, align 1
            hsel = hbase % NSHIFT
            hoff = pl.multiple_of(hbase - hsel, 8)
        else:
            hbase = pl.multiple_of(meta_ref[0, 0, gidx * 8 + 1], 8)
            hsel = hoff = None
        xbase = pl.multiple_of(meta_ref[0, 0, gidx * 8 + 2], 8)
        occ = meta_ref[0, 0, gidx * 8 + 4]

        def live(carry):
            Bsuf, Q, d_o, d_d = carry                      # [R,1]x2, [R,3]x2
            T = tp_ref[0, 0, 0, pl.ds(gidx, 1), :].reshape(R, 1)
            P = tp_ref[0, 0, 0, pl.ds(n_groups + gidx, 1), :].reshape(R, 1)
            cs = [coords(s + k) for k in range(spi)]
            zs = [c[0] for c in cs]
            ixs = [c[1] for c in cs]
            iys = [c[2] for c in cs]
            izs = [c[3] for c in cs]
            tz, ty, wx_full, wx_rep, ohzy = group_tents(
                ixs, iys, izs, dbase, hbase, xbase)
            fbrick = fbrick_of(dbase, hbase, xbase, hsel, hoff)
            if hs8:
                dbrick = dens_ref[0, hsel, pl.ds(dbase, bz),
                                  pl.ds(hoff, bh), :].reshape(bz * bh, D)
            else:
                dbrick = dens_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh),
                                  :].reshape(bz * bh, D)
            M = spi * R
            if ray_grads:
                # derivative tents up-front so the gF-pre-contracted feature
                # dots (V, Vx) run as ONE stacked matmul — less per-op
                # Mosaic overhead/latency
                wxp_full = cat([_dtent(x, jnp.zeros((), jnp.int32), iota_w, D)
                                for x in ixs])
                ohzy_dz = cat([_dtent(z, dbase, iota_zh_z, D) * b_
                               for z, b_ in zip(izs, ty)])
                ohzy_dy = cat([a * _dtent(y, hbase, iota_zh_y, D)
                               for a, y in zip(tz, iys)])
                wxp_rep = cat([_dtent(x, xbase, iota_xc_x, D) for x in ixs])
                if DWT:
                    # DWT: all four sigma row-dots factor through the x-side
                    # contraction dW = wx @ dbrick^T (K = D -> 12 MXU
                    # pass-units for the stacked pair) instead of the zh-side
                    # d_all = [ohzy; ohzy_dz; ohzy_dy] @ dbrick (K = bz*BH ->
                    # 18): sigma = <ohzy, dW>, dsig_dx = <ohzy, dWp>,
                    # dsig_dy = <ohzy_dy, dW>, dsig_dz = <ohzy_dz, dW>
                    dW_all = jax.lax.dot_general(
                        jnp.concatenate([wx_full, wxp_full],
                                        axis=0).astype(mm_dtype),
                        dbrick.astype(mm_dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [2*spi*R, ZH]
                    dWf, dWp = dW_all[:M], dW_all[M:]
                else:
                    d_all = mm(
                        jnp.concatenate([ohzy, ohzy_dz, ohzy_dy], axis=0),
                        dbrick)                            # [3*spi*R, D]
                    d1, d1z, d1y = d_all[:M], d_all[M:2 * M], d_all[2 * M:]
                VVx = jax.lax.dot_general(
                    jnp.concatenate(
                        [wx_rep * gF_xrep, wxp_rep * gF_xrep],
                        axis=0).astype(mm_dtype),
                    fbrick.astype(mm_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [2*spi*R, bz*BH]
                V, Vx = VVx[:M], VVx[M:]
            else:
                if DWT:
                    # same x-side sigma contraction as the ray_grads branch
                    # (identical pass-units here, but keeps sigma BITWISE
                    # consistent between the cam-grads and no-cam kernels —
                    # the grad_cams_per_volume split relies on it)
                    dWf = jax.lax.dot_general(
                        wx_full.astype(mm_dtype), dbrick.astype(mm_dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [spi*R, ZH]
                else:
                    d1 = mm(ohzy, dbrick)                  # [spi*R, D]
                # gF pre-contracted into the brick (see gF_xrep above):
                # V[r,zh] = sum_xc wx_rep*gF_xrep*fbrick -> A = rowsum(ohzy*V)
                V = jax.lax.dot_general(
                    (wx_rep * gF_xrep).astype(mm_dtype),
                    fbrick.astype(mm_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [spi*R, bz*BH]
            if DWT:
                dens_s = jnp.sum(ohzy * dWf, axis=1, keepdims=True)
            else:
                dens_s = jnp.sum(d1 * wx_full, axis=1, keepdims=True)
            A_f = jnp.sum(ohzy * V, axis=1, keepdims=True)

            sigs, As, Ts, Ps = [], [], [], []
            for k in range(spi):
                sig = dens_s[k * R:(k + 1) * R]            # [R, 1]
                sigs.append(sig)
                As.append(A_f[k * R:(k + 1) * R] + gD * zs[k])
                Ts.append(T)
                Ps.append(P)
                # per-sample EA weight stash for kernel B (its d_row is
                # w * gF, so it needs no density march of its own)
                w_ref[0, 0, 0, pl.ds(s + k, 1), :] = (sig * T).reshape(1, R)
                T = T * ((1.0 + EA_EPS) - sig)
                P = P * (1.0 - sig)
            dsigs = [None] * spi
            for k in reversed(range(spi)):
                dsigs[k] = Ts[k] * (As[k] - Bsuf) + gO * Ps[k] * Q
                Bsuf = sigs[k] * As[k] + ((1.0 + EA_EPS) - sigs[k]) * Bsuf
                Q = (1.0 - sigs[k]) * Q
            dsig = cat(dsigs)                              # [spi*R, 1]

            dd = _mmT(ohzy, dsig * wx_full, mm_dtype)      # [bz*bh, D]
            if hs8:
                # accumulate in the COPY space (the aligned offset keeps the
                # sublane store legal); the wrapper un-shifts and sums the
                # NSHIFT planes on the host graph
                cur = ddens_ref[0, hsel, pl.ds(dbase, bz), pl.ds(hoff, bh), :]
                ddens_ref[0, hsel, pl.ds(dbase, bz), pl.ds(hoff, bh), :] = (
                    cur + dd.reshape(bz, bh, D))
            else:
                cur = ddens_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh), :]
                ddens_ref[0, pl.ds(dbase, bz), pl.ds(hbase, bh), :] = (
                    cur + dd.reshape(bz, bh, D))

            if ray_grads:
                k1 = lambda a: jnp.sum(a, axis=1, keepdims=True)
                if DWT:
                    dsig_dx = k1(ohzy * dWp)               # [spi*R, 1]
                    dsig_dy = k1(ohzy_dy * dWf)
                    dsig_dz = k1(ohzy_dz * dWf)
                else:
                    dsig_dx = k1(d1 * wxp_full)            # [spi*R, 1]
                    dsig_dy = k1(d1y * wx_full)
                    dsig_dz = k1(d1z * wx_full)
                # <gF, df/d*> via the pre-contracted V/Vx (no m1, no df, no
                # sel matmuls — see gF_xrep comment above)
                w = cat(sigs) * cat(Ts)                    # [spi*R, 1]
                gi_x = w * k1(ohzy * Vx) + dsig * dsig_dx
                gi_y = w * k1(ohzy_dy * V) + dsig * dsig_dy
                gi_z = w * k1(ohzy_dz * V) + dsig * dsig_dz
                # chain index coords -> world point (ix = -px*scale + half)
                dp = jnp.concatenate(
                    [-scale * gi_x, -scale * gi_y, scale * gi_z], axis=1
                )                                          # [spi*R, 3]
                for k in range(spi):
                    dpk = dp[k * R:(k + 1) * R]
                    d_o = d_o + dpk
                    d_d = d_d + zs[k] * dpk
            return (Bsuf, Q, d_o, d_d)

        def dead(carry):
            for k in range(spi):
                w_ref[0, 0, 0, pl.ds(s + k, 1), :] = jnp.zeros(
                    (1, R), jnp.float32)
            return carry

        if skip_empty:
            return jax.lax.cond(occ > 0, live, dead, carry)
        return live(carry)

    ones = jnp.ones((R, 1), jnp.float32)
    zeros1 = jnp.zeros((R, 1), jnp.float32)
    zeros3 = jnp.zeros((R, 3), jnp.float32)
    _, _, d_o, d_d = jax.lax.fori_loop(
        0, n_pts // spi, body2, (zeros1, ones, zeros3, zeros3))
    packed = jnp.concatenate(
        [d_o, d_d, jnp.zeros((R, 2), jnp.float32)], axis=1)  # [R, 8]
    dray_ref[0] = packed.reshape(TILE, TILE, 8)


def _ray_march_bwd_feat_kernel(
    origin_ref,   # SMEM [B, 3]
    dirs_ref,     # VMEM [1, TILE, TILE, 128]
    meta_ref,     # SMEM [1, 1, G*8] per-group brick bases + occupancy
    g_ref,        # VMEM [1, 1, TILE, TILE, cc] f32 (this chunk's gF)
    w_ref,        # VMEM [1, 1, 1, n_pts, R] f32 kernel A's EA-weight stash
    dfeat_ref,    # VMEM out [1, 1, D, H, W*cc] f32 (accumulated over tiles)
    *,
    n_pts, min_depth, max_depth, cmax, D, mm_dtype, cpv,
    cc=CC, bxb=None, xslot=3, xalign=16,
):
    # grid is (NC, B, nt, nt) — channel-chunk-major so that for grouped
    # rendering (cpv > 1) the output block index (b // cpv, nc) changes in
    # contiguous runs and is never revisited after being flushed.
    #
    # d_feat is a pure transposed tent scatter of d_row = w * gF: with the
    # per-sample EA weights stashed by kernel A there is no density march
    # here at all (no density volume, no d1 contraction, no sequential T
    # chain), and groups are skipped exactly when their stashed w rows are
    # all zero (w = 0 -> dfb = 0; covers empty bricks AND fully-dead rays).
    R = TILE * TILE
    bz = _bz(D)
    bxb = BX2 if bxb is None else bxb
    b = pl.program_id(1)
    ti = pl.program_id(2)
    tj = pl.program_id(3)
    coords, _ = _geometry(
        origin_ref, dirs_ref, b, n_pts, min_depth, max_depth, cmax, D)

    iota_zh_z = _iota2_f(bz * BH, BH, 0)
    iota_zh_y = _iota2_f(bz * BH, 1, BH)
    iota_x2c_x = _iota2_f(bxb * cc, cc, 0)
    sel2 = _sel_mat(bxb, cc)

    gF = g_ref[0, 0].reshape(R, cc)
    spi = _spi(n_pts)
    cat = lambda ms: ms[0] if spi == 1 else jnp.concatenate(ms, axis=0)
    # gF replicated across the BX2 x-positions, hoisted out of the depth
    # loop: d_row = w * gF with w a per-row scalar, so the channel-replicate
    # matmul (gF_rep @ sel2^T) is group-invariant and the per-group drep is
    # a VPU broadcast-multiply.
    gF_rep = cat([gF] * spi)                                # [spi*R, CC]

    @pl.when(jnp.logical_and(b % cpv == 0,
                             jnp.logical_and(ti == 0, tj == 0)))
    def _():
        dfeat_ref[...] = jnp.zeros(dfeat_ref.shape, dfeat_ref.dtype)

    gF_xrep = jax.lax.dot_general(
        gF_rep.astype(mm_dtype), sel2.astype(mm_dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [spi*R, BX2*CC]

    def body(it, _):
        s = it * spi
        # dead path = one SMEM occupancy read + cond (occ == 0 implies
        # kernel A stashed all-zero w rows for this group); occupied groups
        # additionally check the stashed w rows, which also skips
        # fully-dead rays (transmittance exhausted / object missed)
        occ = meta_ref[0, 0, it * 8 + 4]

        def occupied(_):
            dbase = meta_ref[0, 0, it * 8 + 0]
            hbase = pl.multiple_of(meta_ref[0, 0, it * 8 + 1], 8)
            xbase = pl.multiple_of(meta_ref[0, 0, it * 8 + xslot], xalign)
            ws = [w_ref[0, 0, 0, pl.ds(s + k, 1), :].reshape(R, 1)
                  for k in range(spi)]
            w = cat(ws)                                     # [spi*R, 1]

            def live(_):
                cs = [coords(s + k) for k in range(spi)]
                ixs = [c[1] for c in cs]
                iys = [c[2] for c in cs]
                izs = [c[3] for c in cs]
                ohzy = cat([_tent(z, dbase, iota_zh_z, D)
                            * _tent(y, hbase, iota_zh_y, D)
                            for z, y in zip(izs, iys)])     # [spi*R, ZH]
                wx2_rep = cat([_tent(x, xbase, iota_x2c_x, D) for x in ixs])

                dm1 = (w * gF_xrep) * wx2_rep               # [spi*R, bxb*cc]
                dfb = _mmT(ohzy, dm1, mm_dtype)             # [bz*BH, bxb*cc]

                xoff = pl.multiple_of(xbase * cc, 128)
                cur = dfeat_ref[0, 0, pl.ds(dbase, bz), pl.ds(hbase, BH),
                                pl.ds(xoff, bxb * cc)]
                dfeat_ref[0, 0, pl.ds(dbase, bz), pl.ds(hbase, BH),
                          pl.ds(xoff, bxb * cc)] = (
                    cur + dfb.reshape(bz, BH, bxb * cc))
                return 0

            jax.lax.cond(jnp.max(jnp.abs(w)) > 0, live, lambda _: 0, 0)
            return 0

        jax.lax.cond(occ > 0, occupied, lambda _: 0, 0)
        return 0

    jax.lax.fori_loop(0, n_pts // spi, body, 0)


def render_volume_pallas_bwd(
    features, densities, K, R, t, g,
    image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
    interpret: bool = None,
    vol_dtype=jnp.bfloat16,
    mm_dtype=None,
    ray_grads: bool = True,
    cams_per_volume: int = 1,
    skip_empty: bool = True,
    tp=None,
    meta=None,
):
    """Pallas backward: cotangent image g -> (d_feat, d_dens, dK, dR, dt).

    With cams_per_volume=n, features/densities hold V = B // n volumes and
    the gradient volumes accumulate IN VMEM across each volume's n cameras
    (sequential grid) — d_feat/d_dens come out [V, ...] directly, with no
    per-camera gradient stack in HBM and no cross-camera reduce.

    tp is the forward's stash_tp output (group-start (T, P) per tile). The
    custom-vjp wrapper passes it from the forward residuals; direct callers
    may omit it, in which case the forward is re-run here to produce it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, D, H, W, C0 = features.shape
    cpv = cams_per_volume
    B = V * cpv
    assert K.shape[0] == B, (K.shape, V, cpv)
    assert D == H == W and BX2 <= W <= 128 and C0 % CC == 0
    if B1CHUNK and C0 == 16:
        # one chunk: the full-C f32 gradient block (16.8 MB at 64^3 x 16)
        # fits the 32 MB vmem limit — half the group iterations, 18 instead
        # of 24 MXU pass-units per live group, and the kernel-A brick/meta
        # (xbase slot 2, align 8, BX wide) is reused for the x-window
        cc_b, bxb_b, xslot_b, xalign_b = C0, BX, 2, 8
    else:
        cc_b, bxb_b, xslot_b, xalign_b = CC, BX2, 3, 16
    NC = C0 // cc_b
    mm_dtype = vol_dtype if mm_dtype is None else mm_dtype

    if tp is None:
        _, tp = render_volume_pallas(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size, interpret=interpret,
            vol_dtype=vol_dtype, cams_per_volume=cpv, skip_empty=skip_empty,
            stash_tp=True)

    hs8 = _hs8(D)
    feat_vol = features.astype(vol_dtype).reshape(V, D, H, W * C0)
    dens_vol = densities[..., 0].astype(vol_dtype)
    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    cmax = coord_grid_max(D, volume_size)
    nt = image_size // TILE
    if meta is None:
        meta = _group_meta(
            origins.astype(jnp.float32), dirs.astype(jnp.float32), dens_vol,
            image_size, n_pts_per_ray, float(min_depth), float(max_depth),
            float(cmax), D, cpv, skip_empty, hs8=hs8)
    if hs8:
        feat_vol = _h_copies(feat_vol)
        dens_vol = _h_copies(dens_vol)
    dirs_pad = jnp.pad(dirs.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, 0), (0, 125)))
    g = g.astype(jnp.float32)
    G = n_pts_per_ray // _spi(n_pts_per_ray)

    kern_a = functools.partial(
        _ray_march_bwd_dens_kernel,
        n_pts=n_pts_per_ray, min_depth=float(min_depth),
        max_depth=float(max_depth), cmax=float(cmax), D=D, C=C0,
        mm_dtype=mm_dtype, ray_grads=ray_grads, cpv=cpv,
        skip_empty=skip_empty, hs8=hs8,
    )
    vol_block = ((1, NSHIFT, D, H, W * C0) if hs8 else (1, D, H, W * C0))
    den_block = ((1, NSHIFT, D, H, W) if hs8 else (1, D, H, W))
    vol_imap = ((lambda b, i, j: (b // cpv, 0, 0, 0, 0)) if hs8
                else (lambda b, i, j: (b // cpv, 0, 0, 0)))
    d_dens, d_ray, w_stash = pl.pallas_call(
        kern_a,
        grid=(B, nt, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE, TILE, 128), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            _meta_spec(nt, G),
            pl.BlockSpec(vol_block, vol_imap,
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(den_block, vol_imap,
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, TILE, C0 + 2),
                         lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * G, TILE * TILE),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(den_block, vol_imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, TILE, 8), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n_pts_per_ray, TILE * TILE),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (V, NSHIFT, D, H, W) if hs8 else (V, D, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, image_size, image_size, 8), jnp.float32),
            jax.ShapeDtypeStruct(
                (B, nt, nt, n_pts_per_ray, TILE * TILE), jnp.float32),
        ],
        compiler_params=(_HS8_PARAMS if hs8 else _BWD_PARAMS),
        interpret=interpret,
    )(origins.astype(jnp.float32), dirs_pad, meta, feat_vol, dens_vol, g, tp)
    if hs8:
        # un-shift the per-copy-space density gradients: copy s row h
        # covered volume row h + s
        acc = d_dens[:, 0]
        for s_ in range(1, NSHIFT):
            acc = acc.at[:, :, s_:].add(d_dens[:, s_, :, :-s_])
        d_dens = acc

    # c-major chunked cotangent image for kernel B
    g_chunks = g[..., :C0].reshape(
        B, image_size, image_size, NC, cc_b).transpose(0, 3, 1, 2, 4)

    kern_b = functools.partial(
        _ray_march_bwd_feat_kernel,
        n_pts=n_pts_per_ray, min_depth=float(min_depth),
        max_depth=float(max_depth), cmax=float(cmax), D=D,
        mm_dtype=mm_dtype, cpv=cpv,
        cc=cc_b, bxb=bxb_b, xslot=xslot_b, xalign=xalign_b,
    )
    d_feat_chunks = pl.pallas_call(
        kern_b,
        grid=(NC, B, nt, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE, TILE, 128),
                         lambda n, b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            _meta_spec(nt, G, grid4=True),
            pl.BlockSpec((1, 1, TILE, TILE, cc_b),
                         lambda n, b, i, j: (b, n, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n_pts_per_ray, TILE * TILE),
                         lambda n, b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, D, H, W * cc_b), lambda n, b, i, j: (b // cpv, n, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, NC, D, H, W * cc_b), jnp.float32),
        compiler_params=_BWD_PARAMS,
        interpret=interpret,
    )(origins.astype(jnp.float32), dirs_pad, meta, g_chunks, w_stash)

    d_feat = d_feat_chunks.reshape(V, NC, D, H, W, cc_b)
    d_feat = jnp.transpose(d_feat, (0, 2, 3, 4, 1, 5)).reshape(
        V, D, H, W, C0).astype(features.dtype)
    d_dens = d_dens[..., None].astype(densities.dtype)

    if ray_grads:
        d_origins = jnp.sum(d_ray[..., :3], axis=(1, 2))
        d_dirs = d_ray[..., 3:6]
        _, vjp_rays = jax.vjp(
            lambda K_, R_, t_: pixel_rays_cv2(
                K_, R_, t_, image_size, image_size), K, R, t)
        dK, dR, dt = vjp_rays((d_origins, d_dirs.astype(dirs.dtype)))
    else:
        dK = jnp.zeros_like(K)
        dR = jnp.zeros_like(R)
        dt = jnp.zeros_like(t)
    return d_feat, d_dens, dK, dR, dt


def _make_rvp_grad(ray_grads: bool):
    """Differentiable Pallas renderer: fused forward AND fused backward.

    The backward is the transposed tent-matmul formulation (kernels above),
    replacing the round-1 XLA-VJP fallback that was scatter-bound (training
    steps and the 5000-iter refinement loop differentiate through the
    renderer: models/volume_render.py:63, kubric_eval.py:450-527).

    ray_grads=False skips the derivative-tent camera-gradient contractions
    (+~140 ms per 10-camera backward) and returns zero (dK, dR, dt) — valid
    ONLY when the cameras are constants w.r.t. the loss (GT-pose training,
    kubric_train_pose_3D.py step 1.1); pose-predicting/refining graphs need
    the full backward.
    """

    @functools.partial(jax.custom_vjp,
                       nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
    def rvp(features, densities, K, R, t,
            image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
            cams_per_volume, skip_empty=True):
        return render_volume_pallas(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size,
            cams_per_volume=cams_per_volume, skip_empty=skip_empty,
        )

    def fwd(features, densities, K, R, t,
            image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
            cams_per_volume, skip_empty=True):
        out, tp, meta = render_volume_pallas(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size,
            cams_per_volume=cams_per_volume, skip_empty=skip_empty,
            stash_tp=True, return_meta=True,
        )
        return out, (features, densities, K, R, t, tp, meta)

    def bwd(image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
            cams_per_volume, skip_empty, res, g):
        features, densities, K, R, t, tp, meta = res
        return render_volume_pallas_bwd(
            features, densities, K, R, t, g,
            image_size, n_pts_per_ray, min_depth, max_depth, volume_size,
            ray_grads=ray_grads,
            cams_per_volume=cams_per_volume, skip_empty=skip_empty,
            tp=tp, meta=meta,
        )

    rvp.defvjp(fwd, bwd)
    return rvp


render_volume_pallas_grad = _make_rvp_grad(True)
render_volume_pallas_grad_nocam = _make_rvp_grad(False)


def check_brick_coverage(K, R, t, image_size, n_pts_per_ray,
                         min_depth, max_depth, volume_size, D):
    """Host-side diagnostic: max per-tile-group voxel footprint vs brick sizes.

    The kernel shares one (BZ, BH, BX) brick across a TILE^2-pixel tile and
    _spi consecutive depth samples; tent weight falling OUTSIDE the brick is
    silently dropped (a graceful darkening of extreme corner tiles, not a
    crash). This utility computes the EXACT footprint for concrete cameras so
    tests and dataset integrations can assert their geometry fits. Returns
    dict of the worst-case span (including the +-1 tent reach and the
    h/x base alignment slack) per axis against (BZ, BH, BX).
    """
    import numpy as np

    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    origins = np.asarray(origins)[:, None, None, :]
    dirs = np.asarray(dirs)
    cmax = coord_grid_max(D, volume_size)
    scale = 0.5 * (D - 1) / cmax
    half = 0.5 * (D - 1)
    spi = _spi(n_pts_per_ray)
    step = (max_depth - min_depth) / (n_pts_per_ray - 1)
    zs = min_depth + step * np.arange(n_pts_per_ray)

    B = dirs.shape[0]
    nt = image_size // TILE
    worst = {"z": 0.0, "h": 0.0, "x": 0.0}
    flip = np.array([-1.0, -1.0, 1.0])
    for b in range(B):
        # [img, img, 3] index coords per depth group: span per tile
        for g in range(n_pts_per_ray // spi):
            zg = zs[g * spi:(g + 1) * spi]                       # [spi]
            p = origins[b] + zg[:, None, None, None] * dirs[b]   # [spi,H,W,3]
            idx = p * flip * scale + half
            tiles = idx.reshape(spi, nt, TILE, nt, TILE, 3)
            span = (tiles.max(axis=(0, 2, 4)) - tiles.min(axis=(0, 2, 4)))
            worst["x"] = max(worst["x"], float(span[..., 0].max()))
            worst["h"] = max(worst["h"], float(span[..., 1].max()))
            worst["z"] = max(worst["z"], float(span[..., 2].max()))
    # +2 tent reach (+-1), +1 floor slack; x (and h without the HS8 shift
    # copies) also pays up-to-7 base alignment
    hs8 = _hs8(D)
    need = {
        "z": worst["z"] + 3.0,
        "h": worst["h"] + 3.0 + (0.0 if hs8 else 7.0),
        "x": worst["x"] + 3.0 + 7.0,
    }
    bh = _bh(D, hs8)
    return {
        "need": need,
        "brick": {"z": _bz(D), "h": bh, "x": BX},
        "ok": (need["z"] <= _bz(D) and need["h"] <= bh
               and need["x"] <= BX),
    }
