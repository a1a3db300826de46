"""Fused Pallas affine voxel resample: the SE(3) "rotate" op.

The model's voxel rotation (ops/voxel.py:rotate_voxel_grids, reference
models/rotate.py:92-156) trilinearly resamples each view's feature volume at
an affine transform of the canonical voxel grid. The XLA path is a packed
gather (ops/grid_sample_packed.py) that moves one ~8C-lane row per output
voxel through HBM at gather speed — ~17 ms for the flagship 4x[32^3 x 128ch]
resample, the forward's second-largest cost after the renderer.

This kernel reuses the renderer's brick-tile tent-contraction idea
(ops/ray_march_pallas.py): the source volume sits VMEM-resident per view as
[D, H, W*C] and each program resamples an output subtile through an MXU
contraction

    out[r, :] = sum_x wx[r, x] * (ohzy [rows, bz*BH] @ brick [bz*BH, BX*C])

with NO gathers. Because an output subtile's source footprint is a rotated
box (an isometry — both grids share the voxel scale), a (TD=2, TH=8, TW=8)
subtile spans at most ||(2,8,8)||2 ~ 11.6 source voxels per axis, so fixed
(16, 24, BX) bricks always cover it (+-1 tent reach, floor slack, and base
alignment included; exact bound asserted in tests). Brick bases are
precomputed host-side from the affine corner extremes and read as SMEM
scalars (same trick as ray_march_pallas._group_meta).

The affine is expressed in INDEX space: source index s (x,y,z order; x
indexes W) of output voxel o = (wo, ho, do) is s = A @ o + b. The caller
folds world-space pose math and torch grid_sample unnormalization into
(A, b) — see ops/voxel.py. Semantics match grid_sample_3d(align_corners=
False/True alike — the convention lives in (A, b)) with zero padding, up to
bf16 volume quantization (vol_dtype, f32 accumulation; tests run f32 for
exact parity).

Backward (custom VJP): one kernel produces d_src (transposed tent scatter,
accumulated in a VMEM-resident f32 gradient volume across the view's
programs) and the per-voxel index-space gradients gi = dL/ds (derivative
tents against a gF-pre-contracted V/Vx pair, as in the renderer's backward
kernel A); (dA, db) are tiny host einsums of gi against the output grid, so
pose gradients flow through the caller's (A, b) construction by ordinary AD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forge_tpu.ops.ray_march_pallas import (
    _iota2_f, _tent, _dtent, _mmT, base_down)

TD = 2          # output subtile voxels along D
TH = 8          # along H
TW = 8          # along W; rows per subtile = TD * TH * TW = 128 (1 MXU pass)
BZ2 = 16        # source brick along D  (leading dim, no alignment)
BH2 = 24        # source brick along H  (sublane: base aligned to 8)


def _bx(C: int) -> int:
    """Source brick along W. Footprint needs ~15 voxels incl. tent reach and
    floor slack; C=128 fills the lane dim exactly, so the x base needs no
    alignment widening."""
    return 16 if C >= 128 else 24


def _xalign(C: int) -> int:
    return max(1, 128 // C)


def affine_resample_supports(shape) -> bool:
    """Static shape gate for the fused kernel. C must be exactly 128 (the
    model's raw voxel channel count): narrower channel counts hit Mosaic's
    unsupported sublane->lane shape casts in the output writes
    (AOT-verified); wider ones would blow the brick lane budget."""
    N, D, H, W, C = shape
    return (
        C == 128
        and D % TD == 0 and H % TH == 0 and W % TW == 0
        and D >= BZ2 and H >= BH2 and W >= _bx(C) and W <= 128
    )


def _affine_meta(A, b, D, H, W, C):
    """Host-side per-(view, subtile) brick bases.

    The source footprint minimum of an output index box is attained at a box
    corner (the map is affine), so min_s = A+ @ o_min + A- @ o_max + b
    componentwise. Returns int32 [N * nd * nh, 1, nw * 8] with columns
    8k..8k+2 = (zbase, ybase, xbase) for w-subtile k.
    """
    N = A.shape[0]
    nd, nh, nw = D // TD, H // TH, W // TW
    bx = _bx(C)
    xal = _xalign(C)

    # output index extremes per subtile axis [n*, 2] (min, max)
    def ax_minmax(n, t):
        lo = jnp.arange(n, dtype=jnp.float32) * t
        return lo, lo + (t - 1)

    wlo, whi = ax_minmax(nw, TW)
    hlo, hhi = ax_minmax(nh, TH)
    dlo, dhi = ax_minmax(nd, TD)
    # o vectors ordered (w, h, d) per the kernel's s = A @ (wo, ho, do) + b
    omin = jnp.stack(jnp.meshgrid(dlo, hlo, wlo, indexing="ij"),
                     axis=-1)[..., ::-1]                     # [nd,nh,nw,3]
    omax = jnp.stack(jnp.meshgrid(dhi, hhi, whi, indexing="ij"),
                     axis=-1)[..., ::-1]
    Ap = jnp.maximum(A, 0.0)
    An = jnp.minimum(A, 0.0)
    smin = (jnp.einsum("nij,dhwj->ndhwi", Ap, omin)
            + jnp.einsum("nij,dhwj->ndhwi", An, omax)
            + b[:, None, None, None, :])                     # [N,nd,nh,nw,3]

    zb = base_down(smin[..., 2], BZ2, 1, D)
    yb = base_down(smin[..., 1], BH2, 8, H)
    xb = base_down(smin[..., 0], bx, xal, W)
    zero = jnp.zeros(zb.shape, jnp.int32)
    meta = jnp.stack([zb, yb, xb, zero, zero, zero, zero, zero], axis=-1)
    return meta.reshape(N * nd * nh, 1, nw * 8)


def _row_coords(A_ref, v, sub, D_axis_len=None):
    """Per-row (sx, sy, sz) [TD*TH*TW] source index coords of subtile `sub`.

    Row r encodes output voxel (do, ho, wo) = (r // (TH*TW),
    (r // TW) % TH, r % TW + TW*sub) relative to the program's block origin;
    the block origin offsets ride on the scalar b' terms below.
    """
    R = TD * TH * TW
    # 2-D iota sliced to a 1-D vector (Mosaic rejects 1-D iota on TPU)
    rio = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]
    dd = (rio // (TH * TW)).astype(jnp.float32)
    hh = ((rio // TW) % TH).astype(jnp.float32)
    ww = (rio % TW).astype(jnp.float32)

    i = pl.program_id(1)
    j = pl.program_id(2)
    d0 = (i * TD).astype(jnp.float32)
    h0 = (j * TH).astype(jnp.float32)
    w0 = (sub * TW * 1.0) if isinstance(sub, (int, float)) else (
        sub * TW).astype(jnp.float32)

    out = []
    for comp in range(3):
        a_w = A_ref[v, comp * 3 + 0]
        a_h = A_ref[v, comp * 3 + 1]
        a_d = A_ref[v, comp * 3 + 2]
        bb = A_ref[v, 9 + comp]
        out.append(a_w * (ww + w0) + a_h * (hh + h0) + a_d * (dd + d0) + bb)
    return out  # sx, sy, sz


def _resample_kernel(
    A_ref,        # SMEM [N, 12] rows of A | b
    meta_ref,     # SMEM [1, 1, nw*8] subtile brick bases
    src_ref,      # VMEM [1, D, H, W*C] vol_dtype
    out_ref,      # VMEM [1, TD, TH, W*C]
    *,
    D, H, W, C, mm_dtype,
):
    v = pl.program_id(0)
    bx = _bx(C)
    iota_zh_z = _iota2_f(BZ2 * BH2, BH2, 0)
    iota_zh_y = _iota2_f(BZ2 * BH2, 1, BH2)
    iota_xc_x = _iota2_f(bx * C, C, 0)
    R = TD * TH * TW

    mm = lambda a, b_: jnp.dot(a.astype(mm_dtype), b_.astype(mm_dtype),
                               preferred_element_type=jnp.float32)

    for sub in range(W // TW):
        zb = meta_ref[0, 0, sub * 8 + 0]
        yb = pl.multiple_of(meta_ref[0, 0, sub * 8 + 1], 8)
        xb = meta_ref[0, 0, sub * 8 + 2]
        sx, sy, sz = _row_coords(A_ref, v, sub)
        # tents use _tent's size masking for zero padding outside [0, size-1]
        ohzy = (_tent(sz, zb, iota_zh_z, D)
                * _tent(sy, yb, iota_zh_y, H))               # [R, bz*BH]
        wx_rep = _tent(sx, xb, iota_xc_x, W)                 # [R, bx*C]
        xoff = pl.multiple_of(xb * C, 128)
        fbrick = src_ref[0, pl.ds(zb, BZ2), pl.ds(yb, BH2),
                         pl.ds(xoff, bx * C)].reshape(BZ2 * BH2, bx * C)
        m1 = mm(ohzy, fbrick)                                # [R, bx*C]
        # channel reduction over the x positions as a lane-aligned
        # reshape-sum (the x positions are exactly vreg boundaries at C=128)
        feat = (m1 * wx_rep).reshape(R, bx, C).sum(axis=1)
        out_ref[0, :, :, pl.ds(sub * TW * C, TW * C)] = (
            feat.reshape(TD, TH, TW * C).astype(out_ref.dtype))


def affine_resample_pallas(
    src: jnp.ndarray,      # [N, D, H, W, C]
    A: jnp.ndarray,        # [N, 3, 3]
    b: jnp.ndarray,        # [N, 3]
    interpret: bool = None,
    vol_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D, H, W, C = src.shape
    assert affine_resample_supports(src.shape), src.shape
    nd, nh = D // TD, H // TH
    Ab = jnp.concatenate(
        [A.reshape(N, 9), b.reshape(N, 3)], axis=1).astype(jnp.float32)
    meta = _affine_meta(A.astype(jnp.float32), b.astype(jnp.float32),
                        D, H, W, C)
    src_v = src.astype(vol_dtype).reshape(N, D, H, W * C)

    kernel = functools.partial(
        _resample_kernel, D=D, H=H, W=W, C=C, mm_dtype=vol_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(N, nd, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, (W // TW) * 8),
                         lambda v, i, j: (v * nd * nh + i * nh + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, H, W * C), lambda v, i, j: (v, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TD, TH, W * C), lambda v, i, j: (v, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D, H, W * C), src.dtype),
        interpret=interpret,
    )(Ab, meta, src_v)
    return out.reshape(N, D, H, W, C)


# --------------------------------------------------------------------------
# Backward: d_src (transposed tent scatter) + gi = dL/d(source index coords)
# per output voxel; (dA, db) contract gi against the output grid on the host
# graph. d_src accumulates in a VMEM-resident f32 volume across each view's
# programs (grid is view-major), like the renderer's gradient volumes.
# --------------------------------------------------------------------------

_VMEM_64M = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _resample_bwd_kernel(
    A_ref,        # SMEM [N, 12]
    meta_ref,     # SMEM [1, 1, nw*8]
    src_ref,      # VMEM [1, D, H, W*C] vol_dtype
    g_ref,        # VMEM [1, TD, TH, W*C] f32 cotangent
    dsrc_ref,     # VMEM out [1, D, H, W*C] f32 (accumulated over programs)
    gi_ref,       # VMEM out [1, nw*R, 128] f32 rows=(sub, dd, hh, ww),
                  # lanes 0..2 = dL/d(sx, sy, sz) (lane-padded; Mosaic
                  # rejects the (R, 16) -> (TD, TH, TW*16) cast)
    *,
    D, H, W, C, mm_dtype,
):
    v = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    bx = _bx(C)
    iota_zh_z = _iota2_f(BZ2 * BH2, BH2, 0)
    iota_zh_y = _iota2_f(BZ2 * BH2, 1, BH2)
    iota_xc_x = _iota2_f(bx * C, C, 0)
    R = TD * TH * TW

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dsrc_ref[...] = jnp.zeros(dsrc_ref.shape, dsrc_ref.dtype)

    for sub in range(W // TW):
        zb = meta_ref[0, 0, sub * 8 + 0]
        yb = pl.multiple_of(meta_ref[0, 0, sub * 8 + 1], 8)
        xb = meta_ref[0, 0, sub * 8 + 2]
        sx, sy, sz = _row_coords(A_ref, v, sub)
        tz = _tent(sz, zb, iota_zh_z, D)
        ty = _tent(sy, yb, iota_zh_y, H)
        ohzy = tz * ty                                       # [R, bz*BH]
        wx_rep = _tent(sx, xb, iota_xc_x, W)                 # [R, bx*C]
        g = g_ref[0, :, :, pl.ds(sub * TW * C, TW * C)].reshape(R, C)
        # g replicated across the bx x-positions (lane-tiled copies)
        g_xrep = jnp.concatenate([g] * bx, axis=1)           # [R, bx*C]

        # d_src: transposed scatter of (g broadcast over x) * x-tents
        dfb = _mmT(ohzy, g_xrep * wx_rep, mm_dtype)          # [bz*BH, bx*C]
        xoff = pl.multiple_of(xb * C, 128)
        cur = dsrc_ref[0, pl.ds(zb, BZ2), pl.ds(yb, BH2),
                       pl.ds(xoff, bx * C)]
        dsrc_ref[0, pl.ds(zb, BZ2), pl.ds(yb, BH2),
                 pl.ds(xoff, bx * C)] = cur + dfb.reshape(BZ2, BH2, bx * C)

        # gi: row-dots of g against d(out)/d(s) via gF-pre-contracted V/Vx
        fbrick = src_ref[0, pl.ds(zb, BZ2), pl.ds(yb, BH2),
                         pl.ds(xoff, bx * C)].reshape(BZ2 * BH2, bx * C)
        V = jax.lax.dot_general(
            (wx_rep * g_xrep).astype(mm_dtype), fbrick.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [R, bz*BH]
        wxp_rep = _dtent(sx, xb, iota_xc_x, W)
        Vx = jax.lax.dot_general(
            (wxp_rep * g_xrep).astype(mm_dtype), fbrick.astype(mm_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ohzy_dz = _dtent(sz, zb, iota_zh_z, D) * ty
        ohzy_dy = tz * _dtent(sy, yb, iota_zh_y, H)
        k1 = lambda a: jnp.sum(a, axis=1, keepdims=True)
        gi_x = k1(ohzy * Vx)
        gi_y = k1(ohzy_dy * V)
        gi_z = k1(ohzy_dz * V)
        gi = jnp.concatenate(
            [gi_x, gi_y, gi_z, jnp.zeros((R, 125), jnp.float32)], axis=1)
        gi_ref[0, pl.ds(sub * R, R), :] = gi


def affine_resample_pallas_bwd(
    src, A, b, g,
    interpret: bool = None,
    vol_dtype=jnp.bfloat16,
):
    """Cotangent g [N, D, H, W, C] -> (d_src, dA, db)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D, H, W, C = src.shape
    nd, nh = D // TD, H // TH
    Ab = jnp.concatenate(
        [A.reshape(N, 9), b.reshape(N, 3)], axis=1).astype(jnp.float32)
    meta = _affine_meta(A.astype(jnp.float32), b.astype(jnp.float32),
                        D, H, W, C)
    src_v = src.astype(vol_dtype).reshape(N, D, H, W * C)
    g_v = g.astype(jnp.float32).reshape(N, D, H, W * C)

    kernel = functools.partial(
        _resample_bwd_kernel, D=D, H=H, W=W, C=C, mm_dtype=vol_dtype)
    d_src, gi = pl.pallas_call(
        kernel,
        grid=(N, nd, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, (W // TW) * 8),
                         lambda v, i, j: (v * nd * nh + i * nh + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, H, W * C), lambda v, i, j: (v, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TD, TH, W * C), lambda v, i, j: (v, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, H, W * C), lambda v, i, j: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (W // TW) * TD * TH * TW, 128),
                         lambda v, i, j: (v * nd * nh + i * nh + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D, H, W * C), jnp.float32),
            jax.ShapeDtypeStruct(
                (N * nd * nh, (W // TW) * TD * TH * TW, 128), jnp.float32),
        ],
        compiler_params=_VMEM_64M,
        interpret=interpret,
    )(Ab, meta, src_v, g_v)

    d_src = d_src.reshape(N, D, H, W, C).astype(src.dtype)
    # rows = (v, i, j, sub, dd, hh, ww): reorder back to voxel layout
    nw = W // TW
    gi = gi.reshape(N, nd, nh, nw, TD, TH, TW, 128)[..., :3]
    gi = jnp.transpose(gi, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        N, D, H, W, 3)                                       # [N,D,H,W,3]

    # s = A @ o + b with o = (wo, ho, do): contract gi against the output
    # index grid (tiny host einsums; AD to poses flows through the caller's
    # (A, b) construction)
    wo = jnp.arange(W, dtype=jnp.float32)
    ho = jnp.arange(H, dtype=jnp.float32)
    do = jnp.arange(D, dtype=jnp.float32)
    og = jnp.stack(jnp.meshgrid(do, ho, wo, indexing="ij"),
                   axis=-1)[..., ::-1]                       # [D,H,W,3]
    dA = jnp.einsum("ndhwi,dhwj->nij", gi, og).astype(A.dtype)
    db = jnp.sum(gi, axis=(1, 2, 3)).astype(b.dtype)
    return d_src, dA, db


@jax.custom_vjp
def affine_resample(src, A, b):
    """Differentiable fused affine resample; see affine_resample_pallas."""
    return affine_resample_pallas(src, A, b)


def _ar_fwd(src, A, b):
    return affine_resample_pallas(src, A, b), (src, A, b)


def _ar_bwd(res, g):
    src, A, b = res
    return affine_resample_pallas_bwd(src, A, b, g)


affine_resample.defvjp(_ar_fwd, _ar_bwd)
