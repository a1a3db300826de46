"""Isolate the Pallas ray-march kernel's cost components on chip.

Variants (timed on the flagship 10-cam 128^2x64 shape):
  base      — the production kernel
  nofeat    — density path only (feature matmuls removed)
  nodens    — feature path only
  fixslice  — brick base forced to 0 (no per-plane min-reductions; slices
              static) — wrong results, timing signal only
  noloop    — 8 planes instead of 64 (loop-length scaling)
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from forge_tpu.geometry.cameras import pixel_rays_cv2
from forge_tpu.ops.ray_march import EA_EPS
from forge_tpu.ops.voxel import coord_grid_max

TILE, BZ, BH, BX = 8, 20, 24, 24


def kernel(origin_ref, dirs_ref, feat_ref, dens_ref, out_ref, *,
           n_pts, min_depth, max_depth, cmax, D, C,
           do_feat=True, do_dens=True, fixslice=False):
    R = TILE * TILE
    dirs = dirs_ref[0].reshape(R, 128)
    b = pl.program_id(0)
    ox, oy, oz = origin_ref[b, 0], origin_ref[b, 1], origin_ref[b, 2]
    step = (max_depth - min_depth) / (n_pts - 1)
    scale = 0.5 * (D - 1) / cmax
    half = 0.5 * (D - 1)

    iota_f = lambda n: jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
    iota_z, iota_h, iota_x, iota_w = iota_f(BZ), iota_f(BH), iota_f(BX), iota_f(D)

    def expand_mat(n, m, div):
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n * m), 1)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, n * m), 0)
        key = (j // div) if div else (j % n)
        return (key == i).astype(jnp.float32)

    expand_x = expand_mat(BX, C, C)
    expand_z = expand_mat(BZ, BH, BH)
    expand_y = expand_mat(BH, BZ, 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 0) % C
    cc = jax.lax.broadcasted_iota(jnp.int32, (BX * C, C), 1)
    sel = (jc == cc).astype(jnp.float32)

    def tent(i_coord, base, iota):
        absidx = base.astype(jnp.float32) + iota
        d = i_coord[:, None] - absidx
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
        return w * ((absidx >= 0) & (absidx <= D - 1))

    mm = lambda a, b_: jnp.dot(a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

    def body(s, carry):
        acc_feat, acc_depth, transmittance, survive_all = carry
        z = min_depth + step * s
        px, py, pz = ox + z * dirs[:, 0], oy + z * dirs[:, 1], oz + z * dirs[:, 2]
        ix = -px * scale + half
        iy = -py * scale + half
        iz = pz * scale + half

        if fixslice:
            dbase = hbase = xbase = jnp.zeros((), jnp.int32)
        else:
            def base_of(i_coord, width, align):
                raw = jnp.floor(jnp.min(i_coord)).astype(jnp.int32) - 1
                if align > 1:
                    raw = (raw // align) * align
                return jnp.clip(raw, 0, D - width)
            dbase = base_of(iz, BZ, 1)
            hbase = pl.multiple_of(base_of(iy, BH, 8), 8)
            xbase = pl.multiple_of(base_of(ix, BX, 8), 8)

        wz = tent(iz, dbase, iota_z)
        wy = tent(iy, hbase, iota_h)
        ohzy = mm(wz, expand_z) * mm(wy, expand_y)

        feat = jnp.zeros((R, C), jnp.float32)
        dens = jnp.zeros((R,), jnp.float32)
        if do_feat:
            wx = tent(ix, xbase, iota_x)
            xoff = pl.multiple_of(xbase * C, 128)
            fbrick = feat_ref[0, pl.ds(dbase, BZ), pl.ds(hbase, BH),
                              pl.ds(xoff, BX * C)]
            m1 = mm(ohzy, fbrick.reshape(BZ * BH, BX * C))
            wx_rep = mm(wx, expand_x)
            feat = mm(m1 * wx_rep, sel)
        if do_dens:
            wx_full = tent(ix, jnp.zeros((), jnp.int32), iota_w)
            dbrick = dens_ref[0, pl.ds(dbase, BZ), pl.ds(hbase, BH), :]
            d1 = mm(ohzy, dbrick.reshape(BZ * BH, D))
            dens = jnp.sum(d1 * wx_full, axis=1)

        w = dens * transmittance
        acc_feat = acc_feat + w[:, None] * feat
        acc_depth = acc_depth + w * z
        transmittance = transmittance * ((1.0 + EA_EPS) - dens)
        survive_all = survive_all * (1.0 - dens)
        return acc_feat, acc_depth, transmittance, survive_all

    init = (jnp.zeros((R, C), jnp.float32), jnp.zeros((R,), jnp.float32),
            jnp.ones((R,), jnp.float32), jnp.ones((R,), jnp.float32))
    acc_feat, acc_depth, _, survive_all = jax.lax.fori_loop(0, n_pts, body, init)
    out = jnp.concatenate([acc_feat, (1.0 - survive_all)[:, None],
                           acc_depth[:, None]], axis=1)
    out_ref[0] = out.reshape(TILE, TILE, C + 2)


def render(features, densities, K, R, t, image_size, n_pts, **kvar):
    B, D, H, W, C0 = features.shape
    feat_vol = features.astype(jnp.bfloat16).reshape(B, D, H, W * C0)
    dens_vol = densities[..., 0].astype(jnp.bfloat16)
    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    dirs = jnp.pad(dirs.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, 125)))
    cmax = coord_grid_max(D, 1.0)
    nt = image_size // TILE
    k = functools.partial(kernel, n_pts=n_pts, min_depth=0.5, max_depth=2.0,
                          cmax=float(cmax), D=D, C=C0, **kvar)
    return pl.pallas_call(
        k, grid=(B, nt, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE, TILE, 128), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H, W * C0), lambda b, i, j: (b, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, H, W), lambda b, i, j: (b, 0, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE, C0 + 2),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, image_size, image_size, C0 + 2),
                                       jnp.float32),
    )(origins.astype(jnp.float32), dirs, feat_vol, dens_vol)


def main():
    rng = np.random.RandomState(0)
    B, D, C, img, n = 10, 64, 16, 128, 64
    feats = jnp.asarray(rng.rand(B, D, D, D, C).astype(np.float32))
    dens = jnp.asarray(rng.rand(B, D, D, D, 1).astype(np.float32) * 0.1)
    K = jnp.tile(jnp.asarray([[60.0, 0, img / 2], [0, 60.0, img / 2],
                              [0, 0, 1.0]])[None], (B, 1, 1))
    Rm = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    t = jnp.tile(jnp.asarray([0.0, 0.0, 1.5])[None], (B, 1))

    variants = {
        "base": dict(),
        "nofeat": dict(do_feat=False),
        "nodens": dict(do_dens=False),
        "fixslice": dict(fixslice=True),
        "noloop": dict(),  # npts=8 special case below
    }
    which = sys.argv[1:] or list(variants)
    for name in which:
        kvar = variants[name]
        npts = 8 if name == "noloop" else n
        fn = jax.jit(lambda f, d, kv=kvar, np_=npts: render(
            f, d, K, Rm, t, img, np_, **kv))
        fn(feats, dens).block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(feats, dens).block_until_ready()
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
