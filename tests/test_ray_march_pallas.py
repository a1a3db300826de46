"""Interpret-mode parity of the fused Pallas brick-tile renderer.

The hosted TPU relay cannot execute Mosaic kernels (round-1 environment
limitation), so correctness runs in the Pallas interpreter; the kernel is
additionally AOT-compiled against the real Mosaic toolchain out-of-band.
"""

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march import render_volume_xla
from forge_tpu.ops.ray_march_pallas import render_volume_pallas
import forge_tpu.data.synthetic as syn
from forge_tpu.data import pose_np
import pytest


def test_pallas_interpret_parity():
    rng = np.random.RandomState(3)
    S, img, B = 32, 32, 2
    feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.5).astype(np.float32))
    f = 35.0
    K = jnp.asarray(np.tile(
        np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    pose1 = syn.orbit_pose_cv2(1.5, 0.5, 1.1)
    E1 = pose_np.se3_inverse(pose1[None])[0]
    Rm = jnp.asarray(np.stack([np.eye(3, dtype=np.float32),
                               E1[:3, :3].astype(np.float32)]))
    tv = jnp.asarray(np.stack([np.array([0, 0, 1.5], np.float32),
                               E1[:3, 3].astype(np.float32)]))
    kw = dict(image_size=img, n_pts_per_ray=16, min_depth=0.5,
              max_depth=2.0, volume_size=1.0)

    ref = np.asarray(render_volume_xla(feats, dens, K, Rm, tv, **kw))
    out32 = np.asarray(render_volume_pallas(
        feats, dens, K, Rm, tv, interpret=True, vol_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(out32, ref, atol=1e-4, rtol=1e-4)

    # bf16 volume values: small, bounded divergence
    outbf = np.asarray(render_volume_pallas(
        feats, dens, K, Rm, tv, interpret=True, **kw))
    assert np.abs(outbf - ref).max() < 0.02


def _grad_case(seed=5, S=32, img=16, B=1, n=12):
    # focal 48 keeps an 8-pixel tile's voxel footprint within the kernels'
    # brick widths (the flagship geometry spans ~7 voxels/tile; the kernel
    # contract is <= ~14 — see BX/BX2 in ops/ray_march_pallas.py)
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.4).astype(np.float32))
    K = jnp.asarray(np.tile(np.array(
        [[48.0, 0, img / 2], [0, 48.0, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    pose1 = syn.orbit_pose_cv2(1.5, 0.35, 0.7)
    E1 = pose_np.se3_inverse(pose1[None])[0]
    R = jnp.asarray(np.broadcast_to(
        E1[:3, :3].astype(np.float32), (B, 3, 3)).copy())
    t = jnp.asarray(np.broadcast_to(
        E1[:3, 3].astype(np.float32), (B, 3)).copy())
    return feats, dens, K, R, t, (img, n, 0.5, 2.0, 1.0)


def test_pallas_bwd_f32_parity():
    """The fused Pallas backward equals the XLA VJP in float32, including the
    ray/camera gradients used by pose refinement (kubric_eval.py:450-527)."""
    from forge_tpu.ops.ray_march_pallas import render_volume_pallas_bwd

    feats, dens, K, R, t, kw = _grad_case()
    img, n = kw[0], kw[1]

    def fwd(f, d, K_, R_, t_):
        return render_volume_xla(f, d, K_, R_, t_, image_size=img,
                                 n_pts_per_ray=n, min_depth=0.5,
                                 max_depth=2.0, volume_size=1.0)

    out, vjp = jax.vjp(fwd, feats, dens, K, R, t)
    rng = np.random.RandomState(9)
    g = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    gx = vjp(g)
    gp = render_volume_pallas_bwd(
        feats, dens, K, R, t, g, *kw,
        interpret=True, vol_dtype=jnp.float32)
    names = ("d_feat", "d_dens", "dK", "dR", "dt")
    for name, a, b in zip(names, gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=name)


def test_pallas_bwd_no_ray_grads():
    from forge_tpu.ops.ray_march_pallas import render_volume_pallas_bwd

    feats, dens, K, R, t, kw = _grad_case(seed=7)
    g = jnp.ones((1, kw[0], kw[0], 18), jnp.float32)
    gp = render_volume_pallas_bwd(
        feats, dens, K, R, t, g, *kw,
        interpret=True, vol_dtype=jnp.float32, ray_grads=False)
    assert np.abs(np.asarray(gp[0])).max() > 0
    for z in gp[2:]:
        assert np.abs(np.asarray(z)).max() == 0.0


def test_pallas_grad_wrapper_interpret():
    """custom-vjp wrapper end-to-end (production bf16 path, loose tol)."""
    from forge_tpu.ops import ray_march_pallas as rp

    feats, dens, K, R, t, kw = _grad_case(seed=5)
    img, n = kw[0], kw[1]

    def loss_p(f, d, tt):
        return jnp.sum(
            rp.render_volume_pallas_grad(f, d, K, R, tt, *kw, 1) ** 2)

    def loss_x(f, d, tt):
        return jnp.sum(render_volume_xla(f, d, K, R, tt,
                                         image_size=img, n_pts_per_ray=n,
                                         min_depth=0.5, max_depth=2.0,
                                         volume_size=1.0) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(feats, dens, t)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(feats, dens, t)
    for a, b in zip(gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.05, np.abs(a - b).max()


@pytest.mark.slow
def test_pallas_grouped_cams_per_volume():
    """cams_per_volume grouping == explicit broadcast, forward and backward
    (the model renders one fused volume from t_all cameras,
    models/model.py:117-143)."""
    from forge_tpu.ops import ray_march_pallas as rp

    feats, dens, K, R, t, kw = _grad_case(seed=11, B=1)
    img, n = kw[0], kw[1]
    V, cpv = 2, 3
    rng = np.random.RandomState(13)
    S = feats.shape[1]
    featsV = jnp.asarray(rng.rand(V, S, S, S, 16).astype(np.float32))
    densV = jnp.asarray((rng.rand(V, S, S, S, 1) * 0.4).astype(np.float32))
    B = V * cpv
    Kb = jnp.broadcast_to(K[0], (B, 3, 3)).copy()
    Rb = jnp.broadcast_to(R[0], (B, 3, 3)).copy()
    tb = jnp.asarray(
        np.asarray(t)[0] + 0.01 * rng.randn(B, 3).astype(np.float32))

    def loss_grouped(f, d, tt):
        out = rp.render_volume_pallas_grad(f, d, Kb, Rb, tt, *kw, cpv)
        return jnp.sum(out ** 2), out

    def loss_bcast(f, d, tt):
        fb = jnp.repeat(f, cpv, axis=0)
        db = jnp.repeat(d, cpv, axis=0)
        out = rp.render_volume_pallas_grad(fb, db, Kb, Rb, tt, *kw, 1)
        return jnp.sum(out ** 2), out

    (lg, outg), gg = jax.value_and_grad(
        loss_grouped, argnums=(0, 1, 2), has_aux=True)(featsV, densV, tb)
    (lb, outb), gb = jax.value_and_grad(
        loss_bcast, argnums=(0, 1, 2), has_aux=True)(featsV, densV, tb)
    np.testing.assert_allclose(np.asarray(outg), np.asarray(outb),
                               atol=1e-5, rtol=1e-5)
    for name, a, b in zip(("d_feat", "d_dens", "d_t"), gg, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_pallas_skip_empty_sparse_parity():
    """Empty-brick skipping is exact on sparse sigma >= 0 scenes (fwd AND the
    fused bwd incl. ray grads): a blob occupying ~5% of a 64-cube, rendered
    and differentiated with skip_empty on/off and against the XLA path."""
    from forge_tpu.ops.ray_march_pallas import render_volume_pallas_grad

    rng = np.random.RandomState(9)
    S, img, B, n = 64, 16, 1, 16
    dens_np = np.zeros((B, S, S, S, 1), np.float32)
    feats_np = rng.rand(B, S, S, S, 16).astype(np.float32)
    # one small blob near the center
    dens_np[0, 28:36, 30:38, 26:34, 0] = rng.rand(8, 8, 8) * 0.6
    feats = jnp.asarray(feats_np)
    dens = jnp.asarray(dens_np)
    # flagship focal: at D=64 the brick envelope requires f ~ 140 per 8-px
    # tile (test_brick_coverage_flagship_envelope); the small image is just
    # a center crop of the flagship ray grid
    K = jnp.asarray(np.tile(np.array(
        [[140.0, 0, img / 2], [0, 140.0, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    pose1 = syn.orbit_pose_cv2(1.5, 0.35, 0.7)
    E1 = pose_np.se3_inverse(pose1[None])[0]
    R = jnp.asarray(np.broadcast_to(E1[:3, :3].astype(np.float32),
                                    (B, 3, 3)).copy())
    t = jnp.asarray(np.broadcast_to(E1[:3, 3].astype(np.float32),
                                    (B, 3)).copy())

    static = (img, n, 0.5, 2.0, 1.0, 1)

    def loss(f, d, K_, R_, t_, skip):
        out = render_volume_pallas_grad(f, d, K_, R_, t_, *static, skip)
        return jnp.sum(out ** 2)

    ref = render_volume_xla(feats, dens, K, R, t, img, n, 0.5, 2.0, 1.0)
    out_skip = render_volume_pallas_grad(feats, dens, K, R, t, *static, True)
    out_full = render_volume_pallas_grad(feats, dens, K, R, t, *static, False)
    assert np.abs(np.asarray(out_skip) - np.asarray(ref)).max() < 5e-3
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)

    g_skip = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        feats, dens, K, R, t, True)
    g_full = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        feats, dens, K, R, t, False)
    # feature and camera gradients match everywhere (w = 0 in empty space)
    for a, b in zip((g_skip[0],) + g_skip[2:], (g_full[0],) + g_full[2:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)
    # density gradients: the skip drops entries ONLY on exactly-zero voxels
    # (whose upstream ReLU gradient is zero — see render_volume docstring);
    # on occupied voxels the gradients match.
    gd_s, gd_f = np.asarray(g_skip[1]), np.asarray(g_full[1])
    occ = dens_np > 0
    np.testing.assert_allclose(gd_s[occ], gd_f[occ], atol=2e-4, rtol=1e-3)
    dropped = (gd_s == 0) & (np.abs(gd_f) > 1e-6)
    assert not np.any(dropped & occ)


def test_brick_coverage_flagship_envelope():
    """The (BZ(D), BH, BX) bricks cover the flagship camera envelope: random
    orbit rotations at kubric focal/depths over a 64-cube, 128^2 render."""
    from forge_tpu.ops.ray_march_pallas import check_brick_coverage

    rng = np.random.RandomState(0)
    B = 12
    f, img = 140.0, 128
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    q = rng.randn(B, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    poses[:, :3, :3] = pose_np.quat2mat_transform(q).astype(np.float32)
    poses[:, :3, 3] = (np.array([0, 0, 1.3], np.float32)
                       + rng.randn(B, 3).astype(np.float32) * 0.1)
    extr = pose_np.se3_inverse(poses.astype(np.float64)).astype(np.float32)
    out = check_brick_coverage(
        K, jnp.asarray(extr[:, :3, :3]), jnp.asarray(extr[:, :3, 3]),
        img, 64, 0.5, 2.0, 1.0, 64)
    assert out["ok"], out


def test_volrender_grad_cams_split_matches_unsplit():
    """VolRender.march with grad_cams_per_volume=k must produce the same
    forward raws and the same gradients wrt volumes and the first-k cameras
    as the unsplit all-camera-grads march (the joint graph skips the camera
    gradients of its GT-constant NVS tail, models/forge.py render_views)."""
    import flax.linen as fnn

    from forge_tpu.models.renderer import VolRender

    rng = np.random.RandomState(5)
    V, cpv, k, S, img = 2, 4, 2, 32, 64
    feats = jnp.asarray(rng.rand(V, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(V, S, S, S, 1) * 0.4).astype(np.float32))
    B = V * cpv
    f = 1.1 * img
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t = jnp.asarray(
        np.array([0, 0, 1.5], np.float32) + 0.02 * rng.randn(B, 3).astype(np.float32))

    vr = VolRender(img_size=img, n_pts_per_ray=16, backend="pallas",
                   camera_grads=True)
    variables = vr.init(jax.random.PRNGKey(0),
                        {"K": K, "R": R, "T": t}, feats, dens)

    def raw_of(split):
        def fn(f_, d_, t_):
            out = vr.apply(
                variables, {"K": K, "R": R, "T": t_}, f_, d_,
                method=vr.march,
                grad_cams_per_volume=k if split else None)
            return jnp.sum(out ** 2), out
        return fn

    (l1, o1), g1 = jax.value_and_grad(raw_of(False), argnums=(0, 1, 2),
                                      has_aux=True)(feats, dens, t)
    (l2, o2), g2 = jax.value_and_grad(raw_of(True), argnums=(0, 1, 2),
                                      has_aux=True)(feats, dens, t)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=1e-5, rtol=1e-5)
    for name, a, b in zip(("d_feat", "d_dens"), g2[:2], g1[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
    # camera grads: identical on the first k of each group, exactly zero on
    # the constant tail
    gt1 = np.asarray(g1[2]).reshape(V, cpv, 3)
    gt2 = np.asarray(g2[2]).reshape(V, cpv, 3)
    np.testing.assert_allclose(gt2[:, :k], gt1[:, :k], atol=1e-4, rtol=1e-4)
    assert np.abs(gt1[:, k:]).max() > 0      # unsplit computes them
    np.testing.assert_array_equal(gt2[:, k:], 0.0)   # split skips them


def test_group_meta_bases_and_occupancy():
    """_group_meta's SMEM metadata must (a) gate exactly on the density max
    of the brick window each kernel fetches, and (b) produce bases whose
    bricks cover every sample's tent support (brute-force check)."""
    from forge_tpu.ops.ray_march_pallas import (
        _group_meta, _spi, _bz, BH, TILE)
    from forge_tpu.geometry.cameras import pixel_rays_cv2
    from forge_tpu.ops.voxel import coord_grid_max

    rng = np.random.RandomState(7)
    B, D, img, n_pts = 2, 64, 32, 64   # flagship-like sample
    f = 70.0                           # spacing (~1.5 voxels)
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    Rm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t = jnp.asarray(np.array([[0, 0, 1.5], [0.05, -0.02, 1.45]], np.float32))
    dens = np.zeros((B, D, D, D), np.float32)
    dens[:, 30:34, 10:14, 40:44] = 1.0          # one small occupied block
    cmax = coord_grid_max(D, 1.0)

    origins, dirs = pixel_rays_cv2(K, Rm, t, img, img)
    meta = np.asarray(_group_meta(
        origins.astype(jnp.float32), dirs.astype(jnp.float32),
        jnp.asarray(dens), img, n_pts, 0.5, 2.0, float(cmax), D, 1, True))
    spi = _spi(n_pts)
    G = n_pts // spi
    nt = img // TILE
    bz = _bz(D)
    meta = meta.reshape(B, nt, nt, G, 8)

    # (a) occupancy == brute-force window max > 0
    o = np.asarray(origins)
    d = np.asarray(dirs)
    step = (2.0 - 0.5) / (n_pts - 1)
    scale = 0.5 * (D - 1) / float(cmax)
    half = 0.5 * (D - 1)
    for b in range(B):
        for ti in range(nt):
            for tj in range(nt):
                for g in range(G):
                    db, hb = meta[b, ti, tj, g, 0], meta[b, ti, tj, g, 1]
                    occ = meta[b, ti, tj, g, 4]
                    want = dens[b, db:db + bz, hb:hb + BH, :].max() > 0
                    assert bool(occ) == bool(want), (b, ti, tj, g)
    # (b) brick coverage of the tent support for every sample of a few
    # random tiles
    for _ in range(20):
        b = rng.randint(B); ti = rng.randint(nt); tj = rng.randint(nt)
        g = rng.randint(G)
        px = d[b, ti * TILE:(ti + 1) * TILE, tj * TILE:(tj + 1) * TILE]
        for k in range(spi):
            z = 0.5 + step * (g * spi + k)
            p = o[b] + z * px                    # [TILE,TILE,3]
            iz = p[..., 2] * scale + half
            iy = -p[..., 1] * scale + half
            db, hb = meta[b, ti, tj, g, 0], meta[b, ti, tj, g, 1]
            lo_z = np.ceil(iz.min() - 1)
            hi_z = np.floor(iz.max() + 1)
            assert (lo_z >= db or lo_z < 0) and (
                hi_z <= db + bz - 1 or hi_z > D - 1), (db, iz.min(), iz.max())
            lo_y = np.ceil(iy.min() - 1)
            hi_y = np.floor(iy.max() + 1)
            assert (lo_y >= hb or lo_y < 0) and (
                hi_y <= hb + BH - 1 or hi_y > D - 1), (hb, iy.min(), iy.max())
