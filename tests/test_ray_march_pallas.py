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


def test_pallas_grad_wrapper_interpret():
    """custom-vjp wrapper: gradients equal the XLA path's (interpret fwd)."""
    from forge_tpu.ops import ray_march_pallas as rp

    # interpret-mode for the fwd inside the wrapper
    orig = rp.render_volume_pallas
    rp_interp = lambda *a, **k: orig(*a, interpret=True, vol_dtype=jnp.float32, **k)
    rp.render_volume_pallas = rp_interp
    try:
        rng = np.random.RandomState(5)
        S, img, B = 24, 16, 1
        feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32))
        dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.4).astype(np.float32))
        K = jnp.asarray(np.array(
            [[[18.0, 0, 8], [0, 18.0, 8], [0, 0, 1]]], np.float32))
        R = jnp.asarray(np.eye(3, dtype=np.float32)[None])
        t = jnp.asarray(np.array([[0, 0, 1.5]], np.float32))
        kw = (img, 12, 0.5, 2.0, 1.0)

        def loss_p(f, d, tt):
            return jnp.sum(rp.render_volume_pallas_grad(f, d, K, R, tt, *kw) ** 2)

        def loss_x(f, d, tt):
            return jnp.sum(render_volume_xla(f, d, K, R, tt,
                                             image_size=img, n_pts_per_ray=12,
                                             min_depth=0.5, max_depth=2.0,
                                             volume_size=1.0) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(feats, dens, t)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(feats, dens, t)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3)
    finally:
        rp.render_volume_pallas = orig
