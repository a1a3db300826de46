"""Gradient parity of the packed renderer backend vs the reference XLA path.

Test-time pose optimization differentiates through the renderer w.r.t. camera
extrinsics and volumes (kubric_eval.py:450-527); backends must agree on
gradients, not just primals.
"""

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march import render_volume_xla
from forge_tpu.ops.ray_march_packed import render_volume_packed
import pytest


@pytest.mark.slow
def test_packed_gradients_match_xla():
    rng = np.random.RandomState(11)
    S, img, B = 8, 6, 1
    feats = jnp.asarray(rng.rand(B, S, S, S, 2).astype(np.float32))
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.5).astype(np.float32))
    K = jnp.asarray(np.array([[[6.0, 0, 3], [0, 6.0, 3], [0, 0, 1]]], np.float32))
    R = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    t = jnp.asarray(np.array([[0.0, 0.0, 1.5]], np.float32))

    kw = dict(image_size=img, n_pts_per_ray=16, min_depth=0.5,
              max_depth=2.0, volume_size=1.0)

    def loss(render, feats, dens, t):
        out = render(feats, dens, K, R, t, **kw)
        return jnp.sum(out[..., :3] ** 2)

    g_ref = jax.grad(lambda f, d, tt: loss(render_volume_xla, f, d, tt),
                     argnums=(0, 1, 2))(feats, dens, t)
    import functools
    packed_f32 = functools.partial(render_volume_packed, table_dtype=jnp.float32)
    g_new = jax.grad(lambda f, d, tt: loss(packed_f32, f, d, tt),
                     argnums=(0, 1, 2))(feats, dens, t)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
