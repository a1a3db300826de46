"""Bisect the render_views module overhead vs the raw pallas kernel (B=40)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march import render_volume
from _timing import chip_time

B, S, img, n = 40, 64, 128, 64


def make_inputs(dtype):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32)).astype(dtype)
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.2).astype(np.float32)).astype(dtype)
    f = 140.0
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32), (B, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    ts = [jnp.asarray(np.tile(np.array([1e-3 * i, 0, 1.5], np.float32),
                              (B, 1))) for i in range(3)]
    return feats, dens, K, R, ts


def rep(name, f, args_list):
    try:
        print(f"{name:28s}: {chip_time(f, args_list)*1e3:9.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: failed {e}"[:200], flush=True)


def main():
    kw = dict(image_size=img, n_pts_per_ray=n, min_depth=0.5, max_depth=2.0,
              volume_size=1.0, backend="pallas")

    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        feats, dens, K, R, ts = make_inputs(dtype)
        base = jax.jit(lambda t: render_volume(feats, dens, K, R, t, **kw))
        rep(f"raw kernel ({tag} in)", base, [(t,) for t in ts])

        ck = jax.jit(lambda t: jax.checkpoint(
            lambda tt: render_volume(feats, dens, K, R, tt, **kw))(t))
        rep(f"checkpointed ({tag})", ck, [(t,) for t in ts])

        def loss(t):
            return jnp.sum(render_volume(feats, dens, K, R, t, **kw)
                           .astype(jnp.float32) ** 2)

        rep(f"grad wrt t ({tag})", jax.jit(jax.grad(loss)),
            [(t,) for t in ts])

        def loss_ck(fe, t):
            out = jax.checkpoint(lambda ff, tt: render_volume(
                ff, dens, K, R, tt, **kw))(fe, t)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        rep(f"grad ckpt wrt feat,t ({tag})",
            jax.jit(jax.grad(loss_ck, argnums=(0, 1))),
            [(feats, t) for t in ts])


if __name__ == "__main__":
    main()
