"""Forward-kernel scaling with camera count B: compile vs execute split."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march_pallas import render_volume_pallas
from _timing import _fetch_scalar

S, img, n = 64, 128, 64


def run(B):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.2).astype(np.float32))
    f = 140.0
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32), (B, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    ts = [jnp.asarray(np.tile(np.array([1e-3 * i, 0, 1.5], np.float32),
                              (B, 1))) for i in range(3)]
    fn = jax.jit(lambda t: render_volume_pallas(
        feats, dens, K, R, t, img, n, 0.5, 2.0, 1.0))
    t0 = time.time()
    compiled = fn.lower(ts[0]).compile()
    print(f"B={B:3d} compile: {time.time()-t0:7.1f}s", flush=True)
    t0 = time.time()
    _fetch_scalar(compiled(ts[0]))
    print(f"B={B:3d} exec1  : {time.time()-t0:7.2f}s", flush=True)
    t0 = time.time()
    _fetch_scalar(compiled(ts[1]))
    print(f"B={B:3d} exec2  : {time.time()-t0:7.2f}s", flush=True)


if __name__ == "__main__":
    for B in [int(x) for x in (sys.argv[1:] or ["10", "20", "40"])]:
        run(B)
