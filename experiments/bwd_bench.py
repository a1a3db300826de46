"""On-chip timing of the fused Pallas renderer backward vs the XLA VJP.

Flagship shapes: 64^3 x 16ch volume, B cameras at 128^2 x 64 samples/ray.

NOTE: the hosted axon relay memoizes (executable, inputs) pairs — repeated
identical executions return instantly. Every timing iteration therefore uses
a DIFFERENT camera translation so each call is a real device execution.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march import render_volume_xla
from forge_tpu.ops.ray_march_pallas import (
    render_volume_pallas, render_volume_pallas_bwd, render_volume_pallas_grad)


def timeit(fn, args_list):
    """args_list: one tuple per iteration, all distinct; min over them."""
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    ts = []
    for a in args_list[1:]:
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_ts(B, n):
    return [jnp.asarray(np.tile(np.array(
        [0.001 * i, 0.0, 1.5 + 0.002 * i], np.float32), (B, 1)))
        for i in range(n)]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.RandomState(0)
    S, img, n = 64, 128, 64
    feats = jnp.asarray(rng.rand(B, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(B, S, S, S, 1) * 0.2).astype(np.float32))
    f = 140.0
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    kw = (img, n, 0.5, 2.0, 1.0)
    g = jnp.asarray(rng.randn(B, img, img, 18).astype(np.float32))
    ts = make_ts(B, 5)

    fwd = jax.jit(lambda t: render_volume_pallas(feats, dens, K, R, t, *kw))
    print(f"pallas fwd      B={B}: "
          f"{timeit(fwd, [(t,) for t in ts])*1e3:8.1f} ms", flush=True)

    bwd = jax.jit(lambda t: render_volume_pallas_bwd(
        feats, dens, K, R, t, g, *kw))
    print(f"pallas bwd full B={B}: "
          f"{timeit(bwd, [(t,) for t in ts])*1e3:8.1f} ms", flush=True)

    bwd_nr = jax.jit(lambda t: render_volume_pallas_bwd(
        feats, dens, K, R, t, g, *kw, ray_grads=False))
    print(f"pallas bwd norc B={B}: "
          f"{timeit(bwd_nr, [(t,) for t in ts])*1e3:8.1f} ms", flush=True)

    def loss_p(fe, de, tt):
        return jnp.sum(render_volume_pallas_grad(fe, de, K, R, tt, *kw) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    print(f"pallas fwd+bwd  B={B}: "
          f"{timeit(gp, [(feats, dens, t) for t in ts])*1e3:8.1f} ms",
          flush=True)

    if "--xla" in sys.argv:
        def loss_x(fe, de, tt):
            return jnp.sum(render_volume_xla(fe, de, K, R, tt, *kw) ** 2)

        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        print(f"xla   fwd+bwd   B={B}: "
              f"{timeit(gx, [(feats, dens, t) for t in ts])*1e3:8.1f} ms",
              flush=True)
        # sanity: grads agree within bf16 tolerance on-chip
        a = gp(feats, dens, ts[0])
        b = gx(feats, dens, ts[0])
        for name, x, y in zip(("d_feat", "d_dens", "dt"), a, b):
            x, y = np.asarray(x), np.asarray(y)
            rel = np.abs(x - y).max() / (np.abs(y).max() + 1e-6)
            print(f"  {name}: max rel dev {rel:.4f}")


if __name__ == "__main__":
    main()
