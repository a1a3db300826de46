"""Probe: execute the fused Pallas ray-march kernel on the real TPU chip.

Round-1 state: the kernel is interpret-parity-tested and AOT-compiles through
Mosaic, but the hosted relay could not execute Mosaic kernels (wedged the
lease). This probe escalates carefully: tiny grid first, then the flagship
shape, then parity vs the packed backend, then timing.

Run stages via argv: probe_pallas.py [tiny|flagship|parity|time]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.ops.ray_march_pallas import render_volume_pallas
from forge_tpu.ops.ray_march import render_volume_xla


def make_inputs(B, D=64, C=16, img=128, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.rand(B, D, D, D, C).astype(np.float32))
    dens = jnp.asarray(rng.rand(B, D, D, D, 1).astype(np.float32) * 0.1)
    K = jnp.tile(jnp.asarray([[60.0, 0, img / 2], [0, 60.0, img / 2], [0, 0, 1.0]])[None], (B, 1, 1))
    R = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
    t = jnp.tile(jnp.asarray([0.0, 0.0, 1.5])[None], (B, 1))
    return feats, dens, K, R, t


def run(B, img, n_pts, label):
    feats, dens, K, R, t = make_inputs(B, img=img)
    t0 = time.time()
    out = render_volume_pallas(
        feats, dens, K, R, t, img, n_pts, 0.5, 2.0, 1.0)
    out.block_until_ready()
    print(f"{label}: compile+run {time.time()-t0:.1f}s out={out.shape} "
          f"mean={float(out.mean()):.5f}", flush=True)
    return feats, dens, K, R, t, out


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    print("device:", jax.devices(), flush=True)

    if stage == "tiny":
        run(1, 32, 8, "tiny (1 cam, 32^2, 8 pts)")
    elif stage == "flagship":
        run(10, 128, 64, "flagship (10 cams, 128^2, 64 pts)")
    elif stage == "parity":
        feats, dens, K, R, t, out = run(2, 64, 16, "parity shape")
        ref = render_volume_xla(feats, dens, K, R, t, 64, 16, 0.5, 2.0, 1.0)
        err = float(jnp.abs(out - ref).max())
        print(f"parity max abs err vs xla: {err:.2e}", flush=True)
    elif stage == "time":
        feats, dens, K, R, t, out = run(10, 128, 64, "flagship warmup")
        fn = jax.jit(lambda f, d: render_volume_pallas(
            f, d, K, R, t, 128, 64, 0.5, 2.0, 1.0))
        fn(feats, dens).block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(feats, dens).block_until_ready()
            times.append(time.perf_counter() - t0)
        print(f"pallas renderer (10 cams @128^2x64): {min(times)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
