"""On-chip A/B of the round-5 kernel restructures (SELSUM / DWT / B1CHUNK).

Dense flagship shapes (1 volume, 10 grouped cameras @128^2 x 64, camera
grads) — the bench.py headline protocol. Checks forward parity against the
f32 XLA path and gradient parity against the pre-restructure kernels, then
times fwd and fwd+bwd with the relay-safe protocol.

Usage: python experiments/v5_probe.py [fwd|grad|all]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import forge_tpu.ops.ray_march_pallas as RP
from forge_tpu.ops.ray_march import render_volume_xla
from _timing import chip_time, perturb_tree

V, CPV, S, IMG, NPTS, C = 1, 10, 64, 128, 64, 16


def inputs(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.rand(V, S, S, S, C).astype(np.float32)
    dens = (rng.rand(V, S, S, S, 1) * 0.2).astype(np.float32)
    B = V * CPV
    f = 140.0
    K = np.tile(np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    Rm = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = (np.array([0, 0, 1.5], np.float32)
         + 0.01 * np.arange(B)[:, None] * np.array([1, 0.5, 0.2]))
    return (jnp.asarray(feats), jnp.asarray(dens), jnp.asarray(K),
            jnp.asarray(Rm), jnp.asarray(t.astype(np.float32)))


def set_flags(on):
    RP.SELSUM = on
    RP.DWT = on
    RP.B1CHUNK = on


def fwd_fn():
    return jax.jit(lambda f, d, K, R, t: RP.render_volume_pallas(
        f, d, K, R, t, IMG, NPTS, 0.5, 2.0, 1.0, cams_per_volume=CPV))


def grad_fn():
    def loss(f, d, K, R, t):
        out = RP.render_volume_pallas_grad(
            f, d, K, R, t, IMG, NPTS, 0.5, 2.0, 1.0, CPV)
        return jnp.sum(out * out)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    den = np.abs(b).max() + 1e-12
    return float(np.abs(a - b).max() / den)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    feats, dens, K, Rm, t = inputs()
    argl = [(perturb_tree(feats, i), dens, K, Rm, t) for i in range(4)]

    if which in ("fwd", "all"):
        # XLA f32 reference (camera-major broadcast of the volume)
        featsB = jnp.repeat(feats, CPV, axis=0)
        densB = jnp.repeat(dens, CPV, axis=0)
        ref = np.asarray(jax.jit(lambda f, d: render_volume_xla(
            f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0))(featsB, densB))
        for on in (False, True):
            set_flags(on)
            fn = fwd_fn()
            out = np.asarray(fn(*argl[0]))
            err = float(np.abs(out - ref).max())
            dt = chip_time(fn, argl)
            print(f"fwd v5={int(on)}: {dt*1e3:8.1f} ms  parity_vs_xla "
                  f"{err:.4f}", flush=True)

    if which in ("grad", "all"):
        gref = None
        for on in (False, True):
            set_flags(on)
            fn = grad_fn()
            g = fn(*argl[0])
            g = jax.tree_util.tree_map(np.asarray, g)
            if gref is None:
                gref = g
                tag = ""
            else:
                errs = [rel(a, b) for a, b in zip(g, gref)]
                tag = ("  rel_vs_v4 " +
                       " ".join(f"{n}={e:.4f}" for n, e in
                                zip(("df", "dd", "dK", "dR", "dt"), errs)))
            dt = chip_time(fn, argl)
            print(f"fwd+bwd v5={int(on)}: {dt*1e3:8.1f} ms{tag}", flush=True)


if __name__ == "__main__":
    main()
