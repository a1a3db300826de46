"""Measure production-kernel fwd/bwd across brick-size/SPI variants on chip.

Each variant monkeypatches ray_march_pallas's module constants, re-traces,
checks parity against the f32 XLA path at flagship geometry with RANDOM
camera rotations (bricks too small show up as max-abs blowups, not crashes),
and times with the relay-safe protocol.

Usage: python experiments/brick_probe.py [name ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import forge_tpu.ops.ray_march_pallas as RP
from forge_tpu.ops.ray_march import render_volume_xla
from forge_tpu.data.pose_np import quat2mat_transform, se3_inverse
from _timing import chip_time, perturb_tree

B, D, C, IMG, NPTS = 10, 64, 16, 128, 64

VARIANTS = {
    #          BZ  BH  BX  SPI
    "base":   (20, 24, 24, 4),
    "bz16":   (16, 24, 24, 4),
    "bz14":   (14, 24, 24, 4),
    "spi2":   (12, 24, 24, 2),
    "spi2b":  (14, 16, 24, 2),
    "spi1":   (10, 16, 16, 1),
    # spi8: half the groups -> half the per-group matmul-issue overhead,
    # +50% K FLOPs (bigger bricks); wins if overhead-dominated. NOTE the
    # per-group bases/occupancy now come from the host-side _group_meta,
    # so the old scalar-reduction overhead argument is gone — measure.
    "spi8":   (24, 32, 32, 8),
}


def flagship_inputs(seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.rand(B, D, D, D, C).astype(np.float32)
    dens = (rng.rand(B, D, D, D, 1) * 0.15).astype(np.float32)
    f = 140.0  # flagship: K 280 at 256^2 halved to the 128^2 render
    K = np.tile(np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    # random orbit cameras looking at the origin-ish (worst-case tilt)
    q = rng.randn(B, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    poses[:, :3, :3] = quat2mat_transform(q).astype(np.float32)
    poses[:, :3, 3] = np.array([0, 0, 1.3], np.float32) + \
        rng.randn(B, 3).astype(np.float32) * 0.05
    extr = se3_inverse(poses.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(feats), jnp.asarray(dens), jnp.asarray(K),
            jnp.asarray(extr[:, :3, :3]), jnp.asarray(extr[:, :3, 3]))


def main():
    feats, dens, K, Rm, t = flagship_inputs()
    ref = np.asarray(jax.jit(lambda f, d: render_volume_xla(
        f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0))(feats, dens))

    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        bz, bh, bx, spi = VARIANTS[name]
        RP.BZ, RP.BH, RP.BX, RP.SPI = bz, bh, bx, spi
        try:
            fwd = jax.jit(lambda f, d: RP.render_volume_pallas(
                f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0))
            out = np.asarray(fwd(feats, dens))
            err = float(np.abs(out - ref).max())
            t0 = time.time()
            dt_f = chip_time(fwd, [(perturb_tree(feats, i), dens)
                                   for i in range(3)])

            grad = jax.jit(jax.grad(lambda f, d: jnp.sum(
                RP.render_volume_pallas_grad(
                    f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0, 1) ** 2),
                argnums=(0, 1)))
            dt_b = chip_time(grad, [(perturb_tree(feats, i), dens)
                                    for i in range(3)])
            print(f"{name:7s} BZ{bz} BH{bh} BX{bx} SPI{spi}: "
                  f"maxabs={err:.4f} fwd={dt_f*1e3:6.1f}ms "
                  f"fwd+bwd={dt_b*1e3:6.1f}ms", flush=True)
        except Exception as e:
            print(f"{name:7s}: FAILED {str(e)[:160]}", flush=True)





def sparse_main():
    """Production kernel on a SPARSE blob scene (the real workload shape)."""
    feats, dens, K, Rm, t = flagship_inputs()
    rng = np.random.RandomState(1)
    from forge_tpu.data.synthetic import blob_volume
    d_np, f_np = blob_volume(rng, D)
    dens = jnp.asarray(np.broadcast_to(d_np[None], (B, D, D, D, 1)).copy())

    ref = np.asarray(jax.jit(lambda f, d: render_volume_xla(
        f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0))(feats, dens))

    for skip in (False, True):
        fwd = jax.jit(lambda f, d: RP.render_volume_pallas(
            f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0, skip_empty=skip))
        out = np.asarray(fwd(feats, dens))
        err = float(np.abs(out - ref).max())
        dt_f = chip_time(fwd, [(perturb_tree(feats, i), dens)
                               for i in range(3)])
        grad = jax.jit(jax.grad(lambda f, d: jnp.sum(
            RP.render_volume_pallas_grad(
                f, d, K, Rm, t, IMG, NPTS, 0.5, 2.0, 1.0, 1, skip) ** 2),
            argnums=(0, 1)))
        dt_b = chip_time(grad, [(perturb_tree(feats, i), dens)
                                for i in range(3)])
        print(f"sparse skip={int(skip)}: maxabs={err:.4f} "
              f"fwd={dt_f*1e3:6.1f}ms fwd+bwd={dt_b*1e3:6.1f}ms", flush=True)




if __name__ == "__main__":
    if "sparse" in sys.argv:
        sparse_main()
    else:
        main()
