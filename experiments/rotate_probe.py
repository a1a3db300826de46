"""On-chip validation + timing of the fused Pallas rotate (affine resample).

Compares the pallas path against the packed-gather path at the flagship
rotate shape (4 views x 32^3 x 128ch, the model's raw voxel resample) and
times fwd / fwd+bwd for both.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.data.pose_np import quat2mat_transform
from forge_tpu.geometry.rotations import se3_inverse
from forge_tpu.ops.voxel import rotate_voxel_grids, _affine_from_T
from forge_tpu.ops.affine_resample import (
    affine_resample, affine_resample_pallas)
from forge_tpu.ops.grid_sample_packed import grid_sample_3d_packed
from forge_tpu.ops.voxel import volume_coord_grid, coord_grid_max
from _timing import chip_time, perturb_tree

B, t, S, C = 1, 5, 32, 128


def make_poses(rng, b, n):
    q = rng.randn(b, n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    poses[..., :3, :3] = quat2mat_transform(
        q.reshape(-1, 4)).reshape(b, n, 3, 3).astype(np.float32)
    poses[..., :3, 3] = 0.1 * rng.randn(b, n, 3).astype(np.float32)
    return jnp.asarray(poses)


def main():
    rng = np.random.RandomState(0)
    vox = jnp.asarray(rng.rand(B, t, S, S, S, C).astype(np.float32))
    poses = make_poses(rng, B, t)

    def rot_pallas(v, p):
        os.environ["FORGE_ROTATE_PALLAS"] = "1"
        return rotate_voxel_grids(v, p)

    def rot_packed(v, p):
        os.environ["FORGE_ROTATE_PALLAS"] = "0"
        return rotate_voxel_grids(v, p)

    f_pal = jax.jit(rot_pallas)
    f_pak = jax.jit(rot_packed)
    a = np.asarray(f_pal(vox, poses))
    bb = np.asarray(f_pak(vox, poses))
    err = np.abs(a - bb).max()
    print(f"fwd parity (bf16 vs packed-bf16 path): maxabs={err:.5f} "
          f"(scale {np.abs(bb).max():.3f})", flush=True)

    args = [(perturb_tree(vox, i), poses) for i in range(3)]
    print(f"rotate fwd pallas : {chip_time(f_pal, args)*1e3:7.2f} ms",
          flush=True)
    print(f"rotate fwd packed : {chip_time(f_pak, args)*1e3:7.2f} ms",
          flush=True)

    def loss_pal(v, p):
        os.environ["FORGE_ROTATE_PALLAS"] = "1"
        return jnp.sum(rotate_voxel_grids(v, p) ** 2)

    def loss_pak(v, p):
        os.environ["FORGE_ROTATE_PALLAS"] = "0"
        return jnp.sum(rotate_voxel_grids(v, p) ** 2)

    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))
    g_pak = jax.jit(jax.grad(loss_pak, argnums=(0, 1)))
    ga = g_pal(vox, poses)
    gb = g_pak(vox, poses)
    for name, x, y in zip(("d_vox", "d_pose"), ga, gb):
        x, y = np.asarray(x), np.asarray(y)
        rel = np.abs(x - y).max() / (np.abs(y).max() + 1e-6)
        print(f"grad parity {name}: rel {rel:.4f}", flush=True)
    print(f"rotate f+b pallas : {chip_time(g_pal, args)*1e3:7.2f} ms",
          flush=True)
    print(f"rotate f+b packed : {chip_time(g_pak, args)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
