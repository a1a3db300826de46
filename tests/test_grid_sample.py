"""Parity of forge_tpu.ops.grid_sample_3d against torch.nn.functional.grid_sample.

The reference's voxel rotate depends on ATen's CUDA grid_sample
(models/rotate.py:137); boundary/padding semantics there must match exactly
because pose-optimization gradients flow through the resample.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from forge_tpu.ops import grid_sample_3d


def _compare(vol_np, grid_np, align_corners, padding_mode):
    # torch layout: [B,C,D,H,W]; ours: [B,D,H,W,C]
    vol_t = torch.from_numpy(np.transpose(vol_np, (0, 4, 1, 2, 3)))
    grid_t = torch.from_numpy(grid_np)
    ref = F.grid_sample(
        vol_t,
        grid_t,
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy()
    ref = np.transpose(ref, (0, 2, 3, 4, 1))  # [B,D,H,W,C]

    out = grid_sample_3d(
        jnp.asarray(vol_np),
        jnp.asarray(grid_np),
        align_corners=align_corners,
        padding_mode=padding_mode,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_parity(align_corners, padding_mode):
    rng = np.random.RandomState(0)
    B, D, H, W, C = 2, 5, 6, 7, 3
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    # Include out-of-bounds coords up to +/- 1.6 to exercise padding.
    grid = (rng.rand(B, 4, 3, 5, 3).astype(np.float32) * 3.2) - 1.6
    _compare(vol, grid, align_corners, padding_mode)


def test_grid_sample_identity():
    """Sampling at exact voxel centers reproduces the volume (align_corners=True)."""
    rng = np.random.RandomState(1)
    B, S, C = 1, 4, 2
    vol = rng.randn(B, S, S, S, C).astype(np.float32)
    axis = np.linspace(-1, 1, S, dtype=np.float32)
    z, y, x = np.meshgrid(axis, axis, axis, indexing="ij")
    grid = np.stack([x, y, z], axis=-1)[None]
    out = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), align_corners=True)
    np.testing.assert_allclose(np.asarray(out), vol, atol=1e-5)


def test_grid_sample_gradients_match_torch():
    """Boundary gradients matter for test-time pose optimization."""
    rng = np.random.RandomState(2)
    B, S, C = 1, 4, 1
    vol = rng.randn(B, S, S, S, C).astype(np.float32)
    grid = (rng.rand(B, 3, 3, 3, 3).astype(np.float32) * 2.6) - 1.3

    vol_t = torch.from_numpy(np.transpose(vol, (0, 4, 1, 2, 3))).requires_grad_()
    grid_t = torch.from_numpy(grid).requires_grad_()
    out_t = F.grid_sample(vol_t, grid_t, padding_mode="zeros", align_corners=False)
    out_t.sum().backward()
    dvol_ref = np.transpose(vol_t.grad.numpy(), (0, 2, 3, 4, 1))
    dgrid_ref = grid_t.grad.numpy()

    import jax

    def f(v, g):
        return grid_sample_3d(v, g, align_corners=False).sum()

    dvol, dgrid = jax.grad(f, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(dvol), dvol_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dgrid), dgrid_ref, atol=1e-4)


def test_packed_grid_sample_parity():
    """grid_sample_3d_packed == grid_sample_3d (values and gradients)."""
    import jax
    from forge_tpu.ops.grid_sample_packed import grid_sample_3d_packed

    rng = np.random.RandomState(4)
    B, D, H, W, C = 2, 6, 5, 7, 3
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 4, 3, 2, 3).astype(np.float32) * 3.0) - 1.5

    for ac in (False, True):
        ref = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                             align_corners=ac)
        out = grid_sample_3d_packed(jnp.asarray(vol), jnp.asarray(grid),
                                    align_corners=ac)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def f_ref(v, g):
        return grid_sample_3d(v, g, align_corners=False).sum()

    def f_new(v, g):
        return grid_sample_3d_packed(v, g, align_corners=False).sum()

    gr = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(grid))
    gn = jax.grad(f_new, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(grid))
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_rotate_pose_variants():
    """transform_with_abs_pose / transform_with_every2_pose equivalents
    (reference: models/rotate.py:159-261)."""
    from forge_tpu.ops.voxel import (
        rotate_voxel_grids, rotate_with_abs_pose, rotate_with_every2_pose,
        CV2_TO_TORCH3D)
    from forge_tpu.data import pose_np

    rng = np.random.RandomState(6)
    B, t, S, C = 1, 3, 8, 2
    vox = jnp.asarray(rng.rand(B, t, S, S, S, C).astype(np.float32))
    q = rng.randn(t, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, t, 1, 1))
    poses[0, :, :3, :3] = pose_np.quat2mat_transform(q)
    poses[0, :, :3, 3] = rng.randn(t, 3) * 0.05
    poses_j = jnp.asarray(poses)

    # canonical_pose == pose_0 makes the abs variant agree with the main
    # rotate on views 1..t-1 (view 0 differs by design: the main path passes
    # it through while the variant resamples it, and align_corners=False
    # means even an identity transform is not an exact resample — faithful
    # to the reference's F.grid_sample defaults)
    out_abs = rotate_with_abs_pose(vox, poses_j, poses_j[0, 0])
    out_main = rotate_voxel_grids(vox, poses_j)
    np.testing.assert_allclose(np.asarray(out_abs[:, 1:]),
                               np.asarray(out_main[:, 1:]),
                               atol=1e-5, rtol=1e-5)

    # cross-check: every2 with P = inv(M @ T_abs) applies the same sample
    # transform as the abs variant (T_every2 = inv(P @ M) = T_abs)
    Minv = np.asarray(jnp.linalg.inv(CV2_TO_TORCH3D), np.float64)
    T_abs = np.asarray(poses_j[0, 0])[None] @ pose_np.se3_inverse(
        poses.reshape(t, 4, 4).astype(np.float64))
    P = (pose_np.se3_inverse(T_abs) @ Minv)[None]          # [1, t, 4, 4]
    out_e2 = rotate_with_every2_pose(vox, jnp.asarray(P.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(out_e2), np.asarray(out_abs),
                               atol=1e-4, rtol=1e-4)
