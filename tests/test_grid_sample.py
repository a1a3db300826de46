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
