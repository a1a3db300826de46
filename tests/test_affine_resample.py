"""Parity tests for the fused Pallas affine voxel resample (rotate op).

Runs the kernels in interpret mode on CPU with f32 volumes, so parity
against the XLA grid_sample path is exact (the production bf16 quantization
is covered by the renderer-style tolerance test at the bottom).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forge_tpu.ops.affine_resample import (
    affine_resample_pallas, affine_resample_pallas_bwd,
    affine_resample_supports, TD, TH, TW, BZ2, BH2, _bx)
from forge_tpu.ops.grid_sample import grid_sample_3d
from forge_tpu.data.pose_np import quat2mat_transform

S, C, N = 32, 128, 2


def _rand_affine(rng, n, scale=None):
    """Index-space affines matching the rotate use case: rotation times the
    align_corners=False grid scale S/(S-1), plus a small translation."""
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat2mat_transform(q).astype(np.float32)
    sc = scale if scale is not None else S / (S - 1.0)
    A = (R * sc).astype(np.float32)
    ctr = (S - 1) / 2.0
    # rotate about the volume center + jitter: b = ctr - A @ ctr + eps
    b = (ctr - A @ np.full(3, ctr, np.float32)
         + 0.08 * S * rng.randn(n, 3)).astype(np.float32)
    return jnp.asarray(A), jnp.asarray(b)


def _grid_from_affine(A, b, size):
    """Normalized grid_sample grid reproducing s = A @ (wo, ho, do) + b
    under align_corners=False unnormalization (i = ((g+1)*size - 1)/2)."""
    o = np.arange(size, dtype=np.float32)
    og = np.stack(np.meshgrid(o, o, o, indexing="ij"), axis=-1)[..., ::-1]
    s = np.einsum("nij,dhwj->ndhwi", np.asarray(A), og) + np.asarray(
        b)[:, None, None, None, :]
    return jnp.asarray((2.0 * s + 1.0) / size - 1.0)


def test_supports_gate():
    assert affine_resample_supports((1, 32, 32, 32, 128))
    assert not affine_resample_supports((2, 32, 32, 32, 16))   # C != 128
    assert not affine_resample_supports((1, 8, 32, 32, 128))   # D < BZ2
    assert not affine_resample_supports((1, 31, 32, 32, 128))  # D % TD


def test_forward_parity_f32():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(N, S, S, S, C).astype(np.float32))
    A, b = _rand_affine(rng, N)
    out = affine_resample_pallas(src, A, b, interpret=True,
                                 vol_dtype=jnp.float32)
    ref = grid_sample_3d(src, _grid_from_affine(A, b, S),
                         align_corners=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_identity_passthrough():
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(1, S, S, S, C).astype(np.float32))
    A = jnp.eye(3, dtype=jnp.float32)[None]
    b = jnp.zeros((1, 3), jnp.float32)
    out = affine_resample_pallas(src, A, b, interpret=True,
                                 vol_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-6)


def test_backward_parity_f32():
    rng = np.random.RandomState(2)
    n = 2
    src = jnp.asarray(rng.rand(n, S, S, S, C).astype(np.float32))
    A, b = _rand_affine(rng, n)
    g = jnp.asarray(rng.randn(n, S, S, S, C).astype(np.float32))

    d_src, dA, db = affine_resample_pallas_bwd(
        src, A, b, g, interpret=True, vol_dtype=jnp.float32)

    def ref_loss(src_, A_, b_):
        o = jnp.arange(S, dtype=jnp.float32)
        og = jnp.stack(jnp.meshgrid(o, o, o, indexing="ij"),
                       axis=-1)[..., ::-1]
        s = jnp.einsum("nij,dhwj->ndhwi", A_, og) + b_[:, None, None, None]
        grid = (2.0 * s + 1.0) / S - 1.0
        out = grid_sample_3d(src_, grid, align_corners=False)
        return jnp.sum(out * g)

    rd_src, rdA, rdb = jax.grad(ref_loss, argnums=(0, 1, 2))(src, A, b)
    np.testing.assert_allclose(np.asarray(d_src), np.asarray(rd_src),
                               rtol=0, atol=3e-4)
    # dA/db accumulate over 32^3 voxels; compare relative to magnitude
    for got, want in ((dA, rdA), (db, rdb)):
        got, want = np.asarray(got), np.asarray(want)
        denom = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / denom < 2e-4, (got, want)


def test_custom_vjp_wrapper():
    from forge_tpu.ops.affine_resample import affine_resample

    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.rand(1, S, S, S, C).astype(np.float32))
    A, b = _rand_affine(rng, 1)

    def loss(src_, A_, b_):
        return jnp.sum(affine_resample(src_, A_, b_) ** 2)

    gs, gA, gb = jax.grad(loss, argnums=(0, 1, 2))(src, A, b)
    assert np.isfinite(np.asarray(gs)).all()
    assert np.isfinite(np.asarray(gA)).all()
    assert np.isfinite(np.asarray(gb)).all()


def test_rotate_affine_matches_packed_path():
    """_affine_from_T + the fused kernel must reproduce rotate_voxel_grids'
    packed-gather output on real SE(3) poses (the gate keeps the packed path
    on CPU, so drive the pallas wrapper math explicitly)."""
    from forge_tpu.ops.voxel import rotate_voxel_grids, _affine_from_T
    from forge_tpu.data.pose_np import se3_inverse as np_se3_inverse
    from forge_tpu.geometry.rotations import se3_inverse

    rng = np.random.RandomState(4)
    Bv, t = 1, 3
    vox = jnp.asarray(rng.rand(Bv, t, S, S, S, C).astype(np.float32))
    q = rng.randn(t, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = np.tile(np.eye(4, dtype=np.float32), (Bv, t, 1, 1))
    poses[0, :, :3, :3] = quat2mat_transform(q).astype(np.float32)
    poses[0, :, :3, 3] = 0.1 * rng.randn(t, 3).astype(np.float32)
    poses_j = jnp.asarray(poses)

    ref = rotate_voxel_grids(vox, poses_j, volume_size=1.0)

    T = (poses_j[:, 0:1] @ se3_inverse(poses_j[:, 1:])).reshape(-1, 4, 4)
    A, b = _affine_from_T(T, S, 1.0)
    got = affine_resample_pallas(
        vox[:, 1:].reshape(-1, S, S, S, C), A, b,
        interpret=True, vol_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[:, 1:]).reshape(-1, S, S, S, C),
        rtol=0, atol=3e-5)


def test_brick_coverage_bound():
    """The fixed bricks must cover any isometry's subtile footprint: span
    <= ||(TD, TH, TW)||2 * scale + tent/floor/alignment slack."""
    span = float(np.linalg.norm([TD, TH, TW])) * (S / (S - 1.0))
    assert span + 3.0 <= BZ2
    assert span + 3.0 + 7.0 <= BH2
    assert span + 3.0 <= _bx(128)  # C=128: x base needs no alignment
