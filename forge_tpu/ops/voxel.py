"""Voxel-grid coordinates and the SE(3) voxel resample ("rotate") op.

Replaces the reference's `Rotate_world` module (models/rotate.py:9-156) and its
PyTorch3D `Volumes.get_coord_grid` dependency (models/rotate.py:48-52) with two
small functions. The resample itself rides ops/grid_sample.py.

Volume convention (PyTorch3D `Volumes`, reference: models/volume_render.py:58-61):
a size-S cubic grid of physical extent `volume_size` is centered at the world
origin; voxel centers span +/- (S-1)/2 * voxel_size per axis, e.g. 0.484375 for
S=32, volume_size=1.0 (reference: models/rotate.py:23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from forge_tpu.geometry.rotations import se3_inverse
from forge_tpu.ops.grid_sample import grid_sample_3d


def coord_grid_max(grid_size: int, volume_size: float) -> float:
    """Max voxel-center coordinate (reference: models/rotate.py:23)."""
    voxel = volume_size / grid_size
    return (grid_size - 1) * voxel / 2.0


def volume_coord_grid(
    grid_size: int, volume_size: float, dtype=jnp.float32
) -> jnp.ndarray:
    """[D, H, W, 3] world coordinates (x, y, z) of voxel centers.

    x varies along W, y along H, z along D — the PyTorch3D `get_coord_grid`
    layout consumed by torch `grid_sample` (reference: models/rotate.py:48-52).
    """
    voxel = volume_size / grid_size
    half = (grid_size - 1) * voxel / 2.0
    axis = jnp.linspace(-half, half, grid_size, dtype=dtype)
    z, y, x = jnp.meshgrid(axis, axis, axis, indexing="ij")   # [D,H,W]
    return jnp.stack([x, y, z], axis=-1)


def rotate_voxel_grids(
    voxels: jnp.ndarray,
    cam_poses_cv2: jnp.ndarray,
    volume_size: float = 1.0,
) -> jnp.ndarray:
    """Resample views 1..t-1 into the canonical (view 0) frame.

    Args:
      voxels: [B, t, D, H, W, C] per-view feature volumes (channels-last).
      cam_poses_cv2: [B, t, 4, 4] camera poses in the OpenCV frame.
      volume_size: physical edge length of the cubic volume.

    Returns: [B, t, D, H, W, C]; view 0 passes through unchanged.

    Math (reference: models/rotate.py:64-141): with T = pose_0 @ pose_i^-1, a
    canonical-frame voxel center p is fetched from view i's volume at T @ p,
    normalized by the max voxel-center coordinate, sampled trilinearly with
    zero padding and torch's align_corners=False convention.
    """
    B, t, D, H, W, C = voxels.shape
    dtype = voxels.dtype
    assert D == H == W, "cubic volumes only"

    pose0 = cam_poses_cv2[:, 0:1]                                   # [B,1,4,4]
    T = pose0 @ se3_inverse(cam_poses_cv2[:, 1:])                   # [B,t-1,4,4]

    src = voxels[:, 1:].reshape(B * (t - 1), D, H, W, C)

    # Fused Pallas tent-contraction resample on TPU (no HBM gathers; custom
    # VJP carries d_src and pose gradients) — the XLA packed-gather path is
    # the fallback and the CPU/test reference.
    import os

    from forge_tpu.ops.affine_resample import (
        affine_resample, affine_resample_supports)

    # default ON: exact interpret parity vs the packed path AND AOT Mosaic
    # compilation against the local libtpu toolchain are both green
    # (experiments/aot_compile_check.py); FORGE_ROTATE_PALLAS=0 opts out
    if (affine_resample_supports(src.shape)
            and jax.default_backend() == "tpu"
            and os.environ.get("FORGE_ROTATE_PALLAS", "1") != "0"):
        A, b = _affine_from_T(
            T.reshape(B * (t - 1), 4, 4), D, volume_size)
        sampled = affine_resample(src, A, b).reshape(B, t - 1, D, H, W, C)
        return jnp.concatenate([voxels[:, 0:1], sampled], axis=1)

    coords = volume_coord_grid(D, volume_size, jnp.float32)          # [D,H,W,3]
    cmax = coord_grid_max(D, volume_size)

    rot = T[..., :3, :3].astype(jnp.float32)
    trans = T[..., :3, 3].astype(jnp.float32)
    p = (
        jnp.einsum("bvij,dhwj->bvdhwi", rot, coords)
        + trans[:, :, None, None, None, :]
    )                                                                # [B,t-1,D,H,W,3]
    # sample POSITIONS stay f32 even when feature values are bf16 — bf16
    # coordinates would cost ~0.25 voxel of position precision.
    grid = (p / cmax).astype(jnp.float32)

    # packed-corner sampler: one gathered row per voxel (8x fewer gather rows
    # than the torch-parity reference path; exact same numerics — see
    # ops/grid_sample_packed.py)
    from forge_tpu.ops.grid_sample_packed import grid_sample_3d_packed

    sampled = grid_sample_3d_packed(
        src,
        grid.reshape(B * (t - 1), D, H, W, 3),
        align_corners=False,
    ).reshape(B, t - 1, D, H, W, C)

    return jnp.concatenate([voxels[:, 0:1], sampled], axis=1)


def _affine_from_T(T, S: int, volume_size: float):
    """Fold this module's world-space resample math into the INDEX-space
    affine consumed by ops/affine_resample: source index s (x,y,z) of output
    voxel o = (wo, ho, do) is s = A @ o + b.

    Derivation: p = R c(o) + t with voxel-center coords c(o) = -half +
    voxel * o per axis (volume_coord_grid); normalized grid g = p / cmax;
    torch align_corners=False unnormalization i = ((g + 1) S - 1) / 2.
    All affine, so A = (S / (2 cmax)) voxel R and
    b = (S / (2 cmax)) (R c0 + t) + (S - 1) / 2 with c0 = (-half,)*3.
    Differentiable w.r.t. T — pose gradients flow through here by AD.
    """
    rot = T[..., :3, :3].astype(jnp.float32)                 # [N, 3, 3]
    trans = T[..., :3, 3].astype(jnp.float32)                # [N, 3]
    voxel = volume_size / S
    half = (S - 1) * voxel / 2.0
    cmax = coord_grid_max(S, volume_size)                    # == half
    m = S / (2.0 * cmax)
    A = rot * (m * voxel)
    b = m * (rot.sum(axis=-1) * (-half) + trans) + (S - 1) / 2.0
    return A, b


CV2_TO_TORCH3D = np.diag(np.asarray([-1.0, -1.0, 1.0, 1.0], np.float32))
"""Frame fix used by the every2 variant (reference: dataset/kubric.py:92-95).

A numpy constant on purpose: a module-level jnp array dispatches an eager op
to the default backend at import time, which crashes every importer when the
TPU client is broken (libtpu version skew took down the round-3 multichip
dryrun via exactly this line)."""


def _resample_all(voxels: jnp.ndarray, T: jnp.ndarray,
                  volume_size: float) -> jnp.ndarray:
    """Sample every view's volume at T_i @ grid (shared by the pose-variant
    transforms below). voxels [B, t, D, H, W, C]; T [B, t, 4, 4]."""
    B, t, D, H, W, C = voxels.shape
    coords = volume_coord_grid(D, volume_size, jnp.float32)
    cmax = coord_grid_max(D, volume_size)
    rot = T[..., :3, :3].astype(jnp.float32)
    trans = T[..., :3, 3].astype(jnp.float32)
    p = (jnp.einsum("bvij,dhwj->bvdhwi", rot, coords)
         + trans[:, :, None, None, None, :])
    grid = (p / cmax).astype(jnp.float32)

    from forge_tpu.ops.grid_sample_packed import grid_sample_3d_packed

    return grid_sample_3d_packed(
        voxels.reshape(B * t, D, H, W, C),
        grid.reshape(B * t, D, H, W, 3),
        align_corners=False,
    ).reshape(B, t, D, H, W, C)


def rotate_with_abs_pose(
    voxels: jnp.ndarray,
    cam_poses_cv2: jnp.ndarray,
    canonical_pose_cv2: jnp.ndarray,
    volume_size: float = 1.0,
) -> jnp.ndarray:
    """Resample ALL views into the object's canonical frame using absolute
    camera poses: T_i = canonical_pose @ pose_i^-1 (reference:
    models/rotate.py:159-212). No view passes through unchanged.

    Divergence note: the reference additionally applies two refinement convs
    here (models/rotate.py:208-210) that its main pipeline never trains or
    calls; compose them outside if needed.
    """
    B, t = cam_poses_cv2.shape[:2]
    T = canonical_pose_cv2.reshape(1, 1, 4, 4) @ se3_inverse(cam_poses_cv2)
    return _resample_all(voxels, T, volume_size)


def rotate_with_every2_pose(
    voxels: jnp.ndarray,
    cam_pose_every2_cv2: jnp.ndarray,
    volume_size: float = 1.0,
) -> jnp.ndarray:
    """Resample view i's volume into view i+1's frame from the pairwise pose
    T^c1_c1->c2 (reference: models/rotate.py:215-261): the sample transform
    is (pose_every2 @ cv2_to_torch3d)^-1. See rotate_with_abs_pose for the
    refinement-conv divergence note.
    """
    M = CV2_TO_TORCH3D.astype(cam_pose_every2_cv2.dtype)
    T = se3_inverse(cam_pose_every2_cv2 @ M)
    return _resample_all(voxels, T, volume_size)
