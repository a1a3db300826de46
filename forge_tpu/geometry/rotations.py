"""Rotation representations and SE(3) pose algebra, pure JAX.

Functional parity with the reference geometry utilities
(reference: utils/geo_utils.py:6-316), rewritten batched/branch-free so every
op jits cleanly on TPU. All functions accept arbitrary leading batch dims
unless noted.

Conventions (identical to the reference):
  - SE(3) matrices are 4x4, row-major, acting on column vectors: p' = T @ p.
  - A camera *pose* maps camera -> world; *extrinsics* are its inverse.
  - Quaternions are (w, x, y, z) scalar-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _embed_rt(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Pack rotation [...,3,3] and translation [...,3] into SE(3) [...,4,4]."""
    batch = rot.shape[:-2]
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)       # [...,3,4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def euler2mat(x: jnp.ndarray) -> jnp.ndarray:
    """Euler angles + translation -> SE(3). x: [...,6] as (a, b, y, tx, ty, tz).

    Matches the reference's axis ordering quirk: rotation = Rz @ Ry @ Rx with
    x-angle = x[...,1], y-angle = x[...,0] (reference: utils/geo_utils.py:19,41).
    """
    ax, ay, az = x[..., 1], x[..., 0], x[..., 2]
    cz, sz = jnp.cos(az), jnp.sin(az)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    zeros = jnp.zeros_like(az)
    ones = jnp.ones_like(az)

    zmat = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=-1
    ).reshape(x.shape[:-1] + (3, 3))
    ymat = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(x.shape[:-1] + (3, 3))
    xmat = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=-1
    ).reshape(x.shape[:-1] + (3, 3))

    rot = zmat @ ymat @ xmat
    return _embed_rt(rot, x[..., 3:6])


def quat2mat_transform(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [...,4] (w,x,y,z) -> rotation matrix [...,3,3].

    Reference: utils/geo_utils.py:121-137.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    ).reshape(quat.shape[:-1] + (3, 3))
    return rot


def quat2mat(x: jnp.ndarray) -> jnp.ndarray:
    """[...,7] quat+trans -> SE(3) [...,4,4] (reference: utils/geo_utils.py:109-118)."""
    return _embed_rt(quat2mat_transform(x[..., :4]), x[..., 4:7])


def mat2quat_transform(rot: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix [...,3,3] -> quaternion [...,4] (w,x,y,z).

    Branch-free 4-case extraction, identical math to the reference
    (utils/geo_utils.py:148-207) which operates on the transposed matrix.
    """
    rmat_t = jnp.swapaxes(rot, -1, -2)
    m = lambda i, j: rmat_t[..., i, j]

    mask_d2 = m(2, 2) < eps
    mask_d0_d1 = m(0, 0) > m(1, 1)
    mask_d0_nd1 = m(0, 0) < -m(1, 1)

    t0 = 1 + m(0, 0) - m(1, 1) - m(2, 2)
    q0 = jnp.stack(
        [m(1, 2) - m(2, 1), t0, m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)], axis=-1
    )
    t1 = 1 - m(0, 0) + m(1, 1) - m(2, 2)
    q1 = jnp.stack(
        [m(2, 0) - m(0, 2), m(0, 1) + m(1, 0), t1, m(1, 2) + m(2, 1)], axis=-1
    )
    t2 = 1 - m(0, 0) - m(1, 1) + m(2, 2)
    q2 = jnp.stack(
        [m(0, 1) - m(1, 0), m(2, 0) + m(0, 2), m(1, 2) + m(2, 1), t2], axis=-1
    )
    t3 = 1 + m(0, 0) + m(1, 1) + m(2, 2)
    q3 = jnp.stack(
        [t3, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)], axis=-1
    )

    c0 = (mask_d2 & mask_d0_d1)[..., None]
    c1 = (mask_d2 & ~mask_d0_d1)[..., None]
    c2 = (~mask_d2 & mask_d0_nd1)[..., None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[..., None]

    q = jnp.where(c0, q0, jnp.where(c1, q1, jnp.where(c2, q2, q3)))
    t = jnp.where(
        c0[..., 0], t0, jnp.where(c1[..., 0], t1, jnp.where(c2[..., 0], t2, t3))
    )
    q = q / jnp.sqrt(t)[..., None]
    return q * 0.5


def mat2quat(x: jnp.ndarray) -> jnp.ndarray:
    """SE(3) [...,4,4] -> [...,7] quat+trans (reference: utils/geo_utils.py:140-145)."""
    quat = mat2quat_transform(x[..., :3, :3])
    return jnp.concatenate([quat, x[..., :3, 3]], axis=-1)


def rot6d2mat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation + translation [...,9] -> SE(3).

    Zhou et al. CVPR'19 Gram-Schmidt construction
    (reference: utils/geo_utils.py:88-105).
    """
    a1, a2 = x[..., 0:3], x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2u = a2 - dot * b1
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    rot = jnp.stack([b1, b2, b3], axis=-1)
    return _embed_rt(rot, x[..., 6:9])


def symmetric_orthogonalization(x: jnp.ndarray) -> jnp.ndarray:
    """Map 9D vectors [...,9] onto SO(3) via SVD (reference: utils/geo_utils.py:72-84).

    `jnp.linalg.svd` lowers to a TPU-compatible kernel; matrices are 3x3 so this
    never dominates. Runs in float32.
    """
    m = x.reshape(x.shape[:-1] + (3, 3)).astype(jnp.float32)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)[..., None, None]
    vt_fixed = jnp.concatenate([vt[..., :2, :], vt[..., 2:, :] * det], axis=-2)
    return (u @ vt_fixed).astype(x.dtype)


def rot9d2mat(x: jnp.ndarray) -> jnp.ndarray:
    """9D rotation + translation [...,12] -> SE(3) (reference: utils/geo_utils.py:60-69)."""
    return _embed_rt(symmetric_orthogonalization(x[..., :9]), x[..., 9:12])


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of SE(3) [...,4,4]: [R,t]^-1 = [R^T, -R^T t].

    Replaces the reference's dense `torch.inverse` calls (e.g. models/model.py:77)
    with the structure-exploiting form — cheaper and exactly orthogonal-stable.
    """
    rot = T[..., :3, :3]
    trans = T[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rot_t, trans)
    return _embed_rt(rot_t, new_t)


def get_relative_pose(cam_1: jnp.ndarray, cam_2: jnp.ndarray) -> jnp.ndarray:
    """Relative pose T^c1_c1Toc2 of cam_2 w.r.t. cam_1.

    cam_1: [...,4,4] (broadcast against cam_2), cam_2: [...,4,4].
    Reference math: utils/geo_utils.py:232-267.
    """
    r1, t1 = cam_1[..., :3, :3], cam_1[..., :3, 3]
    r2, t2 = cam_2[..., :3, :3], cam_2[..., :3, 3]
    r1t = jnp.swapaxes(r1, -1, -2)
    rot = r1t @ r2
    trans = jnp.einsum("...ij,...j->...i", r1t, t2 - t1)
    return _embed_rt(rot, trans)


def canonicalize_poses(
    canonical_pose: jnp.ndarray, cam_poses_rel: jnp.ndarray
) -> jnp.ndarray:
    """T^w_wToc2 = canonical_pose @ rel (reference: utils/geo_utils.py:270-287)."""
    return canonical_pose @ cam_poses_rel


def transform_relative_pose(rel_poses: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Re-express relative poses in a new world frame: T^-1 @ rel @ T.

    Reference: utils/geo_utils.py:290-316.
    """
    return se3_inverse(T) @ rel_poses @ T
