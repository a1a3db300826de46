import numpy as np
import jax.numpy as jnp
import pytest

from forge_tpu.geometry import (
    euler2mat,
    quat2mat,
    quat2mat_transform,
    mat2quat,
    mat2quat_transform,
    rot6d2mat,
    rot9d2mat,
    symmetric_orthogonalization,
    get_relative_pose,
    canonicalize_poses,
    transform_relative_pose,
    se3_inverse,
)


def random_rotations(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(quat2mat_transform(jnp.asarray(q, dtype=jnp.float32)))


def random_se3(n, seed=0):
    rng = np.random.RandomState(seed + 1)
    rot = random_rotations(n, seed)
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = rot
    T[:, :3, 3] = rng.randn(n, 3).astype(np.float32)
    return T


def assert_rotation(R, atol=1e-5):
    R = np.asarray(R)
    eye = np.tile(np.eye(3), (R.shape[0], 1, 1))
    np.testing.assert_allclose(R @ np.transpose(R, (0, 2, 1)), eye, atol=atol)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=atol)


def test_quat_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randn(32, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat2mat_transform(jnp.asarray(q))
    q2 = np.asarray(mat2quat_transform(R))
    # q and -q encode the same rotation; compare up to sign.
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=2e-3)


def test_quat2mat_identity():
    T = quat2mat(jnp.asarray([[1.0, 0, 0, 0, 1.0, 2.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(T[0, :3, :3]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[0, :3, 3]), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[0, 3]), [0, 0, 0, 1], atol=1e-6)


def test_euler2mat_simple():
    # z-rotation by pi/2 only: x[...,2] = angle around z.
    T = euler2mat(jnp.asarray([[0.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0]]))
    R = np.asarray(T[0, :3, :3])
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)
    assert_rotation(np.asarray(T[:, :3, :3]))


def test_rot6d():
    rng = np.random.RandomState(1)
    x = rng.randn(16, 9).astype(np.float32)
    T = rot6d2mat(jnp.asarray(x))
    assert_rotation(np.asarray(T[:, :3, :3]))
    # A rotation's first two columns map back to itself.
    R = random_rotations(8, seed=3)
    six = np.concatenate([R[:, :, 0], R[:, :, 1], np.zeros((8, 3))], axis=-1)
    T2 = rot6d2mat(jnp.asarray(six.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(T2[:, :3, :3]), R, atol=1e-5)


def test_rot9d():
    rng = np.random.RandomState(2)
    x = rng.randn(8, 12).astype(np.float32)
    T = rot9d2mat(jnp.asarray(x))
    assert_rotation(np.asarray(T[:, :3, :3]), atol=1e-4)
    # Projection of an exact rotation is itself.
    R = random_rotations(8, seed=5)
    proj = symmetric_orthogonalization(jnp.asarray(R.reshape(8, 9)))
    np.testing.assert_allclose(np.asarray(proj), R, atol=1e-4)


def test_se3_inverse():
    T = random_se3(16)
    inv = np.asarray(se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(inv @ T, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_relative_pose_composition():
    T = random_se3(6, seed=7)
    cam1 = jnp.asarray(T[0])
    cam2 = jnp.asarray(T)
    rel = get_relative_pose(cam1, cam2)
    # cam1 @ rel == cam2
    np.testing.assert_allclose(
        np.asarray(cam1 @ rel), np.asarray(cam2), atol=1e-5
    )


def test_canonicalize_and_transform_relative():
    T = random_se3(4, seed=11)
    canon = jnp.asarray(random_se3(1, seed=13)[0])
    rel = get_relative_pose(jnp.asarray(T[0]), jnp.asarray(T))
    poses = canonicalize_poses(canon, rel)
    # Relative poses are invariant to the world frame.
    rel2 = get_relative_pose(poses[0], poses)
    np.testing.assert_allclose(np.asarray(rel2), np.asarray(rel), atol=1e-4)

    W = jnp.asarray(random_se3(1, seed=17)[0])
    rel_w2 = transform_relative_pose(rel, W)
    # Re-expressing twice with W then W^-1 is identity.
    back = transform_relative_pose(rel_w2, se3_inverse(W))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rel), atol=1e-4)
