"""Camera math: projection/ray inverses, look-at convention, origin projection."""

import numpy as np
import jax.numpy as jnp

from forge_tpu.geometry.cameras import (
    pixel_rays_cv2,
    project_points_screen,
    look_at_view_transform_cv2,
)
from forge_tpu.data import pose_np


def test_project_unproject_roundtrip():
    rng = np.random.RandomState(0)
    K = jnp.asarray(np.array([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]],
                             np.float32))
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = jnp.asarray(pose_np.quat2mat_transform(q[None]).astype(np.float32))
    t = jnp.asarray(np.array([[0.1, -0.2, 1.5]], np.float32))

    origins, dirs = pixel_rays_cv2(K, R, t, 64, 64)
    # a world point on the ray through pixel (i=10, j=20) at depth z projects
    # back to that pixel center
    z = 1.3
    p = np.asarray(origins)[0] + z * np.asarray(dirs)[0, 10, 20]
    uv = np.asarray(project_points_screen(jnp.asarray(p[None]), K, R, t))[0, 0]
    np.testing.assert_allclose(uv, [20.5, 10.5], atol=1e-3)


def test_look_at_canonical():
    """azim=180, elev=0, dist=d is the canonical camera: R=I, t=(0,0,d).

    (This is why the reference's turntable starts at azim+180,
    kubric_eval.py:193.)
    """
    R, t = look_at_view_transform_cv2(np.array([1.5]), np.array([0.0]),
                                      np.array([180.0]))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(t[0], [0, 0, 1.5], atol=1e-6)


def test_look_at_all_views_see_origin():
    n = 12
    R, t = look_at_view_transform_cv2(
        np.full(n, 1.5), np.zeros(n), np.linspace(0, 360, n) + 180)
    # origin must sit on the +z axis of every camera at distance 1.5
    p_cam = t  # R @ 0 + t
    np.testing.assert_allclose(p_cam[:, 2], 1.5, atol=1e-5)
    np.testing.assert_allclose(p_cam[:, :2], 0, atol=1e-5)
    # rotations are valid
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (n, 1, 1)), atol=1e-5)


def test_color_jitter_properties():
    import random
    from forge_tpu.data.augment import color_jitter_seq, adjust_hue

    rng = np.random.RandomState(1)
    imgs = rng.rand(3, 16, 16, 3).astype(np.float32)
    out = color_jitter_seq(imgs, random.Random(0))
    assert out.shape == imgs.shape
    assert out.min() >= 0 and out.max() <= 1
    # same factors across the sequence: per-frame transforms are identical maps,
    # so equal input frames map to equal outputs
    dup = np.stack([imgs[0]] * 3)
    out2 = color_jitter_seq(dup, random.Random(1))
    np.testing.assert_allclose(out2[0], out2[1], atol=1e-6)

    # hue rotation by 0 is identity; by 1.0 wraps to identity
    np.testing.assert_allclose(adjust_hue(imgs[0], 0.0), imgs[0], atol=1e-5)
    np.testing.assert_allclose(adjust_hue(imgs[0], 1.0), imgs[0], atol=1e-4)
