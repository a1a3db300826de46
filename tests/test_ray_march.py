"""Golden-value tests for the volume renderer (XLA reference path).

Strategy per SURVEY.md §4: emission-absorption on analytic volumes — uniform
density gives a closed-form opacity; a single opaque sample pins feature and
depth; camera/volume conventions checked by rendering an axis-aligned voxel.
"""

import numpy as np
import jax.numpy as jnp

from forge_tpu.ops import emission_absorption, render_volume_xla, volume_coord_grid
from forge_tpu.ops.voxel import coord_grid_max


def test_coord_grid_constants():
    assert abs(coord_grid_max(32, 1.0) - 0.484375) < 1e-9  # models/rotate.py:23
    g = np.asarray(volume_coord_grid(4, 1.0))
    assert g.shape == (4, 4, 4, 3)
    # x varies along W (last spatial axis)
    assert np.allclose(g[0, 0, :, 0], np.linspace(-0.375, 0.375, 4))
    assert np.allclose(g[0, :, 0, 1], np.linspace(-0.375, 0.375, 4))
    assert np.allclose(g[:, 0, 0, 2], np.linspace(-0.375, 0.375, 4))


def test_ea_single_opaque_sample():
    n, C = 8, 3
    dens = np.zeros((1, n), np.float32)
    dens[0, 3] = 1.0
    feats = np.tile(np.arange(n, dtype=np.float32)[None, :, None], (1, 1, C))
    lengths = np.linspace(0.5, 2.0, n, dtype=np.float32)[None]
    out = np.asarray(
        emission_absorption(jnp.asarray(dens), jnp.asarray(feats), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(out[0, :C], 3.0, atol=1e-5)   # feature of sample 3
    np.testing.assert_allclose(out[0, C], 1.0, atol=1e-5)    # opacity
    np.testing.assert_allclose(out[0, C + 1], lengths[0, 3], atol=1e-5)  # depth


def test_ea_uniform_density():
    n = 16
    alpha = 0.1
    dens = np.full((1, n), alpha, np.float32)
    feats = np.ones((1, n, 1), np.float32)
    lengths = np.linspace(0.0, 1.0, n, dtype=np.float32)[None]
    out = np.asarray(
        emission_absorption(jnp.asarray(dens), jnp.asarray(feats), jnp.asarray(lengths))
    )
    expected_opacity = 1.0 - (1.0 - alpha) ** n
    np.testing.assert_allclose(out[0, 1], expected_opacity, atol=1e-5)
    # weights sum = opacity for constant feature
    np.testing.assert_allclose(out[0, 0], expected_opacity, atol=1e-4)


def _canonical_camera(img_size, focal, camera_z):
    K = np.array(
        [[focal, 0, img_size / 2], [0, focal, img_size / 2], [0, 0, 1]],
        np.float32,
    )[None]
    R = np.eye(3, dtype=np.float32)[None]
    t = np.array([[0.0, 0.0, camera_z]], np.float32)
    return K, R, t


def test_render_center_voxel_depth_and_opacity():
    """A fully opaque center voxel seen by the canonical camera."""
    S = 16
    img = 8
    dens = np.zeros((1, S, S, S, 1), np.float32)
    dens[0, S // 2 - 1 : S // 2 + 1, S // 2 - 1 : S // 2 + 1, S // 2 - 1 : S // 2 + 1] = 1.0
    feats = np.ones((1, S, S, S, 2), np.float32) * 5.0

    K, R, t = _canonical_camera(img, focal=24.0, camera_z=1.5)
    out = np.asarray(
        render_volume_xla(
            jnp.asarray(feats), jnp.asarray(dens),
            jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
            image_size=img, n_pts_per_ray=64,
            min_depth=0.5, max_depth=2.0, volume_size=1.0,
        )
    )
    assert out.shape == (1, img, img, 4)
    center = out[0, img // 2, img // 2]
    np.testing.assert_allclose(center[0], 5.0, atol=1e-3)   # feature
    np.testing.assert_allclose(center[1], 5.0, atol=1e-3)
    assert center[2] > 0.99                                  # opacity
    # camera at z=1.5 looking at origin; voxel front face ~1.5 - 0.06
    assert 1.3 < center[3] < 1.55                            # z-depth
    # corner pixel misses the object entirely
    corner = out[0, 0, 0]
    assert corner[2] < 1e-4


def test_render_offcenter_voxel_direction():
    """Conventions: a voxel at +X(cv2),+Y(cv2) must appear right+down in image.

    cv2 world: +X right, +Y down; image rows grow down, cols grow right.
    """
    S = 16
    img = 16
    dens = np.zeros((1, S, S, S, 1), np.float32)
    feats = np.ones((1, S, S, S, 1), np.float32)
    # Volume indices: x (W axis) is pt3d X = -cv2 X. A cv2 point at +X lands at
    # low W index. Put the blob at cv2 (+0.3, +0.3, 0): pt3d (-0.3, -0.3, 0).
    # pt3d x -> W axis, so W index low; pt3d y -> H axis, low H index.
    # world coord -0.3 -> normalized -0.3/0.484 -> idx ~ (coord/cmax+1)/2*(S-1)
    idx = int(round((-0.3 / coord_grid_max(S, 1.0) + 1) / 2 * (S - 1)))
    dens[0, S // 2 - 1 : S // 2 + 1, idx - 1 : idx + 2, idx - 1 : idx + 2] = 1.0

    K, R, t = _canonical_camera(img, focal=35.0, camera_z=1.5)
    out = np.asarray(
        render_volume_xla(
            jnp.asarray(feats), jnp.asarray(dens),
            jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
            image_size=img, n_pts_per_ray=64,
            min_depth=0.5, max_depth=2.0, volume_size=1.0,
        )
    )
    opac = out[0, :, :, 1]
    ii, jj = np.unravel_index(np.argmax(opac), opac.shape)
    assert ii > img // 2 and jj > img // 2, (ii, jj)


def test_packed_backend_matches_xla():
    """'packed' (one gather row per sample) must agree with the reference
    XLA path bit-for-tolerance, including boundary samples."""
    from forge_tpu.ops.ray_march_packed import render_volume_packed

    rng = np.random.RandomState(7)
    S, img, B = 12, 10, 2
    feats = rng.rand(B, S, S, S, 4).astype(np.float32)
    dens = (rng.rand(B, S, S, S, 1) * 0.4).astype(np.float32)
    K = np.tile(np.array([[[9.0, 0, img / 2], [0, 9.0, img / 2], [0, 0, 1]]],
                         np.float32), (B, 1, 1))
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = np.tile(np.array([0.05, -0.08, 1.5], np.float32), (B, 1))

    args = (jnp.asarray(feats), jnp.asarray(dens), jnp.asarray(K),
            jnp.asarray(R), jnp.asarray(t))
    kw = dict(image_size=img, n_pts_per_ray=24, min_depth=0.5,
              max_depth=2.0, volume_size=1.0)
    ref = np.asarray(render_volume_xla(*args, **kw))
    out = np.asarray(render_volume_packed(*args, table_dtype=jnp.float32, **kw))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    # default bf16 table: bounded value divergence
    outb = np.asarray(render_volume_packed(*args, **kw))
    assert np.abs(outb - ref).max() < 0.02
