"""Volume rendering: ray generation + emission-absorption marching.

TPU-native replacement for the reference's PyTorch3D renderer stack
(`NDCGridRaysampler` + `VolumeSampler` + `EmissionAbsorptionRaymarcher` +
the documented depth patch; reference: models/volume_render.py:18-24,63 and
README.md:26-33). Two backends:

  - `render_volume_xla`: straightforward XLA program (gather + lerp + cumprod).
    The correctness reference and CPU/test path.
  - `render_volume_packed` (ops/ray_march_packed.py): corner-packed gather —
    one gathered row per ray-sample instead of eight.
  - `render_volume_pallas` (ops/ray_march_pallas.py): the production fused
    brick-tile kernel with a fused backward and volume/camera grouping.

Semantics replicated exactly:
  - rays through pixel centers at the render resolution, z-depth parameterized,
    depths = linspace(min_depth, max_depth, n_pts) (PyTorch3D v0.7.0
    NDCGridRaysampler with half-pixel offsets);
  - trilinear volume lookup with align_corners=True, zero padding
    (PyTorch3D VolumeSampler);
  - EA compositing: absorption_i = prod_{j<i} (1 + eps - d_j), eps=1e-10,
    weights w_i = d_i * absorption_i, feature = sum w_i f_i,
    opacity = 1 - prod(1 - d_i), depth = sum w_i z_i (the reference's patch).

Frame note: the volume lives in the PyTorch3D world frame; a world point given
in OpenCV coordinates (X, Y, Z) has PyTorch3D coordinates (-X, -Y, Z)
(reference: dataset/kubric.py:92-95), so the normalized lookup is
(-X, -Y, Z) / cmax. Everything else stays in the OpenCV convention.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from forge_tpu.geometry.cameras import pixel_rays_cv2
from forge_tpu.ops.grid_sample import grid_sample_3d
from forge_tpu.ops.voxel import coord_grid_max

EA_EPS = 1e-10


def emission_absorption(
    densities: jnp.ndarray,
    features: jnp.ndarray,
    lengths: jnp.ndarray,
    eps: float = EA_EPS,
) -> jnp.ndarray:
    """Composite samples along rays.

    Args:
      densities: [..., n] raw per-sample densities (treated as alphas).
      features: [..., n, C].
      lengths: [..., n] z-depths of the samples.

    Returns: [..., C + 2] = (features, opacity, depth).
    """
    # shifted cumprod with shift=1: absorption_0 = 1.
    surv = (1.0 + eps) - densities
    absorption = jnp.concatenate(
        [jnp.ones_like(surv[..., :1]), jnp.cumprod(surv, axis=-1)[..., :-1]],
        axis=-1,
    )
    weights = densities * absorption                                # [..., n]
    feat = jnp.einsum("...n,...nc->...c", weights, features)
    opacity = 1.0 - jnp.prod(1.0 - densities, axis=-1, keepdims=True)
    depth = jnp.sum(weights * lengths, axis=-1, keepdims=True)
    return jnp.concatenate([feat, opacity, depth], axis=-1)


def sample_points_world(
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    image_size: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray sample points in cv2 world frame: [B,H,W,n,3] and lengths [n]."""
    origins, dirs = pixel_rays_cv2(K, R, t, image_size, image_size)
    z = jnp.linspace(min_depth, max_depth, n_pts_per_ray, dtype=K.dtype)
    pts = (
        origins[:, None, None, None, :]
        + dirs[:, :, :, None, :] * z[None, None, None, :, None]
    )
    return pts, z


def render_volume_xla(
    features: jnp.ndarray,
    densities: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    image_size: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
    volume_size: float,
) -> jnp.ndarray:
    """Render feature volumes through OpenCV cameras; XLA reference path.

    Args:
      features: [B, D, H, W, C] channels-last feature volume.
      densities: [B, D, H, W, 1].
      K, R, t: [B,...] OpenCV cameras at the render resolution `image_size`.

    Returns: [B, image_size, image_size, C + 2] = (features, opacity, depth).
    """
    B, D, H, W, C = features.shape
    pts, z = sample_points_world(
        K, R, t, image_size, n_pts_per_ray, min_depth, max_depth
    )                                                               # [B,h,w,n,3]
    cmax = coord_grid_max(D, volume_size)
    flip = jnp.array([-1.0, -1.0, 1.0], dtype=pts.dtype) / cmax
    grid = pts * flip                                               # cv2 -> pt3d, normalized

    vol = jnp.concatenate([features, densities], axis=-1)           # [B,D,H,W,C+1]
    sampled = grid_sample_3d(vol, grid, align_corners=True, padding_mode="zeros")
    feat_s = sampled[..., :C]                                       # [B,h,w,n,C]
    dens_s = sampled[..., C]                                        # [B,h,w,n]
    lengths = jnp.broadcast_to(z, dens_s.shape)
    return emission_absorption(dens_s, feat_s, lengths)


def resolve_backend(backend: str) -> str:
    """'auto' -> the fused pallas kernel on TPU, the XLA gather path
    elsewhere (CPU tests; pallas-interpret would be orders slower)."""
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def pallas_supports(features_shape, image_size: int) -> bool:
    """Shape constraints of the fused kernel (ray_march_pallas.py): cubic
    volume, lane-aligned channel count, tile-divisible image."""
    _, D, H, W, C = features_shape
    return (D == H == W and 32 <= W <= 128
            and (8 * C) % 128 == 0 and image_size % 8 == 0)


def render_volume(
    features: jnp.ndarray,
    densities: jnp.ndarray,
    K: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    image_size: int,
    n_pts_per_ray: int,
    min_depth: float,
    max_depth: float,
    volume_size: float,
    backend: str = "xla",
    camera_grads: bool = True,
    cams_per_volume: int = 1,
    skip_empty: bool = True,
) -> jnp.ndarray:
    """Backend dispatcher; see `render_volume_xla` for the contract.

    camera_grads=False (pallas backend only) skips the camera-gradient part
    of the fused backward — valid only when (K, R, t) are loss constants
    (GT-pose training).

    cams_per_volume=n: features/densities carry B // n volumes, each rendered
    by its n consecutive cameras (the model broadcasts one fused volume to
    all target views, models/model.py:117-143). The pallas backend resolves
    the grouping in its BlockSpec index maps — the per-camera volume
    broadcast and its stacked gradient never exist; other backends fall back
    to an explicit repeat.

    skip_empty (pallas backend): skip all-zero density bricks in the march
    and its backward. Exact for sigma >= 0 volumes (EA treats densities as
    per-sample opacities in [0, 1], and this model's density head is
    ReLU-/clamp-gated) up to dropped (1 + 1e-10) transmittance factors;
    gradients skipped in empty space land only on exactly-zero voxels whose
    upstream ReLU gradient is zero. Set False for signed density fields.
    """
    if backend == "auto":
        backend = resolve_backend(backend)
        if backend == "pallas" and not pallas_supports(
                features.shape, image_size):
            backend = "xla"   # kernel shape constraints unmet (e.g. C != 16)
    if cams_per_volume > 1 and backend != "pallas":
        features = jnp.repeat(features, cams_per_volume, axis=0)
        densities = jnp.repeat(densities, cams_per_volume, axis=0)
    if backend == "packed":
        from forge_tpu.ops.ray_march_packed import render_volume_packed

        return render_volume_packed(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size,
        )
    if backend == "pallas":
        from forge_tpu.ops.ray_march_pallas import (
            render_volume_pallas_grad, render_volume_pallas_grad_nocam)

        fn = (render_volume_pallas_grad if camera_grads
              else render_volume_pallas_grad_nocam)
        return fn(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size, cams_per_volume, skip_empty,
        )
    if backend == "xla":
        return render_volume_xla(
            features, densities, K, R, t, image_size, n_pts_per_ray,
            min_depth, max_depth, volume_size,
        )
    raise ValueError(
        f"unknown renderer backend {backend!r}; "
        "available: 'xla', 'packed', 'pallas'")
