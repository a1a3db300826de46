"""Coordinate-frame constants shared across datasets and the renderer.

Axis conventions (reference: dataset/kubric.py:78-104):

             | Kubric | OpenCV | PyTorch3D
    X-axis   | Right  | Right  |   Left
    Y-axis   | Up     | Down   |   Up
    Z-axis   | Out    | In     |   In

forge_tpu works natively in the OpenCV frame; the PyTorch3D frame only appears
as the diagonal flip relating a world point's coordinates between the two
frames (used by the renderer's volume lookup, see ops/ray_march.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Inverse y and z axes, no translation (reference: dataset/kubric.py:88-91).
KUBRIC_TO_CV2 = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)

# Inverse x and y axes, no translation (reference: dataset/kubric.py:92-95).
CV2_TO_TORCH3D = np.array(
    [
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


def canonical_extrinsics_cv2(camera_z: float) -> jnp.ndarray:
    """Identity rotation, camera at distance camera_z (reference: dataset/kubric.py:100-103)."""
    e = np.eye(4, dtype=np.float32)
    e[2, 3] = camera_z
    return jnp.asarray(e)


def canonical_pose_cv2(camera_z: float) -> jnp.ndarray:
    """Inverse of the canonical extrinsics (reference: dataset/kubric.py:104)."""
    p = np.eye(4, dtype=np.float32)
    p[2, 3] = -camera_z
    return jnp.asarray(p)
