"""Host-side (numpy) pose algebra for the data pipeline.

Same math as forge_tpu.geometry.rotations but in numpy so the input pipeline
never touches an accelerator (the reference does this with torch CPU tensors
inside DataLoader workers, dataset/kubric.py:354-407).
"""

from __future__ import annotations

import numpy as np


def quat2mat_transform(q: np.ndarray) -> np.ndarray:
    """(w,x,y,z) [...,4] -> [...,3,3] (reference: utils/geo_utils.py:121-137)."""
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (w * y + x * z),
            2 * (w * z + x * y), w * w - x * x + y * y - z * z, 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (w * x + y * z), w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))


def se3_inverse(T: np.ndarray) -> np.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = np.swapaxes(R, -1, -2)
    out = np.zeros_like(T)
    out[..., :3, :3] = Rt
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", Rt, t)
    out[..., 3, 3] = 1.0
    return out


def get_relative_pose(cam_1: np.ndarray, cam_2: np.ndarray) -> np.ndarray:
    """T^c1_c1Toc2 (reference: utils/geo_utils.py:232-267)."""
    if cam_1.ndim == 2:
        cam_1 = np.broadcast_to(cam_1, cam_2.shape)
    R1, t1 = cam_1[..., :3, :3], cam_1[..., :3, 3]
    R2, t2 = cam_2[..., :3, :3], cam_2[..., :3, 3]
    R1t = np.swapaxes(R1, -1, -2)
    out = np.zeros_like(cam_2)
    out[..., :3, :3] = R1t @ R2
    out[..., :3, 3] = np.einsum("...ij,...j->...i", R1t, t2 - t1)
    out[..., 3, 3] = 1.0
    return out


def canonicalize_poses(canonical_pose: np.ndarray, rel: np.ndarray) -> np.ndarray:
    return canonical_pose[None] @ rel
