"""Shared dataset machinery: frame conventions, sample assembly, image IO.

All three dataset families (Kubric/ShapeNet, GSO, OmniObject3D) share the same
sample schema and pose pipeline (reference: dataset/kubric.py:340-407,
dataset/gso.py, dataset/omniobject3d.py:133-218); only metadata parsing and
file layout differ. forge_tpu factors the common 90% here.

Layouts are channels-last ([t, H, W, C]) numpy float32, ready for
jnp.asarray without relayout.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageFile

from forge_tpu.config import Config
from forge_tpu.data import pose_np

ImageFile.LOAD_TRUNCATED_IMAGES = True

# Axis conventions: single source of truth in geometry/frames.py
# (reference: dataset/kubric.py:78-97)
from forge_tpu.geometry.frames import KUBRIC_TO_CV2  # noqa: E402


def canonical_cameras(camera_z: float):
    """Host-side (numpy) canonical cameras; same math as
    geometry.frames.canonical_pose_cv2/extrinsics_cv2."""
    extr = np.eye(4, dtype=np.float32)
    extr[2, 3] = camera_z
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -camera_z
    return pose, extr


IMAGENET_MEAN = np.array([0.4850, 0.4560, 0.4060], np.float32)
IMAGENET_STD = np.array([0.2290, 0.2240, 0.2250], np.float32)


def normalize_imagenet(rgb: np.ndarray) -> np.ndarray:
    """ImageNet-normalize channels-last rgb in [0,1] (the reference's
    train.normalize_img option, dataset/kubric.py:432-437)."""
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


def load_rgba_frame(
    path: str, img_size: int, mask_images: bool, premultiply_mask: bool = False,
    normalize_img: bool = False,
):
    """RGBA png -> (rgb [H,W,3], mask [H,W,1]) float32 in [0,1].

    White background when not masking, black otherwise; LANCZOS ('ANTIALIAS')
    resize for rgb, NEAREST for mask (reference: dataset/kubric.py:410-430).
    normalize_img: ImageNet-normalize the rgb after assembly (reference:
    dataset/kubric.py:432-437 — applied identically by all three loaders).

    Set FORGE_NATIVE_IO=1 to decode through the C++ forge_io library
    (multi-threaded batch decode on multi-core hosts; falls back here).
    """
    if os.environ.get("FORGE_NATIVE_IO") == "1":
        from forge_tpu.data import native_io

        out = native_io.load_frame(path, img_size, mask_images)
        if out is not None:
            rgb_np, mask_np = out
            if premultiply_mask:
                rgb_np = rgb_np * mask_np
            if normalize_img:
                rgb_np = normalize_imagenet(rgb_np)
            return rgb_np, mask_np
    img_pil = Image.open(path)
    arr = np.asarray(img_pil)
    if arr.ndim == 3 and arr.shape[2] == 4:
        mask = Image.fromarray((arr[:, :, 3] > 0).astype(np.float64))
    else:
        mask = Image.fromarray(
            np.logical_or.reduce([arr[..., i] > 0 for i in range(min(3, arr.shape[-1]))]).astype(np.float64)
        )
    if not mask_images:
        bg = Image.new("RGBA", img_pil.size, "WHITE")
        bg.paste(img_pil, (0, 0), img_pil if img_pil.mode == "RGBA" else None)
        rgb = bg.convert("RGB")
    else:
        rgb = Image.fromarray(arr[:, :, :3])
    rgb = rgb.resize((img_size, img_size), Image.LANCZOS)
    mask = mask.resize((img_size, img_size), Image.NEAREST)
    rgb_np = np.asarray(rgb, dtype=np.float32) / 255.0            # [H,W,3]
    mask_np = np.asarray(mask, dtype=np.float32)[..., None]       # [H,W,1]
    if premultiply_mask:
        rgb_np = rgb_np * mask_np
    if normalize_img:
        rgb_np = normalize_imagenet(rgb_np)
    return rgb_np, mask_np


def depth_to_z(depth: np.ndarray, sensor_width: float, sensor_height: float,
               focal_length: float) -> np.ndarray:
    """Euclidean depth -> z-depth (reference: dataset/kubric.py:516-534)."""
    h, w = depth.shape
    px = (np.arange(-w / 2, w / 2, dtype=np.float32) + 0.5) / w * sensor_width
    py = (np.arange(-h / 2, h / 2, dtype=np.float32) + 0.5) / h * sensor_height
    sq = np.sum(np.square(np.meshgrid(px, py, indexing="xy")), axis=0)
    return depth / np.sqrt(1 + sq / focal_length**2)


def assemble_sample(
    images: np.ndarray,
    masks: np.ndarray,
    K: np.ndarray,
    cam_poses_kubric: np.ndarray,
    camera_z: float,
    depths: Optional[np.ndarray] = None,
    seq_name: str = "",
    seen_flag: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Build the canonical sample dict from per-frame data.

    cam_poses_kubric: [t,4,4] camera poses in the source (OpenGL/kubric/NeRF)
    frame; converted to cv2 and canonicalized exactly as the reference
    (dataset/kubric.py:374-407).
    """
    t = cam_poses_kubric.shape[0]
    cam_poses_cv2 = cam_poses_kubric @ KUBRIC_TO_CV2[None]
    cam_extr_cv2 = pose_np.se3_inverse(cam_poses_cv2)
    rel_cv2 = pose_np.get_relative_pose(cam_poses_cv2[0], cam_poses_cv2)
    rel_cv2[0] = np.eye(4, dtype=np.float32)
    rel_every2 = pose_np.get_relative_pose(cam_poses_cv2[:-1], cam_poses_cv2[1:])
    canon_pose, canon_extr = canonical_cameras(camera_z)
    poses_canon = pose_np.canonicalize_poses(canon_pose, rel_cv2)
    extr_canon = pose_np.se3_inverse(poses_canon)

    sample = {
        "images": images.astype(np.float32),
        "fg_probabilities": masks.astype(np.float32),
        "K_cv2": np.broadcast_to(K[None], (t, 3, 3)).astype(np.float32).copy(),
        "cam_extrinsics_cv2_canonicalized": extr_canon.astype(np.float32),
        "cam_extrinsics_cv2": cam_extr_cv2.astype(np.float32),
        "cam_poses_cv2": cam_poses_cv2.astype(np.float32),
        "cam_poses_cv2_canonicalized": poses_canon.astype(np.float32),
        "cam_poses_rel_cv2": rel_cv2.astype(np.float32),
        "cam_poses_rel_every2_cv2": rel_every2.astype(np.float32),
        "seq_name": seq_name,
    }
    if depths is not None:
        sample["depths"] = depths.astype(np.float32)
    if seen_flag is not None:
        sample["seen_flag"] = np.asarray([seen_flag], dtype=np.float32)
    return sample


class FrameSequenceDataset:
    """Base class: sequence list + per-index sample assembly."""

    def __init__(self, cfg: Config, split: str):
        self.cfg = cfg
        self.split = split
        self.seq_names: List[str] = []
        self.rng = random.Random(cfg.seed)

    def __len__(self) -> int:
        return len(self.seq_names)

    def num_frames(self) -> int:
        cfg = self.cfg
        if (cfg.test.compute_metric and self.split != "train") or cfg.dataset.train_all_frame:
            return 10  # reference: dataset/kubric.py:75
        return cfg.dataset.num_frame

    def choose_indices(self, len_seq: int, n: int) -> List[int]:
        if self.split == "train":
            idx = self.rng.sample(range(len_seq), n)
            if self.cfg.dataset.train_shuffle:
                self.rng.shuffle(idx)
            return idx
        return list(range(n))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError
