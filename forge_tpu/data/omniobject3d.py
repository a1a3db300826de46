"""OmniObject3D dataset (Blender renders, NeRF-synthetic transforms.json).

Functional parity with the reference loader (dataset/omniobject3d.py:23-279):
intrinsics from camera_angle_x, per-category 90/10 instance split cached to
json, OpenGL camera-to-world matrices -> cv2, no depth supervision.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List

import numpy as np

from forge_tpu.config import Config
from forge_tpu.data.base import (
    FrameSequenceDataset,
    assemble_sample,
    load_rgba_frame,
)


class OmniObject3DDataset(FrameSequenceDataset):
    def __init__(self, cfg: Config, split: str = "train",
                 split_cache_dir: str = "./data_omniobject3d"):
        super().__init__(cfg, split)
        self.root = cfg.dataset.root
        self.split_cache_dir = split_cache_dir
        self.data_split = self._load_split()
        if split == "train":
            self.seq_names = list(self.data_split.get("train", []))
        else:
            self.seq_names = list(self.data_split.get("test", []))
            if split == "val":
                self.seq_names = self.seq_names[:: cfg.eval_vis_freq]

    def num_frames(self) -> int:
        # reference: dataset/omniobject3d.py:40
        return self.cfg.dataset.num_frame if self.split == "train" else 10

    def _load_split(self) -> Dict[str, List[str]]:
        os.makedirs(self.split_cache_dir, exist_ok=True)
        path = os.path.join(self.split_cache_dir, "split_info.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        split = self._build_split()
        with open(path, "w") as f:
            json.dump(split, f)
        return split

    def _build_split(self) -> Dict[str, List[str]]:
        out = {"train": [], "test": []}
        if not os.path.isdir(self.root):
            return out
        for category in sorted(os.listdir(self.root)):
            cpath = os.path.join(self.root, category)
            insts = [i for i in sorted(os.listdir(cpath)) if category in i]
            n_test = max(1, int(len(insts) * 0.1))
            out["train"] += insts[: len(insts) - n_test]
            out["test"] += insts[len(insts) - n_test:]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        seq_name = self.seq_names[idx]
        category = seq_name[:-4]  # instance dirs are '<category>_NNN'
        seq_path = os.path.join(self.root, category, seq_name, "render")
        with open(os.path.join(seq_path, "transforms.json")) as f:
            meta = json.load(f)

        img_size = cfg.dataset.img_size
        # intrinsics from FOV (reference: dataset/omniobject3d.py:141-146)
        focal = 0.5 / math.tan(0.5 * meta["camera_angle_x"])
        K = np.array(
            [[img_size * focal, 0, img_size / 2],
             [0, img_size * focal, img_size / 2],
             [0, 0, 1]], dtype=np.float32,
        )

        imgs_path = os.path.join(seq_path, "images")
        rgb_files = sorted(
            os.listdir(imgs_path),
            key=lambda s: int(s.split("_")[1].replace(".png", "")),
        )
        n = self.num_frames()
        chosen = self.choose_indices(len(rgb_files), n)

        imgs, masks = [], []
        for i in chosen:
            rgb, mask = load_rgba_frame(
                os.path.join(imgs_path, rgb_files[i]), img_size,
                cfg.dataset.mask_images, premultiply_mask=cfg.dataset.mask_images,
                normalize_img=cfg.train.normalize_img,
            )
            imgs.append(rgb)
            masks.append(mask)
        images = np.stack(imgs)
        masks_np = np.stack(masks)

        poses = np.asarray(
            [meta["frames"][i]["transform_matrix"] for i in chosen],
            dtype=np.float32,
        )

        return assemble_sample(
            images, masks_np, K, poses, cfg.render.camera_z,
            seq_name=seq_name,
            seen_flag=(None if self.split == "train"
                       else (-1.0 if self.split == "test" else None)),
        )
