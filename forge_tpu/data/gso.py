"""Google Scanned Objects dataset (test-unseen evaluation only).

Functional parity with the reference loader (dataset/gso.py): same kubric
metadata format and conventions as KubricDataset, all sequences are unseen,
optional color-jitter augmentation in train mode (dataset/gso.py:34-38,170-172).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from forge_tpu.config import Config
from forge_tpu.data.base import (
    FrameSequenceDataset,
    assemble_sample,
    depth_to_z,
    load_rgba_frame,
    KUBRIC_TO_CV2,
)
from forge_tpu.data import pose_np


class GSODataset(FrameSequenceDataset):
    def __init__(self, cfg: Config, split: str = "test"):
        super().__init__(cfg, split)
        self.root = cfg.dataset.root
        if os.path.isdir(self.root):
            seqs = []
            for inst in sorted(os.listdir(self.root)):
                ipath = os.path.join(self.root, inst)
                if os.path.isdir(ipath):
                    seqs += [os.path.join(inst, s) for s in sorted(os.listdir(ipath))]
            self.seq_names = seqs
        self.color_aug = cfg.dataset.augmentation

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        seq_name = self.seq_names[idx]
        seq_path = os.path.join(self.root, seq_name)
        with open(os.path.join(seq_path, "metadata.json")) as f:
            meta = json.load(f)
        img_size = cfg.dataset.img_size
        sensor_width = meta["camera"]["sensor_width"]
        focal_norm = meta["camera"]["K"][0][0]

        rgb_files = sorted(
            (f for f in os.listdir(seq_path) if "rgb" in f),
            key=lambda s: int(s.replace("rgba_", "").replace(".png", "")),
        )
        n = self.num_frames()
        chosen = self.choose_indices(len(rgb_files), n)

        imgs, masks, depths = [], [], []
        for i in chosen:
            path = os.path.join(seq_path, rgb_files[i])
            rgb, mask = load_rgba_frame(path, img_size, cfg.dataset.mask_images,
                                        normalize_img=cfg.train.normalize_img)
            imgs.append(rgb)
            masks.append(mask)
            dp = path.replace("rgba", "depth").replace("png", "tiff")
            if os.path.exists(dp):
                import imageio.v2 as imageio
                from PIL import Image as PILImage

                d = np.asarray(imageio.imread(dp), dtype=np.float32)
                d = depth_to_z(d, sensor_width, sensor_width,
                               focal_norm * d.shape[0])
                d = np.asarray(PILImage.fromarray(d).resize(
                    (img_size, img_size), PILImage.BILINEAR))
                d = d * mask[..., 0]
                d = np.where(d > 2.1, 0.0, d)
                depths.append(d[..., None].astype(np.float32))
        images = np.stack(imgs)
        masks_np = np.stack(masks)
        if self.color_aug and self.split == "train":
            # sequence-consistent jitter (reference: dataset/gso.py:170-172)
            from forge_tpu.data.augment import color_jitter_seq

            images = color_jitter_seq(images, self.rng)
        if cfg.dataset.mask_images:
            images = images * masks_np

        K = np.asarray(meta["camera"]["K"], dtype=np.float32)
        K = K @ KUBRIC_TO_CV2[:3, :3].T
        K[0] *= img_size
        K[1] *= img_size

        positions = np.asarray(meta["camera"]["positions"], np.float32)[chosen]
        quats = np.asarray(meta["camera"]["quaternions"], np.float32)[chosen]
        poses = np.zeros((n, 4, 4), np.float32)
        poses[:, :3, :3] = pose_np.quat2mat_transform(quats)
        poses[:, :3, 3] = positions
        poses[:, 3, 3] = 1.0

        return assemble_sample(
            images, masks_np, K, poses, cfg.render.camera_z,
            depths=np.stack(depths) if depths else None,
            seq_name=seq_name,
            seen_flag=-1.0 if self.split == "test" else None,  # all unseen
        )
