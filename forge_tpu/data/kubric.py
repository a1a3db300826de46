"""Kubric-rendered ShapeNet dataset.

Functional parity with the reference loader (dataset/kubric.py:43-534):
category tables, cached train/test_seen/test_unseen splits, RGBA frames with
white/black background, depth-tiff -> z-depth conversion with background
zeroing, kubric->cv2 intrinsics/pose conversion, canonicalized pose set.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List

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

# reference: dataset/kubric.py:22-40
SHAPENET_IDS = {
    "table": "04379243", "car": "02958343", "chair": "03001627",
    "airplane": "02691156", "sofa": "04256520", "rifle": "04090263",
    "lamp": "03636649", "watercraft": "04530566", "bench": "02828884",
    "loudspeaker": "03691459", "cabinet": "02933112", "display": "03211117",
    "telephone": "04401088", "bus": "02924116", "bathtub": "02808440",
    "guitar": "03467517", "faucet": "03325088", "clock": "03046257",
    "flowerport": "03991062", "jar": "03593526", "bottle": "02876657",
    "bookshelf": "02871439", "laptop": "03642806", "knife": "03624134",
    "train": "04468005", "trash bin": "02747177", "motorbike": "03790512",
    "pistol": "03948459", "file cabinet": "03337140", "bed": "02818832",
    "piano": "03928116", "stove": "04330267", "mug": "03797390",
    "bowl": "02880940", "washer": "04554684", "printer": "04004475",
    "helmet": "03513137", "microwaves": "03761084", "skateboard": "04225987",
    "tower": "04460130", "camera": "02942699", "basket": "02801938",
    "can": "02946921", "pillow": "03938244", "mailbox": "03710193",
    "dishwasher": "03207941", "rocket": "04099429", "bag": "02773838",
    "birdhouse": "02843684", "earphone": "03261776", "microphone": "03759954",
    "remote": "04074963", "keyboard": "03085013", "bicycle": "02834778",
    "cap": "02954340",
}

GENERAL_TRAIN = ["airplane", "bench", "cabinet", "car", "chair", "display",
                 "lamp", "loudspeaker", "rifle", "sofa", "table", "telephone",
                 "watercraft"]
GENERAL_TEST_UNSEEN = ["bus", "guitar", "clock", "bottle", "train", "mug",
                       "washer", "skateboard", "dishwasher", "pistol"]


class KubricDataset(FrameSequenceDataset):
    def __init__(self, cfg: Config, split: str = "train",
                 split_cache_dir: str = "./data_kubric"):
        super().__init__(cfg, split)
        self.root = cfg.dataset.root
        self.split_cache_dir = split_cache_dir

        cat = cfg.dataset.category
        self.is_general = cat in ("general", "general_unseen_category")
        if self.is_general:
            names = GENERAL_TRAIN if cat == "general" else GENERAL_TEST_UNSEEN
            self.category_ids = [SHAPENET_IDS[c] for c in names]
        else:
            self.category_ids = [SHAPENET_IDS[cat]]

        self.data_split = self._load_split()
        if split == "train":
            self.seq_names = list(self.data_split.get("train", []))
        else:
            if cat != "general_unseen_category":
                self.seq_names = list(self.data_split.get("test_seen", []))
                self.seq_names += list(self.data_split.get("test_unseen", []))
            else:
                self.seq_names = list(self.data_split.get("test_unseen", []))
        self.test_unseen = set(self.data_split.get("test_unseen", []))

    # ------------------------------------------------------------- split

    def _split_file(self) -> str:
        cat = self.cfg.dataset.category
        d = os.path.join(self.split_cache_dir, cat)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, "split_info.json")

    def _load_split(self) -> Dict[str, List[str]]:
        path = self._split_file()
        if not os.path.exists(path):
            split = self._build_split()
            with open(path, "w") as f:
                json.dump(split, f)
            return split
        with open(path) as f:
            return json.load(f)

    def _build_split(self) -> Dict[str, List[str]]:
        """5000 train / ~250 test_seen / ~250 test_unseen sequences per
        category (reference: dataset/kubric.py:142-281)."""
        rng = random.Random(self.cfg.seed)
        out = {"train": [], "test_seen": [], "test_unseen": []}
        for cid in self.category_ids:
            croot = os.path.join(self.root, cid)
            if not os.path.isdir(croot):
                continue
            instances = sorted(os.listdir(croot))
            seqs_by_instance = {
                inst: [os.path.join(cid, inst, s)
                       for s in sorted(os.listdir(os.path.join(croot, inst)))]
                for inst in instances
            }
            n_unseen = max(1, int(250.0 / 5000.0 * len(instances)))
            unseen = set(rng.sample(instances, min(n_unseen, len(instances))))
            seen_seqs = [s for i in instances if i not in unseen
                         for s in seqs_by_instance[i]]
            rng.shuffle(seen_seqs)
            n_test_seen = max(1, len(seen_seqs) // 20)
            out["test_unseen"] += [s for i in unseen for s in seqs_by_instance[i]]
            out["test_seen"] += seen_seqs[:n_test_seen]
            out["train"] += seen_seqs[n_test_seen:]
        return out

    # ------------------------------------------------------------ samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        seq_name = self.seq_names[idx]
        seq_path = os.path.join(self.root, seq_name)
        with open(os.path.join(seq_path, "metadata.json")) as f:
            meta = json.load(f)
        sensor_width = meta["camera"]["sensor_width"]
        img_size = cfg.dataset.img_size
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
            d = self._load_depth(path, sensor_width, focal_norm, mask)
            imgs.append(rgb)
            masks.append(mask)
            depths.append(d)
        images = np.stack(imgs)
        masks = np.stack(masks)
        depths = np.stack(depths)
        if cfg.dataset.mask_images:
            images = images * masks

        # kubric K is normalized by image size; kubric->cv2 flips y/z columns
        # (reference: dataset/kubric.py:341-344)
        K = np.asarray(meta["camera"]["K"], dtype=np.float32)
        K = K @ KUBRIC_TO_CV2[:3, :3].T
        K[0] *= img_size
        K[1] *= img_size

        positions = np.asarray(meta["camera"]["positions"], np.float32)[chosen]
        quats = np.asarray(meta["camera"]["quaternions"], np.float32)[chosen]
        rot = pose_np.quat2mat_transform(quats)
        poses = np.zeros((n, 4, 4), np.float32)
        poses[:, :3, :3] = rot
        poses[:, :3, 3] = positions
        poses[:, 3, 3] = 1.0

        seen = -1.0 if seq_name in self.test_unseen else 1.0
        return assemble_sample(
            images, masks, K, poses, cfg.render.camera_z,
            depths=depths, seq_name=seq_name,
            seen_flag=seen if self.split == "test" else None,
        )

    def _load_depth(self, rgb_path, sensor_width, focal_norm, mask):
        import imageio.v2 as imageio

        cfg = self.cfg
        img_size = cfg.dataset.img_size
        depth_path = rgb_path.replace("rgba", "depth").replace("png", "tiff")
        depth = np.asarray(imageio.imread(depth_path), dtype=np.float32)
        depth = depth_to_z(depth, sensor_width, sensor_width,
                           focal_norm * depth.shape[0])
        from PIL import Image as PILImage

        depth = np.asarray(
            PILImage.fromarray(depth).resize((img_size, img_size), PILImage.BILINEAR)
        )
        depth = depth * mask[..., 0]
        # zero background beyond the far plane (reference: dataset/kubric.py:443)
        depth = np.where(depth > (1.6 + 0.5), 0.0, depth)
        return depth[..., None].astype(np.float32)
