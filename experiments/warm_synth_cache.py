"""Pre-render every synthetic scene the curriculum will touch into the
FORGE_SYNTH_CACHE disk cache, BEFORE any training holds HBM.

Why: the synthetic dataset renders scenes lazily with a jitted on-chip
renderer (data/synthetic.py:_render). A mid-training lazy render (e.g. the
test split at the first validation) competes with the resident train scenes
+ train state for HBM and can RESOURCE_EXHAUSTED the stage — which is
exactly how the first flagship curriculum attempt died at epoch 10. Scene
keys depend on (split, img_size, frames, ...) so every (config, split) pair
the curriculum uses must be touched.

Usage: python experiments/warm_synth_cache.py <n_seqs> [cfg.yaml ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from forge_tpu.config import update_config
from forge_tpu.run import _build_dataset

CFGS_DEFAULT = [
    "configs/kubric/gt_pose.yaml",
    "configs/kubric/pred_pose_3d.yaml",
    "configs/kubric/pred_pose_2d.yaml",
    "configs/kubric/pretrain_pose_2d3d.yaml",
    "configs/kubric/pred_pose_2d3d.yaml",
    "configs/kubric/joint_pose_2d3d.yaml",
    "configs/kubric/optimize_seen.yaml",
]


def main():
    n_seqs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfgs = sys.argv[2:] or CFGS_DEFAULT
    done = set()
    for path in cfgs:
        cfg = update_config(path)
        for split in ("train", "test"):
            ds = _build_dataset(cfg, split, synthetic=True,
                                synthetic_seqs=n_seqs)
            key = (split, len(ds), ds._disk_key(0))
            if key in done:
                continue
            done.add(key)
            t0 = time.time()
            for i in range(len(ds)):
                ds[i]
            print(f"{path} {split}: {len(ds)} scenes ready "
                  f"({time.time()-t0:.0f}s, key {ds._disk_key(0)})",
                  flush=True)
    print("cache warm", flush=True)


if __name__ == "__main__":
    main()
