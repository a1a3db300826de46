"""Refinement-basin sweep: from GT poses perturbed by a known rotation angle,
how far does test-time pose optimization (the reference's kubric_eval.py
refinement) descend?

Round-2 asserted-without-measurement that ~32 deg initial error is "outside
the basin"; this measures the basin directly (VERDICT round 2, item 5).

Usage:
  python experiments/basin_sweep.py <gt_pose_cpt> [--iters 300] [--seqs 4]
                                    [--img 256]

Writes a markdown table to stdout.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.config import update_config, merge_config
from forge_tpu.models import build_model, TrainFlags
from forge_tpu.data import SyntheticVoxelDataset, Loader
from forge_tpu.data import pose_np
from forge_tpu.eval.refine import make_refiner
from forge_tpu.eval import metrics as M
from forge_tpu.geometry.rotations import mat2quat
from forge_tpu.utils import checkpoint as CKPT


def perturb_quat(q, angle_deg, rng):
    """Compose a random-axis rotation of angle_deg onto quaternion rows."""
    out = []
    for row in np.asarray(q):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        half = np.deg2rad(angle_deg) / 2
        dq = np.concatenate([[np.cos(half)], np.sin(half) * axis])
        w1, v1 = dq[0], dq[1:]
        w2, v2 = row[0], row[1:4]
        w = w1 * w2 - v1 @ v2
        v = w1 * v2 + w2 * v1 + np.cross(v1, v2)
        out.append(np.concatenate([[w], v, row[4:]]))
    return np.stack(out).astype(np.float32)


def main():
    cpt = sys.argv[1]
    get = lambda flag, d: (int(sys.argv[sys.argv.index(flag) + 1])
                           if flag in sys.argv else d)
    iters = get("--iters", 300)
    n_seqs = get("--seqs", 4)
    img = get("--img", 256)

    cfg = update_config("configs/kubric/gt_pose.yaml")
    cfg = merge_config(cfg, {"dataset": {"img_size": img}})
    model = build_model(cfg)
    raw = CKPT.load_checkpoint(cpt)
    st = raw["state"] if "state" in raw else raw
    variables = {"params": st["params"], "batch_stats": st["batch_stats"]}
    variables = jax.device_put(variables)

    ds = SyntheticVoxelDataset(cfg, split="test", n_seqs=n_seqs)
    loader = Loader(ds, batch_size=1, drop_last=False)

    encode = jax.jit(lambda v, c: model.apply(
        v, c, False, method=lambda m, x, tr: m.encode_views(x, tr)))
    chunk = 50
    refiner = jax.jit(make_refiner(model, cfg, chunk))

    levels = [5, 10, 20, 40]
    rng = np.random.RandomState(0)
    results = {a: [] for a in levels}
    for bi, sample in enumerate(loader):
        if bi >= n_seqs:
            break
        clips = jnp.asarray(sample["images"][:, :5])
        feats = encode(variables, clips)
        camK = jnp.asarray(sample["K_cv2"][:, :5])
        tmask = jnp.asarray(sample["fg_probabilities"][:, :5])
        gt_rel = np.asarray(sample["cam_poses_rel_cv2"])[0, 1:5]
        gt_q = np.asarray(mat2quat(jnp.asarray(gt_rel)))

        for ang in levels:
            pose0 = perturb_quat(gt_q, ang, rng)
            rot0, _ = M.pose_errors_capped(pose0, gt_q)
            pose = jnp.asarray(pose0)
            opt_state = None
            t0 = time.time()
            for _ in range(max(1, iters // chunk)):
                pose, metrics, opt_state = refiner(
                    variables, pose, feats, camK, clips, tmask, opt_state)
            pose_ref = np.asarray(pose)
            rot1, _ = M.pose_errors_capped(pose_ref, gt_q)
            results[ang].append((rot0, rot1, time.time() - t0))
            print(f"seq {bi} perturb {ang:2d}deg: {rot0:6.2f} -> {rot1:6.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    print("\n| perturbation | rot before | rot after (mean over "
          f"{n_seqs} scenes, {iters} iters) |")
    print("|---|---|---|")
    for ang in levels:
        b = np.mean([r[0] for r in results[ang]])
        a = np.mean([r[1] for r in results[ang]])
        print(f"| {ang} deg | {b:.2f} | {a:.2f} |")


if __name__ == "__main__":
    main()
