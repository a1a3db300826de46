"""In-training validation: NVS PSNR/SSIM + pose errors, seen/unseen buckets.

Functional parity with the reference validation (scripts/kubric_validation.py:15-558):
subsample the val split by eval_vis_freq, re-run encode -> (predict or GT
poses) -> rotate -> fuse -> render on the 5 held-out views, accumulate PSNR /
SSIM and rotation / translation errors bucketed by seen_flag. The
recompute-everything loop collapses into the same jitted eval paths the eval
harness uses. (The reference's 'kurbic' typo at kubric_validation.py:279,541
— falling through to the last bucket for the combined metric — is not
reproduced; we return the overall means.)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.config import Config
from forge_tpu.models.forge import FORGE, TrainFlags
from forge_tpu.eval import metrics as M
from forge_tpu.eval.evaluate import make_eval_renderer
from forge_tpu.geometry.rotations import mat2quat


def make_validator(model: FORGE, cfg: Config, use_gt_pose: bool = False,
                   pose_source: str = "2d3d"):
    """Returns validate(variables, loader) -> metrics dict.

    pose_source: '2d3d' uses the fused head (validate, reference:
    kubric_validation.py:299); '3d' uses the 3D estimator alone
    (validate_poseEstimator3D, reference: kubric_validation.py:15); '2d'
    validates the standalone 2D estimator — pose errors only, no rendering
    (reference: scripts/kubric_trainer_pose2D.py:103-167).
    """
    renderer = make_eval_renderer(model)

    def _encode_2d3d(v, x):
        return model.apply(v, x, method=model.encode_and_predict_poses)

    def _encode_3d(v, x):
        def fn(m, clips):
            feats = m.encode_views(clips, False)
            pose, conf = m.encoder_traj(feats, False)
            quat = pose[..., :4]
            quat = quat / jnp.maximum(
                jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
            return feats, jnp.concatenate([quat, pose[..., 4:]], -1), conf
        return model.apply(v, x, method=fn)

    def _encode_2d(v, x):
        def fn(m, clips):
            pred = m.encoder_traj_2d(clips, False)
            quat = pred[..., :4]
            quat = quat / jnp.maximum(
                jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
            return None, jnp.concatenate([quat, pred[..., 4:]], -1), None
        return model.apply(v, x, method=fn)

    render_views = pose_source != "2d"
    encode = jax.jit({"2d3d": _encode_2d3d, "3d": _encode_3d,
                      "2d": _encode_2d}[pose_source])
    encode_only = jax.jit(
        lambda v, x: model.apply(
            v, x, False, method=lambda m, c, t: m.encode_views(c, t))
    )

    def validate(variables, loader, logger=None) -> Dict[str, float]:
        log = logger.info if logger else print
        buckets: Dict[str, Dict[str, list]] = {}

        for batch_idx, sample in enumerate(loader):
            # subsample the val set — kubric only, like the reference
            # (kubric_validation.py:48 gates the stride on dataset name)
            if (cfg.dataset.name == "kubric" and cfg.eval_vis_freq > 1
                    and batch_idx % cfg.eval_vis_freq != 0):
                continue
            arrays = {k: v for k, v in sample.items() if not isinstance(v, list)}
            clips = arrays["images"][:, :5]
            b = clips.shape[0]
            assert b == 1, "validation runs at batch 1 like the reference"
            seen = True
            if "seen_flag" in arrays:
                seen = float(np.asarray(arrays["seen_flag"]).ravel()[0]) > 0

            if use_gt_pose:
                features_raw = encode_only(variables, jnp.asarray(clips))
                gt_rel = np.asarray(arrays["cam_poses_rel_cv2"][:, 1:5])
                pose_vec = np.asarray(
                    mat2quat(jnp.asarray(gt_rel.reshape(-1, 4, 4))))
                rot_err = trans_err = 0.0
            else:
                features_raw, poses_cam, _ = encode(
                    variables, jnp.asarray(clips))
                pose_vec = np.asarray(poses_cam)
                gt_rel = np.asarray(arrays["cam_poses_rel_cv2"][:, 1:5])
                gt_q = np.asarray(mat2quat(jnp.asarray(gt_rel.reshape(-1, 4, 4))))
                rot_err, trans_err = M.pose_errors_capped(pose_vec, gt_q)

            psnr = ssim = 0.0
            if render_views:
                nvs_extr = jnp.asarray(
                    arrays["cam_extrinsics_cv2_canonicalized"][:, 5:])
                nvs_K = jnp.asarray(arrays["K_cv2"][:, 5:])
                imgs, masks, _ = renderer(
                    variables, features_raw, jnp.asarray(pose_vec),
                    jnp.asarray(arrays["K_cv2"][:, :5]), nvs_extr, nvs_K,
                )
                imgs = np.asarray(imgs)
                gt_imgs = np.asarray(arrays["images"][:, 5:])[0]
                for i in range(gt_imgs.shape[0]):
                    p, s = M.compute_img_metric(imgs[i], gt_imgs[i])
                    psnr += p
                    ssim += s
                psnr /= gt_imgs.shape[0]
                ssim /= gt_imgs.shape[0]

            key = "seen" if seen else "unseen"
            bk = buckets.setdefault(
                key, {"psnr": [], "ssim": [], "rot": [], "trans": []})
            bk["psnr"].append(psnr)
            bk["ssim"].append(ssim)
            bk["rot"].append(rot_err)
            bk["trans"].append(trans_err)

        out: Dict[str, float] = {}
        all_psnr, all_rot = [], []
        for key, bk in buckets.items():
            for field, vals in bk.items():
                out[f"{key}_{field}"] = float(np.mean(vals)) if vals else 0.0
            all_psnr += bk["psnr"]
            all_rot += bk["rot"]
        out["psnr"] = float(np.mean(all_psnr)) if all_psnr else 0.0
        out["rot"] = float(np.mean(all_rot)) if all_rot else 0.0
        out["ssim"] = float(np.mean(
            [v for bk in buckets.values() for v in bk["ssim"]])) if buckets else 0.0
        log("validation: " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    return validate
