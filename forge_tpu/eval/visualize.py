"""Eval-time visualization: turntable GIFs and camera-frustum plots.

Reference parity: `visualize_360[_all]` mirror kubric_eval.py:148-232 (28
look-at cameras rendered in one jitted pass, GIF via utils/vis); `vis_pose_
frusta` mirrors the predicted-vs-GT frustum plots at kubric_eval.py:554-557.
Split out of eval/evaluate.py so the harness semantics stay compact.
"""

from __future__ import annotations

import os
from itertools import combinations

import numpy as np
import jax.numpy as jnp


def visualize_360(model, variables, entry, camK, cfg, output_dir, name,
                  batch_idx, n_views: int = 28, combination=None):
    """Turntable GIF from the current pose estimate
    (reference: kubric_eval.py:166-232). combination: optional view-index
    subset (of views 1..t-1) fused together with the canonical view
    (reference's `combination` arg, kubric_eval.py:180-186)."""
    from forge_tpu.eval.evaluate import make_eval_renderer
    from forge_tpu.geometry.cameras import look_at_view_transform_cv2
    from forge_tpu.utils.vis import vis_nvs

    features_raw = np.asarray(entry["features_raw"])
    poses_cam = np.asarray(entry["poses_cam"])
    img_name = f"{batch_idx}"
    if combination is not None:
        views = [0] + list(combination)
        features_raw = features_raw[:, views]
        poses_cam = poses_cam[[v - 1 for v in combination]]
        img_name = "sample{}_{}views_{}".format(
            batch_idx, len(combination),
            "_".join(str(v) for v in combination))

    R, t = look_at_view_transform_cv2(
        dist=np.full(n_views, cfg.render.camera_z),
        elev=np.zeros(n_views),
        azim=np.linspace(0, 360, n_views) + 180,
    )
    extr = np.tile(np.eye(4, dtype=np.float32), (1, n_views, 1, 1))
    extr[0, :, :3, :3] = R
    extr[0, :, :3, 3] = t
    nvs_K = np.tile(np.asarray(camK)[:, :1], (1, n_views, 1, 1))
    renderer = make_eval_renderer(model)
    imgs, masks, depths = renderer(
        variables, jnp.asarray(features_raw),
        jnp.asarray(poses_cam), jnp.asarray(camK),
        jnp.asarray(extr), jnp.asarray(nvs_K),
    )
    return vis_nvs(np.asarray(imgs).astype(np.float32),
                   img_name, output_dir,
                   subfolder=os.path.join("vis_360", name),
                   masks=np.asarray(masks), depths=np.asarray(depths))


def visualize_360_all(model, variables, entry, camK, cfg, output_dir, name,
                      batch_idx, n_views: int = 28):
    """Turntable GIFs for every non-empty subset of the non-canonical views
    fused with the canonical one (reference: kubric_eval.py:148-163)."""
    # divergence note: the reference enumerates subsets of ALL views and
    # prepends the canonical view even when already present (duplicating
    # view 0 for subsets containing it, kubric_eval.py:161-163,182); we
    # enumerate subsets of the non-canonical views, which covers the same
    # distinct fusions without the duplicate-view renders.
    t = entry["features_raw"].shape[1]
    for r in range(1, t):
        for comb in combinations(range(1, t), r):
            visualize_360(model, variables, entry, camK, cfg, output_dir,
                          name, batch_idx, n_views=n_views,
                          combination=list(comb))


def vis_pose_frusta(entry, pose_vec, cfg, output_dir, name, batch_idx):
    """Frustum plot of predicted vs GT camera poses; the GT z column is
    shifted by -camera_z like the reference (kubric_eval.py:554-557 — the
    omniobject variant uses its own camera_z 4.0, omniobject_eval.py:557;
    parameterized here via cfg.render.camera_z)."""
    from forge_tpu.eval.evaluate import _poses_cv2_from_vec
    from forge_tpu.utils.vis import vis_poses

    pred = _poses_cv2_from_vec(pose_vec, cfg.render.camera_z)
    gt = np.asarray(entry["gt_poses"]).reshape(-1, 4, 4).copy()
    gt[:, 2, 3] -= cfg.render.camera_z
    vis_poses(None, pred[None], gt[None], output_dir,
              subfolder=os.path.join("poses", name, str(batch_idx)))
