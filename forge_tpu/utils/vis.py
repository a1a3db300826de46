"""Visualization: image grids, turntable GIFs, camera-frustum pose plots.

Host-side matplotlib/imageio equivalents of the reference visualizers
(utils/vis_utils.py:134-448). All inputs are channels-last numpy arrays in
[0, 1]; figures are written under <output_dir>/visualization/<subfolder>/.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _outdir(output_dir: str, subfolder: str) -> str:
    d = os.path.join(output_dir, "visualization", subfolder)
    os.makedirs(d, exist_ok=True)
    return d


def _to_np(x):
    return np.asarray(x)


def vis_seq(
    vid_clips, vid_masks, recon_clips, recon_masks, iter_num, output_dir,
    subfolder="train", vid_depths=None, recon_depths=None,
):
    """Grid of GT vs reconstructed rgb/mask (+depth) per view.

    reference: utils/vis_utils.py:134-200. Shapes [b, t, H, W, C].
    """
    vid_clips = _to_np(vid_clips)
    b, t = vid_clips.shape[:2]
    rows = 4 + (2 if vid_depths is not None else 0)
    for bi in range(b):
        fig, axes = plt.subplots(rows, t, figsize=(2 * t, 2 * rows))
        axes = np.atleast_2d(axes)
        datasets = [
            ("gt rgb", vid_clips[bi]),
            ("recon rgb", np.clip(_to_np(recon_clips)[bi], 0, 1)),
            ("gt mask", _to_np(vid_masks)[bi]),
            ("recon mask", np.clip(_to_np(recon_masks)[bi], 0, 1)),
        ]
        if vid_depths is not None:
            datasets += [
                ("gt depth", _to_np(vid_depths)[bi]),
                ("recon depth", _to_np(recon_depths)[bi]),
            ]
        for r, (name, data) in enumerate(datasets):
            for c in range(t):
                ax = axes[r, c]
                img = data[c]
                if img.shape[-1] == 1:
                    ax.imshow(img[..., 0], cmap="viridis")
                else:
                    ax.imshow(img)
                ax.set_xticks([])
                ax.set_yticks([])
                if c == 0:
                    ax.set_ylabel(name, fontsize=8)
        path = os.path.join(_outdir(output_dir, subfolder),
                            f"{iter_num}_{bi}.png")
        fig.savefig(path, bbox_inches="tight", dpi=80)
        plt.close(fig)


def vis_seq_sv_mv(vid_clips, vid_masks, recon_clips, recon_masks, iter_num,
                  output_dir, subfolder="train"):
    """Cross-render (sv) and full-fusion (mv) halves side by side.

    reference: utils/vis_utils.py:224-289. recon_* have 2t views.
    """
    rc = _to_np(recon_clips)
    b, t2 = rc.shape[:2]
    t = t2 // 2
    vis_seq(vid_clips, vid_masks, rc[:, :t], _to_np(recon_masks)[:, :t],
            f"{iter_num}_sv", output_dir, subfolder)
    vis_seq(vid_clips, vid_masks, rc[:, t:], _to_np(recon_masks)[:, t:],
            f"{iter_num}_mv", output_dir, subfolder)


def vis_nvs(imgs, img_name, output_dir, subfolder="vis_360",
            masks=None, depths=None, fps: int = 10):
    """Turntable GIF (reference: utils/vis_utils.py:292-313). When masks /
    depths are given each frame is [rgb | mask | depth] side by side."""
    import imageio

    imgs = np.clip(_to_np(imgs), 0, 1)
    strips = [imgs]
    if masks is not None:
        m = np.clip(_to_np(masks), 0, 1)
        strips.append(np.broadcast_to(m, m.shape[:-1] + (3,)))
    if depths is not None:
        d = _to_np(depths)
        d = d / max(float(d.max()), 1e-6)
        cmap = plt.get_cmap("viridis")
        strips.append(cmap(d[..., 0])[..., :3])
    frames = (np.concatenate(strips, axis=2) * 255).astype(np.uint8)
    path = os.path.join(_outdir(output_dir, subfolder), f"{img_name}.gif")
    imageio.mimsave(path, list(frames), fps=fps, loop=0)
    return path


def vis_nvs_separate(imgs, img_name, output_dir, subfolder="nvs_sep"):
    """Per-frame PNG dumps (reference: utils/vis_utils.py:426-448)."""
    import imageio

    d = _outdir(output_dir, subfolder)
    imgs = np.clip(_to_np(imgs), 0, 1)
    for i, im in enumerate((imgs * 255).astype(np.uint8)):
        imageio.imwrite(os.path.join(d, f"{img_name}_{i:03d}.png"), im)


def _frustum_points(pose, scale=0.15, aspect=1.0):
    """Pyramid of a camera given its cv2 pose (cam->world)."""
    pts_cam = np.array([
        [0, 0, 0],
        [-aspect, -1, 2], [aspect, -1, 2], [aspect, 1, 2], [-aspect, 1, 2],
    ]) * scale
    return (pose[:3, :3] @ pts_cam.T).T + pose[:3, 3]


def vis_poses(clips, pred_poses, gt_poses, output_dir, subfolder="poses"):
    """3D frustum plot of predicted vs GT camera poses.

    reference: utils/vis_utils.py:328-423 (CameraPoseVisualizer).
    pred_poses/gt_poses: [b, t, 4, 4] cv2 poses.
    """
    pred = _to_np(pred_poses)
    gt = _to_np(gt_poses)
    b, t = pred.shape[:2]
    for bi in range(b):
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        for ti in range(t):
            for poses, color in ((pred, "tab:red"), (gt, "tab:blue")):
                pts = _frustum_points(poses[bi, ti])
                edges = [(0, 1), (0, 2), (0, 3), (0, 4),
                         (1, 2), (2, 3), (3, 4), (4, 1)]
                for a_, b_ in edges:
                    ax.plot(*zip(pts[a_], pts[b_]), color=color, lw=0.8)
        ax.set_title("pred (red) vs gt (blue)")
        lim = 2.0
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        d = _outdir(output_dir, subfolder)
        fig.savefig(os.path.join(d, f"{bi}.png"), dpi=80)
        plt.close(fig)
