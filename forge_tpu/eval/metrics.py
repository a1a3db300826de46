"""Evaluation metrics: PSNR, SSIM, pose errors, view permutation.

Replaces the reference's skimage/eval glue (utils/eval_utils.py:8-63) with
numpy implementations (host-side, eval-only). SSIM matches
skimage.metrics.structural_similarity defaults: 7x7 uniform window, K1=0.01,
K2=0.03, per-channel mean for multichannel inputs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from forge_tpu.data import pose_np


def compute_psnr(gt: np.ndarray, pred: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((gt.astype(np.float64) - pred.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _uniform_filter2d(x: np.ndarray, win: int) -> np.ndarray:
    """Mean filter with 'reflect'-free valid handling identical to skimage's
    uniform_filter crop: we filter with reflect padding then crop the border."""
    from numpy.lib.stride_tricks import sliding_window_view

    pad = win // 2
    xp = np.pad(x, ((pad, pad), (pad, pad)), mode="reflect")
    w = sliding_window_view(xp, (win, win))
    return w.mean(axis=(-2, -1))


def _ssim_single(gt: np.ndarray, pred: np.ndarray, data_range: float,
                 win: int = 7, K1: float = 0.01, K2: float = 0.03) -> float:
    gt = gt.astype(np.float64)
    pred = pred.astype(np.float64)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu1 = _uniform_filter2d(gt, win)
    mu2 = _uniform_filter2d(pred, win)
    s11 = _uniform_filter2d(gt * gt, win) - mu1 * mu1
    s22 = _uniform_filter2d(pred * pred, win) - mu2 * mu2
    s12 = _uniform_filter2d(gt * pred, win) - mu1 * mu2
    # skimage uses unbiased covariances: scale by n/(n-1)
    n = win * win
    cov_norm = n / (n - 1)
    s11, s22, s12 = s11 * cov_norm, s22 * cov_norm, s12 * cov_norm
    ssim_map = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s11 + s22 + C2)
    )
    pad = win // 2
    return float(ssim_map[pad:-pad, pad:-pad].mean())


def compute_ssim(gt: np.ndarray, pred: np.ndarray, data_range: float = 1.0) -> float:
    """[H,W] or [H,W,C]; multichannel averages per-channel SSIM (skimage)."""
    if gt.ndim == 3:
        return float(np.mean([
            _ssim_single(gt[..., c], pred[..., c], data_range)
            for c in range(gt.shape[-1])
        ]))
    return _ssim_single(gt, pred, data_range)


def compute_img_metric(rgb: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """(psnr, ssim) with data_range 1 (reference: utils/eval_utils.py:8-11)."""
    return compute_psnr(gt, rgb), compute_ssim(gt, rgb)


def compute_pose_metric(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """Rotation error 2*acos|<q_p, q_g>| in degrees + translation L2.

    reference: utils/eval_utils.py:14-27.
    """
    d = abs(float(np.sum(pred[:4] * gt[:4])))
    d = min(d, 1.0)
    theta = 2 * np.arccos(d) * 180.0 / np.pi
    t_error = float(np.linalg.norm(pred[4:] - gt[4:]))
    return float(theta), t_error


def pose_errors_capped(pred_quats: np.ndarray, gt_quats: np.ndarray,
                       cap: float = 50.0, denom: Optional[int] = None):
    """Mean rot/trans errors with per-pair rotation cap.

    Replicates the eval averaging quirk: errors summed over the t-1 pairs but
    divided by t (reference: kubric_eval.py:359-365).
    """
    n = pred_quats.shape[0]
    denom = denom if denom is not None else n + 1
    rot, trans = 0.0, 0.0
    for i in range(n):
        r, tr = compute_pose_metric(pred_quats[i], gt_quats[i])
        rot += min(r, cap)
        trans += tr
    return rot / denom, trans / denom


def permutation_for_canonical(t: int, canonical_id: int) -> List[int]:
    """Reorder so view `canonical_id` comes first (reference: utils/eval_utils.py:36-41)."""
    if canonical_id == 0:
        return list(range(t))
    if canonical_id == t - 1:
        return [canonical_id] + list(range(t - 1))
    return [canonical_id] + list(range(canonical_id)) + list(range(canonical_id + 1, t))


def permute_clips(
    clips: np.ndarray,
    gt_poses: Optional[np.ndarray],
    nvs_extr: Optional[np.ndarray],
    canonical_id: int,
    camera_z: float = 1.5,
    clips_only: bool = False,
):
    """Re-express a sequence with view `canonical_id` first.

    reference: utils/eval_utils.py:30-63. GT relative poses are re-based on the
    new canonical view; NVS extrinsics are re-canonicalized. NOTE: the
    reference hardcodes camera_z=4.0 here regardless of dataset
    (utils/eval_utils.py:53-56); we parameterize it.
    """
    t = clips.shape[1]
    permute = permutation_for_canonical(t, int(canonical_id))
    clips = clips[:, permute]
    if clips_only:
        return clips

    gt = np.asarray(gt_poses).reshape(-1, 4, 4)
    canonical_pose = gt[int(canonical_id)]
    gt_rebased = pose_np.get_relative_pose(canonical_pose, gt)[permute][None]

    nvs_poses = pose_np.se3_inverse(np.asarray(nvs_extr).reshape(-1, 4, 4))
    canon = np.eye(4, dtype=np.float64)
    canon[2, 3] = -camera_z
    rel = pose_np.get_relative_pose(nvs_poses[int(canonical_id)], nvs_poses)
    nvs_new = pose_np.canonicalize_poses(canon.astype(np.float32), rel)
    nvs_extr_new = pose_np.se3_inverse(nvs_new)[None]
    return clips, gt_rebased.astype(np.float32), nvs_extr_new.astype(np.float32), permute
