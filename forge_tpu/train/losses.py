"""Loss functions for the FORGE curriculum.

Functional parity with the reference losses (scripts/kubric_compute_loss.py:9-172),
rewritten to take model OUTPUTS instead of running the model themselves — the
train step composes model.apply + loss under one jit. All reductions are plain
means (equal to torch's F.mse_loss 'mean' reduction); under a batch-sharded jit
the mean is global, replicating DDP's averaged gradients.

Images are channels-last [*, H, W, C].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from forge_tpu.config import Config


def _mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def reconstruction_loss(
    cfg: Config,
    rendered_imgs: jnp.ndarray,
    rendered_masks: jnp.ndarray,
    sample: Dict[str, jnp.ndarray],
    perceptual_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """GT-pose curriculum loss over 2t renders (reference: :9-42).

    rendered_* : [b*2t, H, W, C]; targets are the t input views, compared
    against both the cross-render half (sv) and the full-fusion half (mv).
    """
    clips = sample["images"][:, :5]
    masks = sample["fg_probabilities"][:, :5]
    b, t = clips.shape[:2]
    h, w = clips.shape[2:4]
    c = clips.shape[-1]

    ri = rendered_imgs.reshape(b, 2 * t, h, w, c)
    rm = rendered_masks.reshape(b, 2 * t, h, w, 1)

    losses = {}
    losses["recon_img_sv"] = cfg.loss.recon_rgb * _mse(ri[:, :t], clips)
    losses["recon_mask_sv"] = cfg.loss.recon_mask * _mse(rm[:, :t], masks)
    losses["recon_img_mv"] = cfg.loss.recon_rgb * _mse(ri[:, t:], clips)
    losses["recon_mask_mv"] = cfg.loss.recon_mask * _mse(rm[:, t:], masks)
    loss = sum(losses.values())
    if cfg.loss.perceptual_img > 0 and perceptual_fn is not None:
        # targets tiled over both render halves (reference: :37-41)
        tgt = jnp.tile(clips, (1, 2, 1, 1, 1)).reshape(b * 2 * t, h, w, c)
        losses["perceptual_img"] = cfg.loss.perceptual_img * perceptual_fn(
            rendered_imgs.reshape(b * 2 * t, h, w, c), tgt
        )
        loss = loss + losses["perceptual_img"]
    return loss, losses


def pose_loss(
    cfg: Config,
    cam_pose_return: Dict[str, jnp.ndarray],
    origin_proj: Optional[jnp.ndarray],
    epoch: int = 0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Quaternion + translation MSE (+ origin regularizer after epoch 100).

    reference: scripts/kubric_compute_loss.py:45-66.
    """
    pred, gt = cam_pose_return["pred"], cam_pose_return["gt"]
    losses = {
        "pose": _mse(pred[:, :4], gt[:, :4]),
        "trans": _mse(pred[:, 4:], gt[:, 4:]),
    }
    loss = losses["pose"] + losses["trans"]
    if cfg.loss.regu_origin_proj > 0 and origin_proj is not None:
        target = jnp.asarray([0.5, 0.5], dtype=origin_proj.dtype)[None]
        regu = cfg.loss.regu_origin_proj * _mse(
            origin_proj, jnp.broadcast_to(target, origin_proj.shape)
        )
        # the regularizer switches on at epoch 100 (reference: :60); `epoch`
        # may be a traced scalar, so gate with where instead of Python control flow
        gate = jnp.where(jnp.asarray(epoch) >= 100, 1.0, 0.0)
        losses["regu_origin"] = regu * gate
        loss = loss + losses["regu_origin"]
    return loss, losses


def _pose_and_origin_terms(cfg, cam_pose_return, origin_proj, losses):
    pred, gt = cam_pose_return["pred"], cam_pose_return["gt"]
    losses["pose"] = _mse(pred[:, :4], gt[:, :4])
    losses["trans"] = _mse(pred[:, 4:], gt[:, 4:])
    extra = losses["pose"] + losses["trans"]
    if cfg.loss.regu_origin_proj > 0:
        target = jnp.asarray([0.5, 0.5], dtype=origin_proj.dtype)[None]
        losses["regu_origin"] = cfg.loss.regu_origin_proj * _mse(
            origin_proj, jnp.broadcast_to(target, origin_proj.shape)
        )
        extra = extra + losses["regu_origin"]
    return extra


def all_loss(
    cfg: Config,
    rendered_imgs: jnp.ndarray,
    rendered_masks: jnp.ndarray,
    origin_proj: jnp.ndarray,
    cam_pose_return: Dict[str, jnp.ndarray],
    sample: Dict[str, jnp.ndarray],
    perceptual_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Recon(2t) + pose + origin regularizer (reference: :69-117)."""
    loss, losses = reconstruction_loss(
        cfg, rendered_imgs, rendered_masks, sample, perceptual_fn
    )
    loss = loss + _pose_and_origin_terms(cfg, cam_pose_return, origin_proj, losses)
    return loss, losses


def all_loss_nvs(
    cfg: Config,
    rendered_imgs: jnp.ndarray,
    rendered_masks: jnp.ndarray,
    origin_proj: jnp.ndarray,
    cam_pose_return: Dict[str, jnp.ndarray],
    sample: Dict[str, jnp.ndarray],
    perceptual_fn=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Input-view + held-out NVS-view recon + pose terms (reference: :121-172).

    rendered_*: [b*t_all, ...] where views t: are the held-out NVS targets.
    """
    images = sample["images"]
    fg = sample["fg_probabilities"]
    b, t_all = images.shape[:2]
    t = 5
    h, w = images.shape[2:4]
    c = images.shape[-1]

    ri = rendered_imgs.reshape(b, t_all, h, w, c)
    rm = rendered_masks.reshape(b, t_all, h, w, 1)

    losses = {}
    losses["recon_img"] = cfg.loss.recon_rgb * _mse(ri[:, :t], images[:, :t])
    losses["recon_mask"] = cfg.loss.recon_mask * _mse(rm[:, :t], fg[:, :t])
    losses["recon_img_nvs"] = cfg.loss.recon_rgb * _mse(ri[:, t:], images[:, t:])
    losses["recon_mask_nvs"] = cfg.loss.recon_mask * _mse(rm[:, t:], fg[:, t:])
    loss = sum(losses.values())
    if cfg.loss.perceptual_img > 0 and perceptual_fn is not None:
        losses["perceptual_img"] = cfg.loss.perceptual_img * perceptual_fn(
            ri.reshape(b * t_all, h, w, c),
            images.reshape(b * t_all, h, w, c),
        )
        loss = loss + losses["perceptual_img"]
    loss = loss + _pose_and_origin_terms(cfg, cam_pose_return, origin_proj, losses)
    return loss, losses
