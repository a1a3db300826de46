"""Test-time pose optimization, fully jitted.

TPU-native rebuild of the reference's refinement loop
(kubric_eval.py:412-564): Adam on (quaternion, translation) leaves through the
frozen rotate->fuse->decode->render graph, minimizing RGB+mask MSE against the
input views. The reference re-builds and re-differentiates the torch graph on
the host every iteration (up to 5000x per object); here the WHOLE loop is one
`lax.scan` inside one jit — zero host round-trips, and the per-iteration graph
is compiled once.

Learning rates follow the reference: Adam lr 1e-3 for rotation, 5e-4 for
translation, ExponentialLR with gamma=(lr_end/lr_start)^(1/iters) which is
identically 1.0 in the released config (kubric_eval.py:442-447) — i.e.
constant; we expose the knobs anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from forge_tpu.config import Config
from forge_tpu.models.forge import FORGE, TrainFlags


def make_refiner(
    model: FORGE,
    cfg: Config,
    iter_num: int,
    lr_rot: float = 1e-3,
    lr_trans: float = 5e-4,
    lr_end_scale: float = 1.0,
) -> Callable:
    """Build refine(variables, pose_vec, features_raw, camK, imgs, masks) ->
    (pose_vec_refined [b*(t-1), 7], final_metrics dict)."""

    flags = TrainFlags.none()
    w_rgb, w_mask = cfg.loss.recon_rgb, cfg.loss.recon_mask

    def loss_fn(params_rt, variables, features_raw, camK, timgs, tmasks):
        vec = jnp.concatenate([params_rt["rot"], params_rt["trans"]], axis=-1)
        imgs, masks = model.apply(
            variables, features_raw, vec, camK, flags,
            method=model.fuse_render_from_rel,
        )
        b, t = features_raw.shape[:2]
        hw = imgs.shape[1]
        # per-instance photometric losses (multi-start refinement selects
        # the winning candidate by ITS loss, not the batch mean)
        err_img = jnp.square(imgs - timgs.reshape(b * t, hw, hw, 3))
        err_mask = jnp.square(masks - tmasks.reshape(b * t, hw, hw, 1))
        per_img = jnp.mean(err_img.reshape(b, -1), axis=1)      # [b]
        per_mask = jnp.mean(err_mask.reshape(b, -1), axis=1)
        per = w_rgb * per_img + w_mask * per_mask
        # SUM, not mean: d(sum)/d(pose_i) = d(per_i)/d(pose_i) exactly, so
        # each instance's refinement trajectory is identical at any window
        # size (a mean would scale grads by 1/b, which Adam cancels only up
        # to its eps term). b=1 reduces to the reference's per-object loss.
        return jnp.sum(per), per

    gamma = lr_end_scale ** (1.0 / max(iter_num, 1))
    sched_rot = optax.exponential_decay(lr_rot, 1, gamma)
    sched_trans = optax.exponential_decay(lr_trans, 1, gamma)
    tx = optax.multi_transform(
        {"rot": optax.adam(sched_rot), "trans": optax.adam(sched_trans)},
        {"rot": "rot", "trans": "trans"},
    )

    def refine(variables, pose_vec, features_raw, camK, target_imgs,
               target_masks, opt_state=None):
        """One jitted chunk of `iter_num` optimization steps.

        Pass the returned opt_state back in to continue (run_optimization
        chains chunks: the hosted TPU relay kills device programs running
        longer than ~20 s, and Adam state must persist across chunks).
        """
        params_rt = {"rot": pose_vec[..., :4], "trans": pose_vec[..., 4:]}
        if opt_state is None:
            opt_state = tx.init(params_rt)

        def step(carry, _):
            params_rt, opt_state = carry
            (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_rt, variables, features_raw, camK, target_imgs, target_masks
            )
            updates, opt_state = tx.update(grads, opt_state, params_rt)
            params_rt = optax.apply_updates(params_rt, updates)
            return (params_rt, opt_state), (loss, per)

        (params_rt, opt_state), (losses, pers) = jax.lax.scan(
            step, (params_rt, opt_state), None, length=iter_num
        )
        losses = losses / pers.shape[-1]  # log per-instance-mean loss
        quat = params_rt["rot"]
        quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
        refined = jnp.concatenate([quat, params_rt["trans"]], axis=-1)
        return (refined, {"loss_first": losses[0], "loss_last": losses[-1],
                          "loss_last_per": pers[-1]},
                opt_state)

    return refine
