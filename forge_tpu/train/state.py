"""Train state and the jitted train step.

TPU-native replacement of the reference training loop mechanics
(scripts/kubric_trainer.py:16-101): one `train_step(state, batch, rng, epoch)`
function compiled once and executed per batch on a device mesh. The reference's
DDP barriers, `find_unused_parameters`, and per-parameter-group optimizers
become: a batch-sharded jit (XLA all-reduces gradients over ICI), an optax
mask that zeroes updates for frozen subtrees (curriculum freezing), and a
piecewise-constant LR schedule (utils/train_utils.py:149-164).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.struct
from flax.core import FrozenDict
from flax import traverse_util

from forge_tpu.config import Config
from forge_tpu.models.forge import FORGE, TrainFlags
from forge_tpu.train.curriculum import CurriculumStep
from forge_tpu.train import losses as L


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def path_trainable(path: str, prefixes: Tuple[str, ...]) -> bool:
    """Prefix match on path-component boundaries.

    A bare prefix like 'encoder_traj' matches 'encoder_traj/...' but NOT
    'encoder_traj_2d/...'; a prefix ending in '_' or '/' (e.g.
    'encoder_3d/dh_') matches raw-string-wise.
    """
    for p in prefixes:
        if p == "*":
            return True
        if path == p:
            return True
        if p.endswith(("_", "/")):
            if path.startswith(p):
                return True
        elif path.startswith(p + "/"):
            return True
    return False


def trainable_labels(params, prefixes: Tuple[str, ...]):
    """Label tree: 'train' for subtrees matching the curriculum prefixes."""
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = {
        k: ("train" if path_trainable(k, prefixes) else "freeze") for k in flat
    }
    return traverse_util.unflatten_dict(labels, sep="/")


def lr_schedule(cfg: Config) -> optax.Schedule:
    """Step schedule: lr halves at each milestone iteration, with a 500-step
    linear warmup on omniobject3d.

    reference: utils/train_utils.py:149-164 (factors .5/.25/.125/.0625,
    omniobject warmup) with lr scaled by accumulation_step
    (kubric_train_pose_3D.py:109).
    """
    base = cfg.train.lr * cfg.train.accumulation_step
    milestones = [m for m in cfg.train.adjust_iter_num if m > 0]
    if milestones:
        sched = optax.piecewise_constant_schedule(
            base, {int(m): 0.5 for m in milestones}
        )
    else:
        sched = optax.constant_schedule(base)
    if cfg.dataset.name == "omniobject3d":
        # NOTE: not optax.join_schedules — it would evaluate the milestone
        # schedule at (count - 500), firing every decay 500 steps late.
        inner = sched

        def sched(count):
            import jax.numpy as jnp

            warm = base * jnp.minimum(count, 500) / 500.0
            return jnp.where(count < 500, warm, inner(count))
    return sched


def make_optimizer(cfg: Config, params, step: CurriculumStep) -> optax.GradientTransformation:
    """clip -> (torch-style) Adam with L2 weight decay -> lr schedule,
    with frozen subtrees zeroed (replacing per-group param lists,
    kubric_train_joint.py:85-118)."""
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.add_decayed_weights(cfg.train.weight_decay)
        if cfg.train.weight_decay > 0
        else optax.identity(),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    )
    labels = trainable_labels(params, step.trainable)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )
    if cfg.train.accumulation_step > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.accumulation_step)
    return tx


def create_train_state(
    model: FORGE, cfg: Config, sample, rng, step: CurriculumStep
) -> Tuple[TrainState, optax.GradientTransformation]:
    # init_all touches every submodule so the parameter tree is complete
    # regardless of which curriculum step runs first (subtree surgery and
    # later steps need the full tree). Jitted: eager init dispatches every op
    # separately (minutes over the high-latency TPU tunnel, and ~5 minutes
    # even on a 1-core CPU host).
    variables = jax.jit(
        lambda s: model.init({"params": rng}, s, method=model.init_all)
    )(sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, params, step)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    return state, tx


def make_train_step(
    model: FORGE,
    cfg: Config,
    step_def: CurriculumStep,
    tx: optax.GradientTransformation,
    perceptual_apply: Optional[Callable] = None,
) -> Callable:
    """Build the pure train-step function (jit it with desired shardings).

    perceptual_apply: optional fn(imgs, targets) -> scalar closing over frozen
    VGG params (reference DDP-wraps the VGG loss, kubric_train_joint.py:125).
    """
    flags = step_def.flags
    fwd = {
        "single": model.forward_single,
        "full": model.forward_full,
        "pose2d": model.forward_pose2d,
    }[step_def.forward]

    def loss_fn(params, batch_stats, sample, rng, epoch):
        variables = {"params": params, "batch_stats": batch_stats}
        outs, mut = model.apply(
            variables, sample, flags,
            method=fwd, mutable=["batch_stats"], rngs={"dropout": rng},
        )
        if step_def.loss == "pose":
            cam_pose_return, origin_proj = outs
            loss, metrics = L.pose_loss(cfg, cam_pose_return, origin_proj, epoch)
        elif step_def.loss == "recon":
            imgs, masks = outs[0], outs[1]
            loss, metrics = L.reconstruction_loss(
                cfg, imgs, masks, sample, perceptual_apply
            )
        elif step_def.loss == "all":
            imgs, masks, origin_proj, cam_pose_return = outs
            loss, metrics = L.all_loss(
                cfg, imgs, masks, origin_proj, cam_pose_return, sample,
                perceptual_apply,
            )
        elif step_def.loss == "all_nvs":
            imgs, masks, origin_proj, cam_pose_return = outs
            loss, metrics = L.all_loss_nvs(
                cfg, imgs, masks, origin_proj, cam_pose_return, sample,
                perceptual_apply,
            )
        else:
            raise ValueError(step_def.loss)
        return loss, (mut.get("batch_stats", batch_stats), metrics)

    def train_step(state: TrainState, sample, rng, epoch):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, sample, rng, epoch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return train_step
