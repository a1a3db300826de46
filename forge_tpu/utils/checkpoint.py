"""Checkpointing: orbax tree checkpoints + curriculum subtree surgery.

The reference keeps NINE bespoke loaders that each pick a different subset of
module keys out of torch checkpoints (utils/exp_utils.py:185-422:
load_encoder_pretrained / load_pose2d / load_pose3d / load_model_full /
load_model_without_fusion / ...). Because forge_tpu keeps every submodule in
ONE parameter tree, all of them reduce to `load_subtrees(...)` — a declarative
merge of named subtrees from a saved tree, with optional drops (e.g. the
`del encoder_traj.out.*` surgery at kubric_eval.py:619).

Checkpoints are orbax PyTree checkpoints holding
{params, batch_stats, opt_state?, step, metadata}.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a TrainState (or any pytree) + host metadata."""
    path = os.path.abspath(path)
    tree = {"state": jax.device_get(state)}
    if metadata:
        tree["metadata"] = dict(metadata)
    _checkpointer().save(path, tree, force=True)


def load_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    """Restore a checkpoint; pass `template` (matching pytree, e.g. a
    TrainState inside {'state': ...}) to recover custom node types — orbax
    restores plain dicts otherwise, which cannot be tree-mapped against
    dataclass/namedtuple states.

    The on-disk 'metadata' dict may carry extra host scalars (epoch + the
    epoch's metric averages); the template's metadata is widened to the
    stored keys so resume doesn't trip orbax's structure check."""
    path = os.path.abspath(path)
    if template is not None:
        if "metadata" in template:
            stored = _checkpointer().metadata(path)
            meta_keys = stored.item_metadata.tree.get("metadata", {})
            template = dict(template)
            template["metadata"] = {
                k: template["metadata"].get(k, 0.0) for k in meta_keys}
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)


def save_variables(path: str, variables: Dict, metadata: Optional[Dict] = None) -> None:
    tree = {"variables": jax.device_get(variables)}
    if metadata:
        tree["metadata"] = dict(metadata)
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def load_variables(path: str) -> Dict:
    return _checkpointer().restore(os.path.abspath(path))["variables"]


def _match(path: str, prefixes: Sequence[str]) -> bool:
    for p in prefixes:
        if path == p or path.startswith(p + "/"):
            return True
        if p.endswith(("_", "/")) and path.startswith(p):
            return True
    return False


def load_subtrees(
    variables: Dict,
    source_variables: Dict,
    subtrees: Sequence[str],
    drop: Sequence[str] = (),
    strict: bool = True,
) -> Dict:
    """Merge `subtrees` (path prefixes like 'encoder_3d', 'render',
    'pose_head_') from source into a copy of `variables`.

    Covers every reference surgery loader:
      - load_encoder_pretrained  -> subtrees=('encoder_3d', 'render')
      - load_pose3d              -> subtrees=('encoder_traj',)
      - load_pose2d              -> subtrees=('encoder_traj_2d',)
      - load_model_full          -> subtrees=('*',)
      - load_model_without_fusion-> subtrees=('*',),
                                    drop=('encoder_3d/fusion_feature',)
      - the encoder_traj.out drop (kubric_eval.py:619) -> drop=('encoder_traj/out_',)
    """
    out = {}
    total_merged = 0
    for coll in variables:
        dst = traverse_util.flatten_dict(variables[coll], sep="/")
        src = traverse_util.flatten_dict(source_variables.get(coll, {}), sep="/")
        for k, v in src.items():
            if not _match(k, subtrees) and "*" not in subtrees:
                continue
            if _match(k, drop):
                continue
            if k in dst:
                if strict and tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch for {coll}/{k}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}")
                dst[k] = v
                total_merged += 1
            elif strict and "*" not in subtrees:
                raise KeyError(f"{coll}/{k} not present in target tree")
        out[coll] = traverse_util.unflatten_dict(dst, sep="/")
    if strict and total_merged == 0 and subtrees:
        # merging nothing is almost always a path typo
        raise KeyError(f"no keys merged for subtrees {subtrees}")
    return out


class BestTracker:
    """Track best metrics and write named checkpoints, mirroring the
    reference's cpt_best_psnr_* / cpt_best_rot_* files with metric-bearing
    names (kubric_train_pose_3D.py:166-212)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.best_psnr = 0.0
        self.best_rot = float("inf")

    def update(self, state, psnr: Optional[float] = None,
               rot: Optional[float] = None) -> Dict[str, str]:
        written = {}
        if psnr is not None and psnr > self.best_psnr:
            self.best_psnr = psnr
            p = os.path.join(self.output_dir, f"cpt_best_psnr_{psnr:.4f}")
            save_checkpoint(p, state, {"psnr": psnr})
            written["psnr"] = p
        if rot is not None and rot < self.best_rot:
            self.best_rot = rot
            p = os.path.join(self.output_dir, f"cpt_best_rot_{rot:.4f}")
            save_checkpoint(p, state, {"rot": rot})
            written["rot"] = p
        return written
