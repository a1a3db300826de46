"""Curriculum step definitions: loss, trainable subtrees, BN-mode flags.

Encodes the reference's 6-step training curriculum (README.md:62-71, SURVEY.md
Appendix A) as data. Each reference entry point hardwires a (loss_fn, parameter
list, set_model_train) triple — kubric_train_pose_3D.py:24-43,82-106 for the
single-estimator family and kubric_train_joint.py:24-44,83-123 for the full
2D+3D family. Here the parameter lists become path-prefix masks over the single
FORGE parameter tree and the train()/eval() surgery becomes `TrainFlags`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

from forge_tpu.models.forge import TrainFlags


@dataclass(frozen=True)
class CurriculumStep:
    forward: str                 # 'full' (2D+3D) or 'single' (3D-only)
    loss: str                    # 'recon' | 'pose' | 'all' | 'all_nvs'
    trainable: Tuple[str, ...]   # param path prefixes; ('*',) = everything
    flags: TrainFlags


_POSE_HEAD_PATHS = ("pose_head_fc1", "pose_head_norm", "pose_head_fc2")

CURRICULUM = {
    # --- single-estimator family (kubric_train_pose_3D.py) ---
    # step 1.1: GT-pose reconstruction, everything trains
    ("single", "all"): CurriculumStep(
        "single", "recon", ("*",), TrainFlags.all()
    ),
    # step 1.2: 3D pose estimator only
    ("single", "pose"): CurriculumStep(
        "single", "pose", ("encoder_traj",), TrainFlags(encoder_traj=True)
    ),
    # step 1.3: joint tune (backbone frozen); reference param list is
    # encoder_traj + fusion_feature + rotate + render (rotate's refinement
    # convs are dead code, models/rotate.py:143-154, so carry no params here)
    ("single", "joint"): CurriculumStep(
        "single", "all",
        ("encoder_traj", "encoder_3d/fusion_feature", "render"),
        TrainFlags(encoder_traj=True, fusion=True, conv_rgb=True),
    ),
    # --- standalone 2D pose estimator (kubric_train_pose_2D.py, step 2) ---
    ("pose2d", "pose"): CurriculumStep(
        "pose2d", "pose", ("encoder_traj_2d",), TrainFlags(encoder_traj_2d=True)
    ),
    # --- full 2D+3D family (kubric_train_joint.py) ---
    # step 3.1: fuse-head pretrain
    ("full", "pose_head"): CurriculumStep(
        "full", "pose", _POSE_HEAD_PATHS, TrainFlags(pose_head=True)
    ),
    # step 3.2: both estimators + head
    ("full", "pose"): CurriculumStep(
        "full", "pose",
        _POSE_HEAD_PATHS + ("encoder_traj", "encoder_traj_2d"),
        TrainFlags(encoder_traj=True, encoder_traj_2d=True, pose_head=True),
    ),
    # step 3.3: joint with NVS loss; note: density_head trains but
    # features_head stays frozen, encoder_traj_2d frozen
    # (reference: kubric_train_joint.py:114-119,39-44)
    ("full", "joint"): CurriculumStep(
        "full", "all_nvs",
        _POSE_HEAD_PATHS
        + ("encoder_traj", "encoder_3d/fusion_feature",
           "encoder_3d/dh_", "render"),
        TrainFlags(encoder_traj=True, pose_head=True, fusion=True,
                   density_head=True, conv_rgb=True),
    ),
}


def get_curriculum_step(forward: str, mode: str) -> CurriculumStep:
    key = (forward, mode)
    if key not in CURRICULUM:
        raise ValueError(f"unknown curriculum step {key}")
    return CURRICULUM[key]
