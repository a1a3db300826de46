"""The FORGE model: few-view voxel reconstruction with pose estimation.

Functional parity with the reference's two model classes:
  - `FORGE` (models/model.py:18-148): full model with 2D+3D pose estimators
    fused by an MLP head; renders all t_all views from the 5-view fusion.
  - `FORGE_poseEstimator3D` (models/model_single_pose_estimator.py:14-138):
    3D-estimator-only curriculum variant; renders 2t views — cross-renders
    from 3-view/2-view sub-fusions plus full 5-view fusion renders.

Here both forwards are methods of ONE flax module owning every submodule, so
the reference's 9 checkpoint-surgery loaders (utils/exp_utils.py:185-422)
reduce to named-subtree merges over a single parameter tree, and curriculum
freezing is an optax mask plus per-submodule BatchNorm mode flags
(`TrainFlags`, mirroring set_model_train, kubric_train_joint.py:24-43).

Everything jits: the distance-sorted view reorder is argsort+gather
(replacing the Python loop in models/model.py:161-168), and the model receives
plain arrays — the canonical pose enters as a constant derived from config,
not a live dataset object (the reference passes the dataset into forward,
models/model.py:42,74).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from forge_tpu.config import Config
from forge_tpu.geometry import rotations as geo
from forge_tpu.geometry.frames import canonical_pose_cv2, canonical_extrinsics_cv2
from forge_tpu.geometry.cameras import project_points_screen
from forge_tpu.models.encoder import Encoder3D
from forge_tpu.models.pose3d import PoseEstimator3D, to_se3
from forge_tpu.models.pose2d import PoseEstimator2D
from forge_tpu.models.renderer import VolRender, halve_intrinsics
from forge_tpu.ops.voxel import rotate_voxel_grids
from forge_tpu.nn.layers import leaky_relu

Dtype = Any


@dataclass(frozen=True)
class TrainFlags:
    """Per-submodule train-mode (BatchNorm/Dropout) flags.

    Mirrors the reference's set_model_train submodule freezing
    (kubric_train_joint.py:24-43): a frozen submodule runs BN in eval mode
    even inside a training step.
    """

    encoder_3d: bool = False       # ResNet backbone + conv1
    fusion: bool = False           # ConvGRU + fusion_conv
    density_head: bool = False
    features_head: bool = False
    conv_rgb: bool = False         # renderer's 2D decoder
    encoder_traj: bool = False     # 3D pose estimator
    encoder_traj_2d: bool = False  # 2D pose estimator
    pose_head: bool = False        # fused 2D+3D head (incl. dropout)

    @staticmethod
    def none() -> "TrainFlags":
        return TrainFlags()

    @staticmethod
    def all() -> "TrainFlags":
        return TrainFlags(*([True] * 8))


def sequence_from_distance(trans: jnp.ndarray) -> jnp.ndarray:
    """Sort views by translation distance to the canonical view.

    trans: [b, t, 3] -> idxs [b, t] (reference: models/model.py:152-158).
    """
    d = jnp.sum((trans - trans[:, 0:1]) ** 2, axis=-1)
    return jnp.argsort(d, axis=1)


def chose_selected(x: jnp.ndarray, idxs: jnp.ndarray) -> jnp.ndarray:
    """Gather views per batch element (reference: models/model.py:161-168)."""
    idx = idxs.reshape(idxs.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


class FORGE(nn.Module):
    cfg: Config
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        r = self.cfg.render
        feat_hw = self.cfg.dataset.img_size // 8
        self.encoder_3d = Encoder3D(depth_fold=feat_hw, name="encoder_3d", **kw)
        self.render = VolRender(
            img_size=self.cfg.dataset.img_size,
            volume_size=r.volume_size,
            n_pts_per_ray=r.n_pts_per_ray,
            min_depth=r.min_depth,
            max_depth=r.max_depth,
            k_size=r.k_size,
            backend=r.backend,
            # GT-pose training treats cameras as loss constants -> skip the
            # camera-gradient part of the pallas fused backward
            camera_grads=not self.cfg.train.use_gt_pose,
            ray_parallel=r.ray_parallel,
            name="render",
            **kw,
        )
        self.encoder_traj = PoseEstimator3D(
            rot_representation=self.cfg.network.rot_representation,
            inp_res=feat_hw // 2,
            name="encoder_traj", **kw,
        )
        self.encoder_traj_2d = PoseEstimator2D(
            grid_size=self.cfg.dataset.img_size // 16, name="encoder_traj_2d", **kw
        )
        # reference: models/model.py:32-39
        self.pose_head_drop = nn.Dropout(rate=0.5)
        self.pose_head_fc1 = nn.Dense(512, name="pose_head_fc1", **kw)
        self.pose_head_norm = nn.LayerNorm(epsilon=1e-5, name="pose_head_norm", **kw)
        self.pose_head_fc2 = nn.Dense(
            self.encoder_traj.pose_dim + 1, name="pose_head_fc2", **kw
        )

    # ------------------------------------------------------------------ utils

    @property
    def pose_dim(self) -> int:
        return self.encoder_traj.pose_dim

    def _canonical(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cz = self.cfg.render.camera_z
        return canonical_pose_cv2(cz), canonical_extrinsics_cv2(cz)

    def encode_views(self, clips: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[b, t, H, W, 3] -> [b, t, 32, 32, 32, 128] voxel features."""
        b, t = clips.shape[:2]
        feats = self.encoder_3d.get_feat3d(
            clips.reshape((b * t,) + clips.shape[2:]), train
        )
        return feats.reshape((b, t) + feats.shape[1:])

    def pose_head(self, feat: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = self.pose_head_drop(feat, deterministic=not train)
        x = self.pose_head_fc1(x)
        x = leaky_relu(self.pose_head_norm(x))
        return self.pose_head_fc2(x)

    def predict_poses_2d3d(
        self, clips: jnp.ndarray, features_raw: jnp.ndarray, flags: TrainFlags
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused 2D+3D relative pose prediction (reference: models/model.py:62-71).

        Returns (poses_cam [b*(t-1), pose_dim] quat-normalized, conf [.,1]).
        """
        f3d = self.encoder_traj(features_raw, flags.encoder_traj, return_features=True)
        f2d = self.encoder_traj_2d(clips, flags.encoder_traj_2d, return_features=True)
        feat = jnp.concatenate([f3d, f2d], axis=-1)
        pred = self.pose_head(feat, flags.pose_head)
        poses_cam, conf = pred[..., : self.pose_dim], pred[..., self.pose_dim :]
        quat = poses_cam[..., :4]
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12
        )
        poses_cam = jnp.concatenate([quat, poses_cam[..., 4:]], axis=-1)
        return poses_cam, conf

    def cameras_from_rel(
        self, cam_pose_rel: jnp.ndarray, b: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Relative poses [b*(t-1),4,4] -> canonicalized (poses, extrinsics) [b,t,4,4]."""
        canon_pose, canon_extr = self._canonical()
        poses = canon_pose[None] @ cam_pose_rel                 # [b*(t-1),4,4]
        extr = geo.se3_inverse(poses)
        t1 = cam_pose_rel.shape[0] // b
        poses = poses.reshape(b, t1, 4, 4)
        extr = extr.reshape(b, t1, 4, 4)
        poses = jnp.concatenate(
            [jnp.broadcast_to(canon_pose, (b, 1, 4, 4)), poses], axis=1
        )
        extr = jnp.concatenate(
            [jnp.broadcast_to(canon_extr, (b, 1, 4, 4)), extr], axis=1
        )
        return poses, extr

    def origin_projection(
        self, camE: jnp.ndarray, camK: jnp.ndarray
    ) -> jnp.ndarray:
        """Normalized screen projection of the world origin, in [0,2]-ish units.

        reference: models/model.py:106-114 — projection uses HALVED intrinsics
        (half-res render frame) then is scaled by 2/img_size.
        """
        B = camE.shape[0]
        Kh = halve_intrinsics(camK)
        origin = jnp.zeros((1, 3), dtype=camK.dtype)
        proj = project_points_screen(
            origin, Kh, camE[..., :3, :3], camE[..., :3, 3]
        )[:, 0, :]
        return 2.0 * proj / self.cfg.dataset.img_size

    def fuse_and_decode(
        self, feats_t: jnp.ndarray, flags: TrainFlags
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[b, t, 32c, 128] aligned volumes -> (render features, densities) 64c."""
        fused = self.encoder_3d.fuse(feats_t, flags.fusion)
        dens = self.encoder_3d.get_density3d(fused, flags.density_head)
        feat = self.encoder_3d.get_render_features(fused, flags.features_head)
        if self.cfg.dataset.name == "omniobject3d":
            dens = jnp.clip(dens, 0.0, 1.0)  # reference: models/model.py:140-141
        return feat, dens

    def render_views(
        self,
        features: jnp.ndarray,
        densities: jnp.ndarray,
        camE: jnp.ndarray,
        camK: jnp.ndarray,
        flags: TrainFlags,
        return_origin_proj: bool = False,
        render_depth: bool = False,
        grad_cams_per_volume: Optional[int] = None,
    ):
        """Render [B] views of volumes [B, 64c, ...]."""
        cameras = {
            "R": camE[..., :3, :3],
            "T": camE[..., :3, 3],
            "K": camK,
        }
        return self.render(
            cameras, features, densities,
            train=flags.conv_rgb,
            render_depth=render_depth,
            return_origin_proj=return_origin_proj,
            grad_cams_per_volume=grad_cams_per_volume,
        )

    def forward_pose2d(self, sample: Dict[str, jnp.ndarray], flags: TrainFlags):
        """Standalone 2D pose estimator training forward.

        reference: kubric_train_pose_2D.py + scripts/kubric_trainer_pose2D.py:19-39 —
        predict [b*(t-1), 7] poses from images alone, quat-normalized, against
        GT relative poses.
        """
        clips = sample["images"][:, :5]
        b, t = clips.shape[:2]
        pred = self.encoder_traj_2d(clips, flags.encoder_traj_2d)
        quat = pred[..., :4]
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12
        )
        pred = jnp.concatenate([quat, pred[..., 4:]], axis=-1)
        gt_rel = sample["cam_poses_rel_cv2"][:, 1:t].reshape(b * (t - 1), 4, 4)
        return {"gt": geo.mat2quat(gt_rel), "pred": pred}, None

    def init_all(self, sample: Dict[str, jnp.ndarray]):
        """Initialization forward touching EVERY submodule.

        The curriculum configs route around submodules (e.g. gt-pose training
        never calls the pose estimators), but the unified parameter tree must
        always be complete so checkpoint-surgery merges are well-defined.
        Renders a single view to keep init tracing cheap.
        """
        flags = TrainFlags.none()
        images = sample["images"]
        b = images.shape[0]
        t = min(5, images.shape[1])
        clips = images[:, :t]
        features_raw = self.encode_views(clips, False)
        poses_cam, conf = self.predict_poses_2d3d(clips, features_raw, flags)
        # out-head branches of both estimators (used by pose2d training / eval)
        _ = self.encoder_traj(features_raw, False)
        _ = self.encoder_traj_2d(clips, False)
        rel = to_se3(poses_cam, self.cfg.network.rot_representation)
        cam_poses, cam_extr = self.cameras_from_rel(rel, b)
        feats_t = rotate_voxel_grids(
            features_raw, cam_poses, self.cfg.render.volume_size
        )
        feat, dens = self.fuse_and_decode(feats_t, flags)
        imgs, masks = self.render_views(
            feat, dens, cam_extr[:, 0], sample["K_cv2"][:, 0], flags
        )
        return imgs

    # ------------------------------------------------------------- eval paths

    def encode_and_predict_poses(self, clips: jnp.ndarray, flags: Optional[TrainFlags] = None):
        """Encode views and predict fused 2D+3D relative poses.

        clips: [b, t, H, W, 3] -> (features_raw [b,t,32c,128],
        poses_cam [b*(t-1), pose_dim], conf). Core of the eval harness's
        per-canonical-permutation initialization (reference:
        kubric_eval.py:371-409); all 5 permutations batch along b here.
        """
        flags = flags or TrainFlags.none()
        features_raw = self.encode_views(clips, flags.encoder_3d)
        poses_cam, conf = self.predict_poses_2d3d(clips, features_raw, flags)
        return features_raw, poses_cam, conf

    def fuse_render_from_rel(
        self,
        features_raw: jnp.ndarray,
        rel_pose_vec: jnp.ndarray,
        camK: jnp.ndarray,
        flags: Optional[TrainFlags] = None,
        render_depth: bool = False,
        nvs_extr: Optional[jnp.ndarray] = None,
        nvs_K: Optional[jnp.ndarray] = None,
    ):
        """Rotate + fuse + decode + render from predicted relative poses.

        The shared trunk of test-time refinement (kubric_eval.py:450-491),
        evaluation (kubric_eval.py:258-347) and the 360-degree visualizer
        (kubric_eval.py:166-232). Fully jittable: one call renders either the
        t input cameras (default) or the provided NVS cameras.

        Args:
          features_raw: [b, t, S, S, S, 128] per-view volumes.
          rel_pose_vec: [b*(t-1), pose_dim] (quat part need not be normalized).
          camK: [b, t, 3, 3] intrinsics of the input views.
          nvs_extr/nvs_K: optional [b, n, 4, 4] / [b, n, 3, 3] held-out cameras.
        """
        flags = flags or TrainFlags.none()
        b, t = features_raw.shape[:2]
        quat = rel_pose_vec[..., :4]
        quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
        vec = jnp.concatenate([quat, rel_pose_vec[..., 4:]], axis=-1)
        rel = to_se3(vec, self.cfg.network.rot_representation)
        cam_poses, cam_extr = self.cameras_from_rel(rel, b)

        feats_t = rotate_voxel_grids(
            features_raw, cam_poses, self.cfg.render.volume_size
        )
        idxs = sequence_from_distance(cam_poses[:, :, :3, 3])
        feats_t = chose_selected(feats_t, idxs)
        feat, dens = self.fuse_and_decode(feats_t, flags)

        if nvs_extr is not None:
            camE, K = nvs_extr, nvs_K if nvs_K is not None else camK
        else:
            camE, K = cam_extr, camK
        n = camE.shape[1]
        return self.render_views(
            feat, dens,
            camE.reshape(b * n, 4, 4), K.reshape(b * n, 3, 3),
            flags, render_depth=render_depth,
        )

    def fuse_render_from_poses(
        self,
        features_aligned_feat: jnp.ndarray,
        features_aligned_dens: jnp.ndarray,
        camE: jnp.ndarray,
        camK: jnp.ndarray,
        flags: Optional[TrainFlags] = None,
        render_depth: bool = False,
    ):
        """Render pre-fused volumes with arbitrary cameras (360-degree NVS)."""
        flags = flags or TrainFlags.none()
        return self.render_views(
            features_aligned_feat, features_aligned_dens,
            camE, camK, flags, render_depth=render_depth,
        )

    # ---------------------------------------------------------------- forward

    def __call__(self, sample: Dict[str, jnp.ndarray], flags: Optional[TrainFlags] = None):
        flags = flags or TrainFlags.none()
        return self.forward_full(sample, flags)

    def forward_full(self, sample: Dict[str, jnp.ndarray], flags: TrainFlags):
        """Full 2D+3D model forward (reference: models/model.py:42-148)."""
        cfg = self.cfg
        images = sample["images"]
        b, t_all = images.shape[:2]
        t = min(5, t_all)
        clips = images[:, :t]

        features_raw = self.encode_views(clips, flags.encoder_3d)

        cam_pose_return = None
        if not cfg.train.use_gt_pose:
            poses_cam, conf = self.predict_poses_2d3d(clips, features_raw, flags)
            rel = to_se3(poses_cam, cfg.network.rot_representation)
            cam_poses, cam_extr = self.cameras_from_rel(rel, b)
            gt_rel = sample["cam_poses_rel_cv2"][:, 1:t].reshape(b * (t - 1), 4, 4)
            cam_pose_return = {
                "gt": geo.mat2quat(gt_rel),
                "pred": poses_cam,
                "conf": conf,
            }
            idxs = sequence_from_distance(cam_poses[:, :, :3, 3])
        else:
            if cfg.train.canonicalize:
                cam_extr = sample["cam_extrinsics_cv2_canonicalized"][:, :t]
                cam_poses = sample["cam_poses_cv2_canonicalized"][:, :t]
            else:
                cam_extr = sample["cam_extrinsics_cv2"][:, :t]
                cam_poses = sample["cam_poses_cv2"][:, :t]
            idxs = jnp.broadcast_to(jnp.arange(t)[None], (b, t))

        if cfg.train.parameter in ("pose", "pose_head"):
            # pose-only early return (reference: models/model.py:98-114)
            camK = sample["K_cv2"][:, :t].reshape(b * t, 3, 3)
            camE = cam_extr.reshape(b * t, 4, 4)
            return cam_pose_return, self.origin_projection(camE, camK)

        # append held-out NVS cameras (reference: models/model.py:117-118)
        camE_all = jnp.concatenate(
            [cam_extr, sample["cam_extrinsics_cv2_canonicalized"][:, t:]], axis=1
        )
        camK_all = sample["K_cv2"][:, :t_all]

        feats_t = rotate_voxel_grids(
            features_raw, cam_poses, cfg.render.volume_size
        )
        feats_t = chose_selected(feats_t, idxs)
        feat, dens = self.fuse_and_decode(feats_t, flags)

        # one fused volume per object, rendered by its t_all target cameras
        # (grouping resolved inside VolRender — no [b*t_all] volume
        # broadcast). Only the first t cameras per volume descend from
        # predicted poses; the appended NVS cameras are sample constants, so
        # the fused backward skips their camera-gradient contractions.
        imgs, masks, origin_proj = self.render_views(
            feat, dens,
            camE_all.reshape(b * t_all, 4, 4),
            camK_all.reshape(b * t_all, 3, 3),
            flags, return_origin_proj=True,
            grad_cams_per_volume=(t if (not cfg.train.use_gt_pose
                                        and t_all > t) else None),
        )
        origin_proj = 2.0 * origin_proj / cfg.dataset.img_size

        if cfg.train.use_gt_pose:
            return imgs, masks
        return imgs, masks, origin_proj, cam_pose_return

    def forward_single(self, sample: Dict[str, jnp.ndarray], flags: TrainFlags):
        """3D-estimator-only curriculum forward with 2t renders.

        reference: models/model_single_pose_estimator.py:26-138. Renders, per
        batch element: views 0..t-1 from sub-view fusions (first 3 slots use
        the last-2-view fusion, last 2 slots the first-3-view fusion), then
        views 0..t-1 again from the full 5-view fusion.
        """
        cfg = self.cfg
        images = sample["images"]
        b = images.shape[0]
        t = min(5, images.shape[1])
        clips = images[:, :t]

        features_raw = self.encode_views(clips, flags.encoder_3d)

        cam_pose_return = None
        if not cfg.train.use_gt_pose:
            poses_cam, conf = self.encoder_traj(features_raw, flags.encoder_traj)
            quat = poses_cam[..., :4]
            quat = quat / jnp.maximum(
                jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12
            )
            poses_cam = jnp.concatenate([quat, poses_cam[..., 4:]], axis=-1)
            rel = to_se3(poses_cam, cfg.network.rot_representation)
            cam_poses, cam_extr = self.cameras_from_rel(rel, b)
            gt_rel = sample["cam_poses_rel_cv2"][:, 1:t].reshape(b * (t - 1), 4, 4)
            cam_pose_return = {
                "gt": geo.mat2quat(gt_rel),
                "pred": poses_cam,
                "conf": conf,
            }
        else:
            if cfg.train.canonicalize:
                cam_extr = sample["cam_extrinsics_cv2_canonicalized"][:, :t]
                cam_poses = sample["cam_poses_cv2_canonicalized"][:, :t]
            else:
                cam_extr = sample["cam_extrinsics_cv2"][:, :t]
                cam_poses = sample["cam_poses_cv2"][:, :t]

        camE_2t = jnp.tile(cam_extr, (1, 2, 1, 1))
        camK_2t = jnp.tile(sample["K_cv2"][:, :t], (1, 2, 1, 1))

        if cfg.train.parameter == "pose":
            camK = camK_2t.reshape(b * 2 * t, 3, 3)
            camE = camE_2t.reshape(b * 2 * t, 4, 4)
            return cam_pose_return, self.origin_projection(camE, camK)

        feats_t = rotate_voxel_grids(features_raw, cam_poses, cfg.render.volume_size)

        # sub-view fusions (reference :108-117)
        feat_3v, dens_3v = self.fuse_and_decode(feats_t[:, :3], flags)
        feat_2v, dens_2v = self.fuse_and_decode(feats_t[:, -2:], flags)
        # full fusion
        feat_mv, dens_mv = self.fuse_and_decode(feats_t, flags)

        # Three grouped marches — slots 0-2 render the 2-view fusion through
        # cameras 0-2, slots 3-4 the 3-view fusion through cameras 3-4, slots
        # 5-9 the full fusion through all t cameras (reference :118-133) —
        # then ONE decode over all 2t raw images so the BatchNorm batch
        # matches the reference's single conv_rgb forward. Grouping keeps the
        # per-slot volume broadcast out of HBM (see VolRender.march).
        camK_t = sample["K_cv2"][:, :t]

        def cam_dict(extr, Km):
            n = extr.shape[1]
            e = extr.reshape(b * n, 4, 4)
            return {"R": e[..., :3, :3], "T": e[..., :3, 3],
                    "K": Km.reshape(b * n, 3, 3)}

        raw_2v = self.render.march(
            cam_dict(cam_extr[:, :3], camK_t[:, :3]), feat_2v, dens_2v)
        raw_3v = self.render.march(
            cam_dict(cam_extr[:, 3:t], camK_t[:, 3:t]), feat_3v, dens_3v)
        raw_mv = self.render.march(
            cam_dict(cam_extr, camK_t), feat_mv, dens_mv)
        half = raw_mv.shape[1:]
        raw = jnp.concatenate(
            [raw_2v.reshape((b, 3) + half), raw_3v.reshape((b, t - 3) + half),
             raw_mv.reshape((b, t) + half)], axis=1,
        ).reshape((b * 2 * t,) + half)

        cams_2t = {"R": camE_2t.reshape(b * 2 * t, 4, 4)[..., :3, :3],
                   "T": camE_2t.reshape(b * 2 * t, 4, 4)[..., :3, 3],
                   "K": camK_2t.reshape(b * 2 * t, 3, 3)}
        imgs, masks, origin_proj = self.render.finish(
            raw, cams_2t, flags.conv_rgb, return_origin_proj=True)
        origin_proj = 2.0 * origin_proj / cfg.dataset.img_size

        if cfg.train.use_gt_pose:
            return imgs, masks
        return imgs, masks, origin_proj, cam_pose_return


@flax.struct.dataclass
class ForgeOutputs:
    imgs: jnp.ndarray
    masks: jnp.ndarray
    origin_proj: Optional[jnp.ndarray] = None
    pose_gt: Optional[jnp.ndarray] = None
    pose_pred: Optional[jnp.ndarray] = None
    pose_conf: Optional[jnp.ndarray] = None
