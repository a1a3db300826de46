"""OmniObject3D family coverage: configs, LR warmup, density clamp,
transforms.json parsing.

The real dataset isn't present in the image, so the loader test builds a
tiny on-disk instance in the reference's NeRF-synthetic layout
(transforms.json + renders; reference dataset/omniobject3d.py:133-218).
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from forge_tpu.config import update_config


OMNI_CFGS = [
    "configs/omniobject3d/gt_pose.yaml",
    "configs/omniobject3d/pred_pose_3d.yaml",
    "configs/omniobject3d/pred_pose_2d.yaml",
    "configs/omniobject3d/pretrain_pose_2d3d.yaml",
    "configs/omniobject3d/pred_pose_2d3d.yaml",
    "configs/omniobject3d/joint_pose_2d3d.yaml",
    "configs/omniobject3d/optimize.yaml",
]


def test_omni_configs_parse_and_render_constants():
    """All 7 omniobject YAMLs pass strict-key validation and carry the
    reference's render constants (volume 2.0, depth [3, 5], camera_z 4.0 —
    SURVEY.md Appendix A)."""
    for path in OMNI_CFGS:
        cfg = update_config(os.path.join("/root/repo", path))
        assert cfg.dataset.name == "omniobject3d", path
        assert cfg.render.volume_size == 2.0, path
        assert cfg.render.min_depth == 3.0 and cfg.render.max_depth == 5.0, path
        assert cfg.render.camera_z == 4.0, path


def test_omni_lr_warmup_schedule():
    """500-step linear warmup before the milestone schedule, with milestones
    NOT shifted by the warmup (utils/train_utils.py:149-164; the reference's
    adjust_lr fires on absolute iters)."""
    from forge_tpu.train.state import lr_schedule

    cfg = update_config("/root/repo/configs/omniobject3d/gt_pose.yaml")
    base = cfg.train.lr * cfg.train.accumulation_step
    sched = lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(250)), base * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), base, rtol=1e-6)
    m0 = int(cfg.train.adjust_iter_num[0])
    np.testing.assert_allclose(float(sched(m0 + 1)), base * 0.5, rtol=1e-6)


def test_omni_density_clamp():
    """decode_volume clamps density to [0, 1] only for omniobject3d
    (reference models/model.py:140-141)."""
    import jax
    import __graft_entry__ as ge
    from forge_tpu.config import merge_config
    from forge_tpu.models import FORGE, TrainFlags

    cfg = merge_config(ge.tiny_config(), {})
    cfg_o = merge_config(ge.tiny_config(), {"dataset": {"name": "omniobject3d"}})
    b, t, S = 1, 5, cfg.dataset.img_size // 8
    rng = np.random.RandomState(0)
    feats = jnp.asarray(
        rng.randn(b, t, S, S, S, 128).astype(np.float32))

    for c, name in ((cfg, "kubric"), (cfg_o, "omniobject3d")):
        model = FORGE(c)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, feats, TrainFlags.none(),
            method=model.fuse_and_decode)
        feat, dens = model.apply(
            variables, feats, TrainFlags.none(), method=model.fuse_and_decode)
        dens = np.asarray(dens)
        assert dens.min() >= 0.0, name  # ReLU head in both
        if name == "omniobject3d":
            assert dens.max() <= 1.0


def test_omni_transforms_json_loader(tmp_path):
    """Tiny on-disk instance in the NeRF-synthetic layout: FOV->K conversion
    (camera_angle_x, reference dataset/omniobject3d.py:141-146) and the
    sample dict contract."""
    import imageio.v2 as imageio
    from forge_tpu.data.omniobject3d import OmniObject3DDataset

    root = tmp_path / "omni"
    inst = root / "toy" / "toy_001" / "render"
    (inst / "images").mkdir(parents=True)
    n, res = 12, 32   # test split loads 10 frames
    angle_x = 0.8
    frames = []
    rng = np.random.RandomState(0)
    for i in range(n):
        name = f"r_{i}"
        img = (rng.rand(res, res, 4) * 255).astype(np.uint8)
        imageio.imwrite(str(inst / "images" / f"{name}.png"), img)
        c2w = np.eye(4)
        c2w[2, 3] = 4.0 - 0.1 * i
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": c2w.tolist()})
    with open(inst / "transforms.json", "w") as f:
        json.dump({"camera_angle_x": angle_x, "frames": frames}, f)

    from forge_tpu.config import merge_config

    cfg = merge_config(
        update_config("/root/repo/configs/omniobject3d/gt_pose.yaml"),
        {"dataset": {"img_size": res, "num_frame": 5, "root": str(root)}})
    # a single instance per category lands in the 10% test bucket
    ds = OmniObject3DDataset(
        cfg, split="test", split_cache_dir=str(tmp_path / "split"))
    assert len(ds) == 1
    s = ds[0]
    assert s["images"].shape == (10, res, res, 3)
    assert s["K_cv2"].shape[-2:] == (3, 3)
    # K from FOV: fx = 0.5 * res / tan(0.5 * angle_x)
    fx = 0.5 * res / np.tan(0.5 * angle_x)
    np.testing.assert_allclose(s["K_cv2"][0][0, 0], fx, rtol=1e-5)
    for k in ("cam_extrinsics_cv2", "cam_poses_rel_cv2", "fg_probabilities"):
        assert k in s, k
