"""Eval subsystem tests: metrics, camera sync, jitted refinement, harness."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forge_tpu.eval import metrics as M
from forge_tpu.eval import sync as S
from forge_tpu.data import pose_np


def test_psnr_ssim_basics():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32)
    assert M.compute_psnr(img, img) == float("inf")
    assert abs(M.compute_ssim(img, img) - 1.0) < 1e-6

    noisy = np.clip(img + rng.randn(32, 32, 3) * 0.1, 0, 1).astype(np.float32)
    psnr, ssim = M.compute_img_metric(noisy, img)
    assert 15 < psnr < 25
    assert 0.1 < ssim < 0.99
    # worse noise -> worse metrics
    noisier = np.clip(img + rng.randn(32, 32, 3) * 0.3, 0, 1).astype(np.float32)
    psnr2, ssim2 = M.compute_img_metric(noisier, img)
    assert psnr2 < psnr and ssim2 < ssim


def test_pose_metric():
    q = np.array([1.0, 0, 0, 0, 0.5, 0.5, 0.5])
    theta, terr = M.compute_pose_metric(q, q)
    assert theta < 1e-3 and terr < 1e-8
    # 90 degree rotation about z: q = (cos45, 0, 0, sin45)
    q2 = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4), 0.5, 0.5, 1.5])
    theta, terr = M.compute_pose_metric(q2, q)
    np.testing.assert_allclose(theta, 90.0, atol=1e-4)
    np.testing.assert_allclose(terr, 1.0, atol=1e-6)


def test_permutation():
    assert M.permutation_for_canonical(5, 0) == [0, 1, 2, 3, 4]
    assert M.permutation_for_canonical(5, 4) == [4, 0, 1, 2, 3]
    assert M.permutation_for_canonical(5, 2) == [2, 0, 1, 3, 4]


def _random_se3(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    T = np.zeros((n, 4, 4), np.float64)
    T[:, :3, :3] = pose_np.quat2mat_transform(q)
    T[:, :3, 3] = rng.randn(n, 3) * 0.5
    T[:, 3, 3] = 1
    return T


def test_camera_synchronization_recovers_consistent_graph():
    """Exact pairwise extrinsics recover the GT up to the reference frame."""
    rng = np.random.RandomState(3)
    N = 5
    E = _random_se3(rng, N)          # extrinsics per view
    E[0] = np.eye(4)
    from itertools import combinations
    Ps, conf = {}, {}
    for i, j in combinations(range(N), 2):
        # P_ij: transform i -> j = E_j @ E_i^-1 (sync convention)
        Ps[(i, j)] = (E[j] @ pose_np.se3_inverse(E[i]))[None]
        conf[(i, j)] = np.asarray([1.0])
    out = S.camera_synchronization(Ps, conf, N, squares=10,
                                   center_first_camera=True)
    # out[:, i] should equal E_i @ E_0^-1 = E_i (since E0 = I)
    for i in range(N):
        np.testing.assert_allclose(out[0, i], E[i], atol=1e-4)


def test_camera_synchronization_noise_robustness():
    rng = np.random.RandomState(4)
    N = 5
    E = _random_se3(rng, N)
    E[0] = np.eye(4)
    from itertools import combinations
    Ps, conf = {}, {}
    for i, j in combinations(range(N), 2):
        P = E[j] @ pose_np.se3_inverse(E[i])
        # perturb rotation slightly
        dq = np.array([1.0, *(rng.randn(3) * 0.02)])
        dq /= np.linalg.norm(dq)
        dR = pose_np.quat2mat_transform(dq[None])[0]
        P = P.copy()
        P[:3, :3] = dR @ P[:3, :3]
        Ps[(i, j)] = P[None]
        conf[(i, j)] = np.asarray([1.0])
    out = S.camera_synchronization(Ps, conf, N, squares=10,
                                   center_first_camera=True)
    for i in range(1, N):
        R_err = out[0, i, :3, :3] @ E[i, :3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
        assert ang < 5.0, (i, ang)


def _noisy_graph(rng, N, noise=0.02):
    from itertools import combinations
    E = _random_se3(rng, N)
    E[0] = np.eye(4)
    Ps, conf = {}, {}
    for i, j in combinations(range(N), 2):
        P = E[j] @ pose_np.se3_inverse(E[i])
        dq = np.array([1.0, *(rng.randn(3) * noise)])
        dq /= np.linalg.norm(dq)
        P = P.copy()
        P[:3, :3] = pose_np.quat2mat_transform(dq[None])[0] @ P[:3, :3]
        Ps[(i, j)] = P[None]
        conf[(i, j)] = np.asarray([np.clip(0.8 + rng.rand() * 0.2, 0, 1)])
    return E, Ps, conf


def test_camera_synchronization_jax_matches_f64():
    """The jitted f32 power-iteration sync tracks the host f64 reference."""
    rng = np.random.RandomState(11)
    N = 5
    _, Ps, conf = _noisy_graph(rng, N)
    ref = S.camera_synchronization(Ps, conf, N, squares=10,
                                   center_first_camera=True)
    fn = jax.jit(lambda ps, cf: S.camera_synchronization_jax(
        ps, cf, N, squares=10, center_first_camera=True))
    out = np.asarray(fn({k: jnp.asarray(v, jnp.float32) for k, v in Ps.items()},
                        {k: jnp.asarray(v, jnp.float32) for k, v in conf.items()}))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_camera_synchronization_eig_cross_check():
    """Spectral and power-iteration variants agree on relative rotations of a
    consistent graph (reference implements both: utils/sync_utils.py:76-278)."""
    rng = np.random.RandomState(12)
    N = 5
    E, Ps, conf = _noisy_graph(rng, N, noise=0.0)
    power = S.camera_synchronization(Ps, conf, N, squares=10,
                                     center_first_camera=True)
    eig = S.camera_synchronization_eig(Ps, conf, N)
    # both recover per-camera rotations up to a global gauge: compare
    # relative rotations R_i R_0^T between all camera pairs
    for out in (power, eig):
        for i in range(1, N):
            rel = out[0, i, :3, :3] @ out[0, 0, :3, :3].T
            gt_rel = E[i, :3, :3] @ E[0, :3, :3].T
            err = rel @ gt_rel.T
            ang = np.degrees(np.arccos(np.clip((np.trace(err) - 1) / 2, -1, 1)))
            assert ang < 1.0, (i, ang)


def test_camera_chaining():
    rng = np.random.RandomState(5)
    N = 4
    E = _random_se3(rng, N)
    Ps = {(i, i + 1): (E[i + 1] @ pose_np.se3_inverse(E[i]))[None]
          for i in range(N - 1)}
    out = S.camera_chaining(Ps, {}, N)
    for i in range(N):
        expected = E[i] @ pose_np.se3_inverse(E[0])
        np.testing.assert_allclose(out[0, i], expected, atol=1e-5)


@pytest.mark.slow
def test_refine_and_harness_end_to_end(tmp_path):
    """Tiny-model eval harness: refinement reduces loss, results.txt written."""
    import __graft_entry__ as ge
    from forge_tpu.models import FORGE, TrainFlags
    from forge_tpu.config import merge_config
    from forge_tpu.data import SyntheticVoxelDataset, Loader
    from forge_tpu.eval.refine import make_refiner
    from forge_tpu.eval.evaluate import run_optimization, predict_initial
    from forge_tpu.eval.readout import summarize

    cfg = merge_config(ge.tiny_config(), {
        "dataset": {"mask_images": False},
        "test": {"compute_metric": True},
    })
    model = FORGE(cfg)
    ds = SyntheticVoxelDataset(cfg, split="test", n_seqs=1, grid=8)
    loader = Loader(ds, batch_size=1, drop_last=False)
    sample0 = next(iter(loader))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda s: model.init({"params": jax.random.PRNGKey(0)}, s,
                                 TrainFlags.none())
        )(jax.tree.map(lambda x: x if isinstance(x, np.ndarray) else x,
                       {k: v for k, v in sample0.items() if not isinstance(v, list)}))

    refiner = jax.jit(make_refiner(model, cfg, iter_num=3))
    outfile = run_optimization(
        model, variables, loader, cfg, str(tmp_path),
        refiner=refiner, split_num=1, exp_id=0, use_sync=True,
        iter_num=3, max_instances=1,
    )
    assert os.path.exists(outfile)
    lines = open(outfile).read().strip().splitlines()
    assert len(lines) == 2  # before + after
    stats = summarize(outfile, print_fn=lambda *a: None)
    assert any("before" in k for k in stats)
    assert any("after" in k for k in stats)

    # refinement must reduce its own loss on a smooth objective
    sample = {k: v for k, v in sample0.items() if not isinstance(v, list)}
    rd = predict_initial(model, variables, sample, cfg)
    entry = rd["0"]
    refined, rm, opt_state = refiner(
        variables,
        jnp.asarray(entry["poses_cam"]),
        jnp.asarray(entry["features_raw"]),
        jnp.asarray(sample["K_cv2"][:, :5]),
        jnp.asarray(sample["images"][:, :5]),
        jnp.asarray(sample["fg_probabilities"][:, :5]),
    )
    assert np.isfinite(float(rm["loss_last"]))
    # chained chunk continues from carried optimizer state
    refined2, rm2, _ = refiner(
        variables, refined,
        jnp.asarray(entry["features_raw"]),
        jnp.asarray(sample["K_cv2"][:, :5]),
        jnp.asarray(sample["images"][:, :5]),
        jnp.asarray(sample["fg_probabilities"][:, :5]),
        opt_state,
    )
    assert np.isfinite(float(rm2["loss_last"]))


@pytest.mark.slow
def test_batched_refinement_window(tmp_path):
    """refine_batch>1 writes the same per-instance results.txt rows as the
    per-instance path, exercising both a full window and a padded flush."""
    import __graft_entry__ as ge
    from forge_tpu.models import FORGE, TrainFlags
    from forge_tpu.config import merge_config
    from forge_tpu.data import SyntheticVoxelDataset, Loader
    from forge_tpu.eval.refine import make_refiner
    from forge_tpu.eval.evaluate import run_optimization

    cfg = merge_config(ge.tiny_config(), {
        "dataset": {"mask_images": False},
        "test": {"compute_metric": True},
    })
    model = FORGE(cfg)
    ds = SyntheticVoxelDataset(cfg, split="test", n_seqs=3, grid=8)
    loader = Loader(ds, batch_size=1, drop_last=False)
    sample0 = next(iter(loader))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda s: model.init({"params": jax.random.PRNGKey(0)}, s,
                                 TrainFlags.none())
        )({k: v for k, v in sample0.items() if not isinstance(v, list)})

    refiner = jax.jit(make_refiner(model, cfg, iter_num=2))
    outfile = run_optimization(
        model, variables, loader, cfg, str(tmp_path),
        refiner=refiner, split_num=1, exp_id=0,
        iter_num=2, max_instances=3, refine_batch=2,
    )
    lines = open(outfile).read().strip().splitlines()
    assert len(lines) == 6  # 3 instances x (before, after)
    idxs = sorted(int(ln.split(",")[0].split()[1]) for ln in lines)
    assert idxs == [0, 0, 1, 1, 2, 2]
    for ln in lines:
        assert "nan" not in ln.lower()


@pytest.mark.slow
def test_multistart_refinement(tmp_path):
    """--refine-multistart refines all 5 canonical candidates in one scan
    and writes one winner per instance."""
    import __graft_entry__ as ge
    from forge_tpu.models import FORGE, TrainFlags
    from forge_tpu.config import merge_config
    from forge_tpu.data import SyntheticVoxelDataset, Loader
    from forge_tpu.eval.refine import make_refiner
    from forge_tpu.eval.evaluate import run_optimization

    cfg = merge_config(ge.tiny_config(), {
        "dataset": {"mask_images": False},
        "test": {"compute_metric": True},
    })
    model = FORGE(cfg)
    ds = SyntheticVoxelDataset(cfg, split="test", n_seqs=1, grid=8)
    loader = Loader(ds, batch_size=1, drop_last=False)
    sample0 = next(iter(loader))
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda s: model.init({"params": jax.random.PRNGKey(0)}, s,
                                 TrainFlags.none())
        )({k: v for k, v in sample0.items() if not isinstance(v, list)})

    refiner = jax.jit(make_refiner(model, cfg, iter_num=2))
    outfile = run_optimization(
        model, variables, loader, cfg, str(tmp_path),
        refiner=refiner, split_num=1, exp_id=0,
        iter_num=2, max_instances=1, refine_multistart=True,
    )
    lines = open(outfile).read().strip().splitlines()
    assert len(lines) == 2  # one winner: before + after
    assert "nan" not in lines[1].lower()


def test_readout_lpips_unit_label(tmp_path):
    """results.txt with the lpips_unit column parses into its own field
    (honest-LPIPS labeling; evaluate.py lpips_label)."""
    from forge_tpu.eval.readout import parse_results, summarize

    p = tmp_path / "results.txt"
    p.write_text(
        "idx 0, seen True, before, psnr 20.0, ssim 0.8, lpips_unit 0.01, "
        "rot 12.0, trans 0.5, depth 0.1\n"
        "idx 0, seen True, after, psnr 22.0, ssim 0.85, lpips_unit 0.005, "
        "rot 6.0, trans 0.2, depth 0.05\n")
    buckets = parse_results(str(p))
    assert buckets["seen_before"]["lpips_unit"] == [0.01]
    assert buckets["seen_before"]["lpips"] == []
    stats = summarize(str(p), print_fn=lambda *a: None)
    assert abs(stats["seen_after"]["lpips_unit_mean"] - 0.005) < 1e-9
    assert "lpips_mean" not in stats["seen_after"]


def test_poses_cv2_from_vec():
    """Pose-plot helper: identity rel pose rows give the canonical camera
    pose (reference: models/model.py:74-81)."""
    from forge_tpu.eval.evaluate import _poses_cv2_from_vec

    vec = np.zeros((4, 7), np.float32)
    vec[:, 0] = 1.0  # identity quaternions, zero translation
    poses = _poses_cv2_from_vec(vec, camera_z=1.5)
    assert poses.shape == (5, 4, 4)
    canon = np.eye(4, dtype=np.float32)
    canon[2, 3] = -1.5
    for i in range(5):
        np.testing.assert_allclose(poses[i], canon, atol=1e-6)


def test_sync_pose_jit_backend_matches_host():
    """sync_pose(backend='jit') routes through the compiled f32 sync and
    agrees with the host f64 path on a realistic 5-permutation return_dict
    (reference flow: kubric_eval.py:95-145)."""
    from forge_tpu.eval.evaluate import sync_pose
    from forge_tpu.data import pose_np
    from forge_tpu.config import Config

    rng = np.random.RandomState(21)
    t = 5
    # ground-truth camera poses with small per-edge noise
    gt = []
    for i in range(t):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        P = np.eye(4)
        P[:3, :3] = pose_np.quat2mat_transform(q[None])[0]
        P[:3, 3] = rng.randn(3) * 0.3
        gt.append(P)

    from forge_tpu.geometry.rotations import mat2quat

    def rel_q(i, j):
        rel = np.linalg.inv(gt[i]) @ gt[j]
        rel[:3, 3] += rng.randn(3) * 0.01
        q = np.asarray(mat2quat(jnp.asarray(rel[None], jnp.float32)))[0]
        return np.concatenate([q, rel[:3, 3]])

    rd = {}
    for k in range(t):
        perm = [k] + [i for i in range(t) if i != k]
        rd[str(k)] = {
            "permutation": np.asarray(perm),
            "poses_cam": np.stack([rel_q(k, j) for j in perm[1:]]),
        }

    host = sync_pose(rd, "0", Config(), backend="host")
    jit = sync_pose(rd, "0", Config(), backend="jit")
    # same chirality convention for quaternion sign
    sign = np.sign(np.sum(host[..., :1] * jit[..., :1], axis=-1, keepdims=True))
    np.testing.assert_allclose(jit * sign, host * np.abs(sign), atol=5e-3)
