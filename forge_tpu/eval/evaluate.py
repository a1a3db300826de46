"""Eval harness: per-instance initialization, evaluation, sync, refinement.

Functional parity with the reference eval driver (kubric_eval.py:36-145,
235-409) re-architected TPU-first:

  - `predict_initial` runs ALL five canonical-view permutations as ONE batched
    jitted forward (the reference loops them on the host, kubric_eval.py:374).
  - `evaluate_canonical` renders the held-out NVS views and the input views
    with one jitted fuse+render; image metrics run host-side numpy.
  - `sync_pose` builds the pairwise pose graph from the five permutation runs,
    weighs edges by cycle consistency, and synchronizes (host f64).
  - refinement is the jitted `eval.refine.make_refiner` scan.

Work sharding across processes uses `batch_idx % split_num == exp_id` exactly
like the reference's 8-process eval scripts (kubric_eval.py:56-57).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from forge_tpu.config import Config
from forge_tpu.models.forge import FORGE, TrainFlags
from forge_tpu.eval import metrics as M
from forge_tpu.eval.sync import sync_pose  # noqa: F401  (re-export; the
# pairwise-graph synchronization semantics live with the sync algorithm)
from forge_tpu.eval.runner import (
    brick_coverage_guard, make_recover, run_shard)
from forge_tpu.eval.visualize import (
    vis_pose_frusta, visualize_360, visualize_360_all)
from forge_tpu.data import pose_np
from forge_tpu.geometry.rotations import quat2mat, mat2quat


def predict_initial(model: FORGE, variables, sample: Dict, cfg: Config,
                    jitted_encode: Optional[Callable] = None) -> Dict:
    """Per-canonical-id initialization (reference: kubric_eval.py:371-409).

    sample: single-instance batch (b=1, t_all=10 views).
    Returns dict[str(canonical_id)] with permutation, poses_cam (numpy
    [t-1, pose_dim]), features_raw [t,...], nvs_extr, gt_poses.
    """
    clips = np.asarray(sample["images"][:, :5])
    K = np.asarray(sample["K_cv2"][:, :5])
    gt_rel = np.asarray(sample["cam_poses_rel_cv2"][:, :5])
    nvs_extr_full = np.asarray(sample["cam_extrinsics_cv2_canonicalized"])
    t = clips.shape[1]

    permuted_clips, permutations, gts, nvs_list = [], [], [], []
    for cid in range(t):
        c, gt, nvs, perm = M.permute_clips(
            clips, gt_rel, nvs_extr_full, cid, camera_z=cfg.render.camera_z
        )
        permuted_clips.append(c[0])
        permutations.append(perm)
        gts.append(gt)
        nvs_list.append(nvs)

    batch = jnp.asarray(np.stack(permuted_clips))       # [5, t, H, W, 3]
    fn = jitted_encode or jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_and_predict_poses)
    )
    features_raw, poses_cam, conf = fn(variables, batch)
    features_raw = np.asarray(features_raw)             # [5, t, S,S,S,128]
    poses_cam = np.asarray(poses_cam).reshape(t, t - 1, -1)
    conf = np.asarray(conf).reshape(t, t - 1, -1)

    return {
        str(cid): {
            "permutation": permutations[cid],
            "poses_cam": poses_cam[cid],
            "conf": conf[cid],
            "features_raw": features_raw[cid: cid + 1],
            "nvs_extr": nvs_list[cid],
            "gt_poses": gts[cid],
        }
        for cid in range(t)
    }


def make_eval_renderer(model: FORGE) -> Callable:
    """Jitted: (variables, features_raw, pose_vec, camK, nvs_extr, nvs_K) ->
    (imgs, masks, depths) for the NVS cameras."""

    def fn(variables, features_raw, pose_vec, camK, nvs_extr, nvs_K):
        return model.apply(
            variables, features_raw, pose_vec, camK, TrainFlags.none(),
            True, nvs_extr, nvs_K,
            method=model.fuse_render_from_rel,
        )

    return jax.jit(fn)


def evaluate_canonical(
    model: FORGE, variables, sample: Dict, entry: Dict, cfg: Config,
    renderer: Optional[Callable] = None,
    lpips_fn: Optional[Callable] = None,
    eval_pose: bool = True,
    vis: Optional[tuple] = None,
) -> Dict[str, float]:
    """Render held-out NVS views and compute image + pose metrics.

    reference: kubric_eval.py:258-367. vis=(output_dir, name, batch_idx,
    canonical_id) additionally writes the per-canonical vis_seq panels of the
    NVS renders and the re-rendered input views (kubric_eval.py:313-347).
    """
    renderer = renderer or make_eval_renderer(model)
    clips_nvs = np.asarray(sample["images"][:, 5:])     # [1,5,H,W,3]
    camK = jnp.asarray(sample["K_cv2"][:, :5])
    nvs_extr = jnp.asarray(entry["nvs_extr"][:, 5:])
    nvs_K = jnp.asarray(np.asarray(sample["K_cv2"])[:, 5:])

    imgs, masks, depths = renderer(
        variables, jnp.asarray(entry["features_raw"]),
        jnp.asarray(entry["poses_cam"]), camK, nvs_extr, nvs_K,
    )
    imgs = np.asarray(imgs)
    depths = np.asarray(depths)

    if vis is not None:
        from forge_tpu.utils.vis import vis_seq

        output_dir, name, batch_idx, cid = vis
        tag = f"{batch_idx}_{cid}"
        has_depth = "depths" in sample
        vis_seq(
            clips_nvs, np.asarray(sample["fg_probabilities"][:, 5:]),
            imgs[None], np.asarray(masks)[None], tag, output_dir,
            subfolder=os.path.join("nvs", name),
            vid_depths=(np.asarray(sample["depths"][:, 5:])
                        if has_depth else None),
            recon_depths=depths[None] if has_depth else None,
        )
        # re-render the (permuted) input views (kubric_eval.py:330-347)
        in_imgs, in_masks, in_depths = renderer(
            variables, jnp.asarray(entry["features_raw"]),
            jnp.asarray(entry["poses_cam"]), camK,
            jnp.asarray(entry["nvs_extr"][:, :5]), camK,
        )
        perm = entry["permutation"]
        vis_seq(
            np.asarray(sample["images"][:, :5])[:, perm],
            np.asarray(sample["fg_probabilities"][:, :5])[:, perm],
            np.asarray(in_imgs)[None], np.asarray(in_masks)[None],
            tag, output_dir, subfolder=os.path.join("inputs", name),
            vid_depths=(np.asarray(sample["depths"][:, :5])[:, perm]
                        if has_depth else None),
            recon_depths=np.asarray(in_depths)[None] if has_depth else None,
        )

    psnr = ssim = 0.0
    n = clips_nvs.shape[1]
    for i in range(n):
        p, s = M.compute_img_metric(imgs[i], clips_nvs[0, i])
        psnr += p
        ssim += s
    psnr /= n
    ssim /= n

    lpips_val = 0.0
    if lpips_fn is not None:
        lpips_val = float(np.mean(np.asarray(
            lpips_fn(jnp.asarray(imgs), jnp.asarray(clips_nvs[0])))))

    depth_err = 0.0
    if "depths" in sample:
        gt_d = np.asarray(sample["depths"][:, :5])[0]
        depth_err = float(np.clip(np.abs(gt_d - depths).mean(), 0.0, 2.0))

    out = {"psnr": psnr, "ssim": ssim, "lpips": lpips_val,
           "depth_error": depth_err}
    if eval_pose:
        gt = np.asarray(entry["gt_poses"]).reshape(-1, 4, 4)[1:]
        gt_q = np.asarray(mat2quat(jnp.asarray(gt)))
        rot, trans = M.pose_errors_capped(entry["poses_cam"], gt_q)
        out["rot_error"] = rot
        out["trans_error"] = trans
    return out


def evaluate_all(model, variables, sample, return_dict, cfg,
                 renderer=None, lpips_fn=None, vis_base=None):
    """Evaluate every canonical choice; best = lowest rot error
    (reference: kubric_eval.py:235-255). vis_base=(output_dir, name,
    batch_idx) writes per-canonical nvs/inputs panels."""
    results = {}
    for cid in sorted(return_dict.keys(), key=int):
        results[cid] = evaluate_canonical(
            model, variables, sample, return_dict[cid], cfg,
            renderer=renderer, lpips_fn=lpips_fn,
            vis=(vis_base + (cid,)) if vis_base is not None else None,
        )
    best = min(results, key=lambda k: results[k]["rot_error"])
    return best, results


def _poses_cv2_from_vec(pose_vec, camera_z: float) -> np.ndarray:
    """quat+trans rel pose rows [t-1, 7] -> canonicalized cv2 camera poses
    [t, 4, 4] (reference: models/model.py:74-81)."""
    rel = np.asarray(quat2mat(jnp.asarray(np.asarray(pose_vec, np.float32))))
    rel = np.concatenate([np.eye(4, dtype=np.float32)[None], rel], axis=0)
    canon = np.eye(4, dtype=np.float32)
    canon[2, 3] = -camera_z
    return pose_np.canonicalize_poses(canon, rel)


def run_optimization(
    model: FORGE, variables, loader, cfg: Config, output_dir: str,
    refiner: Optional[Callable] = None,
    lpips_fn: Optional[Callable] = None,
    lpips_builder: Optional[Callable[[], Callable]] = None,
    lpips_label: str = "lpips",
    split_num: int = 1, exp_id: int = 0,
    use_sync: bool = False, sync_backend: str = "host",
    iter_num: int = 1000,
    max_instances: Optional[int] = None,
    visualize: bool = False,
    visualize_all: bool = False,
    variables_render: Optional[Dict] = None,
    instance_retries: int = 2,
    refine_batch: int = 1,
    refine_multistart: bool = False,
) -> str:
    """Full eval loop writing results.txt (reference: kubric_eval.py:36-93).

    variables_render: optional second weight tree used for the fuse/render
    (and refinement) graph while pose prediction uses `variables` — the
    reference's --model_gt option, which renders with the undegenerated
    GT-pose model's fusion (kubric_eval.py:46,606-621).

    instance_retries: on a per-instance device failure (the hosted TPU worker
    has been observed to crash/restart under sustained eval load), the
    instance is retried up to this many times after re-uploading the weight
    trees from host copies and rebuilding the jitted closures; an instance
    that still fails is skipped with a log line rather than aborting the
    whole eval shard.

    lpips_builder: factory returning a fresh jitted LPIPS closure; used
    instead of (or to rebuild) `lpips_fn` after a worker restart — a jitted
    closure capturing LPIPS weights as device arrays dies with the worker.
    lpips_label: column name written to results.txt; pass "lpips_unit" when
    the metric runs with unit lin weights so readout never mistakes it for
    comparable LPIPS.

    refine_batch: refine this many instances per jitted scan (windows padded
    to a fixed shape). The reference refines strictly one object at a time
    (kubric_eval.py:450-527, batch=1 loader); >1 amortizes the per-iteration
    fuse/decode/render graph, which under-occupies the chip at b=1. Metrics
    are identical per instance (refinement is batch-parallel); only wall
    clock changes. Windows interact with per-instance retry by falling back
    to per-instance refinement on a window failure.
    """
    from forge_tpu.eval.refine import make_refiner

    vr = variables_render if variables_render is not None else variables
    os.makedirs(os.path.join(output_dir, "results"), exist_ok=True)
    outfile = os.path.join(output_dir, "results", "results.txt")
    posefile = os.path.join(output_dir, "results", f"poses_{exp_id}.npz")
    # host-side copies so weights can be re-uploaded after a worker restart
    # (device buffers and compiled executables die with the worker)
    host_vars = jax.tree.map(np.asarray, variables) if instance_retries else None
    host_vr = (jax.tree.map(np.asarray, variables_render)
               if instance_retries and variables_render is not None else None)
    # chunk the optimization into bounded device programs (the hosted TPU
    # relay kills programs running longer than ~20 s). The safe default
    # depends on the resolved render backend: the fused pallas backward runs
    # ~60-120 ms/iter (100 iters ≈ 6-12 s, safely under the kill budget and
    # 5x less dispatch than the round-2 chunk of 20); the xla/packed gather
    # paths run ~480 ms/iter, where a 100-iter chunk (~48 s) would be killed.
    from forge_tpu.ops.ray_march import pallas_supports, resolve_backend

    _d = cfg.dataset.img_size // 4   # render volume = 2x the raw img/8 grid,
    _fast_bwd = (                    # 16 features (models/encoder.py heads)
        resolve_backend(cfg.render.backend) == "pallas"
        and pallas_supports((1, _d, _d, _d, 16), cfg.dataset.img_size // 2)
    )
    refine_chunk = min(iter_num, int(os.environ.get(
        "FORGE_REFINE_CHUNK", 100 if _fast_bwd else 20)))
    n_refine_chunks = max(1, -(-iter_num // refine_chunk))
    user_refiner = refiner
    refiner = refiner or jax.jit(make_refiner(model, cfg, refine_chunk))
    renderer = make_eval_renderer(model)
    encode = jax.jit(
        lambda v, x: model.apply(v, x, method=model.encode_and_predict_poses)
    )
    if lpips_builder is not None:
        lpips_fn = lpips_builder()
    pose_log = {}

    def rebuild():
        """Re-upload weights and rebuild every jitted closure (they capture
        device buffers, which die with a worker restart)."""
        nonlocal variables, vr, refiner, renderer, encode, lpips_fn
        variables = jax.device_put(host_vars)
        vr = (jax.device_put(host_vr) if host_vr is not None
              else variables)
        refiner = user_refiner or jax.jit(
            make_refiner(model, cfg, refine_chunk))
        renderer = make_eval_renderer(model)
        encode = jax.jit(
            lambda v, x: model.apply(
                v, x, method=model.encode_and_predict_poses)
        )
        if lpips_builder is not None:
            lpips_fn = lpips_builder()

    recover = make_recover(rebuild)

    def on_first_sample(sample):
        # The pallas kernel's fixed brick sizes silently drop tent weight
        # for cameras outside the measured envelope; enforce coverage
        # against this eval's ACTUAL camera distribution (with a
        # refinement-excursion margin) before the first render, falling
        # back to the xla renderer when the envelope is exceeded.
        nonlocal model, cfg, refine_chunk, n_refine_chunks
        nonlocal refiner, renderer, encode
        g_model, g_cfg = brick_coverage_guard(model, cfg, sample)
        if g_model is not None:
            model, cfg = g_model, g_cfg
            refine_chunk = min(iter_num, int(os.environ.get(
                "FORGE_REFINE_CHUNK", 20)))
            n_refine_chunks = max(1, -(-iter_num // refine_chunk))
            refiner = user_refiner or jax.jit(
                make_refiner(model, cfg, refine_chunk))
            renderer = make_eval_renderer(model)
            encode = jax.jit(
                lambda v, x: model.apply(
                    v, x, method=model.encode_and_predict_poses))

    if refine_batch > 1 and refine_multistart:
        print("note: --refine-batch is superseded by --refine-multistart "
              "(each instance already refines its 5 candidates as one "
              "batched scan); instance windows are not formed")

    def run_one(sample, batch_idx, seen):
        _run_instance(
            model, variables, vr, sample, cfg, batch_idx, seen,
            encode, renderer, refiner, n_refine_chunks, lpips_fn,
            use_sync, visualize, output_dir, outfile, pose_log,
            lpips_label=lpips_label, visualize_all=visualize_all,
            sync_backend=sync_backend, multistart=refine_multistart)

    def queue_one(sample, batch_idx, seen):
        # window mode: run the per-instance phase now, queue the context;
        # refinement runs batched when the window fills
        return _pre_instance(
            model, variables, vr, sample, cfg, batch_idx, seen,
            encode, renderer, lpips_fn, use_sync, visualize,
            visualize_all, output_dir, sync_backend=sync_backend)

    def post(ctx, refined):
        _post_instance(
            model, vr, ctx, refined, cfg, renderer, lpips_fn, visualize,
            visualize_all, output_dir, outfile, pose_log,
            lpips_label=lpips_label)

    def flush_window(ctxs):
        refined, _losses = _refine_window(
            refiner, vr, ctxs, n_refine_chunks, pad_to=refine_batch)
        for ctx, r in zip(ctxs, refined):
            post(ctx, r)

    def flush_one(ctx):
        post(ctx, _refine_window(refiner, vr, [ctx], n_refine_chunks)[0][0])

    def save_state():
        np.savez(posefile, **{f"{i}_{n}": pose_log[i][n]
                              for i in pose_log for n in pose_log[i]})

    run_shard(
        loader, split_num=split_num, exp_id=exp_id,
        max_instances=max_instances, instance_retries=instance_retries,
        recover=recover, run_one=run_one, queue_one=queue_one,
        flush_one=flush_one, flush_window=flush_window,
        window=(refine_batch if not refine_multistart else 1),
        on_first_sample=on_first_sample, save_state=save_state)
    return outfile


def _pre_instance(model, variables, vr, sample, cfg, batch_idx, seen,
                  encode, renderer, lpips_fn, use_sync, visualize,
                  visualize_all, output_dir, sync_backend: str = "host"):
    """Predict -> evaluate(before) -> sync for one instance; returns the
    context dict consumed by refinement + `_post_instance`."""
    rd = predict_initial(model, variables, sample, cfg, jitted_encode=encode)
    best, results = evaluate_all(
        model, vr, sample, rd, cfg, renderer=renderer,
        lpips_fn=lpips_fn,
        vis_base=(output_dir, "before", batch_idx) if visualize else None)
    before = results[best]
    entry = rd[best]
    pose = entry["poses_cam"].copy()
    camK5 = np.asarray(sample["K_cv2"])[:, :5]
    if visualize:
        visualize_360(model, vr, entry, camK5, cfg, output_dir,
                      "before", batch_idx)
        vis_pose_frusta(entry, entry["poses_cam"], cfg, output_dir,
                   "before", batch_idx)
    if visualize_all:
        visualize_360_all(model, vr, entry, camK5, cfg, output_dir,
                          "before_all", batch_idx)

    if use_sync:
        try:
            pose_sync = sync_pose(rd, best, cfg, backend=sync_backend)
            gt = np.asarray(entry["gt_poses"]).reshape(-1, 4, 4)[1:]
            gt_q = np.asarray(mat2quat(jnp.asarray(gt)))
            rot_sync, _ = M.pose_errors_capped(pose_sync, gt_q)
            if rot_sync < before["rot_error"]:
                pose = pose_sync
        except Exception as e:  # reference: try/except fallback (:72-78)
            print(f"{batch_idx} fail to sync poses: {e}")

    perm = entry["permutation"]
    clips = np.asarray(sample["images"][:, :5])
    return {
        "batch_idx": batch_idx, "sample": sample, "seen": seen,
        "entry": entry, "best": best, "before": before, "pose": pose,
        "camK5": camK5, "rd": rd,
        "target_imgs": clips[:, perm],
        "target_masks": np.asarray(
            sample["fg_probabilities"][:, :5])[:, perm],
        "camK": np.asarray(sample["K_cv2"][:, :5]),
    }


def _candidate_ctxs(ctx):
    """Multi-start refinement candidates: one context per canonical
    permutation from predict_initial (the best-by-rot candidate keeps its
    possibly-synced pose). The winner is selected AFTER refinement by final
    photometric loss against the input views — no ground truth involved —
    so this is a pure test-time-compute extension of the reference's
    refine-the-best-candidate flow (kubric_eval.py:412-530)."""
    sample = ctx["sample"]
    clips = np.asarray(sample["images"][:, :5])
    masks = np.asarray(sample["fg_probabilities"][:, :5])
    out = []
    for cid in sorted(ctx["rd"].keys(), key=int):
        entry = ctx["rd"][cid]
        perm = entry["permutation"]
        c = dict(ctx)
        c["entry"] = entry
        c["best"] = cid
        c["pose"] = (ctx["pose"] if cid == ctx["best"]
                     else entry["poses_cam"].copy())
        c["target_imgs"] = clips[:, perm]
        c["target_masks"] = masks[:, perm]
        out.append(c)
    return out


def _refine_window(refiner, vr, ctxs, n_refine_chunks, pad_to=None):
    """Refine one or more instances' poses in a single batched scan.

    The refinement graph is batch-parallel over instances (features_raw
    stacks on the batch axis, pose vectors on their leading axis) while the
    eval loader is batch=1 per the reference (kubric_eval.py:626-635) —
    batching here amortizes the per-iteration fuse/decode/render cost, which
    at b=1 under-occupies the MXU. pad_to repeats the last instance so every
    window compiles at one shape. Returns per-instance refined pose arrays.
    """
    n = len(ctxs)
    pads = (pad_to or n) - n
    cx = ctxs + [ctxs[-1]] * pads
    feats = jnp.concatenate(
        [jnp.asarray(c["entry"]["features_raw"]) for c in cx], axis=0)
    cur = jnp.concatenate([jnp.asarray(c["pose"]) for c in cx], axis=0)
    camK = jnp.concatenate([jnp.asarray(c["camK"]) for c in cx], axis=0)
    timgs = jnp.concatenate(
        [jnp.asarray(c["target_imgs"]) for c in cx], axis=0)
    tmasks = jnp.concatenate(
        [jnp.asarray(c["target_masks"]) for c in cx], axis=0)
    opt_state = None
    rm = {}
    for _ in range(n_refine_chunks):
        cur, rm, opt_state = refiner(
            vr, cur, feats, camK, timgs, tmasks, opt_state)
    refined = np.asarray(cur)
    per = refined.reshape(len(cx), -1, refined.shape[-1])
    if "loss_last_per" in rm:
        losses = np.broadcast_to(
            np.asarray(rm["loss_last_per"]), (len(cx),))[:n]
    else:
        # user-supplied refiner without per-instance losses: selection by
        # loss is impossible — callers that need it (multistart) must check
        losses = None
    return [per[i] for i in range(n)], losses


def _post_instance(model, vr, ctx, refined, cfg, renderer, lpips_fn,
                   visualize, visualize_all, output_dir, outfile, pose_log,
                   lpips_label: str = "lpips"):
    """Evaluate(after) + visualization + results.txt/pose_log writes."""
    batch_idx, sample, entry = ctx["batch_idx"], ctx["sample"], ctx["entry"]
    entry_after = dict(entry)
    entry_after["poses_cam"] = refined
    after = evaluate_canonical(
        model, vr, sample, entry_after, cfg,
        renderer=renderer, lpips_fn=lpips_fn,
        vis=((output_dir, "after", batch_idx, ctx["best"])
             if visualize else None))
    if visualize:
        visualize_360(model, vr, entry_after, ctx["camK5"], cfg,
                      output_dir, "after", batch_idx)
        vis_pose_frusta(entry, refined, cfg, output_dir, "after", batch_idx)
    if visualize_all:
        visualize_360_all(model, vr, entry_after, ctx["camK5"], cfg,
                          output_dir, "after_all", batch_idx)

    with open(outfile, "a+") as f:
        for name, r in (("before", ctx["before"]), ("after", after)):
            f.write(
                "idx {}, seen {}, {}, psnr {}, ssim {}, {} {}, rot {}, "
                "trans {}, depth {}\n".format(
                    batch_idx, ctx["seen"], name, r["psnr"], r["ssim"],
                    lpips_label, r["lpips"], r["rot_error"],
                    r["trans_error"], r["depth_error"])
            )
    pose_log[batch_idx] = {
        "before": entry["poses_cam"], "after": refined,
        "gt": np.asarray(entry["gt_poses"]),
    }


def _run_instance(model, variables, vr, sample, cfg, batch_idx, seen,
                  encode, renderer, refiner, n_refine_chunks, lpips_fn,
                  use_sync, visualize, output_dir, outfile, pose_log,
                  lpips_label: str = "lpips", visualize_all: bool = False,
                  sync_backend: str = "host", multistart: bool = False):
    """One eval instance: predict -> evaluate -> sync -> refine -> evaluate.

    Split out of run_optimization so a device failure anywhere in the
    instance can be retried as a unit (all device state it needs is
    re-derivable from the host-side `sample`).

    multistart=True refines ALL canonical-permutation candidates in one
    batched scan and keeps the lowest final photometric loss (see
    _candidate_ctxs).
    """
    ctx = _pre_instance(
        model, variables, vr, sample, cfg, batch_idx, seen, encode,
        renderer, lpips_fn, use_sync, visualize, visualize_all, output_dir,
        sync_backend=sync_backend)
    if multistart:
        cands = _candidate_ctxs(ctx)
        refined_list, losses = _refine_window(
            refiner, vr, cands, n_refine_chunks)
        if losses is None:
            raise ValueError(
                "refine_multistart needs a refiner reporting per-instance "
                "final losses (metrics key 'loss_last_per'); the supplied "
                "refiner does not")
        win = int(np.argmin(losses))
        ctx, refined = cands[win], refined_list[win]
    else:
        refined = _refine_window(refiner, vr, [ctx], n_refine_chunks)[0][0]
    _post_instance(
        model, vr, ctx, refined, cfg, renderer, lpips_fn, visualize,
        visualize_all, output_dir, outfile, pose_log,
        lpips_label=lpips_label)
