"""Bisect the composed-graph cliff INSIDE the GT-pose train step.

Round-2 table (OPTIMIZATION.md): every pairwise composition is healthy
(0.05-2 s) but encode->rotate->fuse->decode->render grad = 35 s at b=4
(40 cameras), and removing rotate / stop-gradienting encode changes nothing.
This probe reconstructs the real forward_single tail FROM ALIGNED VOXELS
(feats_t as an argument) and toggles pieces to find the cliff's minimal
reproducer.

Usage: python experiments/cliff_bisect.py [case ...]   (default: all)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.config import update_config, merge_config
from forge_tpu.models import build_model, TrainFlags
from _timing import chip_time, perturb_tree

B = 4
T = 5


def build(case):
    cfg = update_config("configs/kubric/gt_pose.yaml")
    if "bf16" in case:
        cfg = merge_config(cfg, {"render": {"backend": "pallas"}})
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=B, t_all=10)
    variables = ge.zeros_variables(model, sample)
    # sane BN stats
    from flax.core import FrozenDict
    variables = dict(variables)
    if "batch_stats" in variables:
        variables["batch_stats"] = jax.tree_util.tree_map_with_path(
            lambda p, t: jnp.ones(t.shape, t.dtype) if "var" in str(p[-1])
            else jnp.zeros(t.shape, t.dtype), variables["batch_stats"])

    rng = np.random.RandomState(0)
    feats_t = jnp.asarray(rng.rand(B, T, 32, 32, 32, 128).astype(np.float32))

    camE = jnp.asarray(sample["cam_extrinsics_cv2_canonicalized"][:, :T])
    camK = jnp.asarray(sample["K_cv2"][:, :T])
    target = jnp.asarray(sample["images"][:, :T])

    flags = TrainFlags.all()

    def cam_dict(extr, Km):
        n = extr.shape[1]
        e = extr.reshape(B * n, 4, 4)
        return {"R": e[..., :3, :3], "T": e[..., :3, 3],
                "K": Km.reshape(B * n, 3, 3)}

    def tail(params, feats_t, mode):
        v = dict(variables)
        v["params"] = params

        def apply(method, *a, **kw):
            out = model.apply(
                v, *a, method=method, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)}, **kw)
            return out[0]

        fuse = lambda ft: apply(
            lambda m, x, f: m.fuse_and_decode(x, f), ft, flags)
        march = lambda cams, fe, de: apply(
            lambda m, c, f, d: m.render.march(c, f, d), cams, fe, de)

        if "remat_fuse" in mode:
            fuse = jax.checkpoint(fuse)

        if "mv_only" in mode:
            feat_mv, dens_mv = fuse(feats_t)
            raw = march(cam_dict(camE, camK), feat_mv, dens_mv)
        elif "fuse1_render3" in mode:
            feat_mv, dens_mv = fuse(feats_t)
            raw = jnp.concatenate([
                march(cam_dict(camE[:, :3], camK[:, :3]), feat_mv, dens_mv),
                march(cam_dict(camE[:, 3:], camK[:, 3:]), feat_mv, dens_mv),
                march(cam_dict(camE, camK), feat_mv, dens_mv)], axis=0)
        else:  # full: 3 fusions, 3 grouped marches (the real tail)
            feat_3v, dens_3v = fuse(feats_t[:, :3])
            feat_2v, dens_2v = fuse(feats_t[:, -2:])
            feat_mv, dens_mv = fuse(feats_t)
            raw = jnp.concatenate([
                march(cam_dict(camE[:, :3], camK[:, :3]), feat_2v, dens_2v),
                march(cam_dict(camE[:, 3:], camK[:, 3:]), feat_3v, dens_3v),
                march(cam_dict(camE, camK), feat_mv, dens_mv)], axis=0)

        if "no_decode" in mode:
            return jnp.mean(raw ** 2)
        camE_2t = jnp.tile(camE, (1, 2, 1, 1)).reshape(B * 2 * T, 4, 4)
        camK_2t = jnp.tile(camK, (1, 2, 1, 1)).reshape(B * 2 * T, 3, 3)
        cams_2t = {"R": camE_2t[..., :3, :3], "T": camE_2t[..., :3, 3],
                   "K": camK_2t}
        imgs, masks = apply(
            lambda m, r, c, tr: m.render.finish(r, c, tr), raw, cams_2t,
            flags.conv_rgb)[:2]
        tgt = jnp.tile(target, (1, 2, 1, 1, 1)).reshape(imgs.shape)
        return jnp.mean((imgs - tgt) ** 2) + jnp.mean(masks ** 2)

    def loss_and_grad(params, feats_t, mode):
        l, g = jax.value_and_grad(lambda p: tail(p, feats_t, mode))(params)
        # reduce the gradient so the fetch is tiny
        return l + sum(jnp.sum(x) * 0.0 for x in jax.tree_util.tree_leaves(g))

    return variables["params"], feats_t, loss_and_grad


CASES = [
    "full",                 # real tail: 3 fusions + 3 grouped marches + decode
    "full+remat_fuse",
    "full+no_decode",       # drop conv_rgb finish
    "mv_only",              # 1 fusion, 1 grouped march (20 cams)
    "fuse1_render3",        # 1 fusion feeding all 3 march groups
]


def main():
    cases = sys.argv[1:] or CASES
    for case in cases:
        params, feats_t, fn = build(case)
        jf = jax.jit(lambda p, f: fn(p, f, case))
        t0 = time.time()
        args = [(params, perturb_tree(feats_t, i)) for i in range(2)]
        try:
            dt = chip_time(jf, args, warmup=1)
            print(f"{case:24s} compile+warm {time.time()-t0:6.1f}s "
                  f"step {dt:7.3f}s", flush=True)
        except Exception as e:
            print(f"{case:24s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
