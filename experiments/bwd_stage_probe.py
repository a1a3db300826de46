"""Per-stage fwd+bwd timing of the GT-pose training graph at batch 4."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.config import update_config
from forge_tpu.models import build_model, TrainFlags
from _timing import chip_time, perturb_tree


def report(name, fn, args, n=3):
    args_list = [tuple(perturb_tree(a, i) for a in args) for i in range(n)]
    try:
        dt = chip_time(fn, args_list)
        print(f"{name:24s}: {dt*1e3:9.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:24s}: failed {e}"[:250], flush=True)


def main():
    cfg = update_config("configs/kubric/gt_pose.yaml")
    b = 4
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=b, t_all=10)
    variables = ge.zeros_variables(model, sample)
    clips = jnp.asarray(sample["images"][:, :5])

    # encode fwd+bwd (train-mode BN)
    def enc_loss(v, c):
        f = model.apply(v, c, True,
                        method=lambda m, cc, t: m.encode_views(cc, t),
                        mutable=["batch_stats"])[0]
        return jnp.sum(f * f)

    report("encode fwd", jax.jit(lambda v, c: model.apply(
        v, c, True, method=lambda m, cc, t: m.encode_views(cc, t),
        mutable=["batch_stats"])[0]), (variables, clips))
    report("encode fwd+bwd", jax.jit(jax.grad(enc_loss)), (variables, clips))

    feats = jax.jit(lambda v, c: model.apply(
        v, c, False, method=lambda m, cc, t: m.encode_views(cc, t))
    )(variables, clips)

    # fuse+decode fwd / fwd+bwd (train mode, mutable BN)
    def fuse_apply(v, f):
        out = model.apply(
            v, f, TrainFlags(encoder_3d=True, fusion=True,
                             density_head=True, features_head=True),
            method=lambda m, ff, fl: m.fuse_and_decode(ff, fl),
            mutable=["batch_stats"])
        return out[0]

    def fuse_loss(v, f):
        feat, dens = fuse_apply(v, f)
        return jnp.sum(feat * feat) + jnp.sum(dens)

    report("fuse+decode fwd", jax.jit(fuse_apply), (variables, feats))
    report("fuse+decode fwd+bwd", jax.jit(jax.grad(fuse_loss)),
           (variables, feats))

    # render 40 cams fwd+bwd through the module (remat + decode)
    feat_vol, dens_vol = jax.jit(fuse_apply)(variables, feats)
    n_cams = 40
    camE = jnp.asarray(np.tile(
        np.asarray(sample["cam_extrinsics_cv2_canonicalized"]).reshape(
            b * 10, 4, 4), (1, 1, 1)))
    camK = jnp.asarray(np.asarray(sample["K_cv2"]).reshape(b * 10, 3, 3))
    feat_all = jnp.broadcast_to(
        feat_vol[:, None], (b, 10) + feat_vol.shape[1:]).reshape(
        (n_cams,) + feat_vol.shape[1:])
    dens_all = jnp.broadcast_to(
        dens_vol[:, None], (b, 10) + dens_vol.shape[1:]).reshape(
        (n_cams,) + dens_vol.shape[1:])

    def rend_apply(v, f, d):
        out = model.apply(
            v, f, d, camE, camK,
            TrainFlags(conv_rgb=True),
            method=lambda m, ff, dd, ee, kk, fl: m.render_views(
                ff, dd, ee, kk, fl),
            mutable=["batch_stats"])
        return out[0]

    def rend_loss(v, f, d):
        imgs, masks = rend_apply(v, f, d)[:2]
        return jnp.sum(imgs * imgs) + jnp.sum(masks)

    report("render40 fwd", jax.jit(rend_apply), (variables, feat_all, dens_all))
    report("render40 fwd+bwd", jax.jit(jax.grad(rend_loss, argnums=(0, 1, 2))),
           (variables, feat_all, dens_all))


if __name__ == "__main__":
    main()
