"""Attribute the flagship JOINT train step's non-render time (VERDICT r3 #1).

Round-3 bench: train_step_ms_b4 = 1430 ms while the 40-camera fused render
fwd+bwd is only ~360 ms — ~75% of the step was never attributed op-by-op.
This probe times every stage of the joint graph fwd+bwd at b=4 on the chip
(relay-safe distinct-input protocol), plus the optimizer update alone and the
full step, so the residual (dispatch/fusion overhead) is pinned down.

Usage: python experiments/joint_step_probe.py [b] [backend]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.config import merge_config, update_config
from forge_tpu.models import TrainFlags, build_model
from forge_tpu.train import create_train_state, get_curriculum_step, make_train_step
from _timing import chip_time, perturb_tree

RESULTS = {}


def report(name, fn, args, n=3):
    args_list = [tuple(perturb_tree(a, i) for a in args) for i in range(n)]
    try:
        dt = chip_time(fn, args_list)
        RESULTS[name] = dt * 1e3
        print(f"{name:28s}: {dt*1e3:9.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: failed {e}"[:250], flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = update_config("configs/kubric/joint_pose_2d3d.yaml")
    if len(sys.argv) > 2:
        cfg = merge_config(cfg, {"render": {"backend": sys.argv[2]}})
    print(f"b={b} backend={cfg.render.backend}", flush=True)
    model = build_model(cfg)
    step_def = get_curriculum_step("full", "joint")
    sample = jax.device_put(ge.synthetic_sample(cfg, b=b, t_all=10))
    variables = ge.bench_variables(model, sample)

    # ---- full joint step (the bench number) ----
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, tx = create_train_state(
            model, cfg, jax.tree.map(lambda x: x[:1], jax.device_get(sample)),
            jax.random.PRNGKey(0), step_def)
    state = jax.device_put(state, jax.devices()[0])
    train_step = jax.jit(make_train_step(model, cfg, step_def, tx))

    def full(s, r):
        _, metrics = train_step(state, s, r, 0)
        return metrics

    report("FULL joint step", full, (sample, jax.random.PRNGKey(1)))

    # loss-forward only (no backward, no optimizer): how much of the step
    # is the forward graph vs AD + update
    import forge_tpu.train.losses as L

    def fwd_loss(v, s, r):
        outs, _ = model.apply(
            v, s, step_def.flags, method=model.forward_full,
            mutable=["batch_stats"], rngs={"dropout": r})
        imgs, masks, origin_proj, cam_pose_return = outs
        loss, _ = L.all_loss_nvs(cfg, imgs, masks, origin_proj,
                                 cam_pose_return, s, None)
        return loss

    report("FULL fwd (loss only)", jax.jit(fwd_loss),
           (variables, sample, jax.random.PRNGKey(1)))

    clips5 = jnp.asarray(sample["images"][:, :5])

    # ---- encode (20 ResNet passes + Conv3d lift) ----
    def enc(v, c):
        return model.apply(v, c, True,
                           method=lambda m, cc, t: m.encode_views(cc, t),
                           mutable=["batch_stats"])[0]

    def enc_loss(v, c):
        return jnp.sum(jnp.square(enc(v, c)))

    report("encode fwd", jax.jit(enc), (variables, clips5))
    report("encode fwd+bwd", jax.jit(jax.grad(enc_loss)), (variables, clips5))

    feats = jax.jit(lambda v, c: model.apply(
        v, c, False, method=lambda m, cc, t: m.encode_views(cc, t))
    )(variables, clips5)

    # ---- pose estimators (3d: 4096^2 attention; 2d: FPN + perceiver) ----
    def p3d(v, f):
        return model.apply(
            v, f, method=lambda m, ff: m.encoder_traj(
                ff, True, return_features=True),
            mutable=["batch_stats"])[0]

    def p3d_loss(v, f):
        return jnp.sum(jnp.square(p3d(v, f)))

    report("pose3d fwd", jax.jit(p3d), (variables, feats))
    report("pose3d fwd+bwd", jax.jit(jax.grad(p3d_loss, argnums=(0, 1))),
           (variables, feats))

    def p2d(v, c):
        return model.apply(
            v, c, method=lambda m, cc: m.encoder_traj_2d(
                cc, True, return_features=True),
            mutable=["batch_stats"])[0]

    def p2d_loss(v, c):
        return jnp.sum(jnp.square(p2d(v, c)))

    report("pose2d fwd", jax.jit(p2d), (variables, clips5))
    report("pose2d fwd+bwd", jax.jit(jax.grad(p2d_loss, argnums=(0, 1))),
           (variables, clips5))

    # ---- rotate (SE(3) resample of 5 volumes) ----
    poses = jnp.asarray(sample["cam_poses_cv2_canonicalized"][:, :5])

    def rot(f, p):
        from forge_tpu.ops.voxel import rotate_voxel_grids

        return rotate_voxel_grids(f, p, cfg.render.volume_size)

    def rot_loss(f, p):
        return jnp.sum(jnp.square(rot(f, p)))

    report("rotate fwd", jax.jit(rot), (feats, poses))
    report("rotate fwd+bwd", jax.jit(jax.grad(rot_loss, argnums=(0, 1))),
           (feats, poses))

    # ---- fuse + decode heads ----
    def fuse(v, f):
        out = model.apply(
            v, f, TrainFlags(encoder_3d=True, fusion=True,
                             density_head=True, features_head=True),
            method=lambda m, ff, fl: m.fuse_and_decode(ff, fl),
            mutable=["batch_stats"])
        return out[0]

    def fuse_loss(v, f):
        feat, dens = fuse(v, f)
        return jnp.sum(jnp.square(feat)) + jnp.sum(dens)

    report("fuse+decode fwd", jax.jit(fuse), (variables, feats))
    report("fuse+decode fwd+bwd", jax.jit(jax.grad(fuse_loss, argnums=(0, 1))),
           (variables, feats))

    # ---- render 2t views/elem (the joint NVS graph renders t_all = 10) ----
    feat_vol, dens_vol = jax.jit(fuse)(variables, feats)
    camE = jnp.asarray(sample["cam_extrinsics_cv2_canonicalized"]).reshape(
        b * 10, 4, 4)
    camK = jnp.asarray(sample["K_cv2"]).reshape(b * 10, 3, 3)

    def rend(v, f, d):
        out = model.apply(
            v, f, d, camE, camK, TrainFlags(conv_rgb=True),
            method=lambda m, ff, dd, ee, kk, fl: m.render_views(
                ff, dd, ee, kk, fl),
            mutable=["batch_stats"])
        return out[0]

    def rend_loss(v, f, d):
        imgs, masks = rend(v, f, d)[:2]
        return jnp.sum(jnp.square(imgs)) + jnp.sum(masks)

    report(f"render{b*10} fwd", jax.jit(rend), (variables, feat_vol, dens_vol))
    report(f"render{b*10} fwd+bwd",
           jax.jit(jax.grad(rend_loss, argnums=(0, 1, 2))),
           (variables, feat_vol, dens_vol))

    # ---- optimizer update alone (grads = params-shaped noise) ----
    grads = jax.tree.map(lambda p: p * 1e-3, state.params)

    def opt(g, p, os_):
        import optax

        updates, new_os = tx.update(g, os_, p)
        return optax.apply_updates(p, updates), new_os

    report("optimizer update", jax.jit(opt),
           (grads, state.params, state.opt_state))

    known = sum(RESULTS.get(k, 0.0) for k in RESULTS
                if k.endswith("fwd+bwd") or k == "optimizer update")
    full_ms = RESULTS.get("FULL joint step")
    if full_ms:
        print(f"\nsum of stage fwd+bwd + opt: {known:9.1f} ms")
        print(f"FULL step:                  {full_ms:9.1f} ms")
        print(f"residual (loss/dispatch/fusion-overlap): "
              f"{full_ms - known:9.1f} ms")


if __name__ == "__main__":
    main()
