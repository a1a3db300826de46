"""Per-stage timing of the flagship forward on one TPU chip.

Splits the forward into encode / pose3d / pose2d / rotate / fuse+decode /
render using the honest relay-safe protocol in _timing.py.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.models import build_model, TrainFlags
from _timing import chip_time, perturb_tree

N = 4


def report(name, fn, base_args):
    args_list = [tuple(perturb_tree(a, i) for a in base_args)
                 for i in range(N)]
    try:
        dt = chip_time(fn, args_list)
        print(f"{name:18s}: {dt*1e3:8.1f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name:18s}: failed {e}"[:250], flush=True)
        return 0.0


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    cfg = ge.flagship_config(backend=backend)
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=1, t_all=10)
    variables = ge.zeros_variables(model, sample)
    flags = TrainFlags.none()
    clips = jnp.asarray(sample["images"][:, :5])

    full = jax.jit(lambda s: model.apply(variables, s, flags))
    t_full = report("full forward", full, (sample,))

    enc = jax.jit(lambda c: model.apply(
        variables, c, False, method=lambda m, cc, t: m.encode_views(cc, t)))
    t_enc = report("encode 5 views", enc, (clips,))
    feats = enc(clips)

    p3d = jax.jit(lambda f: model.apply(
        variables, f, False,
        method=lambda m, ff, t: m.encoder_traj(ff, t, True)))
    t_p3d = report("pose3d 4096-attn", p3d, (feats,))

    p2d = jax.jit(lambda c: model.apply(
        variables, c, False,
        method=lambda m, cc, t: m.encoder_traj_2d(cc, t, True)))
    t_p2d = report("pose2d FPN", p2d, (clips,))

    from forge_tpu.ops.voxel import rotate_voxel_grids

    poses = jnp.asarray(sample["cam_poses_cv2_canonicalized"][:, :5])
    rot = jax.jit(lambda f, p: rotate_voxel_grids(
        f, p, cfg.render.volume_size))
    t_rot = report("rotate", rot, (feats, poses))
    feats_t = rot(feats, poses)

    fuse = jax.jit(lambda f: model.apply(
        variables, f, False,
        method=lambda m, ff, t: m.fuse_and_decode(ff, TrainFlags.none())))
    t_fuse = report("fuse+decode", fuse, (feats_t,))
    feat_vol, dens_vol = fuse(feats_t)

    camE = jnp.asarray(
        sample["cam_extrinsics_cv2_canonicalized"]).reshape(10, 4, 4)
    camK = jnp.asarray(sample["K_cv2"]).reshape(10, 3, 3)
    feat_all = jnp.broadcast_to(
        feat_vol[:, None], (1, 10) + feat_vol.shape[1:]).reshape(
        (10,) + feat_vol.shape[1:])
    dens_all = jnp.broadcast_to(
        dens_vol[:, None], (1, 10) + dens_vol.shape[1:]).reshape(
        (10,) + dens_vol.shape[1:])
    rend = jax.jit(lambda f, d, e: model.apply(
        variables, f, d, e, camK, TrainFlags.none(),
        method=lambda m, ff, dd, ee, kk, fl: m.render_views(ff, dd, ee, kk, fl)))
    t_rend = report("render 10 views", rend, (feat_all, dens_all, camE))

    rest = t_full - (t_enc + t_p3d + t_p2d + t_rot + t_fuse + t_rend)
    print(f"{'unattributed':18s}: {rest*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
