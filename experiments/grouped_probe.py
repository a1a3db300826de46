"""On-chip validation + timing of grouped (cams_per_volume) rendering.

Stages (run any subset: python experiments/grouped_probe.py parity fwd train4):
  parity  — grouped vs broadcast forward + grad on the real Mosaic kernel
  fwd     — flagship eval forward b=1/b=4 (grouped render path)
  train4  — GT-pose train step at b=4 (the composed-graph cliff case:
            35 s before grouping, OPTIMIZATION.md round 2)
  joint4  — joint train step at b=4
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.config import update_config
from forge_tpu.models import build_model, TrainFlags
from forge_tpu.utils.chiptime import chip_time, perturb_tree


def stage_parity():
    from forge_tpu.ops import ray_march_pallas as rp
    from forge_tpu.ops.ray_march import render_volume_xla

    rng = np.random.RandomState(11)
    S, img, V, cpv = 64, 32, 2, 3
    B = V * cpv
    feats = jnp.asarray(rng.rand(V, S, S, S, 16).astype(np.float32))
    dens = jnp.asarray((rng.rand(V, S, S, S, 1) * 0.3).astype(np.float32))
    f = 70.0
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    Rm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t = jnp.asarray(
        np.tile(np.array([0, 0, 1.5], np.float32), (B, 1))
        + 0.01 * rng.randn(B, 3).astype(np.float32))
    # n_pts=64 keeps the per-sample advance ~1.5 voxels (the kernel's brick
    # margins assume flagship sample spacing; 16 pts at S=64 violates them)
    kw = (img, 64, 0.5, 2.0, 1.0)

    def loss_g(fe, de, tt):
        return jnp.sum(rp.render_volume_pallas_grad(fe, de, K, Rm, tt, *kw, cpv) ** 2)

    def loss_b(fe, de, tt):
        fb = jnp.repeat(fe, cpv, axis=0)
        db = jnp.repeat(de, cpv, axis=0)
        return jnp.sum(rp.render_volume_pallas_grad(fb, db, K, Rm, tt, *kw, 1) ** 2)

    gg = jax.jit(jax.grad(loss_g, argnums=(0, 1, 2)))(feats, dens, t)
    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1, 2)))(feats, dens, t)
    for name, a, b in zip(("d_feat", "d_dens", "d_t"), gg, gb):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        print(f"parity {name}: rel err {err:.2e}", flush=True)
        assert err < 2e-2, (name, err)
    # value vs xla reference
    outg = jax.jit(lambda fe, de: rp.render_volume_pallas_grad(
        fe, de, K, Rm, t, *kw, cpv))(feats, dens)
    ref = render_volume_xla(jnp.repeat(feats, cpv, 0), jnp.repeat(dens, cpv, 0),
                            K, Rm, t, image_size=img, n_pts_per_ray=64,
                            min_depth=0.5, max_depth=2.0, volume_size=1.0)
    err = np.abs(np.asarray(outg) - np.asarray(ref)).max()
    print(f"parity fwd vs xla: max abs {err:.3e}", flush=True)
    assert err < 0.05
    print("parity OK", flush=True)


def stage_fwd():
    for b in (1, 4):
        cfg = ge.flagship_config(backend="pallas")
        model = build_model(cfg)
        sample = ge.synthetic_sample(cfg, b=b, t_all=10)
        variables = ge.zeros_variables(model, sample)
        fn = jax.jit(lambda s: model.apply(variables, s, TrainFlags.none()))
        args = [(perturb_tree(sample, i),) for i in range(3)]
        dt = chip_time(fn, args)
        print(f"fwd b={b}: {dt*1e3:.1f} ms  ({b/dt:.2f} obj/s)", flush=True)


def _train_step_time(cfg_path, family, b):
    from forge_tpu.train import (
        create_train_state, make_train_step, get_curriculum_step)

    cfg = update_config(cfg_path)
    model = build_model(cfg)
    step_def = get_curriculum_step(family, cfg.train.parameter)
    sample = ge.synthetic_sample(cfg, b=b, t_all=10)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, tx = create_train_state(
            model, cfg, jax.tree.map(lambda x: x[:1], sample),
            jax.random.PRNGKey(0), step_def)
    state = jax.device_put(state, jax.devices()[0])
    train_step = jax.jit(make_train_step(model, cfg, step_def, tx))
    rng = jax.random.PRNGKey(1)

    def run(s):
        _, metrics = train_step(state, s, rng, 0)
        return metrics

    t0 = time.time()
    args = [(perturb_tree(jax.device_put(sample), i),) for i in range(3)]
    dt = chip_time(run, args)
    print(f"{family}/{cfg.train.parameter} b={b}: {dt*1e3:.0f} ms/step "
          f"(incl. first-call compile {time.time()-t0:.0f}s total)", flush=True)


def stage_train4():
    _train_step_time("configs/kubric/gt_pose.yaml", "single", 4)


def stage_joint4():
    _train_step_time("configs/kubric/joint_pose_2d3d.yaml", "full", 4)


def stage_joint1():
    _train_step_time("configs/kubric/joint_pose_2d3d.yaml", "full", 1)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["parity", "fwd"]
    for s in stages:
        print(f"=== {s} ===", flush=True)
        globals()[f"stage_{s}"]()
