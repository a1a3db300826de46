"""Diagnose the GT-pose curriculum step cost: device step vs H2D vs D2H."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from forge_tpu.config import update_config, merge_config
from forge_tpu.models import build_model
from forge_tpu.train import create_train_state, make_train_step, get_curriculum_step
from _timing import chip_time, perturb_tree


def main():
    cfg = update_config("configs/kubric/gt_pose.yaml")
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    if len(sys.argv) > 2:  # render backend override: xla | packed | pallas
        cfg = merge_config(cfg, {"render": {"backend": sys.argv[2]}})
    print(f"b={b} backend={cfg.render.backend}", flush=True)
    model = build_model(cfg)
    step_def = get_curriculum_step("single", cfg.train.parameter)
    sample = ge.synthetic_sample(cfg, b=b, t_all=10)

    t0 = time.time()
    state, tx = create_train_state(
        model, cfg, jax.tree.map(lambda x: x[:1], sample),
        jax.random.PRNGKey(0), step_def)
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    # H2D of one batch
    t0 = time.time()
    dev = jax.device_put(sample)
    jax.block_until_ready(dev)
    # force with a readback of one element per leaf
    for leaf in jax.tree_util.tree_leaves(dev):
        np.asarray(leaf[tuple(0 for _ in leaf.shape)])
    nbytes = sum(np.asarray(l).nbytes if hasattr(l, 'nbytes') else 0
                 for l in jax.tree_util.tree_leaves(sample))
    print(f"H2D batch ({nbytes/1e6:.0f} MB): {time.time()-t0:.2f}s",
          flush=True)

    # device step time (relay-safe)
    train_step = jax.jit(make_train_step(model, cfg, step_def, tx))
    rng = jax.random.PRNGKey(1)

    def run(s):
        _, metrics = train_step(state, s, rng, 0)
        return metrics

    args_list = [(perturb_tree(dev, i),) for i in range(3)]
    dt = chip_time(run, args_list)
    print(f"train step device time (b={b}): {dt:.2f}s", flush=True)

    # checkpoint-sized D2H
    t0 = time.time()
    host = jax.device_get(state.params)
    nb = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(host))
    print(f"D2H params ({nb/1e6:.0f} MB): {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
