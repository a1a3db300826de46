"""Trace the b=4 joint train step and attribute device time op-by-op.

joint_step_probe's stage decomposition leaves a ~284 ms residual at b=4
(OPTIMIZATION.md round-5 #5) that only an op-level trace can attribute:
this captures a jax.profiler device trace of 3 steady-state steps and
prints the top HLO ops by self time from xprof's hlo_stats.

Usage: python experiments/step_trace.py [b] [trace_dir]
"""

import glob
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax

import __graft_entry__ as ge
from forge_tpu.config import update_config
from forge_tpu.models import build_model
from forge_tpu.train import (
    create_train_state, get_curriculum_step, make_train_step)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_trace"
    cfg = update_config("configs/kubric/joint_pose_2d3d.yaml")
    model = build_model(cfg)
    sample = jax.device_put(ge.synthetic_sample(cfg, b=b, t_all=10))
    step_def = get_curriculum_step("full", "joint")
    with jax.default_device(jax.devices("cpu")[0]):
        state, tx = create_train_state(
            model, cfg, sample, jax.random.PRNGKey(0), step_def)
    state = jax.device_put(state, jax.devices()[0])
    train_step = jax.jit(make_train_step(model, cfg, step_def, tx),
                         donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    for _ in range(2):   # compile + warm
        state, m = train_step(state, sample, rng, 0)
    jax.block_until_ready(m)
    with jax.profiler.trace(tdir):
        for _ in range(3):
            state, m = train_step(state, sample, rng, 0)
        jax.block_until_ready(m)
    # force a readback (relay: block_until_ready does not synchronize)
    print("loss", float(m["loss"]))

    # ---- parse: top ops by self time (xprof hlo_stats / op_profile) ----
    runs = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*")))
    print("trace dir:", runs[-1] if runs else tdir)
    try:
        from xprof.convert import raw_to_tool_data as rtd

        xspaces = glob.glob(os.path.join(runs[-1], "*.xplane.pb"))
        data, _ = rtd.xspace_to_tool_data(xspaces, "hlo_stats", {})
        import json

        # xprof returns the hlo_stats table as gviz JSON
        # ({"cols":[{label,...}],"rows":[{"c":[{"v":...},...]}]})
        obj = json.loads(data.decode() if isinstance(data, bytes) else data)
        cols = [c["label"] for c in obj["cols"]]
        i_cat = cols.index("HLO op category")
        i_name = cols.index("HLO op name")
        i_t = cols.index("Total self time (us)")
        i_occ = cols.index("#Occurrences")
        body = [[c.get("v") if c else None for c in r["c"]]
                for r in obj["rows"]]
        body.sort(key=lambda r: -float(r[i_t] or 0))
        tot = sum(float(r[i_t] or 0) for r in body)
        print(f"\ntotal device self time: {tot/1e3:.1f} ms over 3 steps "
              f"({tot/3e3:.1f} ms/step)")
        agg = {}
        for r in body:
            cat = str(r[i_cat])
            agg[cat] = agg.get(cat, 0.0) + float(r[i_t] or 0)
        print("\nby category (ms/step):")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {k:40s} {v/3e3:9.2f}")
        print("\ntop 25 ops (ms/step):")
        for r in body[:25]:
            print(f"  {float(r[i_t])/3e3:8.2f}  x{int(float(r[i_occ] or 0))}"
                  f"  {str(r[i_name])[:100]}")
    except Exception as e:
        print(f"xprof parse failed ({e}); raw trace left in {tdir}")


if __name__ == "__main__":
    main()
