"""Benchmark: flagship FORGE throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: 5-view objects/sec for the full eval-style forward (encode 5
views -> predict poses -> rotate -> fuse -> decode -> render 10 views at
256^2, 64 samples/ray = 10.5M ray-samples/object, BASELINE.md:22). Both
renderer backends ('packed' corner-packed gather, 'pallas' fused kernel) are
timed; the headline is the best.

extras additionally report the two hot backward paths (VERDICT round 1 #9):
  - refine_ms_per_iter: one test-time pose-optimization step (Adam through
    the frozen fuse+render graph, reference kubric_eval.py:450-527)
  - train_step_ms: one full joint train step (loss + backward + optimizer),
    batch 1, reference scripts/kubric_trainer.py

vs_baseline compares per-chip against the reference's derived per-A40
eval-forward throughput of 10 obj/s (grounded in the reference's ONLY
published throughput anchor: 200k train steps/day at global batch 32 on
8xA40 -> 9.3 train-obj/s/A40 fwd+bwd; forward-only ~3x, batch-1 eager
penalty ~3x -> ~10 eval-obj/s/A40 -- full derivation in BASELINE.md).
The round-1/2 estimate (2.5 obj/s, ~4x too generous) is kept in extras as
vs_baseline_est2p5 for cross-round continuity. North star: >=5x per chip.
"""

import json
import os

# persistent compile cache: the flagship init/train compiles are ~6-11 min
# on the relay terminal and recur across bench/curriculum processes.
# Durable location (artifacts/ is gitignored): an Aug-21 container reset
# wiped /tmp and forced a full re-warm.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "artifacts", "jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp

# sitecustomize imports jax at interpreter start, before the setdefaults
# above — the env route only reaches CHILD processes. Explicit config.update
# is required for THIS process (without it the 25-min flagship compiles of
# the Aug-21 cold run were silently never cached).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))

from forge_tpu.utils.chiptime import chip_time, perturb_tree

BASELINE_OBJECTS_PER_SEC_PER_A40 = 10.0   # derived; see BASELINE.md "Grounding"
BASELINE_EST_ROUNDS_1_2 = 2.5             # rounds-1/2 estimate (continuity)
BASELINE_TRAIN_OBJECTS_PER_SEC_PER_A40 = 9.3  # fwd+bwd, batch 4/GPU


def _time_best(fn, base_args, n_iter=4):
    """Relay-safe average seconds/call over n_iter distinct-input calls
    (jax.block_until_ready does not synchronize over the axon relay, and
    identical executions can be served memoized — see utils/chiptime.py)."""
    args_list = [tuple(perturb_tree(a, i) for a in base_args)
                 for i in range(n_iter)]
    return chip_time(fn, args_list)


def _setup(backend: str, b: int = 1):
    import __graft_entry__ as ge
    from forge_tpu.models import build_model

    cfg = ge.flagship_config(backend=backend)
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=b, t_all=10)
    # Device-resident inputs: numpy leaves would re-upload the whole batch
    # inside every timed call (b=4 is ~170 MB over the relay), measuring the
    # host link instead of the chip. The real pipeline keeps batches
    # device-resident (DeviceCachedLoader; eval uploads each instance once).
    sample = jax.device_put(sample)
    jax.block_until_ready(sample)
    # Random (NOT zero) weights: zero weights decode an all-zero density
    # volume, which the renderer's exact empty-brick skip turns into an
    # empty-scene fast path — random weights are the dense worst case.
    # A trained checkpoint (FORGE_BENCH_CHECKPOINT or auto-discovered under
    # artifacts/) is benched ALONGSIDE dense, not instead — see
    # _find_checkpoint/_load_cpt_variables; the dense number stays the
    # headline (honest worst case), extra.checkpoint_* carries the
    # real-object-scene numbers.
    cpt = ""
    variables = ge.bench_variables(model, sample)
    # Round-4 honesty fix: random weights do NOT decode a dense volume — the
    # density head's ReLU left the round-3 bench volumes ~EMPTY (positive
    # fraction ~1e-5, measured), so the renderer's empty-brick skip was
    # benchmarking an empty scene while claiming "dense worst case". Bias the
    # density head positive so the decoded volume is genuinely dense —
    # measured within 1% of a 15%-occupancy object blob on the fused kernel
    # (experiments round 4), i.e. the honest object-scene upper bound.
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.5
        if ("dh_conv2" in "/".join(str(p) for p in path)
            and "bias" in str(path[-1])) else x,
        variables)
    return cfg, model, sample, variables


def _find_checkpoint():
    """FORGE_BENCH_CHECKPOINT, else the newest curriculum checkpoint under
    artifacts/ (best-metric preferred, cpt_last fallback)."""
    import glob

    p = os.environ.get("FORGE_BENCH_CHECKPOINT", "")
    if p:
        return p
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts")
    cands = (glob.glob(os.path.join(root, "curriculum*", "**", "cpt_best_*"),
                       recursive=True)
             + glob.glob(os.path.join(root, "curriculum*", "**", "cpt_last"),
                         recursive=True))
    cands = [c for c in cands if os.path.exists(c)]
    return max(cands, key=os.path.getmtime) if cands else ""


def _load_cpt_variables(variables, cpt):
    from forge_tpu.utils import checkpoint as CKPT

    raw = CKPT.load_checkpoint(cpt)
    src = raw.get("variables", raw)
    if "params" not in src and "state" in raw:
        src = {"params": raw["state"]["params"],
               "batch_stats": raw["state"].get("batch_stats", {})}
    return CKPT.load_subtrees(variables, src, ["*"], [])


def _cpt_hash(cpt):
    import hashlib

    h = hashlib.sha1()
    if os.path.isdir(cpt):
        for root, _, files in os.walk(cpt):
            for f in sorted(files):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read(1 << 20))
    else:
        with open(cpt, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def _measure_forward(backend: str):
    from forge_tpu.models import TrainFlags

    cfg, model, sample, variables = _setup(backend)
    # variables must be an ARGUMENT: closing over ~377 MB of (random,
    # incompressible) weights embeds them in the relay compile request,
    # which 413s above ~300 MB (OPTIMIZATION.md round-3 findings)
    fn = jax.jit(lambda v, s: model.apply(v, s, TrainFlags.none()))
    return _time_best(fn, (variables, sample))


V5E_BF16_PEAK = 394e12   # bf16 TFLOP/s, one v5e chip


def _render_pass_model():
    """Forward-kernel MXU pass-model FLOPs per live depth-group, derived
    from the CURRENT kernel constants (OPTIMIZATION.md 'MXU pass-unit
    model'): one unit = a 128^3 MXU pass = 2 * 128^3 FLOPs. Dense scenes
    make every group live, so model_flops = units * groups."""
    import math

    import forge_tpu.ops.ray_march_pallas as RP

    D, C, spi = 64, 16, RP.SPI
    R = RP.TILE * RP.TILE
    bz = RP._bz(D)
    bh = RP._bh(D, RP._hs8(D))
    kp = math.ceil(bz * bh / 128)          # zh contraction K-passes
    mp = math.ceil(spi * R / 128)          # row passes
    np_m1 = math.ceil(RP.BX * C / 128)     # feature N-passes
    np_d1 = math.ceil(D / 128)             # density N-passes
    units = kp * mp * (np_m1 + np_d1)
    if not RP.SELSUM:
        units += math.ceil(RP.BX * C / 128) * mp * 1   # select matmul
    return units * 2 * 128 ** 3


def _measure_render_mfu(n_iter=4):
    """Raw fused-kernel forward at dense flagship shapes (1 volume, 10
    grouped cameras @128^2 x 64) -> (ms, MFU vs v5e bf16 peak under the
    kernel's own pass model). The MFU line makes kernel-efficiency progress
    judgeable round over round independent of model-graph changes
    (VERDICT r4 #6)."""
    import numpy as np

    import forge_tpu.ops.ray_march_pallas as RP

    rng = np.random.RandomState(0)
    V, cpv, S, img, npts, C = 1, 10, 64, 128, 64, 16
    feats = jnp.asarray(rng.rand(V, S, S, S, C).astype(np.float32))
    dens = jnp.asarray((rng.rand(V, S, S, S, 1) * 0.2).astype(np.float32))
    B = V * cpv
    f = 140.0
    K = jnp.asarray(np.tile(np.array(
        [[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    Rm = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t = jnp.asarray((np.array([0, 0, 1.5], np.float32)
                     + 0.01 * np.arange(B)[:, None]
                     * np.array([1, 0.5, 0.2])).astype(np.float32))
    fn = jax.jit(lambda fe, de: RP.render_volume_pallas(
        fe, de, K, Rm, t, img, npts, 0.5, 2.0, 1.0, cams_per_volume=cpv))
    dt = chip_time(fn, [(perturb_tree(feats, i), dens)
                        for i in range(n_iter)])
    nt = img // RP.TILE
    groups = B * nt * nt * (npts // RP._spi(npts))
    flops = _render_pass_model() * groups
    return dt * 1e3, flops / dt / V5E_BF16_PEAK


def _measure_refine(backend: str, chunk: int = 10, b: int = 1):
    """Seconds per refinement iteration (5-view fuse+render fwd+bwd+Adam).

    b > 1 refines b objects in one batched scan (eval --refine-batch): the
    returned value is still seconds per ITERATION of the batched step —
    divide by b for the per-object cost."""
    from forge_tpu.eval.refine import make_refiner

    cfg, model, sample, variables = _setup(backend, b=b)
    feats = jax.jit(
        lambda v, x: model.apply(
            v, x, False, method=lambda m, c, t: m.encode_views(c, t))
    )(variables, jnp.asarray(sample["images"][:, :5]))
    pose = jnp.zeros((4 * b, 7), jnp.float32).at[:, 0].set(1.0)
    camK = jnp.asarray(sample["K_cv2"][:, :5])
    timgs = jnp.asarray(sample["images"][:, :5])
    tmasks = jnp.asarray(sample["fg_probabilities"][:, :5])
    refiner = jax.jit(make_refiner(model, cfg, chunk))
    dt = _time_best(refiner, (variables, pose, feats, camK, timgs, tmasks),
                    n_iter=3)
    return dt / chunk


def _measure_train_step(backend: str, b: int = 1):
    """One joint train step (batch b) on the chip."""
    import __graft_entry__ as ge
    from forge_tpu.models import build_model
    from forge_tpu.train import (
        create_train_state, make_train_step, get_curriculum_step)

    cfg = ge.flagship_config(backend=backend)
    model = build_model(cfg)
    sample = jax.device_put(ge.synthetic_sample(cfg, b=b, t_all=10))
    step_def = get_curriculum_step("full", "joint")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state, tx = create_train_state(
            model, cfg, sample, jax.random.PRNGKey(0), step_def)
    state = jax.device_put(state, jax.devices()[0])
    train_step = jax.jit(make_train_step(model, cfg, step_def, tx))
    rng = jax.random.PRNGKey(1)

    def run(s, r):
        new_state, metrics = train_step(state, s, r, 0)
        return metrics

    return _time_best(run, (sample, rng), n_iter=3)


def _measure_forward_slice(backend: str, n_dev: int):
    """Eval forward sharded over an n-device data mesh (one object/device).

    Engages automatically when bench.py sees >1 accelerator (VERDICT r3 #10:
    the day a real multi-chip slice is attached, nothing needs writing) —
    per-chip numbers stay the headline; slice totals go to extras. Set
    FORGE_BENCH_TINY=1 to smoke-test this path on virtual CPU devices.
    """
    import __graft_entry__ as ge
    from jax.sharding import NamedSharding, PartitionSpec as P

    from forge_tpu.models import TrainFlags, build_model
    from forge_tpu.parallel import make_mesh

    tiny = os.environ.get("FORGE_BENCH_TINY", "") == "1"
    cfg = ge.tiny_config() if tiny else ge.flagship_config(backend=backend)
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=n_dev, t_all=10)
    variables = ge.bench_variables(model, sample)
    mesh = make_mesh(n_dev, ray_parallel=1)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    sample = jax.device_put(sample, data)
    variables = jax.device_put(variables, repl)
    jax.block_until_ready(sample)
    with jax.set_mesh(mesh):
        fn = jax.jit(lambda v, s: model.apply(v, s, TrainFlags.none()),
                     in_shardings=(repl, data))
        dt = _time_best(fn, (variables, sample), n_iter=3)
    return n_dev / dt


def _device_reachable(timeout_s: int = 480, retries: int = 2) -> bool:
    """Probe the accelerator in a SUBPROCESS with a hard timeout: a dead
    hosted-relay tunnel makes every device op hang forever (observed
    round 4), and a bench that hangs is worse than one that reports.

    Retries with a pause: a DEGRADED relay (post-outage Aug 21: a trivial
    matmul took 94 s while the relay drained a killed client's server-side
    compile) must read as slow, not unreachable."""
    import subprocess
    import sys
    import time as _time

    for attempt in range(retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries:
            print(f"# device probe attempt {attempt + 1} failed; retrying",
                  flush=True)
            _time.sleep(60)
    return False


def main():
    if not _device_reachable():
        print(json.dumps({
            "metric": "5-view objects/sec", "value": 0.0,
            "unit": "objects/sec", "vs_baseline": 0.0,
            "error": "accelerator unreachable (device probe hung/failed; "
                     "hosted TPU relay tunnel down)"}))
        return
    # Truncation safety: every flagship program is a multi-minute cold
    # compile on the relay, and the driver (or `timeout`) may cut the bench
    # mid-phase. Keep a best-so-far result and print it as THE json line on
    # SIGTERM so a cut bench still records everything measured up to the
    # cut. The pallas backend (the winner every round since r3) is measured
    # FIRST; the packed comparison column compiles last.
    import signal

    state = {"metric": "5-view objects/sec", "value": 0.0,
             "unit": "objects/sec", "vs_baseline": 0.0,
             "error": "no forward measured before the bench was cut"}

    def _on_term(sig, frame):
        state.setdefault("extra", {})["truncated"] = (
            "bench hit its time budget; metrics measured so far")
        print(json.dumps(state), flush=True)
        os._exit(1)

    signal.signal(signal.SIGTERM, _on_term)

    backends = [t.strip() for t in os.environ.get(
        "FORGE_BENCH_BACKENDS", "pallas,packed").split(",")]
    results = {}
    for b in backends:
        try:
            print(f"# measuring forward backend={b}", flush=True)
            results[b] = _measure_forward(b)
        except Exception as e:  # a backend failing must not kill the bench
            results[b] = None
            print(f"# backend {b} failed: {type(e).__name__}: {e}"[:300])
        if b == backends[0] and results[b]:
            # primary backend done: record a valid best-so-far result
            state.update(value=round(1.0 / results[b], 4),
                         vs_baseline=round(
                             1.0 / results[b] / BASELINE_OBJECTS_PER_SEC_PER_A40, 3))
            state.pop("error", None)

    ok = {k: v for k, v in results.items() if v}
    if ok:
        # any successful backend invalidates the "nothing measured" error —
        # popping only in the first-backend branch left a stale error field
        # when the primary failed but a later backend succeeded (ADVICE r4)
        state.pop("error", None)
    if not ok:
        print(json.dumps({"metric": "5-view objects/sec", "value": 0.0,
                          "unit": "objects/sec", "vs_baseline": 0.0,
                          "error": "all backends failed"}))
        return
    best_backend = min(ok, key=lambda k: ok[k])
    dt = ok[best_backend]
    objects_per_sec = 1.0 / dt
    best_b = 1
    ray_samples = 10 * 128 * 128 * 64

    extra = {
        "backend": best_backend,
        "sec_per_forward": {k: (round(v, 4) if v else None)
                            for k, v in results.items()},
        "objects_per_sec_b1": round(objects_per_sec, 3),
        "device": str(jax.devices()[0]),
    }
    state["extra"] = extra
    def _sync():
        state.update(
            metric=(f"5-view objects/sec (full eval forward, best batch"
                    f" b={best_b}, 10 renders/object @128^2x64)"),
            value=round(objects_per_sec, 4),
            vs_baseline=round(
                objects_per_sec / BASELINE_OBJECTS_PER_SEC_PER_A40, 3))

    _sync()
    if os.environ.get("FORGE_BENCH_FAST", "") != "1":
        try:
            # batched eval amortizes the per-call host/dispatch overhead;
            # per-chip throughput = best over batch sizes
            import __graft_entry__ as ge
            from forge_tpu.models import build_model, TrainFlags

            for b in (4, 8, 16):
                print(f"# measuring batched forward b={b}", flush=True)
                cfg, model, sample, variables = _setup(best_backend, b=b)
                fn = jax.jit(lambda v, s: model.apply(v, s,
                                                      TrainFlags.none()))
                dtb = _time_best(fn, (variables, sample), n_iter=3)
                ops = b / dtb
                extra[f"objects_per_sec_b{b}"] = round(ops, 3)
                if ops > objects_per_sec:
                    objects_per_sec, best_b = ops, b
                _sync()
        except Exception as e:
            extra["objects_per_sec_batched"] = f"failed: {e}"[:120]
        try:
            # raw-kernel MFU trend line (dense, kernel pass model)
            print("# measuring render MFU", flush=True)
            rms, mfu = _measure_render_mfu()
            extra["render_fwd_ms_dense"] = round(rms, 1)
            extra["render_mfu"] = round(mfu, 3)
        except Exception as e:
            extra["render_mfu"] = f"failed: {e}"[:120]
        try:
            cpt = _find_checkpoint()
            if cpt:
                # real-object-scene throughput alongside the dense headline
                print(f"# measuring checkpoint forward b=8 ({cpt})",
                      flush=True)
                from forge_tpu.models import TrainFlags

                cfgc, modelc, samplec, varc = _setup(best_backend, b=8)
                varc = _load_cpt_variables(varc, cpt)
                fnc = jax.jit(lambda v, s: modelc.apply(
                    v, s, TrainFlags.none()))
                dtc = _time_best(fnc, (varc, samplec), n_iter=3)
                extra["checkpoint_objects_per_sec_b8"] = round(8.0 / dtc, 3)
                extra["checkpoint"] = {
                    "path": os.path.relpath(
                        cpt, os.path.dirname(os.path.abspath(__file__))),
                    "sha1": _cpt_hash(cpt)}
        except Exception as e:
            extra["checkpoint_objects_per_sec_b8"] = f"failed: {e}"[:120]
        try:
            print("# measuring refinement b=1", flush=True)
            refine_ms = _measure_refine(best_backend) * 1e3
            extra["refine_ms_per_iter"] = round(refine_ms, 1)
            # the reference's "1000 iters already good" refinement budget
            # (kubric_eval.py:578-579) in wall seconds/object
            extra["refine_1000iter_s"] = round(refine_ms, 1)
        except Exception as e:
            extra["refine_ms_per_iter"] = f"failed: {e}"[:120]
        try:
            # eval --refine-batch 4: per-object refinement cost when four
            # instances share one batched scan
            print("# measuring refinement b=4", flush=True)
            r4 = _measure_refine(best_backend, b=4) * 1e3
            extra["refine_ms_per_iter_b4"] = round(r4, 1)
            extra["refine_1000iter_s_per_obj_b4"] = round(r4 / 4.0, 1)
        except Exception as e:
            extra["refine_ms_per_iter_b4"] = f"failed: {e}"[:120]
        try:
            print("# measuring train step b=1", flush=True)
            extra["train_step_ms"] = round(
                _measure_train_step(best_backend) * 1e3, 1)
        except Exception as e:
            extra["train_step_ms"] = f"failed: {e}"[:120]
        try:
            print("# measuring train step b=4", flush=True)
            # the reference's per-GPU training configuration (batch 4,
            # config/kubric/joint_pose_2d3d.yaml): per-chip train objects/sec
            dt4 = _measure_train_step(best_backend, b=4)
            extra["train_step_ms_b4"] = round(dt4 * 1e3, 1)
            extra["train_objects_per_sec_b4"] = round(4.0 / dt4, 3)
        except Exception as e:
            extra["train_step_ms_b4"] = f"failed: {e}"[:120]

    n_dev = len(jax.devices())
    if n_dev > 1 or os.environ.get("FORGE_BENCH_TINY", "") == "1":
        try:
            slice_ops = _measure_forward_slice(best_backend, n_dev)
            extra["n_devices"] = n_dev
            extra["slice_objects_per_sec"] = round(slice_ops, 3)
            extra["slice_vs_8xA40"] = round(
                slice_ops / (8 * BASELINE_OBJECTS_PER_SEC_PER_A40), 3)
        except Exception as e:
            extra["slice_objects_per_sec"] = f"failed: {e}"[:120]

    extra["ray_msamples_per_sec"] = round(
        ray_samples * objects_per_sec / 1e6, 1)
    extra["vs_baseline_est2p5"] = round(
        objects_per_sec / BASELINE_EST_ROUNDS_1_2, 3)
    ts = extra.get("train_step_ms")
    train_ops = [1000.0 / ts] if isinstance(ts, (int, float)) else []
    t4 = extra.get("train_objects_per_sec_b4")
    if isinstance(t4, (int, float)):
        train_ops.append(t4)
    if train_ops:
        extra["train_vs_baseline"] = round(
            max(train_ops) / BASELINE_TRAIN_OBJECTS_PER_SEC_PER_A40, 3)
    _sync()
    print(json.dumps(state), flush=True)


if __name__ == "__main__":
    main()
