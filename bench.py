"""Benchmark: flagship FORGE forward throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: 5-view objects/sec for the full eval-style forward (encode 5
views -> predict poses -> rotate -> fuse -> decode -> render 10 views at
256^2, 64 samples/ray = 10.5M ray-samples/object, BASELINE.md:22). Both
renderer backends ('xla' reference gather, 'packed' corner-packed gather) are
timed; the headline is the best.

vs_baseline compares per-chip against the reference's estimated per-A40
eval-forward throughput (~2.5 obj/s; the reference publishes no objects/sec —
estimated from its 10x 128^2x64 PyTorch3D renders + ResNet50 encodes at
batch 1). The driver's north star is >=5x per chip (BASELINE.md:25-28).
"""

import json
import os
import time

import jax

BASELINE_OBJECTS_PER_SEC_PER_A40 = 2.5  # estimated; see module docstring


def _measure(backend: str, n_iter: int = 5):
    import __graft_entry__ as ge
    from forge_tpu.models import build_model, TrainFlags

    cfg = ge.flagship_config(backend=backend)
    model = build_model(cfg)
    sample = ge.synthetic_sample(cfg, b=1, t_all=10)
    variables = ge.zeros_variables(model, sample)

    fn = jax.jit(lambda v, s: model.apply(v, s, TrainFlags.none()))
    out = fn(variables, sample)
    jax.block_until_ready(out)

    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(variables, sample)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    backends = os.environ.get(
        "FORGE_BENCH_BACKENDS", "packed,pallas").split(",")
    results = {}
    for b in backends:
        try:
            results[b] = _measure(b.strip())
        except Exception as e:  # a backend failing must not kill the bench
            results[b] = None
            print(f"# backend {b} failed: {type(e).__name__}: {e}"[:300])

    ok = {k: v for k, v in results.items() if v}
    if not ok:
        print(json.dumps({"metric": "5-view objects/sec", "value": 0.0,
                          "unit": "objects/sec", "vs_baseline": 0.0,
                          "error": "all backends failed"}))
        return
    best_backend = min(ok, key=lambda k: ok[k])
    dt = ok[best_backend]
    objects_per_sec = 1.0 / dt
    ray_samples = 10 * 128 * 128 * 64

    print(json.dumps({
        "metric": "5-view objects/sec (full forward, b=1, 10 renders @128^2x64)",
        "value": round(objects_per_sec, 4),
        "unit": "objects/sec",
        "vs_baseline": round(objects_per_sec / BASELINE_OBJECTS_PER_SEC_PER_A40, 3),
        "extra": {
            "backend": best_backend,
            "sec_per_forward": {k: (round(v, 4) if v else None)
                                for k, v in results.items()},
            "ray_msamples_per_sec": round(ray_samples / dt / 1e6, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
