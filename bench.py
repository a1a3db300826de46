"""Benchmark: flagship FORGE forward throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric: 5-view objects/sec for the full eval-style forward (encode 5
views -> predict poses -> rotate -> fuse -> decode -> render 10 views at
256^2, 64 samples/ray = 10.5M ray-samples/object, BASELINE.md:22).

vs_baseline compares per-chip against the reference's estimated per-A40
eval-forward throughput. The reference publishes no objects/sec; we estimate
~2.5 obj/s/A40 from its workload (10 renders of 128^2x64 samples through
PyTorch3D + ResNet50 encodes per object at batch 1). The driver's north star
is >=5x per chip (BASELINE.md:25-28).
"""

import json
import time

import jax

from __graft_entry__ import entry

BASELINE_OBJECTS_PER_SEC_PER_A40 = 2.5  # estimated; see module docstring


def main():
    fn, (variables, sample) = entry()
    jitted = jax.jit(fn)

    # warmup / compile
    out = jitted(variables, sample)
    jax.block_until_ready(out)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jitted(variables, sample)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    b, t_all = sample["images"].shape[:2]
    objects_per_sec = b / dt
    half = sample["images"].shape[2] // 2
    ray_samples = b * t_all * half * half * 64
    msamples_per_sec = ray_samples / dt / 1e6

    print(json.dumps({
        "metric": "5-view objects/sec (full forward, b=1, 10 renders @128^2x64)",
        "value": round(objects_per_sec, 4),
        "unit": "objects/sec",
        "vs_baseline": round(objects_per_sec / BASELINE_OBJECTS_PER_SEC_PER_A40, 3),
        "extra": {
            "ray_msamples_per_sec": round(msamples_per_sec, 1),
            "sec_per_forward": round(dt, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
