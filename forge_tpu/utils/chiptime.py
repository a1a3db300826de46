"""Honest wall-clock timing over the hosted axon TPU relay.

Two relay artifacts make naive timing wrong (measured 2026-08-19):
  - jax.block_until_ready returns BEFORE remote execution completes; only a
    device->host readback actually synchronizes (a 371 ms "forward" was
    really ~850 ms).
  - repeated executions of the same (executable, inputs) pair can be served
    from a relay-side cache in ~0 ms.

Protocol: enqueue N executions with DISTINCT inputs back-to-back, then fetch
one scalar from the last output (the device runs the queue in order, so the
fetch waits for all N), and subtract the measured fetch round-trip.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def _fetch_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    # index on-device so the readback moves one element, not the whole array
    return float(jax.device_get(leaf[tuple(0 for _ in leaf.shape)]))


def chip_time(fn, args_list, warmup: int = 1):
    """Average seconds per call of fn over len(args_list) distinct-input
    executions (args_list entries must all differ)."""
    for i in range(warmup):
        _fetch_scalar(fn(*args_list[i % len(args_list)]))
    # fetch round-trip on already-computed data
    out = fn(*args_list[0])
    _fetch_scalar(out)
    t0 = time.perf_counter()
    _fetch_scalar(out)
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = None
    for a in args_list:
        outs = fn(*a)
    _fetch_scalar(outs)
    dt = time.perf_counter() - t0
    return max(dt - rtt, 1e-9) / len(args_list)


def perturb_tree(x, i):
    """Scale float leaves so inputs differ between calls (no host<->device
    movement: works on the leaf's own array type)."""
    def f(v):
        dt = getattr(v, "dtype", None)
        if dt is not None and jnp.issubdtype(dt, jnp.floating):
            return v * (1.0 + 1e-6 * i)
        return v
    return jax.tree.map(f, x)
