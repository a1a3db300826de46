"""Eval-shard infrastructure: recovery, retries, windows, incremental saves.

The hosted TPU worker can crash/restart under sustained eval load (round-1
finding, OPTIMIZATION.md); device buffers and compiled executables die with
it. This module owns everything about KEEPING AN EVAL SHARD ALIVE:

  - `make_recover`: weight re-upload + jitted-closure rebuild with backoff
    (the worker self-restarts in ~minutes, so a device_put against a
    still-dead worker must retry, not abort the shard);
  - `run_shard`: the instance loop — `batch_idx % split_num == exp_id` work
    sharding exactly like the reference's 8-process eval scripts
    (kubric_eval.py:56-57,575-578), per-instance retry, refinement-window
    queueing with per-instance fallback, and incremental result saves;
  - `brick_coverage_guard`: pallas brick-envelope enforcement with an xla
    fallback (a kernel constraint, not an eval-semantics concern).

It knows nothing about FORGE, metrics, or refinement math — the semantic
callbacks live in eval/evaluate.py and read a mutable closure namespace that
recovery refreshes in place.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import numpy as np


def make_recover(rebuild: Callable[[], None],
                 waits=(5, 15, 30, 60, 120, 180)) -> Callable[[], bool]:
    """Wrap a (re)build callable in the device-recovery backoff loop.

    `rebuild` re-uploads weight trees from host copies and rebuilds every
    jitted closure (they capture device buffers, which die with the worker).
    Returns a zero-arg callable: True once a rebuild succeeds, False when the
    worker never comes back within the backoff schedule.
    """
    import jax

    def recover() -> bool:
        for wait in waits:
            try:
                jax.clear_caches()
                rebuild()
                return True
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:
                print(f"recover failed ({e}); retrying in {wait}s")
                time.sleep(wait)
        return False

    return recover


def run_shard(
    loader: Iterable,
    *,
    split_num: int = 1,
    exp_id: int = 0,
    max_instances: Optional[int] = None,
    instance_retries: int = 2,
    recover: Callable[[], bool],
    run_one: Callable,            # (sample, batch_idx, seen) -> None
    queue_one: Optional[Callable] = None,   # (sample, batch_idx, seen) -> ctx
    flush_one: Optional[Callable] = None,   # (ctx) -> None (window fallback)
    flush_window: Optional[Callable] = None,  # (list[ctx]) -> None
    window: int = 1,
    on_first_sample: Optional[Callable] = None,   # (sample) -> None
    save_state: Optional[Callable] = None,        # () -> None
) -> None:
    """The eval-shard instance loop, semantics supplied as callbacks.

    window <= 1 (or no queue_one): every selected instance runs through
    `run_one` with `instance_retries` device-failure retries; a retry first
    calls `recover` to re-upload weights.

    window > 1: `queue_one` runs the per-instance phase and returns a
    context; contexts are flushed `window` at a time through `flush_window`.
    A device failure mid-window falls back to per-instance `flush_one` after
    one recovery so one bad instance cannot sink its window-mates.

    `save_state` is called after every completed instance/window so results
    survive a shard kill (the reference appends results.txt per instance,
    kubric_eval.py:85-93).
    """
    windowed = window > 1 and queue_one is not None
    pending = []

    def _flush():
        ctxs = list(pending)
        pending.clear()
        try:
            flush_window(ctxs)
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception as e:
            print(f"batched refinement window failed ({e}); "
                  f"falling back to per-instance")
            if not recover():
                print("window skipped: device recovery failed")
                return
            for ctx in ctxs:
                try:
                    flush_one(ctx)
                except (KeyboardInterrupt, SystemExit):
                    raise
                except Exception as e2:
                    print(f"{ctx['batch_idx']} skipped in fallback: {e2}")

    done = 0
    first = True
    for batch_idx, sample in enumerate(loader):
        if batch_idx % split_num != exp_id:
            continue
        if max_instances is not None and done >= max_instances:
            break
        done += 1
        seen = (float(np.asarray(sample["seen_flag"]).ravel()[0]) > 0
                if "seen_flag" in sample else True)
        if first:
            first = False
            if on_first_sample is not None:
                on_first_sample(sample)

        for attempt in range(instance_retries + 1):
            try:
                if windowed:
                    pending.append(queue_one(sample, batch_idx, seen))
                    if len(pending) >= window:
                        _flush()
                else:
                    run_one(sample, batch_idx, seen)
                break
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:
                if attempt >= instance_retries:
                    print(f"{batch_idx} skipped after "
                          f"{instance_retries + 1} attempts: {e}")
                else:
                    print(f"{batch_idx} attempt {attempt + 1} failed "
                          f"({e}); re-uploading weights and retrying")
                    if not recover():
                        print(f"{batch_idx} skipped: device recovery failed")
                        break
        if save_state is not None:
            save_state()
    if pending:
        _flush()
        if save_state is not None:
            save_state()


def brick_coverage_guard(model, cfg, sample):
    """Check the pallas kernel's brick envelope against real eval cameras.

    The fused kernel shares one fixed-size voxel brick per ray tile; cameras
    whose tile frusta span more voxels than the brick (wide FOV, very close
    orbits, or refinement wandering beyond the training distribution) lose
    tent weight SILENTLY (ops/ray_march_pallas.py:check_brick_coverage). The
    measured flagship envelope has ~0.5 voxel z-margin, so enforcement
    belongs at runtime, not only in tests. Checks this instance's cameras
    plus a 0.8x-radius excursion (refinement moving cameras closer enlarges
    the per-tile footprint) and returns (model, cfg) rebuilt onto the 'xla'
    renderer when the envelope is exceeded, else (None, None).
    """
    from forge_tpu.config import merge_config
    from forge_tpu.ops.ray_march import pallas_supports, resolve_backend
    from forge_tpu.ops.ray_march_pallas import check_brick_coverage

    half = cfg.dataset.img_size // 2
    D = cfg.dataset.img_size // 4
    if (resolve_backend(cfg.render.backend) != "pallas"
            or not pallas_supports((1, D, D, D, 16), half)):
        return None, None   # pallas never engages; nothing to guard
    K = np.asarray(sample["K_cv2"], np.float64).reshape(-1, 3, 3) / 2.0
    K[:, 2, 2] = 1.0
    extr = np.asarray(
        sample.get("cam_extrinsics_cv2_canonicalized",
                   sample["cam_extrinsics_cv2"]), np.float64).reshape(-1, 4, 4)
    r = cfg.render
    ok = True
    for f in (1.0, 0.8):
        out = check_brick_coverage(
            K, extr[:, :3, :3], extr[:, :3, 3] * f, half, r.n_pts_per_ray,
            r.min_depth, r.max_depth, r.volume_size, D)
        ok = ok and out["ok"]
    if ok:
        return None, None
    print("brick_coverage_guard: eval cameras exceed the pallas brick "
          f"envelope ({out['need']} vs {out['brick']}); falling back to the "
          "xla renderer for this eval run")
    new_cfg = merge_config(cfg, {"render": {"backend": "xla"}})
    return model.clone(cfg=new_cfg), new_cfg
