"""Unit tests for the eval-shard infrastructure (eval/runner.py).

The reference has no analogue (its eval loop aborts on any error); these
pin the recovery/retry/window semantics the TPU-relay environment needs:
instance retry after recovery, window fallback to per-instance, work
sharding, and incremental save calls.
"""

import numpy as np

from forge_tpu.eval.runner import make_recover, run_shard


def _samples(n):
    return [{"seen_flag": np.asarray([i % 2])} for i in range(n)]


def test_shard_selection_and_seen_flag():
    got = []
    run_shard(
        _samples(8), split_num=2, exp_id=1, instance_retries=0,
        recover=lambda: True,
        run_one=lambda s, i, seen: got.append((i, seen)))
    assert got == [(1, True), (3, True), (5, True), (7, True)]


def test_retry_recovers_then_succeeds():
    calls = {"n": 0, "rec": 0}

    def run_one(s, i, seen):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device died")

    def recover():
        calls["rec"] += 1
        return True

    run_shard(_samples(1), instance_retries=2, recover=recover,
              run_one=run_one)
    assert calls == {"n": 2, "rec": 1}


def test_instance_skipped_when_recovery_fails():
    done = []
    run_shard(
        _samples(2), instance_retries=1, recover=lambda: False,
        run_one=lambda s, i, seen: (_ for _ in ()).throw(RuntimeError("x"))
        if i == 0 else done.append(i))
    assert done == [1]   # instance 0 skipped, shard continues


def test_window_flush_and_fallback():
    flushed, singles, saves = [], [], []

    def flush_window(ctxs):
        if any(c["batch_idx"] == 2 for c in ctxs):
            raise RuntimeError("bad window")
        flushed.append([c["batch_idx"] for c in ctxs])

    run_shard(
        _samples(4), instance_retries=0, window=2,
        recover=lambda: True,
        run_one=None,
        queue_one=lambda s, i, seen: {"batch_idx": i},
        flush_window=flush_window,
        flush_one=lambda c: singles.append(c["batch_idx"]),
        save_state=lambda: saves.append(1))
    # window [0,1] flushed batched; window [2,3] fell back per-instance
    assert flushed == [[0, 1]]
    assert singles == [2, 3]
    assert len(saves) == 4


def test_partial_window_flushes_at_end():
    flushed = []
    run_shard(
        _samples(3), window=2, instance_retries=0, recover=lambda: True,
        run_one=None,
        queue_one=lambda s, i, seen: {"batch_idx": i},
        flush_window=lambda ctxs: flushed.append(
            [c["batch_idx"] for c in ctxs]),
        flush_one=lambda c: None)
    assert flushed == [[0, 1], [2]]


def test_on_first_sample_runs_once():
    seen_first = []
    run_shard(
        _samples(3), instance_retries=0, recover=lambda: True,
        run_one=lambda s, i, seen: None,
        on_first_sample=lambda s: seen_first.append(1))
    assert seen_first == [1]


def test_make_recover_backoff_gives_up(monkeypatch):
    import forge_tpu.eval.runner as R

    sleeps = []
    monkeypatch.setattr(R.time, "sleep", lambda s: sleeps.append(s))

    def rebuild():
        raise RuntimeError("worker still dead")

    rec = make_recover(rebuild, waits=(1, 2, 3))
    assert rec() is False
    assert sleeps == [1, 2, 3]


def test_make_recover_succeeds_midway(monkeypatch):
    import forge_tpu.eval.runner as R

    monkeypatch.setattr(R.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def rebuild():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("not yet")

    assert make_recover(rebuild)() is True
    assert calls["n"] == 2
