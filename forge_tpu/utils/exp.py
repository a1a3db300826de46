"""Experiment infrastructure: output dirs, logging, meters, profiling.

Mirrors the reference's exp utilities (utils/exp_utils.py:21-129): output
directory layout output/<dataset>/<cfg-stem>/<exp_name>, file+console logging,
averaging meters. Adds what the reference lacks (SURVEY.md §5): a step timer
that can emit jax profiler traces.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional


def create_logger(cfg, cfg_path: str, phase: str = "train"):
    """Returns (logger, output_dir). reference: utils/exp_utils.py:90-129."""
    cfg_stem = os.path.splitext(os.path.basename(cfg_path))[0]
    output_dir = os.path.join(
        cfg.output_dir, cfg.dataset.name, cfg_stem, cfg.exp_name
    )
    os.makedirs(output_dir, exist_ok=True)
    ts = time.strftime("%Y-%m-%d-%H-%M")
    log_file = os.path.join(output_dir, f"{cfg_stem}_{ts}_{phase}.log")

    logger = logging.getLogger(f"forge_tpu.{cfg.exp_name}.{phase}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(log_file)
    fh.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(ch)
    return logger, output_dir


class AverageMeter:
    """reference: utils/exp_utils.py:21-47."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class AverageMeters:
    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def update(self, vals: Dict, n: int = 1):
        for k, v in vals.items():
            self.meters.setdefault(k, AverageMeter()).update(float(v), n)

    def avg(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()


class StepTimer:
    """Wall-clock step/data timing + optional jax profiler traces.

    The reference only logs wall-clock meters (scripts/kubric_trainer.py:42-48);
    this additionally captures a device trace for steps in
    [profile_start, profile_start + profile_steps) when profile_dir is set.
    """

    def __init__(self, profile_dir: Optional[str] = None,
                 profile_start: int = 10, profile_steps: int = 3):
        self.profile_dir = profile_dir
        self.profile_start = profile_start
        self.profile_stop = profile_start + profile_steps
        self._active = False
        self._count = 0
        self._t = time.perf_counter()

    def tick(self):
        """Call once per train step (global across epochs): captures a device
        trace for steps [profile_start, profile_stop) when profile_dir is
        set. Step profile_start is past the first-step compiles so the trace
        records steady-state device work, not tracing/compilation."""
        if self.profile_dir:
            import jax

            if self._count == self.profile_start and not self._active:
                jax.profiler.start_trace(self.profile_dir)
                self._active = True
            elif self._count >= self.profile_stop and self._active:
                self.close()
        self._count += 1

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    def step(self, i: int) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        return dt
