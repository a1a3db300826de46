"""Aggregate eval results.txt into seen/unseen x before/after buckets.

Functional parity with the reference readout (scripts/eval_readout.py:33-129):
parses the structured text lines written by eval, prints mean and median
PSNR/SSIM/LPIPS/depth and rot/trans pose errors per bucket.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

# "lpips_unit" is LPIPS run with unit lin weights (no learned checkpoint in
# the image) — structurally the same metric but NOT comparable to published
# LPIPS numbers; eval labels the column accordingly (evaluate.py lpips_label).
_FIELDS = ("psnr", "ssim", "lpips", "lpips_unit", "rot", "trans", "depth")


def parse_results(path: str) -> Dict[str, Dict[str, List[float]]]:
    buckets: Dict[str, Dict[str, List[float]]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = [p.strip() for p in line.split(",")]
            # idx N, seen B, STAGE, psnr X, ssim X, lpips X, rot X, trans X, depth X
            seen = parts[1].split()[1] in ("True", "1", "1.0")
            stage = parts[2]
            key = f"{'seen' if seen else 'unseen'}_{stage}"
            vals = {}
            for p in parts[3:]:
                toks = p.split()
                if len(toks) == 2 and toks[0] in _FIELDS:
                    vals[toks[0]] = float(toks[1])
            b = buckets.setdefault(key, {k: [] for k in _FIELDS})
            for k, v in vals.items():
                b[k].append(v)
    return buckets


def summarize(path: str, print_fn=print) -> Dict[str, Dict[str, float]]:
    buckets = parse_results(path)
    out = {}
    for key in sorted(buckets):
        stats = {}
        for field, vals in buckets[key].items():
            if not vals:
                continue
            stats[f"{field}_mean"] = float(np.mean(vals))
            stats[f"{field}_median"] = float(np.median(vals))
        out[key] = stats
        print_fn(f"[{key}] n={len(buckets[key]['psnr'])} " + " ".join(
            f"{k}={v:.4f}" for k, v in stats.items()))
    return out
