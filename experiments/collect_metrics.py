"""Parse curriculum training logs into the METRICS.md results table.

Usage: python experiments/collect_metrics.py /tmp/curriculum [METRICS.md]
"""

import os
import re
import sys

STEPS = [
    ("1.1 gt_pose", "gt_pose"),
    ("1.2 pose_3d", "pred_pose_3d"),
    ("2 pose_2d", "pred_pose_2d"),
    ("3.1 pose_head", "pretrain_pose_2d3d"),
    ("3.2 pose", "pred_pose_2d3d"),
    ("3.3 joint", "joint_pose_2d3d"),
]

VAL_RE = re.compile(
    r"validation: .*?psnr=([\d.]+)?.*?rot=([\d.]+).*?$|"
    r"validation: (.*)$")


def parse_log(path):
    """Return list of dicts per validation line."""
    out = []
    for line in open(path, errors="replace"):
        if "validation:" not in line:
            continue
        fields = dict(re.findall(r"(\w+)=([\d.]+)", line))
        if fields:
            out.append(fields)
    return out


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curriculum"
    rows = []
    series = {}
    for label, cfg in STEPS:
        d = os.path.join(root, "kubric", cfg)
        vals = []
        if os.path.isdir(d):
            for exp in sorted(os.listdir(d)):
                for f in sorted(os.listdir(os.path.join(d, exp))):
                    if f.endswith("_train.log"):
                        vals.extend(parse_log(os.path.join(d, exp, f)))
        series[label] = vals
        if vals:
            last = vals[-1]
            rows.append((label, cfg, len(vals),
                         last.get("psnr", "-"), last.get("rot", "-"),
                         last.get("ssim", "-")))
        else:
            rows.append((label, cfg, 0, "-", "-", "-"))

    print("| step | config | #vals | final val PSNR | final rot err | ssim |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| {} | {} | {} | {} | {} | {} |".format(*r))

    print("\nper-validation series:")
    for label, vals in series.items():
        pts = ", ".join(
            f"({v.get('psnr', '?')}, rot {v.get('rot', '?')})" for v in vals)
        print(f"  {label}: {pts}")

    # eval harness readout, if present
    for cfg in ("optimize_seen",):
        d = os.path.join(root, "kubric", cfg)
        if not os.path.isdir(d):
            continue
        for exp in sorted(os.listdir(d)):
            rt = os.path.join(d, exp, "results", "results.txt")
            if os.path.exists(rt):
                print(f"\neval readout ({rt}):")
                sys.path.insert(0, "/root/repo")
                from forge_tpu.eval.readout import summarize

                summarize(rt)


if __name__ == "__main__":
    main()
