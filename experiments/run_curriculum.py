"""End-to-end curriculum on the synthetic dataset, on one TPU chip.

Chains the reference's 6-step training curriculum (README.md:62-71,
Appendix A of SURVEY.md) through the run.py CLI with --load surgery between
steps, then runs the eval harness with test-time refinement. Writes per-step
validation metrics to METRICS.md.

Round 3: runs at the FLAGSHIP configuration — 256^2 images, each stage's own
reference batch size (4/5/8/5/5/4) and learning rate — which the round-2
composed-graph cliff forced down to b=1 @128^2. The cliff was the XLA gather
renderer (see OPTIMIZATION.md); with render.backend auto->pallas the b=4
GT-pose step is ~2 s.

Usage:  python experiments/run_curriculum.py [outdir] [--scale small|full]
"""

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curriculum"
SCALE = "small" if "--scale" not in sys.argv else sys.argv[
    sys.argv.index("--scale") + 1]

# epochs per step; synthetic scenes. Pose-estimator stages are cheap (no
# renders) and need the most steps to converge toward the reference's ~10
# degree checkpoints; render stages cost ~2 s/step at b=4.
if SCALE == "full512":
    # Round 4: 4x the training scenes (the round-3 2D estimator flatly
    # memorized 128 scenes; the measured refinement basin needs < 20 degree
    # initializations, METRICS.md). Stage 1.1 is a short continuation from a
    # prior GT-pose checkpoint (env FORGE_GT_INIT) instead of the ~6 h
    # from-scratch run; the data-hungry pose stages retrain from scratch.
    SEQS = 512
    # Pose-estimator budgets sized for the post-h2d-fix epoch cost (~2 s for
    # p3d/p2d/pose once the trainer stopped re-placing device-resident
    # batches): p3d was still descending at its round-4 epoch-200 cutoff
    # (38.2 -> 28.2 -> 23.4 deg at 50/100/150), and the reference LR
    # schedule's first decay lands at ~epoch 294 (30k iters / 102 steps).
    # POSE_SEQS: the render-free pose stages see 2x the scenes (scene files
    # are cached per-index, so the render stages' first 512 stay identical;
    # residency is ~2 GB compact u8 for 1024 image-only scenes).
    # gt: 4 epochs continue a warm start; a COLD start (no FORGE_GT_INIT —
    # the Aug-21 container wipe destroyed every prior checkpoint) needs the
    # round-3 step budget (~1280 steps = 10 epochs at 512 scenes / b=4)
    # round-5 measurement: at 1024 scenes with a cold-start GT encoder the
    # pose estimators fully memorize the train split by ~epoch 150-250 (train
    # pose-loss 6e-4 while val rot bounces ~30 deg); best-rot checkpoint
    # selection makes epochs past ~300 pure chip-time waste.
    EPOCHS = dict(gt=(4 if os.environ.get("FORGE_GT_INIT") else 10),
                  p3d=500, p2d=300, head=12, pose=200, joint=16)
    VAL_EVERY = dict(gt=2, p3d=50, p2d=50, head=6, pose=25, joint=4)
    SAVE_EVERY = dict(gt=2, p3d=25, p2d=25, head=6, pose=10, joint=2)
    POSE_SEQS = 1024
elif SCALE == "full":
    SEQS = 128
    # pose-estimator steps are ~90 ms (no renders): run them long — the
    # estimators need tens of thousands of steps to descend toward the
    # reference's ~10 degree checkpoints (kubric_train_joint.py:92-95)
    EPOCHS = dict(gt=40, p3d=500, p2d=500, head=12, pose=12, joint=10)
    VAL_EVERY = dict(gt=10, p3d=100, p2d=100, head=6, pose=6, joint=5)
    # a cpt_last save is a ~377 MB device_get (~11 s): saving every epoch
    # would dominate the ~2 s pose-estimator epochs
    SAVE_EVERY = dict(gt=5, p3d=25, p2d=25, head=6, pose=6, joint=2)
else:
    SEQS, EPOCHS = 32, dict(gt=16, p3d=8, p2d=8, head=4, pose=4, joint=8)
    VAL_EVERY = {k: 2 for k in EPOCHS}
    SAVE_EVERY = {k: 1 for k in EPOCHS}

POSE_SEQS = globals().get("POSE_SEQS", SEQS)
# pose-stage scene override appended AFTER `common` (argparse last-wins)
pose_seqs = (["--synthetic-seqs", str(POSE_SEQS)]
             if POSE_SEQS != SEQS else [])

ENV = dict(os.environ)
# share rendered synthetic scenes across the 6 per-step processes.
# Durable defaults (artifacts/ is gitignored, survives container resets —
# the Aug-21 reset wiped /tmp including scenes, caches, and checkpoints).
ENV.setdefault("FORGE_SYNTH_CACHE", "/root/repo/artifacts/synth_cache")
# persistent XLA compile cache: init/train/val programs recur across the
# per-step processes (a flagship init compile alone is ~6 min on the relay)
ENV.setdefault("JAX_COMPILATION_CACHE_DIR",
               "/root/repo/artifacts/jax_comp_cache")
ENV.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
# device-resident scenes: the relay host link is ~10 MB/s, so per-step batch
# uploads (42 MB at b=4) would dominate the 2 s step. Round 2's OOM with
# resident scenes was the XLA gather renderer's HBM pressure (OPTIMIZATION.md
# composed-graph cliff), which the pallas backend removes; 128 scenes at
# 256^2 are ~1.7 GB of the 15.75 GB HBM.
ENV.setdefault("FORGE_DEVICE_LOADER", "1")


def run(tag, args, done_key=None):
    # completion markers: a resumed-but-complete stage still pays ~5 min of
    # init + checkpoint restore before its empty epoch loop; the marker
    # makes curriculum relaunches O(seconds) per finished stage. Keyed by a
    # hash of the FULL stage command (plus SEQS): rerunning after changing
    # any stage hyperparameter (--lr, batch, img size, scene count, ...)
    # must re-train the stage, not silently reuse a stale checkpoint.
    arghash = hashlib.sha1(
        repr((args, SEQS)).encode()).hexdigest()[:10] if done_key else None
    marker = (os.path.join(
        OUT, f".done_{done_key}_{EPOCHS[done_key]}_{arghash}")
        if done_key else None)
    if marker and os.path.exists(marker):
        print(f"\n=== {tag}: already complete ({marker})", flush=True)
        return
    t0 = time.time()
    cmd = [sys.executable, "-m", "forge_tpu.run"] + args
    print(f"\n=== {tag}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd="/root/repo", env=ENV)
    print(f"=== {tag} done rc={r.returncode} ({time.time()-t0:.0f}s)",
          flush=True)
    if r.returncode != 0:
        raise SystemExit(f"{tag} failed")
    if marker:
        open(marker, "w").write("done")


def cpt(cfg_name, prefer="rot"):
    """Newest exp dir's checkpoint; prefer the best-<metric> checkpoint like
    the reference curriculum does (its entry scripts hardcode best-metric
    cpt names, kubric_train_joint.py:92-120), falling back to cpt_last."""
    d = os.path.join(OUT, "kubric", cfg_name)
    for exp in sorted(os.listdir(d), reverse=True) if os.path.isdir(d) else []:
        ed = os.path.join(d, exp)
        best = None
        if prefer:
            cands = []
            for f in os.listdir(ed):
                if f.startswith(f"cpt_best_{prefer}_"):
                    try:
                        cands.append((float(f.rsplit("_", 1)[1]), f))
                    except ValueError:
                        pass
            if cands:
                # rot: lower is better; psnr: higher is better
                cands.sort(reverse=(prefer == "psnr"))
                best = os.path.join(ed, cands[0][1])
        p = best or os.path.join(ed, "cpt_last")
        if os.path.exists(p):
            return p
    raise FileNotFoundError(d)


# Pre-render every scene the curriculum touches into the disk cache while
# HBM is empty: a lazy mid-training scene render (test split at the first
# validation) OOMed the first flagship attempt at epoch 10.
if SCALE in ("full", "full512"):
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "experiments/warm_synth_cache.py",
         str(max(SEQS, POSE_SEQS))],
        cwd="/root/repo", env=ENV)
    print(f"=== warm cache rc={r.returncode} ({time.time()-t0:.0f}s)",
          flush=True)
    if r.returncode != 0:
        raise SystemExit("cache warm failed")

# Flagship scale: no img-size/batch-size overrides — each stage runs its
# reference configuration (render.backend resolves to the fused pallas
# kernel on TPU). Train-time visualization limited to once per 200 iters
# (each vis is a host matplotlib round trip). --resume makes every stage
# restartable from its cpt_last (crash recovery; completed stages skip).
common = ["--synthetic", "--synthetic-seqs", str(SEQS),
          "--vis-freq", "200", "--output-dir", OUT, "--resume"]
if SCALE == "full512":
    common += ["--val-seqs", "128"]   # 32 val scenes; a 128-scene render
                                      # validation would dominate the stages
if not SCALE.startswith("full"):
    common += ["--batch-size", "1", "--img-size", "128"]


def val(key):
    return ["--val-every", str(VAL_EVERY[key]),
            "--save-every", str(SAVE_EVERY[key])]

# step 1.1: GT-pose reconstruction (kubric_train_pose_3D.py, gt_pose.yaml).
# FORGE_GT_INIT: warm-start from a prior round's GT checkpoint (round-4
# full512 continues the round-3 flagship gt model on the larger scene set).
gt_init = os.environ.get("FORGE_GT_INIT", "")
run("1.1 gt_pose", ["train", "--cfg", "configs/kubric/gt_pose.yaml",
                    "--family", "single",
                    "--epochs", str(EPOCHS["gt"])]
    + (["--load", f"*={gt_init}"] if gt_init else [])
    + common + val("gt"), done_key="gt")
gt_cpt = cpt("gt_pose", prefer=None)  # recon stage: last epoch

# step 1.2: 3D pose estimator (pred_pose_3d.yaml), encoder from 1.1.
# lr 5e-4 is the reference's at global batch 40 (8 GPUs x 5); at single-chip
# batch 5 the 8x-noisier gradients ran the translation head away after ~6k
# steps (exponential trans-loss blowup despite clip 10) — 1e-4 holds stable.
run("1.2 pose_3d", ["train", "--cfg", "configs/kubric/pred_pose_3d.yaml",
                    "--family", "single",
                    "--epochs", str(EPOCHS["p3d"]), "--lr", "1e-4",
                    "--load", f"encoder_3d,render={gt_cpt}"]
    + common + pose_seqs + val("p3d"), done_key="p3d")
p3d_cpt = cpt("pred_pose_3d")

# step 2: 2D pose estimator standalone (pred_pose_2d.yaml). lr 2e-4 is the
# reference's (Appendix A); the round-4 200-epoch run at 1e-4 plateaued by
# epoch 50 with TRAIN loss stuck at pose~0.21 (underfitting, not data).
run("2 pose_2d", ["train", "--cfg", "configs/kubric/pred_pose_2d.yaml",
                  "--family", "pose2d",
                  "--epochs", str(EPOCHS["p2d"]), "--lr", "2e-4"]
    + common + pose_seqs + val("p2d"), done_key="p2d")
p2d_cpt = cpt("pred_pose_2d")

# step 3.1: fused pose head (pretrain_pose_2d3d.yaml)
run("3.1 pose_head", ["train", "--cfg",
                      "configs/kubric/pretrain_pose_2d3d.yaml",
                      "--family", "full",
                      "--epochs", str(EPOCHS["head"]),
                      "--load", f"encoder_3d,render={gt_cpt}",
                      "--load", f"encoder_traj={p3d_cpt}",
                      "--load", f"encoder_traj_2d={p2d_cpt}"]
    + common + pose_seqs + val("head"), done_key="head")
head_cpt = cpt("pretrain_pose_2d3d")

# step 3.2: pose (pred_pose_2d3d.yaml)
run("3.2 pose", ["train", "--cfg", "configs/kubric/pred_pose_2d3d.yaml",
                 "--family", "full",
                 "--epochs", str(EPOCHS["pose"]), "--lr", "1e-4",
                 "--load", f"*={head_cpt}"]
    + common + pose_seqs + val("pose"), done_key="pose")
pose_cpt = cpt("pred_pose_2d3d")

# step 3.3: joint (joint_pose_2d3d.yaml) — drop fusion, re-load gt encoder
run("3.3 joint", ["train", "--cfg", "configs/kubric/joint_pose_2d3d.yaml",
                  "--family", "full",
                  "--epochs", str(EPOCHS["joint"]),
                  "--load", f"*={pose_cpt};drop=encoder_3d/fusion_feature",
                  "--load", f"encoder_3d={gt_cpt}"] + common + val("joint"), done_key="joint")
joint_cpt = cpt("joint_pose_2d3d")

# eval harness with refinement on the synthetic test split
eval_img = [] if SCALE.startswith("full") else ["--img-size", "128"]
run("eval", ["eval", "--cfg", "configs/kubric/optimize_seen.yaml",
             "--synthetic", "--synthetic-seqs", str(SEQS)] + eval_img + [
             "--output-dir", OUT,
             "--checkpoint", joint_cpt,
             "--render-checkpoint", gt_cpt,
             "--refine-multistart",
             "--iter-num", "200", "--max-instances", "4"])

print("\ncurriculum complete; checkpoints under", OUT, flush=True)
