#!/bin/bash
# One-shot recovery pipeline after a TPU relay outage:
#   curriculum (resumes from markers/cpt_last) -> rotate-kernel validation.
# Launch:  nohup bash experiments/post_outage.sh > /tmp/post_outage.log 2>&1 &
#          echo $! > /tmp/post_outage.pid
#
# Durability lesson (Aug 21 outage): the container wipe took /tmp with it —
# every curriculum checkpoint and the warm compile cache. Checkpoints now
# live under /root/repo/artifacts (gitignored, survives container resets);
# only the re-derivable caches stay in /tmp.
cd /root/repo || exit 1
OUT=${FORGE_CURRICULUM_OUT:-/root/repo/artifacts/curriculum_r5}
mkdir -p "$OUT"
GT_DEFAULT="$OUT/kubric/gt_pose/gt_pose/cpt_last"
[ -e "$GT_DEFAULT" ] && export FORGE_GT_INIT=${FORGE_GT_INIT:-$GT_DEFAULT}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/artifacts/jax_comp_cache}
# scene cache is chip-time-expensive to regenerate (device-side renders);
# keep it with the checkpoints, not in /tmp
export FORGE_SYNTH_CACHE=${FORGE_SYNTH_CACHE:-/root/repo/artifacts/synth_cache}

echo "=== $(date -u) curriculum"
python experiments/run_curriculum.py "$OUT" --scale full512 \
    >> "$OUT/driver.log" 2>&1
echo "=== $(date -u) curriculum rc=$?"

echo "=== $(date -u) refinement-basin sweep (trained GT checkpoint)"
GT_CPT="$OUT/kubric/gt_pose/gt_pose/cpt_last"
if [ -e "$GT_CPT" ]; then
    timeout 3600 python experiments/basin_sweep.py "$GT_CPT" --iters 300 \
        > /root/repo/artifacts/basin_sweep.log 2>&1
    echo "=== $(date -u) basin sweep rc=$? (artifacts/basin_sweep.log)"
    grep -v Warning /root/repo/artifacts/basin_sweep.log | tail -20
else
    echo "=== no GT checkpoint at $GT_CPT; basin sweep skipped"
fi

echo "=== $(date -u) one-command torch-checkpoint CLI demo"
timeout 3600 python experiments/torch_cpt_demo.py \
    > /root/repo/artifacts/torch_cpt_demo.log 2>&1
echo "=== $(date -u) torch cpt demo rc=$? (artifacts/torch_cpt_demo.log)"
