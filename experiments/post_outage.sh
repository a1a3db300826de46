#!/bin/bash
# One-shot recovery pipeline after a TPU relay outage:
#   curriculum (resumes from markers/cpt_last) -> rotate-kernel validation.
# Launch:  nohup bash experiments/post_outage.sh > /tmp/post_outage.log 2>&1 &
#          echo $! > /tmp/post_outage.pid
cd /root/repo || exit 1
export FORGE_GT_INIT=${FORGE_GT_INIT:-/tmp/curriculum_full/kubric/gt_pose/gt_pose/cpt_last}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache

echo "=== $(date -u) curriculum"
python experiments/run_curriculum.py /tmp/curriculum_r4 --scale full512 \
    >> /tmp/curriculum_r4/driver.log 2>&1
echo "=== $(date -u) curriculum rc=$?"

echo "=== $(date -u) rotate kernel validation"
timeout 2400 python experiments/rotate_probe.py > /tmp/rotate_probe.log 2>&1
echo "=== $(date -u) rotate probe rc=$?"
grep -v Warning /tmp/rotate_probe.log | tail -12
