#!/bin/bash
# Unattended chip-time pipeline for the gap between driver rounds.
#
# The Aug-21 outage + container reset left the round with a degraded relay
# (trivial matmul ~90 s while the server drained a killed client's compile)
# and no surviving checkpoints. This script waits until (a) an initial grace
# period has passed so the driver's end-of-round bench.py owns the chip
# first, and (b) the relay answers a trivial op quickly, then re-runs bench
# (logged durably) and the full 512-scene curriculum with durable outputs.
#
# Launch:  nohup bash experiments/between_rounds.sh > /root/repo/artifacts/between_rounds.log 2>&1 &
#          echo $! > /root/repo/artifacts/between_rounds.pid
cd /root/repo || exit 1
mkdir -p artifacts
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/artifacts/jax_comp_cache}

GRACE_S=${FORGE_BR_GRACE_S:-10800}   # 3 h: let the driver's bench finish first
echo "=== $(date -u) grace sleep ${GRACE_S}s"
sleep "$GRACE_S"

# wait (up to 12 h) for a healthy relay: trivial op answered within 120 s.
# If it never becomes healthy, STOP — launching the curriculum against a
# dead tunnel hangs every device op forever (the round-4 failure mode)
# and leaves a zombie pipeline holding the pid file.
echo "=== $(date -u) waiting for relay health"
HEALTHY=0
for i in $(seq 1 144); do
    if timeout 120 python -c \
        "import jax,jax.numpy as jnp;print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" \
        > /dev/null 2>&1; then
        echo "=== $(date -u) relay healthy (attempt $i)"; HEALTHY=1; break
    fi
    sleep 300
done
if [ "$HEALTHY" != 1 ]; then
    echo "=== $(date -u) relay never became healthy in 12 h; aborting"
    rm -f artifacts/between_rounds.pid
    exit 1
fi

echo "=== $(date -u) bench"
timeout 7200 python bench.py > artifacts/bench_between_rounds.log 2>&1
echo "=== $(date -u) bench rc=$? (artifacts/bench_between_rounds.log)"

echo "=== $(date -u) curriculum"
# generous bound: a hung device op against a re-died relay must not hold
# the pipeline forever (curriculum itself resumes from markers on relaunch)
timeout 36000 bash experiments/post_outage.sh
echo "=== $(date -u) pipeline done rc=$?"
