#!/bin/bash
# Round-4 pipeline, part 2: probe the tunnel, take the lock, then run
#   1. tpu_r4_session4.py — at-scale stage attribution + sharded rates
#                           + the synth-4M HTTP-413 retry
#   2. tpu_r2_stage2.py   — TJDS-hybrid attribution + solver/GCN rates
# Lock protocol per tpu_watch.sh: PID in /tmp/smvp_tpu.lock so bench.py
# waits instead of contending.
set -u
LOG=${LOG:-/tmp/tpu_r4_s4.log}
LOCK=/tmp/smvp_tpu.lock
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

probe() {
  timeout 300 python -u -c "
import jax
print('devices:', jax.devices(), flush=True)
import jax.numpy as jnp
jax.jit(lambda x: x*2)(jnp.ones(8)).block_until_ready()
print('PROBE_OK', flush=True)
" 2>&1
}

for attempt in $(seq 1 24); do
  if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK" 2>/dev/null)" 2>/dev/null; then
    echo "=== lock held by $(cat "$LOCK"); waiting $(date +%H:%M:%S) ===" >> "$LOG"
    sleep 300
    continue
  fi
  echo "=== probe attempt $attempt $(date +%H:%M:%S) ===" >> "$LOG"
  out=$(probe)
  echo "$out" | tail -3 >> "$LOG"
  if echo "$out" | grep -q PROBE_OK; then
    echo $$ > "$LOCK"
    trap 'rm -f "$LOCK"' EXIT
    echo "=== tunnel up; session4 $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 3600 python -u experiments/tpu_r4_session4.py >> "$LOG" 2>&1
    echo "=== session4 done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    echo "=== stage2 $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 2400 python -u experiments/tpu_r2_stage2.py >> "$LOG" 2>&1
    echo "=== stage2 done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  sleep 600
done
echo "=== gave up: tunnel never answered $(date +%H:%M:%S) ===" >> "$LOG"
exit 1
