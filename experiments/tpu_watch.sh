#!/bin/bash
# Tunnel watcher v3: probe the TPU every ~15 min; when it answers, take
# the tunnel lock and run the round-3 measurement pipeline:
#   1. tpu_r3_session.py  — full kernel A/B matrix + autotuner calibration
#   2. tpu_r2_stage2.py   — TJDS-hybrid stage attribution (VERDICT item 4)
#   3. SMVP_TESTS_TPU=1 hardware-gated pytest surface
#   4. bench.py           — warms /root/.jax_cache with the exact fused
#                           program the driver's bench run will need
# Only ONE process owns the tunnel at a time; /tmp/smvp_tpu.lock (PID
# inside) tells bench.py's supervisor to wait instead of contending.
set -u
LOG=/tmp/tpu_watch.log
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

for attempt in $(seq 1 60); do
  echo "=== probe attempt $attempt $(date +%H:%M:%S) ===" >> "$LOG"
  out=$(probe)
  echo "$out" | tail -3 >> "$LOG"
  if echo "$out" | grep -q PROBE_OK; then
    echo $$ > "$LOCK"
    trap 'rm -f "$LOCK"' EXIT
    echo "=== tunnel up; running r3 session $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 7200 python -u experiments/tpu_r3_session.py >> "$LOG" 2>&1
    echo "=== session done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    echo "=== stage2 attribution ===" >> "$LOG"
    timeout 2400 python -u experiments/tpu_r2_stage2.py >> "$LOG" 2>&1
    echo "=== stage2 done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    echo "=== hardware-gated tests ===" >> "$LOG"
    # --timeout needs the pytest-timeout plugin; probe for it instead of
    # retrying on failure (a retry would burn another hour of tunnel
    # window re-running genuinely failing tests).
    if python -c "import pytest_timeout" 2>/dev/null; then
      timeout 3600 env SMVP_TESTS_TPU=1 python -m pytest \
        tests/test_tpu_hw.py -q --timeout=900 >> "$LOG" 2>&1
    else
      timeout 3600 env SMVP_TESTS_TPU=1 python -m pytest \
        tests/test_tpu_hw.py -q >> "$LOG" 2>&1
    fi
    echo "=== gated tests done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    rm -f "$LOCK"   # bench.py supervises itself; must not see our lock
    echo "=== running bench.py (cache warm + headline) ===" >> "$LOG"
    timeout 3000 python bench.py >> "$LOG" 2>&1
    echo "=== bench done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  sleep 600
done
echo "=== gave up after 60 attempts ===" >> "$LOG"
exit 1
