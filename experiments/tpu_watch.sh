#!/bin/bash
# Tunnel watcher: probe the TPU every ~15 min; when it answers, run the
# round-2 measurement session + bench.py, then exit. Only ONE process
# owns the tunnel at a time — this watcher is that process while probing.
set -u
LOG=/tmp/tpu_watch.log
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

for attempt in $(seq 1 40); do
  echo "=== probe attempt $attempt $(date +%H:%M:%S) ===" >> "$LOG"
  out=$(probe)
  echo "$out" | tail -3 >> "$LOG"
  if echo "$out" | grep -q PROBE_OK; then
    echo "=== tunnel up; running r2 session $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 5400 python -u experiments/tpu_r2_session.py >> "$LOG" 2>&1
    echo "=== session done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    echo "=== running bench.py ===" >> "$LOG"
    timeout 1800 python bench.py >> "$LOG" 2>&1
    echo "=== bench done rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  sleep 600
done
echo "=== gave up after 40 attempts ===" >> "$LOG"
exit 1
