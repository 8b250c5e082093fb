#!/bin/bash
# Round-5 TPU cell campaign: one subprocess per cell under timeout so a
# wedged remote Mosaic compile costs one cell, not the session
# (PERFORMANCE.md round-5 "Mosaic hang mode").
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
CELLS=${1:-$(python experiments/tpu_r5_session1.py --list)}
for c in $CELLS; do
  echo "=== cell $c $(date +%H:%M:%S) ==="
  timeout 1500 python -u experiments/tpu_r5_session1.py "$c" || echo "cell $c TIMEOUT/FAIL rc=$?"
done
echo "CELLS DONE $(date +%H:%M:%S)"
