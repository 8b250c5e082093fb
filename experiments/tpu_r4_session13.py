"""Round-4 session 13: grid-fused config sweep — plain vs packed vs relsl.

Under the honest grid-fused protocol (PERFORMANCE.md sessions 6-12),
sweep the three plane layouts x chunk sizes and pick the flagship
config on measured data:

  plain   4 input streams, 3.03 B/slot (bf16 vals + i8 lidx + rel + sl)
  packed  2 streams, 4 B/slot (val‖rel‖lidx int32 + sl)
  relsl   3 streams, 3.03 B/slot (vals + lidx + rel‖sl merged)

Timing: least-squares slope of T(N)/T(2N)/T(4N), 5 fetch-synced
samples each; every cell gated against the bf16 oracle.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session13.py > /tmp/tpu_r4_s13.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session13.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tpu_r3_session as s3
from tpu_r4_session import RESULTS
from tpu_r4_session12 import run_cell

s3.RESULTS = RESULTS

PACK = {"SMVP_SELL_PACK": "1"}
RELSL = {"SMVP_SELL_RELSL": "1"}


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for chunk in (1024, 2048, 4096):
        run_cell("synth-10M", chunk, 200, {}, f"gf3-c{chunk}-plain")
        run_cell("synth-10M", chunk, 200, PACK, f"gf3-c{chunk}-packed")
        run_cell("synth-10M", chunk, 200, RELSL, f"gf3-c{chunk}-relsl")
    run_cell("memplus", 1024, 4000, RELSL, "gf3-relsl")
    run_cell("pwt", 1024, 4000, RELSL, "gf3-relsl")
    print(f"session13 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
