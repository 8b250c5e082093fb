"""Round-4 session 15: replicate the c3072 outlier; neighbor chunks.

Session 14's synth-10M c3072-relsl cell fit 154 us/iter (64 Gnnz/s =
78% of HBM roofline) but with bend +0.34 — a non-linear fit that
usually means chip contention hit one timing point. Replicate it twice
and bracket with c2560/c3584 before believing it.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session15.py > /tmp/tpu_r4_s15.log 2>&1 &
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


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("synth-10M", 3072, 200, {}, "gf3-c3072-relsl-r1")
    run_cell("synth-10M", 3072, 200, {}, "gf3-c3072-relsl-r2")
    run_cell("synth-10M", 2560, 200, {}, "gf3-c2560-relsl")
    run_cell("synth-10M", 3584, 200, {}, "gf3-c3584-relsl")
    run_cell("synth-10M", 2048, 200, {}, "gf3-c2048-relsl-r3")
    print(f"session15 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
