"""Round-4 session 14: relsl fine-tuning — chunk at small scale,
reduce1, and a repeatability check of the 44.7 Gnnz/s flagship cell.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session14.py > /tmp/tpu_r4_s14.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session14.py
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

R1 = {"SMVP_SELL_REDUCE1": "1"}


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    # relsl is the default now — {} cells run it.
    run_cell("memplus", 2048, 4000, {}, "gf3-c2048-relsl")
    run_cell("pwt", 2048, 4000, {}, "gf3-c2048-relsl")
    run_cell("synth-10M", 2048, 200, {}, "gf3-c2048-relsl-rep")
    run_cell("synth-10M", 2048, 200, R1, "gf3-c2048-relsl-reduce1")
    run_cell("synth-10M", 3072, 200, {}, "gf3-c3072-relsl")
    print(f"session14 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
