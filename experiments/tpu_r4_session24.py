"""Round-4 session 24: small-matrix chunk-up probe (headline tuning).

memplus at c2048 runs 113 Gslot/s vs the 135 at-scale rate — the
4-chunk launch is partially wrap-shadowed. Fewer, bigger chunks may
lift the headline; alternate with controls in-process.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session24.py > /tmp/tpu_r4_s24.log 2>&1 &
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

V100 = {"SMVP_SELL_VMEM_MB": "100"}


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("memplus", 2048, 4000, {}, "gf3-c2048-ctl")
    run_cell("memplus", 4096, 4000, {}, "gf3-c4096")
    run_cell("memplus", 8192, 4000, V100, "gf3-c8192-v100")
    run_cell("pwt", 2048, 4000, {}, "gf3-c2048-ctl")
    run_cell("pwt", 4096, 4000, {}, "gf3-c4096")
    print(f"session24 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
