"""Round-4 session 23: VMEM budget x chunk size, alternating A/B.

Session 22's SpMV cells were contention-noisy (control drifted 217->268
us between sessions). This session alternates control and v64 cells
in-process, and retries the c8192 plan (whose compile failed with
HTTP 500 at the default budget) at VMEM_MB=100 — if VMEM was the
killer, bigger chunks open up.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session23.py > /tmp/tpu_r4_s23.log 2>&1 &
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

V64 = {"SMVP_SELL_VMEM_MB": "64"}
V100 = {"SMVP_SELL_VMEM_MB": "100"}


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for rep in range(2):
        run_cell("synth-10M", 2048, 200, {}, f"gf3-c2048-ctl-r{rep}")
        run_cell("synth-10M", 2048, 200, V64, f"gf3-c2048-v64-r{rep}")
    run_cell("synth-10M", 4096, 200, V64, "gf3-c4096-v64")
    run_cell("synth-10M", 8192, 100, V100, "gf3-c8192-v100")
    print(f"session23 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
