"""Round-4 session 6: TRUE stage attribution (fetch-synced harness).

Session-4's attribution ran on the old block_until_ready sync, which the
axon tunnel can satisfy EARLY (micro3's loop "finished" 468 ms before
its result existed) — its stage deltas are unreliable: the "stream
floor" it reported (710 us at the flagship config) is 2.5x the time
micro3's structurally identical frame measures with a host-fetch
barrier (285 us, copy4-xy). This session re-runs the attribution cells
through the FIXED bench_spmv_fused on the flagship configs, plus the
extra variants the round-5 kernel decision needs:

  full / no-table / no-shuffle / reduce1 / no-reduce / stream
  (tpu_r4_session4's ladder, production-mirroring kernels)

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session6.py > /tmp/tpu_r4_s6.log 2>&1 &
CPU dry run:
  SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session6.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tpu_r3_session as s3
import tpu_r4_session4 as s4
from tpu_r4_session import RESULTS

s3.RESULTS = RESULTS


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    # The flagship at-scale config and the small-matrix floor config.
    s4.run_attr("synth-10M", value_dtype=jnp.bfloat16, chunk=2048,
                iterations=50)
    s4.run_attr("memplus", value_dtype=jnp.bfloat16, chunk=1024,
                iterations=200)
    print(f"session6 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
