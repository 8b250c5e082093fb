"""Round-4 session 22: does raising Mosaic's VMEM budget restore
double-buffering (the sessions-18/19 overlap question)?

SMVP_SELL_VMEM_MB threads pltpu.CompilerParams(vmem_limit_bytes=...)
into every pallas_call. Cells: flagship SpMV at raised budgets, and
the 1M-row fused CG that previously crashed the Mosaic compile.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session22.py > /tmp/tpu_r4_s22.log 2>&1 &
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
from tpu_r4_session16 import run_cell as run_cg_cell

s3.RESULTS = RESULTS


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("synth-10M", 2048, 200, {}, "gf3-c2048-relsl-ctl")
    for mb in (32, 64, 100):
        run_cell("synth-10M", 2048, 200,
                 {"SMVP_SELL_VMEM_MB": str(mb)},
                 f"gf3-c2048-relsl-v{mb}")
    # 1M-row fused CG with a raised budget (state 20 MB)
    os.environ["SMVP_SELL_VMEM_MB"] = "100"
    try:
        run_cg_cell("spd-large-v100", 1_000_000, 50)
    finally:
        os.environ.pop("SMVP_SELL_VMEM_MB", None)
    print(f"session22 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
