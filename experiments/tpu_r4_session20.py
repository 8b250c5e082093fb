"""Round-4 session 20: streamed-y small blocks at the 1M-row flagship.

Session 19 proved the resident (NS,128) y's VMEM pressure blocks
DMA/compute overlap at 1M rows (69 Gnnz/s with a 0.8 MB y vs 45.7 with
4 MB). The v7 flush-behind plan shrinks the live y to one small block;
this session sweeps the block size at the flagship config under the
grid-fused protocol (streamed bench_loop, relsl layout).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session20.py > /tmp/tpu_r4_s20.log 2>&1 &
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
    for ybr in (32768, 65536, 131072, 262144):
        run_cell("synth-10M", 2048, 200, {},
                 f"gf3-c2048-relsl-ystream{ybr//1024}k",
                 y_block_rows=ybr)
    # resident control in the same process (contention-comparable)
    run_cell("synth-10M", 2048, 200, {}, "gf3-c2048-relsl-resident")
    print(f"session20 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
