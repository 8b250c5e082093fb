"""Round-4 session 19: VMEM-pressure hypothesis for the overlap failure.

Session 18: the full kernel's compute (~0.95 us/step) does not overlap
the plane DMA (floor 1.07 us/step at the 750 GB/s measured ceiling),
while removing ANY one stage reaches the floor — suggesting VMEM
pressure (4 MB resident y + 2 MB resident x + ~4 MB intermediates)
forces single-buffered inputs. Test: same 10M nnz on 5x fewer rows
(y block 0.8 MB instead of 4 MB). If the full kernel then runs at its
DMA floor, the pressure hypothesis is confirmed and the fix is a
smaller resident y (streamed-y blocks) at scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session19.py > /tmp/tpu_r4_s19.log 2>&1 &
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
    run_cell("synth-10M-dense", 2048, 200, {}, "gf3-c2048-relsl")
    run_cell("synth-10M-dense", 2048, 200, {"SMVP_SELL_REDUCE1": "1"},
             "gf3-c2048-relsl-r1")
    run_cell("synth-10M-dense", 1024, 200, {}, "gf3-c1024-relsl")
    print(f"session19 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
