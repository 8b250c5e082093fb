"""Round-4 session 5: packed-plane + split-launch A/B, resynced timing.

Acts on micro3's verdict (experiments/micro3_tpu.py, measured on v5e):
the 4-stream SELL plane layout moves at ~125-250 GB/s while one stream
moves 480 GB/s and two 2-stream calls aggregate 579 GB/s — DMA stream
COUNT, not byte count, throttles the launch. Two structural candidates,
both bit-exact vs the split planes (tests/test_pallas.py):

  SMVP_SELL_PACK=1    ONE int32 plane carries val(bf16)|rel(9b)|lidx(7b)
                      → 2 input streams per grid step instead of 4,
                      at 4 B/slot instead of 3.03 B/slot
  SMVP_SELL_SPLIT=N   chunk sweep partitioned across N pallas_calls,
                      partial ys summed (micro3 "dual")

Also re-baselines the round-4 flagship cells with the FETCH-SYNCED
harness (bench_spmv_fused now syncs on a host fetch of a 1-element
probe: block_until_ready can return early through the axon tunnel and
the old numbers may undercount).

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session5.py > /tmp/tpu_r4_s5.log 2>&1 &
CPU dry run (interpreter, surrogate sizes):
  SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session5.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _attempt

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"


def run_env(env, name, **kw):
    """One s3.run cell under a temporary SMVP_* env (read at trace time)."""
    for k, v in env.items():
        os.environ[k] = v
    try:
        _attempt(s3.run, name, kw)
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    bf16 = jnp.bfloat16

    # A. Re-baseline the flagship cells with the fetch-synced harness.
    run_env({}, "memplus", value_dtype=bf16, label=" bf16-resync")
    run_env({}, "pwt", value_dtype=bf16, label=" bf16-resync")
    run_env({}, "synth-10M", value_dtype=bf16, chunk=2048, iterations=50,
            label=" bf16-c2048-resync")

    # B. Packed plane (2 input streams / step).
    run_env({"SMVP_SELL_PACK": "1"}, "memplus", value_dtype=bf16,
            label=" bf16-packed")
    run_env({"SMVP_SELL_PACK": "1"}, "pwt", value_dtype=bf16,
            label=" bf16-packed")
    run_env({"SMVP_SELL_PACK": "1"}, "synth-10M", value_dtype=bf16,
            chunk=2048, iterations=50, label=" bf16-c2048-packed")

    # C. Split launches (micro3 "dual"), alone and composed with packed.
    run_env({"SMVP_SELL_SPLIT": "2"}, "synth-10M", value_dtype=bf16,
            chunk=2048, iterations=50, label=" bf16-c2048-split2")
    run_env({"SMVP_SELL_PACK": "1", "SMVP_SELL_SPLIT": "2"}, "synth-10M",
            value_dtype=bf16, chunk=2048, iterations=50,
            label=" bf16-c2048-packed-split2")
    run_env({"SMVP_SELL_PACK": "1", "SMVP_SELL_SPLIT": "4"}, "synth-10M",
            value_dtype=bf16, chunk=2048, iterations=50,
            label=" bf16-c2048-packed-split4")
    run_env({"SMVP_SELL_PACK": "1", "SMVP_SELL_SPLIT": "2"}, "memplus",
            value_dtype=bf16, label=" bf16-packed-split2")

    # D. Packed at other chunk sizes (the stream count interacts with
    # per-step block size).
    run_env({"SMVP_SELL_PACK": "1"}, "synth-10M", value_dtype=bf16,
            chunk=1024, iterations=50, label=" bf16-c1024-packed")
    run_env({"SMVP_SELL_PACK": "1"}, "synth-10M", value_dtype=bf16,
            chunk=4096, iterations=50, label=" bf16-c4096-packed")

    print(f"session5 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
