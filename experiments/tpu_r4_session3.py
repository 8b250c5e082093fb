"""Round-4 perf attribution: where do the non-traffic microseconds go?

Session 1/2 measured the fixed kernel: synth-10M 9.5-11.2 Gnnz/s and a
~150 us floor on memplus/pwt that no config (chunk, passes, dtype)
moves. Hypotheses to separate:

  H1 per-launch overhead — a pallas_call inside a fori_loop costs a
     fixed setup (pipeline prologue, scalar prefetch) regardless of
     work: measure an (almost) empty kernel in the same fused loop.
  H2 per-grid-step overhead — same kernel at grid 1 vs 8 vs 64.
  H3 grid-step amortization at scale — synth-10M bf16 at chunk
     2048/4096 (fewer, fatter steps).
  H4 fused-SpMM overhead amortization — synth-10M bf16 k=8.

Plus the synth-4M streamed config retried on the closure_convert fix
(HTTP 413: constants now ride as jit parameters, not HLO constants).
Appends to tpu_r4_results.jsonl.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _attempt, _record

s3.RESULTS = RESULTS


def micro_overhead(grid_steps: int, iterations: int = 400):
    """Per-iteration cost of a (nearly) empty pallas_call in the fused
    loop: copies one (16, 128) f32 block per grid step. Isolates launch
    + per-step pipeline overhead from real kernel work."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:]

    x = jnp.ones((16 * grid_steps, 128), jnp.float32)

    def copy(_, xx):
        return pl.pallas_call(
            kernel,
            grid=(grid_steps,),
            in_specs=[pl.BlockSpec((16, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=jax.devices()[0].platform != "tpu",
        )(xx)

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused

    stats = bench_spmv_fused(copy, None, x, iterations=iterations,
                             repeats=3)
    rec = {
        "ts": time.time(), "kind": "micro-overhead",
        "name": f"empty-grid{grid_steps}",
        "avg_us": float(stats.avg_ms * 1e3), "iterations": iterations,
    }
    _record(rec)
    print(f"micro empty-grid{grid_steps}: {stats.avg_ms*1e3:8.2f} us/iter",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # H1/H2: launch + grid-step overhead floor.
    for g in (1, 8, 64):
        try:
            micro_overhead(g)
        except Exception as e:  # noqa: BLE001
            print(f"micro grid{g} FAILED: {str(e)[:200]}", flush=True)
            _record({"ts": time.time(), "kind": "micro-overhead",
                     "name": f"empty-grid{g}", "ok": False,
                     "error": str(e)[:300]})

    stages = [
        # Floor at the smallest real matrix (1 chunk, S=16).
        ("curtis54", dict(label=" f32-timed", iterations=400)),
        # H3: fatter chunks at 10M nnz (fewer grid steps).
        ("synth-10M", dict(value_dtype=jnp.bfloat16, chunk=2048,
                           iterations=50, label=" bf16-c2048")),
        ("synth-10M", dict(value_dtype=jnp.bfloat16, chunk=4096,
                           iterations=50, label=" bf16-c4096")),
        # memplus with 1-2 grid steps total.
        ("memplus", dict(chunk=4096, label=" f32-c4096")),
        ("memplus", dict(value_dtype=jnp.bfloat16, chunk=4096,
                         label=" bf16-c4096")),
        # 413 retry: streamed 4M rows on the closure_convert harness.
        ("synth-4M", dict(iterations=50, stream=True,
                          label=" f32-stream")),
    ]
    for name, kw in stages:
        _attempt(s3.run, name, kw)

    # H4: fused SpMM at scale (plane traffic amortized over 8 columns).
    for sname, skw in [
        ("synth-10M", dict(k=8, fused=True, iterations=20,
                           label=" spmm8-fused")),
        ("synth-10M", dict(k=8, fused=False, iterations=20,
                           label=" spmm8-vmap")),
    ]:
        _attempt(s3.run_spmm, sname, skw)
    print(f"session3 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
