"""Round-4 session 17: the practical HBM stream ceiling, grid-fused.

The flagship kernel runs at ~410 GB/s effective = 51% of the NOMINAL
v5e HBM roofline (819 GB/s). This session measures what a pure stream
actually achieves through the same launch structure — grid =
(iterations, blocks), one (2048, 128) read per step, accumulate into a
small revisited output — so the kernel's roofline fraction can be
stated against the chip's MEASURED ceiling rather than the datasheet.

Rungs: f32 read, bf16 read, 2-stream read (bf16+int8, the split-plane
shape), int32 read (the packed/relsl shape).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session17.py > /tmp/tpu_r4_s17.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session17.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _record

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"

CHUNK = 2048
NBLK = 4 if QUICK else 112  # matches the flagship grid


def run_rung(rung, base_iters=200):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if QUICK:
        base_iters = 2
    interpret = jax.devices()[0].platform != "tpu"
    S = CHUNK * NBLK
    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16, "i32": jnp.int32,
          "2stream": jnp.bfloat16}[rung]
    a = jnp.ones((S, 128), dt)
    b = jnp.ones((S, 128), jnp.int8) if rung == "2stream" else None
    spec = pl.BlockSpec((CHUNK, 128), lambda it, ch: (ch, 0))
    out_spec = pl.BlockSpec((8, 128), lambda it, ch: (0, 0))
    out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    if rung == "2stream":
        def kern(a_ref, b_ref, y_ref):
            @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                     pl.program_id(1) == 0))
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

            y_ref[:] += (a_ref[0:8, :].astype(jnp.float32)
                         + b_ref[0:8, :].astype(jnp.float32))

        def call(n):
            return jax.jit(lambda aa, bb: pl.pallas_call(
                kern, grid=(n, NBLK), interpret=interpret,
                in_specs=[spec, spec], out_specs=out_spec,
                out_shape=out_shape,
            )(aa, bb))
        args = (a, b)
        bytes_per_iter = S * 128 * 3
    else:
        def kern(a_ref, y_ref):
            @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                     pl.program_id(1) == 0))
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

            y_ref[:] += a_ref[0:8, :].astype(jnp.float32)

        def call(n):
            return jax.jit(lambda aa: pl.pallas_call(
                kern, grid=(n, NBLK), interpret=interpret,
                in_specs=[spec], out_specs=out_spec,
                out_shape=out_shape,
            )(aa))
        args = (a,)
        bytes_per_iter = S * 128 * a.dtype.itemsize

    pts = [base_iters, 2 * base_iters, 4 * base_iters]
    ts = []
    for n in pts:
        f = call(n)
        np.asarray(f(*args))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter_ns()
            np.asarray(f(*args))
            samples.append((time.perf_counter_ns() - t0) / 1e3)
        ts.append(min(samples))
    A = np.vstack([pts, np.ones(3)]).T
    (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                             rcond=None)
    gbs = bytes_per_iter / max(slope, 1e-9) / 1e3
    _record({"ts": time.time(), "kind": "stream-ceiling", "rung": rung,
             "bytes_per_iter": bytes_per_iter, "us_per_iter": float(slope),
             "gb_s": float(gbs), "intercept_us": float(intercept),
             "iters_pts": pts,
             "device": __import__("jax").devices()[0].device_kind})
    print(f"stream {rung:8s}: {slope:9.2f} us/iter  {gbs:7.1f} GB/s",
          flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for rung in ("f32", "bf16", "i32", "2stream"):
        try:
            run_rung(rung)
        except Exception as e:  # noqa: BLE001
            _record({"ts": time.time(), "kind": "stream-ceiling",
                     "rung": rung, "ok": False,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            print(f"stream {rung} FAILED: {str(e)[:200]}", flush=True)
    print(f"session17 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
