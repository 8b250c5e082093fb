"""Round-4 session 9: fit the pallas launch cost model; sweep chunk up.

Session 8's ladder showed structure-independent floors: EVERY memplus
cell ~125-147 us (8 steps) and an EMPTY 112-step launch 555 us — the
flagship kernel is overhead-bound, not DMA- or compute-bound. But the
implied ~4.1 us/step contradicts the measured c=1024 (224-step) cell at
786 us, so the per-step cost must depend on block size or the probe is
confounded. This session fits the model cleanly:

  loop-floor   fori_loop body with NO pallas call (DUS + scalar add)
  gridN        minimal kernel ((8,128) blocks, revisited out) at
               grid n ∈ {1, 8, 28, 56, 112, 224, 448}
  grid112f     grid=112 with FRESH (i,0) output blocks (does the
               revisited-accumulator pattern cost per step?)
  grid112big   grid=112 reading a real (2048,128) bf16 block per step
               (step cost at production block size, 1 stream)

and sweeps the real kernel to fewer, bigger steps (the lever if
per-step overhead is real): c ∈ {4096, 8192, 16384} x {packed,
packed+split2} on synth-10M.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session9.py > /tmp/tpu_r4_s9.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session9.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _attempt, _record
from tpu_r4_session7 import _time_loop

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"


def probe_loop_floor(_name, iterations=200):
    import jax
    import jax.numpy as jnp

    if QUICK:
        iterations = 3
    x = jnp.ones((8, 128), jnp.float32)
    us = _time_loop(lambda xx: xx * 2.0, (x,), iterations, 0,
                    "probe", "loop-floor", 1)
    _record({"ts": time.time(), "kind": "launch-model",
             "cell": "loop-floor", "avg_us": us,
             "iterations": iterations})


def probe_grid(_name, n=1, fresh=False, big=False, iterations=200):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if QUICK:
        iterations = 3
    interpret = jax.devices()[0].platform != "tpu"
    if big:
        src = jnp.ones((n * 2048, 128), jnp.bfloat16)
        in_specs = [pl.BlockSpec((2048, 128), lambda i: (i, 0))]
    else:
        src = jnp.ones((8, 128), jnp.float32)
        in_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0))]

    if fresh:
        out_specs = pl.BlockSpec((8, 128), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((n * 8, 128), jnp.float32)

        def kern(d_ref, y_ref):
            y_ref[:] = (d_ref[0:8, :] if big else d_ref[:]).astype(
                jnp.float32
            )
    else:
        out_specs = pl.BlockSpec((8, 128), lambda i: (0, 0))
        out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

        def kern(d_ref, y_ref):
            @pl.when(pl.program_id(0) == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

            y_ref[:] += (d_ref[0:8, :] if big else d_ref[:]).astype(
                jnp.float32
            )

    fn = lambda s: pl.pallas_call(  # noqa: E731
        kern, grid=(n,), interpret=interpret,
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
    )(s)
    tag = f"grid{n}{'f' if fresh else ''}{'big' if big else ''}"
    us = _time_loop(fn, (src,), iterations, 0, "probe", tag, 1)
    _record({"ts": time.time(), "kind": "launch-model", "cell": tag,
             "grid": n, "fresh": fresh, "big": big, "avg_us": us,
             "iterations": iterations})


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    _attempt(probe_loop_floor, "probe", {})
    for n in (1, 8, 28, 56, 112, 224, 448):
        _attempt(probe_grid, "probe", dict(n=n))
    _attempt(probe_grid, "probe", dict(n=112, fresh=True))
    _attempt(probe_grid, "probe", dict(n=112, big=True, iterations=50))
    _attempt(probe_grid, "probe", dict(n=28, big=True, iterations=50))

    # Chunk-up sweep on the real kernel (fewer, bigger steps).
    for chunk in (4096, 8192, 16384):
        for env, lab in (
            ({"SMVP_SELL_PACK": "1"}, "packed"),
            ({"SMVP_SELL_PACK": "1", "SMVP_SELL_SPLIT": "2"},
             "packed-split2"),
        ):
            for k, v in env.items():
                os.environ[k] = v
            try:
                _attempt(s3.run, "synth-10M",
                         dict(value_dtype=jnp.bfloat16, chunk=chunk,
                              iterations=50,
                              label=f" bf16-c{chunk}-{lab}"))
            finally:
                for k in env:
                    os.environ.pop(k, None)
    print(f"session9 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
