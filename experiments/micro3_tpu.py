"""Micro ladder 3: WHY does the SELL plane stream run at 124 GB/s?

Session-4 attribution (tpu_r4_results.jsonl, attr cells) decomposed the
flagship synth-10M bf16 c=2048 launch (855 us):

    stream floor (planes only, no compute)   710 us  = 124 GB/s eff.
    + table matmul                            ~41 us
    + lane-shuffle gather                     ~50 us
    + windowed reduce                         ~68 us

and memplus/pwt showed a ~90-140 us per-LAUNCH fixed cost (empty
pallas_call in the same fused loop: 0.36 us). So the kernel is
pipeline/DMA-bound, not compute-bound: plane streaming moves at ~15%
of the v5e HBM roofline. This ladder isolates the structure that
throttles it — each rung adds ONE element of the production launch:

  r1  copy      1 f32 input (2048,128) blocks, fresh output blocks
  r2  copy-b16  same, bf16 input (is it a narrow-dtype DMA penalty?)
  r3  copy4     the 4 SELL planes (bf16 + int8 + (c,1) i32 + (1,1,c)
                i32), fresh f32 out (is it many-operands-per-step?)
  r4  copy4-rv  + revisited (2048,128) accumulator out, @pl.when init
                (is it the revisited-output pipeline mode?)
  r5  copy4-sm  + SMEM bases operand, indexed per step
                (is it the SMEM scalar read?)
  r6  copy4-xy  + resident x block (7824,128) bf16 input at (0,0) and
                revisited y (7824,128) f32 out with a dynamic-offset
                += (the production frame minus all compute)
  r7  grid224   r4 at chunk=1024/grid=224 (per-step size scaling)
  r8  dual      r4 with the 4 DMAs split across two pallas_calls of 2
                planes each, summed (do parallel launches overlap?)

Every rung reports GB/s over the bytes it actually moves. Appends
kind="micro3" records to tpu_r4_results.jsonl.

Run (tunnel discipline):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/micro3_tpu.py > /tmp/micro3.log 2>&1 &
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpu_r4_session import RESULTS, _record

QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"

CHUNK = 2048
GRID = 14 if QUICK else 112
NS = 512 if QUICK else 7824
CT = 512 if QUICK else 7824


def _mk(rung):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.devices()[0].platform != "tpu"
    c = CHUNK if rung != "grid224" else CHUNK // 2
    g = GRID if rung != "grid224" else GRID * 2
    S = c * g

    vals = jnp.ones((S, 128), jnp.bfloat16)
    lidx = jnp.ones((S, 128), jnp.int8)
    rel = jnp.ones((S, 1), jnp.int32)
    sl3 = jnp.ones((g, 1, c), jnp.int32)
    xres = jnp.ones((CT, 128), jnp.bfloat16)
    bases = jnp.zeros((2, g), jnp.int32)
    f32 = jnp.ones((S, 128), jnp.float32)

    spec = lambda cc: pl.BlockSpec((cc, 128), lambda i: (i, 0))  # noqa

    if rung in ("copy", "copy-b16"):
        src = f32 if rung == "copy" else vals

        def kern(a_ref, y_ref):
            y_ref[:] = a_ref[:].astype(jnp.float32)

        def call(s):
            return pl.pallas_call(
                kern, grid=(g,), interpret=interpret,
                in_specs=[spec(c)], out_specs=spec(c),
                out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            )(s)

        moved = S * 128 * (src.dtype.itemsize + 4)
        return call, moved, (src,)

    if rung in ("copy4", "copy4-rv", "grid224"):
        revisit = rung != "copy4"

        def kern(v_ref, l_ref, r_ref, s_ref, y_ref):
            if revisit:
                @pl.when(pl.program_id(0) == 0)
                def _init():
                    y_ref[:] = jnp.zeros_like(y_ref)
                y_ref[:] += (v_ref[:].astype(jnp.float32)
                             + l_ref[:].astype(jnp.float32))
            else:
                y_ref[:] = (v_ref[:].astype(jnp.float32)
                            + l_ref[:].astype(jnp.float32))

        def call(v, l, r, s):
            out_specs = (pl.BlockSpec((c, 128), lambda i: (0, 0))
                         if revisit else spec(c))
            out_shape = jax.ShapeDtypeStruct(
                ((c if revisit else S), 128), jnp.float32)
            return pl.pallas_call(
                kern, grid=(g,), interpret=interpret,
                in_specs=[spec(c), spec(c), pl.BlockSpec((c, 1),
                          lambda i: (i, 0)),
                          pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))],
                out_specs=out_specs, out_shape=out_shape,
            )(v, l, r, s)

        moved = S * 128 * 3 + S * 4 + S * 4
        return call, moved, (vals, lidx, rel, sl3)

    if rung == "copy4-sm":

        def kern(b_ref, v_ref, l_ref, r_ref, s_ref, y_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)
            off = b_ref[0, step]  # SMEM scalar read, used arithmetically
            y_ref[:] += (v_ref[:].astype(jnp.float32)
                         + l_ref[:].astype(jnp.float32)
                         + off.astype(jnp.float32))

        def call(b, v, l, r, s):
            return pl.pallas_call(
                kern, grid=(g,), interpret=interpret,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          spec(c), spec(c),
                          pl.BlockSpec((c, 1), lambda i: (i, 0)),
                          pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((c, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
            )(b, v, l, r, s)

        moved = S * 128 * 3 + S * 8
        return call, moved, (bases, vals, lidx, rel, sl3)

    if rung == "copy4-xy":

        def kern(b_ref, x_ref, v_ref, l_ref, r_ref, s_ref, y_ref):
            import jax as _jax  # noqa: F401

            step = pl.program_id(0)

            @pl.when(step == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)
            xb = pl.multiple_of(b_ref[0, step], 16)
            x_win = x_ref[pl.ds(xb, 96), :]
            sb = pl.multiple_of(b_ref[1, step], 8)
            contrib = (v_ref[0:96, :].astype(jnp.float32)
                       + l_ref[0:96, :].astype(jnp.float32)
                       + x_win.astype(jnp.float32))
            y_ref[pl.ds(sb, 96), :] += contrib

        def call(b, x, v, l, r, s):
            return pl.pallas_call(
                kern, grid=(g,), interpret=interpret,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec((CT, 128), lambda i: (0, 0)),
                          spec(c), spec(c),
                          pl.BlockSpec((c, 1), lambda i: (i, 0)),
                          pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((NS, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((NS, 128), jnp.float32),
            )(b, x, v, l, r, s)

        moved = S * 128 * 3 + S * 8 + CT * 128 * 2 + NS * 128 * 4
        return call, moved, (bases, xres, vals, lidx, rel, sl3)

    if rung == "dual":

        def kern2(v_ref, l_ref, y_ref):
            @pl.when(pl.program_id(0) == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)
            y_ref[:] += (v_ref[:].astype(jnp.float32)
                         + l_ref[:].astype(jnp.float32))

        def one(v, l):
            return pl.pallas_call(
                kern2, grid=(g,), interpret=interpret,
                in_specs=[spec(c), spec(c)],
                out_specs=pl.BlockSpec((c, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
            )(v, l)

        def call(v, l, v2, l2):
            return one(v, l) + one(v2, l2)

        vals2 = jnp.ones((S, 128), jnp.bfloat16)
        lidx2 = jnp.ones((S, 128), jnp.int8)
        moved = S * 128 * 3 * 2
        return call, moved, (vals, lidx, vals2, lidx2)

    raise ValueError(rung)


def run(rung, iterations=200):
    import jax
    import jax.numpy as jnp

    if QUICK:
        iterations = 3
    try:
        t0 = time.time()
        fn, moved, args = _mk(rung)
        # the first floating operand carries a loop-dependent epsilon so
        # XLA cannot hoist the pallas_call out of the fori_loop
        fidx = next(
            i for i, a in enumerate(args)
            if jnp.issubdtype(a.dtype, jnp.floating)
        )

        @jax.jit
        def loop(args):
            def body(i, acc):
                # acc*1e-38 is unknowable at compile time (the earlier
                # where(i<0,...) guard folded: XLA proves i>=0, hoists
                # the then-invariant pallas_call, and every rung "runs"
                # in 0.3 us) but underflows to 0 numerically.
                eps = acc * jnp.float32(1e-38)
                a = list(args)
                a[fidx] = a[fidx].at[(0,) * a[fidx].ndim].add(
                    eps.astype(a[fidx].dtype)
                )
                y = fn(*a)
                return acc + y.reshape(-1)[0].astype(jnp.float32)

            return jax.lax.fori_loop(0, iterations, body, jnp.float32(1))

        # Sync by HOST FETCH, not block_until_ready: through the axon
        # tunnel block_until_ready has been observed to return before
        # the computation completes (copy4-rv "ran" 50 iterations in
        # 163 us; the fetch then waited 468 ms). np.asarray is a real
        # barrier, and the result is one f32 scalar.
        np.asarray(loop(args))
        samples = []
        for _ in range(3):
            t1 = time.perf_counter_ns()
            np.asarray(loop(args))
            samples.append((time.perf_counter_ns() - t1) / 1e3
                           / iterations)
        us = min(samples)
        gbs = moved / (us * 1e-6) / 1e9
        _record({"ts": time.time(), "kind": "micro3", "rung": rung,
                 "avg_us": us, "moved_bytes": moved, "gb_s": gbs,
                 "iterations": iterations,
                 "device": jax.devices()[0].device_kind})
        print(f"micro3 {rung:10s}: {us:9.2f} us  {gbs:7.1f} GB/s "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — rung isolation
        _record({"ts": time.time(), "kind": "micro3", "rung": rung,
                 "ok": False, "error": f"{type(e).__name__}: "
                 f"{str(e)[:300]}"})
        print(f"micro3 {rung} FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    for rung in ("copy", "copy-b16", "copy4", "copy4-rv", "copy4-sm",
                 "copy4-xy", "grid224", "dual"):
        run(rung)
    print(f"micro3 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
