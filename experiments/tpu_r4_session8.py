"""Round-4 session 8: bisect the SELL launch's per-step cost by operand.

Session 7 established: the fused-loop wrapper is NOT the cost (A≈B≈C≈D
within noise at scale); the launch itself runs ~7 µs/step at the
flagship config and ~19 µs/step on memplus, where micro3's bare
4-stream copy (same block shapes) runs ~3 µs/step. This session builds
a ladder of pallas_calls BETWEEN those two structures — each cell adds
one operand/feature of the production launch — timed with the
scalar-carry fetch-synced loop (tpu_r4_session7._time_loop):

  s2op     val+lidx streams only, revisited (chunk,128) out, +=
  s3op     + rel (chunk,1) and sl3 (1,1,chunk) streams (unread)
  s4op     + SMEM bases (unread) — all plane-side streams
  s5op     + resident x block (read: one row broadcast, no window slice)
  s5win    s5op with the real dynamic wt-window slice at bases[0]
  sfull    s5win + windowed y += at bases[1] into an (NS,128) out
           (the production stream structure exactly)
  spack    packed plane + sl3 + bases + x (the packed stream structure)
  sempty   (8,128) dummy operand, same grid — pure per-step floor

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session8.py > /tmp/tpu_r4_s8.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session8.py
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
from tpu_r4_session7 import _time_loop

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"


def build(cell, op):
    """(callable, args) for one ladder cell on operator ``op``'s plan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = op.plan
    chunk, nch, ns = plan.chunk, plan.n_chunks, plan.n_slices
    wt, nsw = plan.window_tiles, op.nsw
    interpret = op.interpret
    ct = plan.n_coltiles
    LANES = 128
    vals, lidx = op.vals, op.lidx
    rel, sl3 = op.rel_tile, op.slice_of.reshape(nch, 1, chunk)
    bases = op.bases
    xt = jnp.ones((ct, LANES), op.value_dtype)
    cspec = pl.BlockSpec((chunk, LANES), lambda i: (i, 0))
    out_rv = pl.BlockSpec((chunk, LANES), lambda i: (0, 0))
    shp_rv = jax.ShapeDtypeStruct((chunk, LANES), jnp.float32)

    def init_then(body):
        def kern(*refs):
            y_ref = refs[-1]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

            body(*refs)

        return kern

    if cell == "sempty":
        dummy = jnp.ones((8, LANES), jnp.float32)

        def body(d_ref, y_ref):
            y_ref[:] += d_ref[:]

        fn = lambda d: pl.pallas_call(  # noqa: E731
            init_then(body), grid=(nch,), interpret=interpret,
            in_specs=[pl.BlockSpec((8, LANES), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        )(d)
        return fn, (dummy,), 8 * LANES * 4

    if cell in ("s2op", "s3op", "s4op", "s5op", "s5win"):
        n_in = {"s2op": 2, "s3op": 4, "s4op": 5, "s5op": 6, "s5win": 6}[
            cell
        ]

        def body(*refs):
            y_ref = refs[-1]
            if cell in ("s5op", "s5win"):
                b_ref, x_ref, v_ref, l_ref = refs[0], refs[1], refs[2], refs[3]
                if cell == "s5win":
                    xb = pl.multiple_of(b_ref[0, pl.program_id(0)], 16)
                    xw = x_ref[pl.ds(xb, wt), :]
                    extra = xw[0:1, :].astype(jnp.float32)
                else:
                    extra = x_ref[0:1, :].astype(jnp.float32)
            elif cell == "s4op":
                v_ref, l_ref = refs[1], refs[2]
                extra = None
            else:
                v_ref, l_ref = refs[0], refs[1]
                extra = None
            acc = (v_ref[:].astype(jnp.float32)
                   + l_ref[:].astype(jnp.float32))
            if extra is not None:
                acc = acc + extra  # broadcast row
            y_ref[:] += acc

        specs = {
            "s2op": ([cspec, cspec], (vals, lidx)),
            "s3op": (
                [cspec, cspec, pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                 pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0))],
                (vals, lidx, rel, sl3),
            ),
            "s4op": (
                [pl.BlockSpec(memory_space=pltpu.SMEM), cspec, cspec,
                 pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                 pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0))],
                (bases, vals, lidx, rel, sl3),
            ),
        }
        if cell in ("s5op", "s5win"):
            specs[cell] = (
                [pl.BlockSpec(memory_space=pltpu.SMEM),
                 pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                 cspec, cspec,
                 pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                 pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0))],
                (bases, xt, vals, lidx, rel, sl3),
            )
        in_specs, opnds = specs[cell]
        assert len(in_specs) == n_in or cell in ("s3op",)
        fn = lambda *a: pl.pallas_call(  # noqa: E731
            init_then(body), grid=(nch,), interpret=interpret,
            in_specs=in_specs, out_specs=out_rv, out_shape=shp_rv,
        )(*a)
        moved = chunk * nch * LANES * 3
        return fn, opnds, moved

    if cell == "sfull":
        # Production stream structure: all operands, windowed dynamic
        # y += into the (NS,128) resident out — no table/gather/reduce.
        def body(b_ref, x_ref, v_ref, l_ref, r_ref, s_ref, y_ref):
            step = pl.program_id(0)
            xb = pl.multiple_of(b_ref[0, step], 16)
            xw = x_ref[pl.ds(xb, wt), :]
            acc = (v_ref[0:nsw, :].astype(jnp.float32)
                   + l_ref[0:nsw, :].astype(jnp.float32)
                   + xw[0:1, :].astype(jnp.float32))
            sb = pl.multiple_of(b_ref[1, step], 8)
            y_ref[pl.ds(sb, nsw), :] += acc

        fn = lambda *a: pl.pallas_call(  # noqa: E731
            init_then(body), grid=(nch,), interpret=interpret,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                      cspec, cspec,
                      pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                      pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((ns, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
        )(*a)
        return fn, (bases, xt, vals, lidx, rel, sl3), chunk * nch * 384

    if cell == "spack":
        pk = op._packed()

        def body(b_ref, x_ref, p_ref, s_ref, y_ref):
            y_ref[:] += p_ref[:].astype(jnp.float32)

        fn = lambda *a: pl.pallas_call(  # noqa: E731
            init_then(body), grid=(nch,), interpret=interpret,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                      cspec,
                      pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0))],
            out_specs=out_rv, out_shape=shp_rv,
        )(*a)
        return fn, (bases, xt, pk, sl3), chunk * nch * LANES * 4

    raise ValueError(cell)


CELLS = ("sempty", "s2op", "s3op", "s4op", "s5op", "s5win", "sfull",
         "spack")


def run_matrix(name, chunk, iterations):
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    if QUICK:
        iterations = 3
    coo = s3._coo(name)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
    op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                     value_dtype=jnp.bfloat16)
    for cell in CELLS:
        try:
            fn, args, moved = build(cell, op)
            fidx = next(
                i for i, a in enumerate(args)
                if jnp.issubdtype(a.dtype, jnp.floating)
            )
            us = _time_loop(fn, args, iterations, fidx, name,
                            f"lad-{cell}", int(coo.nnz))
            _record({"ts": time.time(), "kind": "launch-ladder",
                     "name": name, "cell": cell, "chunk": chunk,
                     "n_chunks": int(plan.n_chunks), "avg_us": us,
                     "us_per_step": us / plan.n_chunks,
                     "moved_bytes": moved,
                     "gb_s": moved / us / 1e3})
        except Exception as e:  # noqa: BLE001 — cell isolation
            _record({"ts": time.time(), "kind": "launch-ladder",
                     "name": name, "cell": cell, "ok": False,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            print(f"{name} {cell} FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_matrix("synth-10M", 2048, 50)
    run_matrix("memplus", 1024, 200)
    print(f"session8 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
