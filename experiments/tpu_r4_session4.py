"""Round-4 session 4: stage attribution AT SCALE + sharded rates.

Sessions 1-3 established the fixed kernel's hardware envelope:
synth-10M 11.6 Gnnz/s (bf16 c=2048, 112 GB/s effective = ~14% of the
v5e HBM roofline) and a ~150 us floor on memplus/pwt. The cost model
says HBM DMA (~1.0 us/chunk) and MXU (~0.8 us/chunk) explain only a
third of the measured 7.6 us/chunk — the rest must be VPU stage work
(one-hot compares, the lane-shuffle gather, dtype casts, the reduce2
hi/lo split). This session measures WHERE, with production-mirroring
kernels that each skip one pipeline stage:

  full        the production stage chain (sanity vs SellSpMV timing)
  no-table    skip the one-hot x-select matmul (broadcast one row)
  no-shuffle  skip the take_along_axis lane gather
  reduce1     single-pass bf16 reduce (no f32 round trip, no hi/lo
              split) — the accuracy/speed frontier of the reduce
  no-reduce   skip the segment reduce entirely (revisited out block)
  stream      touch the value/index planes only (pure plane bandwidth)

Cells: memplus + pwt at the f32 flagship config (the full - no-table
delta on pwt-class matrices is the TJDS-hybrid build/reject gate,
VERDICT r3 item 6), synth-10M at the bf16 c=2048 flagship config (the
at-scale attribution that picks the next kernel optimization).

Also: the synth-4M streamed retry (the HTTP 413 fix routes the SELL
planes as jit parameters now), a lidx32 A/B at scale (is the int8
in-kernel widen worth the traffic it saves?), and the first MEASURED
sharded rates: spmv/spmm_sell_sharded on a 1-chip mesh (VERDICT r3
item 7).

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session4.py > /tmp/tpu_r4_s4.log 2>&1 &
CPU dry run (interpreter, surrogate sizes):
  SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session4.py
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

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"

ATTR_VARIANTS = ("full", "no-table", "no-shuffle", "reduce1", "no-reduce",
                 "stream")


def _attr_kernel(which, ns, nsw, wt, bf16, reduce2, precision):
    """Production-pipeline kernel with one stage removed (see module doc).

    Mirrors ops/spmv_pallas._make_sell_kernel_resident stage for stage —
    the 'full' variant IS that pipeline, so its timing must match the
    production operator within noise (a built-in sanity check).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from smvp_toolkit_tpu.ops import spmv_pallas as sp

    per_chunk_out = which in ("no-reduce", "stream")

    def kern(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref, y_ref):
        step = pl.program_id(0)
        if not per_chunk_out:
            @pl.when(step == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)
        if which == "stream":
            # Touch both packed planes; the revisited (chunk, LANES)
            # output block is flushed to HBM once, not per step.
            y_ref[:] = (val_ref[:].astype(jnp.float32)
                        + lidx_ref[:].astype(jnp.float32))
            return
        xb = pl.multiple_of(bases_ref[0, step], 16)
        x_win = x_ref[pl.ds(xb, wt), :]
        if which == "no-table":
            table = jnp.broadcast_to(
                x_win[0:1, :].astype(jnp.float32),
                (val_ref.shape[0], sp.LANES),
            )
        else:
            table = sp._table_select(
                rel_ref[:], x_win, wt, precision, bf16, reduce2
            )
        if which == "no-shuffle":
            g = table
        else:
            g = jnp.take_along_axis(
                table, lidx_ref[:].astype(jnp.int32), axis=1
            )
        if which == "reduce1":
            # Single-pass bf16 reduce: product stays bf16 (no f32 round
            # trip, no hi/lo split) — trades ~8 product mantissa bits.
            prod = val_ref[:] * g.astype(val_ref.dtype)
            rel_s = sl_ref[0]
            sb = 0
            if nsw < ns:
                sb = pl.multiple_of(bases_ref[1, step], 8)
                rel_s = rel_s - sb
            w = min(nsw, ns)
            iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
            seg = (iota == rel_s).astype(val_ref.dtype)
            r = jnp.dot(seg, prod, preferred_element_type=jnp.float32)
            if nsw < ns:
                y_ref[pl.ds(sb, nsw), :] += r
            else:
                y_ref[:] += r
            return
        prod = val_ref[:].astype(jnp.float32) * g
        if which == "no-reduce":
            y_ref[:] = prod  # revisited block: flushed once at the end
            return
        sp._reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], ns, nsw,
                         precision, reduce2)

    return kern


def attr_call(op, which):
    """SpMV-shaped callable running attribution variant ``which``.

    Resident-x only (every session matrix fits the residency budget).
    Output is wrong by design for every variant except 'full' — these
    cells time stages, they do not validate.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import LANES

    plan = op.plan
    ns, wt, chunk = plan.n_slices, plan.window_tiles, plan.chunk
    nch = plan.n_chunks
    nsw = op.nsw
    ct = plan.n_coltiles
    bf16 = op._bf16
    reduce2 = bf16  # the flagship default ladder
    per_chunk_out = which in ("no-reduce", "stream")
    sl3 = op.slice_of.reshape(nch, 1, chunk)

    def f(x):
        x = x.astype(op.value_dtype)
        npad = ct * LANES
        if x.shape[0] < npad:
            x = jnp.pad(x, (0, npad - x.shape[0]))
        if per_chunk_out:
            # Revisited single-block output: each chunk overwrites block
            # 0, so HBM sees ONE flush — the cell measures stage compute
            # + plane DMA, not an artificial (S, 128) f32 write-back.
            out_specs = pl.BlockSpec((chunk, LANES), lambda i: (0, 0))
            out_shape = jax.ShapeDtypeStruct((chunk, LANES), jnp.float32)
        else:
            out_specs = pl.BlockSpec((ns, LANES), lambda i: (0, 0))
            out_shape = jax.ShapeDtypeStruct((ns, LANES), jnp.float32)
        y = pl.pallas_call(
            _attr_kernel(which, ns, nsw, wt, bf16, reduce2, op.precision),
            grid=(nch,),
            interpret=op.interpret,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
        )(op.bases, x.reshape(ct, LANES), op.vals, op.lidx,
          op.rel_tile, sl3)
        return y.reshape(-1)[: plan.shape[0]]

    return f


def run_attr(name, *, value_dtype=None, chunk=1024, iterations=200):
    """One attribution sweep: all variants on one matrix/config."""
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.ops import spmv_pallas as sp

    if QUICK:
        iterations = 3
    coo = s3._coo(name)
    r, c, v = coo.to_numpy()
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
    op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                     value_dtype=value_dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(coo.shape[1]).astype(np.float32))
    base_rec = dict(
        name=name, kind="attr", chunk=chunk,
        bf16=bool(value_dtype == jnp.bfloat16), nnz=int(coo.nnz),
        S=int(plan.n_sublanes), WT=int(plan.window_tiles),
        NSW=int(op.nsw), NS=int(plan.n_slices),
        n_chunks=int(plan.n_chunks), iterations=iterations,
    )
    out = {}
    for which in ATTR_VARIANTS:
        tag = f"{name} attr:{which}"
        try:
            t0 = time.time()
            stats = bench_spmv_fused(
                lambda m, xx, _w=which: attr_call(op, _w)(xx), coo, x,
                iterations=iterations, repeats=3,
            )
            us = float(stats.avg_ms * 1e3)
            out[which] = us
            rec = dict(base_rec, variant=which, ts=time.time(),
                       avg_us=us,
                       device=jax.devices()[0].device_kind)
            _record(rec)
            print(f"{tag:28s}: {us:10.2f} us/iter "
                  f"(compile+run {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — cell isolation by design
            _record(dict(base_rec, variant=which, ts=time.time(),
                         ok=False,
                         error=f"{type(e).__name__}: {str(e)[:300]}"))
            print(f"{tag} FAILED: {str(e)[:200]}", flush=True)
    if "full" in out:
        parts = {k: out["full"] - v for k, v in out.items() if k != "full"}
        print(f"  deltas vs full: " + ", ".join(
            f"{k}={v:+.1f}us" for k, v in sorted(parts.items())),
            flush=True)


def run_sharded(name, *, value_dtype=None, k=0, iterations=100):
    """Measured per-chip rate of the shard_map SELL path on a 1-chip
    mesh — the distributed layer's first hardware rate (VERDICT #7)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.parallel.sell_dist import (
        shard_sell, spmm_sell_sharded, spmv_sell_sharded,
    )

    if QUICK:
        iterations = 3
    coo = s3._coo(name)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    sh = shard_sell(coo, mesh, value_dtype=value_dtype)
    rng = np.random.default_rng(0)
    label = f"sharded1-{'spmm%d' % k if k else 'spmv'}"
    tag = f"{name} {label}"
    try:
        t0 = time.time()
        if k:
            X = jnp.asarray(
                rng.standard_normal((coo.shape[1], k)).astype(np.float32)
            )
            fn = lambda m, XX: spmm_sell_sharded(sh, XX, mesh)  # noqa: E731
            arg = X
        else:
            arg = jnp.asarray(
                rng.standard_normal(coo.shape[1]).astype(np.float32)
            )
            fn = lambda m, xx: spmv_sell_sharded(sh, xx, mesh)  # noqa: E731
        stats, acc = bench_spmv_fused(fn, coo, arg,
                                      iterations=iterations, repeats=3,
                                      return_final=True)
        # Correctness gate on the loop's own accumulator. In bf16 value
        # mode the device rounds v AND x to bf16 before multiplying, so
        # the oracle must too (else it reports bf16 input rounding,
        # ~4e-3, instead of kernel accumulation error).
        r, c, v = coo.to_numpy()
        xh = np.asarray(arg, dtype=np.float64)
        if value_dtype == jnp.bfloat16:
            v = np.asarray(jnp.asarray(v).astype(jnp.bfloat16),
                           dtype=np.float64)
            xh = np.asarray(jnp.asarray(xh).astype(jnp.bfloat16),
                            dtype=np.float64)
        if k:
            y_ref = np.zeros((coo.shape[0], k))
            np.add.at(y_ref, r, v[:, None].astype(np.float64) * xh[c])
        else:
            y_ref = np.zeros(coo.shape[0])
            np.add.at(y_ref, r, v.astype(np.float64) * xh[c])
        y = np.asarray(acc, dtype=np.float64) / iterations
        err = float(np.abs(y - y_ref).max()
                    / (np.abs(y_ref).max() + 1e-30))
        us = float(stats.avg_ms * 1e3)
        rate = coo.nnz / (us * 1e-6) / 1e9
        _record({"ts": time.time(), "name": name, "kind": "sharded",
                 "label": label, "k": k, "n_shards": 1,
                 "bf16": bool(value_dtype == jnp.bfloat16),
                 "nnz": int(coo.nnz), "err": err, "avg_us": us,
                 "gnnz_s": rate, "iterations": iterations,
                 "device": jax.devices()[0].device_kind})
        print(f"{tag:28s}: err={err:.2e} {us:10.2f} us/iter "
              f"{rate:6.2f} Gnnz/s{' x%d rhs' % k if k else ''} "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        _record({"ts": time.time(), "name": name, "kind": "sharded",
                 "label": label, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{tag} FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # 1. The HTTP 413 retry: streamed 4M rows with planes as jit params.
    _attempt(s3.run, "synth-4M", dict(iterations=50, stream=True,
                                      label=" f32-stream-jp"))

    # 2. Stage attribution (the TJDS gate runs first: memplus + pwt f32).
    run_attr("memplus")
    run_attr("pwt")
    run_attr("synth-10M", value_dtype=jnp.bfloat16, chunk=2048,
             iterations=50)

    # 3. lidx32 A/B at scale: int8 widen cost vs traffic saved.
    _attempt(s3.run, "synth-10M",
             dict(value_dtype=jnp.bfloat16, chunk=2048, lidx32=True,
                  iterations=50, label=" bf16-c2048-lidx32"))

    # 4. First measured sharded rates (1-chip mesh).
    run_sharded("memplus")
    run_sharded("synth-10M", value_dtype=jnp.bfloat16, iterations=50)
    run_sharded("memplus", k=8, iterations=50)

    print(f"session4 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
