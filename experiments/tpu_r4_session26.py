"""Round-4 session 26: hand-pipelined kernel vs Mosaic's auto-pipeline.

Sessions 17-23 left a ~0.5-0.9 µs/step gap between the full chain and
the stream floor that neither stage removal, store mode, nor VMEM
budget explains. This experiment takes DMA scheduling away from the
auto-pipeliner: grid = (iterations,) only, the chunk sweep is an
in-kernel fori_loop with EXPLICIT double-buffered async copies of the
three plane streams (vals, lidx, rel‖slice), so every chunk's DMA is
in flight while the previous chunk's full chain computes.

Pure experiment (correctness-gated vs the oracle, same plan/layout as
production relsl); a win >= 20% in-session justifies a production
variant, a loss closes the Mosaic-pipelining question with data.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session26.py > /tmp/tpu_r4_s26.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session26.py
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


def build_manual(op):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smvp_toolkit_tpu.ops import spmv_pallas as sp

    plan = op.plan
    ns, chunk, nch = plan.n_slices, plan.chunk, plan.n_chunks
    ct, wt, nsw = plan.n_coltiles, plan.window_tiles, op.nsw
    LANES = 128
    precision = op.precision
    reduce2 = True
    rs3 = op._relsl().reshape(nch, 1, chunk)
    xt = jnp.ones((ct, LANES), op.value_dtype)

    def kernel(bases_ref, x_ref, val_hbm, lidx_hbm, rs_hbm, y_ref):
        # fresh y every iteration (the benchmark protocol); kept outside
        # run_scoped — program_id inside a scoped body trips the
        # interpreter's discharge.
        y_ref[:] = jnp.zeros_like(y_ref)

        def body(vbuf, lbuf, rbuf, sems):
            def dmas(slot, ch):
                return (
                    pltpu.make_async_copy(
                        val_hbm.at[pl.ds(ch * chunk, chunk), :],
                        vbuf.at[slot], sems.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        lidx_hbm.at[pl.ds(ch * chunk, chunk), :],
                        lbuf.at[slot], sems.at[slot, 1],
                    ),
                    pltpu.make_async_copy(
                        rs_hbm.at[ch], rbuf.at[slot], sems.at[slot, 2],
                    ),
                )

            def start(slot, ch):
                for d in dmas(slot, ch):
                    d.start()

            def wait(slot, ch):
                for d in dmas(slot, ch):
                    d.wait()

            start(0, 0)

            def chunk_body(ch, _):
                slot = jax.lax.rem(ch, 2)
                nxt = jax.lax.rem(ch + 1, 2)

                @pl.when(ch + 1 < nch)
                def _prefetch():
                    start(nxt, ch + 1)

                wait(slot, ch)
                rs = rbuf[slot][0]
                rel_row = jnp.bitwise_and(
                    rs, jnp.int32(sp._PACK_REL_DEAD)
                )
                sl_row = jax.lax.shift_right_logical(
                    rs, sp._RELSL_SL_SHIFT
                )
                xb = pl.multiple_of(bases_ref[0, ch], 16)
                x_win = x_ref[pl.ds(xb, wt), :]
                table = sp._table_select_t(
                    rel_row, x_win, wt, precision, True, reduce2
                )
                g = jnp.take_along_axis(
                    table, lbuf[slot].astype(jnp.int32), axis=1
                )
                prod = vbuf[slot].astype(jnp.float32) * g
                sp._reduce_store(y_ref, prod, sl_row, bases_ref[1, ch],
                                 ns, nsw, precision, reduce2)
                return 0

            jax.lax.fori_loop(0, nch, chunk_body, 0)

        pl.run_scoped(
            body,
            vbuf=pltpu.VMEM((2, chunk, LANES), op.value_dtype),
            lbuf=pltpu.VMEM((2, chunk, LANES), jnp.int8),
            rbuf=pltpu.VMEM((2, 1, chunk), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((2, 3)),
        )

    def call(n):
        return jax.jit(lambda *a: pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda it: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # vals in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # lidx in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # rs3 in HBM
            ],
            out_specs=pl.BlockSpec((ns, LANES), lambda it: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
            interpret=op.interpret,
        )(*a))

    return call, (op.bases, xt, op.vals, op.lidx, rs3)


def main():
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    coo = s3._coo("synth-10M")
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape, chunk=2048)
    op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                     value_dtype=jnp.bfloat16)
    base_iters = 2 if QUICK else 100

    # oracle on ones-x (xt is ones in the experiment kernel)
    import ml_dtypes

    vdt = ml_dtypes.bfloat16
    y_ref64 = np.zeros(coo.shape[0])
    np.add.at(y_ref64, r, v.astype(vdt).astype(np.float64) * 1.0)
    scale = np.abs(y_ref64).max() + 1e-30

    # control: auto-pipelined bench_loop with the same x=ones
    ctl_x = jnp.ones((coo.shape[1],), jnp.float32)
    for tag, runner in (
        ("manual", None),
        ("auto-ctl", lambda n: jax.jit(
            lambda xx, _n=n: op.bench_loop(xx, _n))),
    ):
        try:
            pts, ts = [base_iters, 2 * base_iters, 4 * base_iters], []
            y_last = None
            for n in pts:
                if tag == "manual":
                    call, args = build_manual(op)
                    f, fa = call(n), args
                else:
                    f, fa = runner(n), (ctl_x,)
                y_last = np.asarray(f(*fa))
                samples = []
                for _ in range(5):
                    tq = time.perf_counter_ns()
                    np.asarray(f(*fa))
                    samples.append((time.perf_counter_ns() - tq) / 1e3)
                ts.append(min(samples))
            A = np.vstack([pts, np.ones(3)]).T
            (slope, intercept), *_ = np.linalg.lstsq(
                A, np.asarray(ts), rcond=None
            )
            err = float(np.abs(
                y_last.reshape(-1)[: coo.shape[0]].astype(np.float64)
                - y_ref64
            ).max() / scale)
            _record({"ts": time.time(), "kind": "manual-pipe",
                     "variant": tag, "us_per_iter": float(slope),
                     "err": err,
                     "device": dev.device_kind})
            print(f"{tag:10s}: {slope:8.2f} us/iter  err={err:.1e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            _record({"ts": time.time(), "kind": "manual-pipe",
                     "variant": tag, "ok": False,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            print(f"{tag} FAILED: {str(e)[:250]}", flush=True)
    print(f"session26 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
