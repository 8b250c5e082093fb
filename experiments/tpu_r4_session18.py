"""Round-4 session 18: grid-fused stage attribution at the flagship.

Session 17 measured the practical stream ceiling at 742-752 GB/s (any
dtype, 1 or 2 streams) — the flagship kernel's 410 GB/s effective is
NOT DMA-bound; its ~1.94 µs/step is compute-serialized. This session
re-does stage attribution UNDER THE HONEST PROTOCOL (grid =
(iterations, chunks), 3-point fits): each variant removes one pipeline
stage from the production relsl kernel at the flagship config
(synth-10M bf16 c2048):

  full        the production chain (control — expect ~217 µs/iter)
  no-reduce   skip seg one-hot + reduce matmuls + windowed RMW store
  no-gather   skip the take_along_axis lane shuffle
  no-table    skip the one-hot build + select matmul (keep gather)
  no-unpack   split rel‖sl arithmetic removed (constant rel/sl rows)
  stream      touch the val/lidx planes only

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session18.py > /tmp/tpu_r4_s18.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session18.py
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

VARIANTS = ("full", "full-assign", "no-reduce", "no-gather", "no-table",
            "no-unpack", "stream")


def build(variant, op):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smvp_toolkit_tpu.ops import spmv_pallas as sp

    plan = op.plan
    ns, chunk, nch = plan.n_slices, plan.chunk, plan.n_chunks
    ct, wt, nsw = plan.n_coltiles, plan.window_tiles, op.nsw
    LANES = 128
    reduce2 = True  # bf16 default ladder
    precision = op.precision
    small_out = variant not in ("full", "full-assign")

    def kern(bases_ref, x_ref, val_ref, lidx_ref, rs_ref, y_ref):
        it, ch = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(it == 0, ch == 0) if small_out
                 else (ch == 0))
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        if variant == "stream":
            y_ref[:] += (val_ref[0:8, :].astype(jnp.float32)
                         + lidx_ref[0:8, :].astype(jnp.float32))
            return
        if variant == "no-unpack":
            rel_row = jnp.zeros((1, chunk), jnp.int32)
            sl_row = jnp.zeros((1, chunk), jnp.int32)
        else:
            rs = rs_ref[0]
            rel_row = jnp.bitwise_and(
                rs, jnp.int32(sp._PACK_REL_DEAD)
            )
            sl_row = jax.lax.shift_right_logical(
                rs, sp._RELSL_SL_SHIFT
            )
        xb = pl.multiple_of(bases_ref[0, ch], 16)
        x_win = x_ref[pl.ds(xb, wt), :]
        if variant == "no-table":
            table = jnp.broadcast_to(
                x_win[0:1, :].astype(jnp.float32), (chunk, LANES)
            )
        else:
            table = sp._table_select_t(
                rel_row, x_win, wt, precision, True, reduce2
            )
        if variant == "no-gather":
            g = table
        else:
            g = jnp.take_along_axis(
                table, lidx_ref[:].astype(jnp.int32), axis=1
            )
        prod = val_ref[:].astype(jnp.float32) * g
        if variant == "full":
            sp._reduce_store(y_ref, prod, sl_row, bases_ref[1, ch], ns,
                             nsw, precision, reduce2)
        elif variant == "full-assign":
            # Same reduce compute, but STORE instead of accumulate at
            # the window (wrong result by design — isolates the y RMW).
            sb = pl.multiple_of(bases_ref[1, ch], 8)
            y_ref[pl.ds(sb, nsw), :] = sp._seg_reduce(
                prod, sl_row, sb, nsw, precision, reduce2
            )
        else:
            y_ref[:] += prod[0:8, :]

    out_shape = (
        jax.ShapeDtypeStruct((ns, LANES), jnp.float32)
        if not small_out
        else jax.ShapeDtypeStruct((8, LANES), jnp.float32)
    )
    out_spec = (
        pl.BlockSpec((ns, LANES), lambda it, ch: (0, 0))
        if not small_out
        else pl.BlockSpec((8, LANES), lambda it, ch: (0, 0))
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ct, LANES), lambda it, ch: (0, 0)),
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
    ]
    rs3 = op._relsl().reshape(nch, 1, chunk)
    xt = jnp.ones((ct, LANES), op.value_dtype)

    def call(n):
        return jax.jit(lambda *a: pl.pallas_call(
            kern, grid=(n, nch), interpret=op.interpret,
            in_specs=in_specs, out_specs=out_spec, out_shape=out_shape,
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
    base_iters = 2 if QUICK else 200
    out = {}
    for variant in VARIANTS:
        try:
            call, args = build(variant, op)
            pts, ts = [base_iters, 2 * base_iters, 4 * base_iters], []
            for n in pts:
                f = call(n)
                np.asarray(f(*args))
                samples = []
                for _ in range(5):
                    tq = time.perf_counter_ns()
                    np.asarray(f(*args))
                    samples.append((time.perf_counter_ns() - tq) / 1e3)
                ts.append(min(samples))
            A = np.vstack([pts, np.ones(3)]).T
            (slope, intercept), *_ = np.linalg.lstsq(
                A, np.asarray(ts), rcond=None
            )
            out[variant] = float(slope)
            _record({"ts": time.time(), "kind": "gf-attr",
                     "variant": variant, "us_per_iter": float(slope),
                     "us_per_step": float(slope) / plan.n_chunks,
                     "intercept_us": float(intercept),
                     "device": dev.device_kind})
            print(f"gf-attr {variant:10s}: {slope:8.2f} us/iter "
                  f"({slope/plan.n_chunks:5.2f} us/step)", flush=True)
        except Exception as e:  # noqa: BLE001
            _record({"ts": time.time(), "kind": "gf-attr",
                     "variant": variant, "ok": False,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            print(f"gf-attr {variant} FAILED: {str(e)[:200]}", flush=True)
    if "full" in out:
        print("  deltas vs full: " + ", ".join(
            f"{k}={out['full']-v:+.1f}us" for k, v in out.items()
            if k != "full"), flush=True)
    print(f"session18 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
