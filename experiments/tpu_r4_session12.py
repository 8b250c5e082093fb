"""Round-4 session 12: grid-fused rates with 3-point linear fits.

Session 11's two-point differencing was under-powered: the per-launch
fixed cost is huge (~30-120 ms) and varies run to run (pwt's diff went
negative). This session times T(N), T(2N), T(4N) with 5 fetch-synced
samples each and fits per-iteration cost as the least-squares slope —
also a linearity check (if the "fixed" cost actually scaled with N,
the 3 points would bend).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session12.py > /tmp/tpu_r4_s12.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session12.py
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


def run_cell(name, chunk, base_n, env, label, y_block_rows=None):
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import (
        build_sell_plan,
        build_streamed_sell_plan,
    )

    for k, v in env.items():
        os.environ[k] = v
    try:
        if QUICK:
            base_n = 2
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        if y_block_rows:
            plan = build_streamed_sell_plan(
                r, c, v, coo.shape, chunk=chunk,
                y_block_rows=y_block_rows,
            )
        else:
            plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         value_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        x = jnp.asarray(xh)

        import ml_dtypes

        vdt = ml_dtypes.bfloat16
        y_ref = np.zeros(coo.shape[0])
        np.add.at(y_ref, r, v.astype(vdt).astype(np.float64)
                  * xh.astype(vdt)[c].astype(np.float64))
        scale = np.abs(y_ref).max() + 1e-30

        ns_pts = [base_n, 2 * base_n, 4 * base_n]
        ts, errs = [], []
        for n in ns_pts:
            f = jax.jit(lambda xx, _n=n: op.bench_loop(xx, _n))
            y = np.asarray(f(x))
            errs.append(
                float(np.abs(y.astype(np.float64) - y_ref).max() / scale)
            )
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                np.asarray(f(x))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([ns_pts, np.ones(3)]).T
        (slope, intercept), res, *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                      rcond=None)
        us = float(slope)
        gnnz = coo.nnz / us / 1e3 if us > 0 else float("nan")
        # linearity: midpoint prediction error
        pred_mid = slope * ns_pts[1] + intercept
        bend = (ts[1] - pred_mid) / max(ts[1], 1e-9)
        rec = {"ts": time.time(), "kind": "grid-fused3", "name": name,
               "label": label, "chunk": chunk,
               "n_chunks": int(plan.n_chunks), "ns_pts": ns_pts,
               "t_us": ts, "avg_us": us, "intercept_us": float(intercept),
               "bend_frac": float(bend), "gnnz_s": gnnz,
               "err": max(errs), "nnz": int(coo.nnz),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"{name} {label:20s}: {us:9.3f} us/iter  {gnnz:8.2f} "
              f"Gnnz/s  err={max(errs):.1e}  intercept="
              f"{intercept/1e3:.1f}ms bend={bend:+.3f}", flush=True)
    except Exception as e:  # noqa: BLE001 — cell isolation
        _record({"ts": time.time(), "kind": "grid-fused3", "name": name,
                 "label": label, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} {label} FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    P = {"SMVP_SELL_PACK": "1"}
    run_cell("memplus", 1024, 4000, {}, "gf3-bf16")
    run_cell("memplus", 1024, 4000, P, "gf3-bf16-packed")
    run_cell("pwt", 1024, 4000, {}, "gf3-bf16")
    run_cell("pwt", 1024, 4000, P, "gf3-bf16-packed")
    run_cell("synth-10M", 2048, 200, P, "gf3-c2048-packed")
    run_cell("synth-10M", 4096, 200, {}, "gf3-c4096")
    run_cell("synth-10M", 4096, 200, P, "gf3-c4096-packed")
    run_cell("synth-10M", 8192, 200, P, "gf3-c8192-packed")
    print(f"session12 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
