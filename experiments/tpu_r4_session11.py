"""Round-4 session 11: grid-fused benchmark rates (the loop tax removed).

`SellSpMV.bench_loop` runs the benchmark's N sequential SpMVs inside
ONE pallas grid (grid = (N, n_chunks)): y re-zeroed per iteration,
planes re-streamed from HBM per iteration — the reference protocol
(main-cli.c:402-420) without the ~140 µs/iteration XLA-loop tax this
tunneled stack imposes (sessions 9/10). Timing: per-iteration cost is
(T(2N) - T(N)) / N over fetch-synced launches, which cancels the
dispatch and every one-time cost exactly. Validation: the final y of
each launch against the f64 oracle.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session11.py > /tmp/tpu_r4_s11.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session11.py
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


def run_cell(name, chunk, n_iters, env, label):
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    for k, v in env.items():
        os.environ[k] = v
    try:
        if QUICK:
            n_iters = 2
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
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

        f1 = jax.jit(lambda xx: op.bench_loop(xx, n_iters))
        f2 = jax.jit(lambda xx: op.bench_loop(xx, 2 * n_iters))

        def timed(f):
            y = np.asarray(f(x))  # warm + materialize
            ts = []
            for _ in range(3):
                t0 = time.perf_counter_ns()
                np.asarray(f(x))
                ts.append((time.perf_counter_ns() - t0) / 1e3)
            return min(ts), y

        t1, y1 = timed(f1)
        t2, y2 = timed(f2)
        err = np.abs(y2.astype(np.float64) - y_ref).max() / scale
        us = (t2 - t1) / n_iters
        gnnz = coo.nnz / us / 1e3 if us > 0 else float("nan")
        rec = {"ts": time.time(), "kind": "grid-fused", "name": name,
               "label": label, "chunk": chunk, "n_chunks": int(plan.n_chunks),
               "iterations": n_iters, "t_n_us": t1, "t_2n_us": t2,
               "avg_us": us, "gnnz_s": gnnz, "err": float(err),
               "nnz": int(coo.nnz),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"{name} {label:18s}: {us:9.2f} us/iter  {gnnz:7.2f} "
              f"Gnnz/s  err={err:.2e}  (T(N)={t1/1e3:.2f} ms, "
              f"T(2N)={t2/1e3:.2f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001 — cell isolation
        _record({"ts": time.time(), "kind": "grid-fused", "name": name,
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
    run_cell("memplus", 1024, 1000, {}, "gf-bf16")
    run_cell("memplus", 1024, 1000, P, "gf-bf16-packed")
    run_cell("pwt", 1024, 1000, {}, "gf-bf16")
    run_cell("pwt", 1024, 1000, P, "gf-bf16-packed")
    run_cell("synth-10M", 2048, 100, {}, "gf-bf16-c2048")
    run_cell("synth-10M", 2048, 100, P, "gf-bf16-c2048-packed")
    run_cell("synth-10M", 4096, 100, P, "gf-bf16-c4096-packed")
    run_cell("synth-10M", 1024, 100, {}, "gf-bf16-c1024")
    print(f"session11 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
