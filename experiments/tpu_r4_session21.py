"""Round-4 session 21: grid-fused SpMM rates (relsl, k-wide).

The round-4 fused-SpMM figure (16.6 Gnnz/s·k at synth-10M k=8) was
measured under the XLA-loop protocol. bench_loop_mat runs the N
sequential SpMMs inside one Mosaic grid; 3-point fits as usual.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session21.py > /tmp/tpu_r4_s21.log 2>&1 &
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


def run_cell(name, chunk, k, base_n, label):
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    try:
        if QUICK:
            base_n = 2
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         value_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        Xh = rng.standard_normal((coo.shape[1], k)).astype(np.float32)
        X = jnp.asarray(Xh)

        import ml_dtypes

        vdt = ml_dtypes.bfloat16
        Y_ref = np.zeros((coo.shape[0], k))
        np.add.at(Y_ref, r, v.astype(vdt).astype(np.float64)[:, None]
                  * Xh.astype(vdt).astype(np.float64)[c])
        scale = np.abs(Y_ref).max() + 1e-30

        pts, ts, errs = [base_n, 2 * base_n, 4 * base_n], [], []
        for n in pts:
            f = jax.jit(lambda XX, _n=n: op.bench_loop_mat(XX, _n))
            Y = np.asarray(f(X))
            errs.append(float(np.abs(Y.astype(np.float64) - Y_ref).max()
                              / scale))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                np.asarray(f(X))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([pts, np.ones(3)]).T
        (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                 rcond=None)
        us = float(slope)
        gk = coo.nnz * k / us / 1e3 if us > 0 else float("nan")
        _record({"ts": time.time(), "kind": "grid-fused-spmm",
                 "name": name, "label": label, "chunk": chunk, "k": k,
                 "iters_pts": pts, "t_us": ts, "avg_us": us,
                 "intercept_us": float(intercept),
                 "gnnz_s_krhs": gk, "err": max(errs),
                 "nnz": int(coo.nnz),
                 "device": jax.devices()[0].device_kind})
        print(f"{name} {label:18s}: {us:9.2f} us/iter  {gk:8.2f} "
              f"Gnnz/s*k  err={max(errs):.1e}", flush=True)
    except Exception as e:  # noqa: BLE001
        _record({"ts": time.time(), "kind": "grid-fused-spmm",
                 "name": name, "label": label, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} {label} FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("memplus", 2048, 8, 1000, "gf-spmm8")
    run_cell("synth-10M", 2048, 8, 100, "gf-spmm8")
    run_cell("synth-10M", 2048, 16, 50, "gf-spmm16")
    print(f"session21 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
