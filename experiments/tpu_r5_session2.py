"""Round-5 session 2: fused-solver launches vs scan loops on TPU.

Verdict item 6's done-criterion: >= 3x measured vs the scan loop for
fused-PCG-IC0 and fused-Chebyshev. The scan loops carry the tunneled
stack's ~140 us/XLA-iteration tax (PERFORMANCE.md) — which is exactly
the overhead class the fused launches exist to delete (and that a real
solver on this dev stack would pay).

System: 2-D Poisson (SPD), 96^2 and 256^2. Fixed iteration counts;
both paths correctness-checked against the dense/f64 solve direction
(residual reduction), timed with 3 samples each after a warm call.

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
      timeout 1500 python -u experiments/tpu_r5_session2.py [nx ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = os.path.join(
    os.path.dirname(__file__), "results", "tpu_r5_results.jsonl"
)


def _record(rec):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def poisson_coo(nx):
    import scipy.sparse as sp

    from smvp_toolkit_tpu.formats.coo import COOMatrix

    eye = sp.eye(nx)
    t = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (nx, nx))
    a = (sp.kron(eye, t) + sp.kron(t, eye)).tocoo()
    return COOMatrix.from_numpy(
        a.row.astype(np.int32), a.col.astype(np.int32),
        a.data.astype(np.float32), shape=a.shape,
    )


def timeit(f, *args):
    import jax

    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter_ns()
        jax.block_until_ready(f(*args))
        ts.append((time.perf_counter_ns() - t0) / 1e6)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models.solvers import (
        chebyshev, ic0_preconditioner, pcg_precond,
    )
    from smvp_toolkit_tpu.ops.cg_fused import fused_cg
    from smvp_toolkit_tpu.ops.ilu import ic0
    from smvp_toolkit_tpu.ops.pcg_fused import fused_chebyshev, fused_pcg_ic0
    from smvp_toolkit_tpu.ops.spmv_pallas import sell_op_csr

    print("device:", jax.devices()[0].device_kind, flush=True)
    sizes = [int(a) for a in sys.argv[1:]] or [96, 256]
    # Per-call wall time through the tunnel floors at ~25 ms
    # (measured: scan and fused both "took" 26 ms for any body) — so
    # time TWO iteration counts and difference them: the slope is the
    # genuine per-iteration cost, the floor cancels.
    n_lo, n_hi = 100, 400
    for nx in sizes:
        coo = poisson_coo(nx)
        n = coo.shape[0]
        csr = csr_encode(coo)
        op = sell_op_csr(csr)
        factors = ic0(csr)
        b = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))

        # --- PCG-IC0 ---
        pre = ic0_preconditioner(factors, sweeps=4,
                                 op_builder=sell_op_csr)

        def slope_ms(make):
            ts = []
            for n_it in (n_lo, n_hi):
                f = make(n_it)
                ts.append(timeit(f, b))
            return (ts[1] - ts[0]) / (n_hi - n_lo), ts

        sc_slope, _ = slope_ms(lambda n_it: jax.jit(
            lambda bb: pcg_precond(csr, bb, pre, num_iters=n_it,
                                   spmv=lambda _m, z: op(z))[0]))
        fu_slope, _ = slope_ms(lambda n_it: jax.jit(
            lambda bb: fused_pcg_ic0(op, factors, bb, n_it, sweeps=4)))
        iters = n_lo
        scan = jax.jit(lambda bb: pcg_precond(
            csr, bb, pre, num_iters=iters,
            spmv=lambda _m, z: op(z))[0])
        fused = jax.jit(lambda bb: fused_pcg_ic0(
            op, factors, bb, iters, sweeps=4))
        t_scan, t_fused = sc_slope * 1e3, fu_slope * 1e3  # us/iter
        x_s = np.asarray(scan(b), np.float64)
        x_f = np.asarray(fused(b), np.float64)
        r_s = np.linalg.norm(np.asarray(coo.to_dense(), np.float64) @ x_s
                             - np.asarray(b, np.float64))
        r_f = np.linalg.norm(np.asarray(coo.to_dense(), np.float64) @ x_f
                             - np.asarray(b, np.float64))
        bn = np.linalg.norm(np.asarray(b, np.float64))
        rec = {"ts": time.time(), "kind": "solver-fused5",
               "method": "pcg-ic0", "nx": nx, "n": n,
               "us_per_iter_scan": t_scan, "us_per_iter_fused": t_fused,
               "speedup": t_scan / max(t_fused, 1e-9),
               "relres_scan": float(r_s / bn),
               "relres_fused": float(r_f / bn),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"pcg-ic0 {nx}^2: scan {t_scan:.1f} us/iter, fused "
              f"{t_fused:.1f} us/iter -> {t_scan/max(t_fused,1e-9):.1f}x "
              f"(relres {r_s/bn:.1e} vs {r_f/bn:.1e})", flush=True)

        # --- Chebyshev ---
        lam = 8.0 * np.sin(np.pi * nx / (2 * (nx + 1))) ** 2
        lmin = 2 * 4.0 * np.sin(np.pi / (2 * (nx + 1))) ** 2
        sc_slope, _ = slope_ms(lambda n_it: jax.jit(
            lambda bb: chebyshev(csr, bb, lmin, lam, num_iters=n_it,
                                 spmv=lambda _m, z: op(z))[0]))
        fu_slope, _ = slope_ms(lambda n_it: jax.jit(
            lambda bb: fused_chebyshev(op, bb, lmin, lam, n_it)))
        t_scan, t_fused = sc_slope * 1e3, fu_slope * 1e3
        scan_c = jax.jit(lambda bb: chebyshev(
            csr, bb, lmin, lam, num_iters=iters,
            spmv=lambda _m, z: op(z))[0])
        fused_c = jax.jit(lambda bb: fused_chebyshev(
            op, bb, lmin, lam, iters))
        x_s = np.asarray(scan_c(b), np.float64)
        x_f = np.asarray(fused_c(b), np.float64)
        dx = np.abs(x_s - x_f).max() / (np.abs(x_s).max() + 1e-30)
        rec = {"ts": time.time(), "kind": "solver-fused5",
               "method": "chebyshev", "nx": nx, "n": n,
               "us_per_iter_scan": t_scan, "us_per_iter_fused": t_fused,
               "speedup": t_scan / max(t_fused, 1e-9),
               "x_rel_diff": float(dx),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"chebyshev {nx}^2: scan {t_scan:.1f} us/iter, fused "
              f"{t_fused:.1f} us/iter -> "
              f"{t_scan/max(t_fused,1e-9):.1f}x (x diff {dx:.1e})",
              flush=True)

        # --- plain fused CG context line (slope) ---
        cg_slope, _ = slope_ms(lambda n_it: jax.jit(
            lambda bb: fused_cg(op, bb, n_it)))
        print(f"cg-fused {nx}^2: {cg_slope*1e3:.1f} us/iter",
              flush=True)


if __name__ == "__main__":
    main()
