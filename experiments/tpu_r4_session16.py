"""Round-4 session 16: fused in-kernel CG vs the scan-loop CG on TPU.

The fused solver (ops/cg_fused.py) runs the whole fixed-iteration CG in
one Mosaic grid; the conventional implementation pays the ~140
µs/iteration XLA-loop tax of this stack on TOP of its per-iteration
launch/glue. Cells (SPD systems, diagonally dominant banded symmetric):

  spd-small   n = 18k rows  (memplus scale)
  spd-large   n = 1M rows   (synth-10M scale)

Per cell: fused_cg per-iteration slope from T(N)/T(2N)/T(4N) launches,
the scan-loop CG (same SELL operator) timed fetch-synced for contrast,
and the fused solution's relative residual as the correctness gate.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session16.py > /tmp/tpu_r4_s16.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session16.py
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


def _spd_banded(n, nnz_per_row=6, bandwidth=192, seed=5):
    """Symmetric diagonally-dominant banded COO (SPD by construction)."""
    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(n, nnz_per_row=nnz_per_row, bandwidth=bandwidth,
                       seed=seed)
    r, c, v = coo.to_numpy()
    # symmetrize off-diagonals, then dominate the diagonal
    keep = r != c
    r2 = np.concatenate([r[keep], c[keep]])
    c2 = np.concatenate([c[keep], r[keep]])
    v2 = np.concatenate([np.abs(v[keep]), np.abs(v[keep])]) * 0.5
    rowsum = np.zeros(n)
    np.add.at(rowsum, r2, v2)
    rd = np.arange(n)
    r3 = np.concatenate([r2, rd])
    c3 = np.concatenate([c2, rd])
    v3 = np.concatenate([v2, rowsum + 1.0])
    return COOMatrix.from_numpy(
        r3.astype(np.int64), c3.astype(np.int64), v3.astype(np.float32),
        shape=(n, n), pad_to=512,
    )


def run_cell(tag, n, base_iters):
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.models import conjugate_gradient
    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.cg_fused import fused_cg

    try:
        if QUICK:
            n = min(n, 20_000)
            base_iters = 4
        coo = _spd_banded(n)
        op = sp.SellSpMV.from_coo(coo, interpret=None if QUICK else False)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        pts = [base_iters, 2 * base_iters, 4 * base_iters]
        ts, x_last = [], None
        for it in pts:
            f = jax.jit(lambda bb, _it=it: fused_cg(op, bb, _it))
            x_last = np.asarray(f(b))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                np.asarray(f(b))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([pts, np.ones(3)]).T
        (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                 rcond=None)
        # correctness: relative residual of the deepest solve
        r_h, c_h, v_h = coo.to_numpy()
        Ax = np.zeros(n)
        np.add.at(Ax, r_h, v_h.astype(np.float64) * x_last[c_h])
        relres = float(np.linalg.norm(np.asarray(b) - Ax)
                       / np.linalg.norm(np.asarray(b)))

        # contrast: scan-loop CG on the same operator (1 jit)
        g = jax.jit(lambda bb: conjugate_gradient(
            None, bb, num_iters=base_iters,
            spmv=lambda _m, xx: op(xx))[0])
        np.asarray(g(b))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter_ns()
            np.asarray(g(b))
            samples.append((time.perf_counter_ns() - t0) / 1e3)
        loop_us = min(samples) / base_iters

        rec = {"ts": time.time(), "kind": "cg-fused", "name": tag,
               "n": n, "nnz": int(coo.nnz), "iters_pts": pts,
               "t_us": ts, "fused_us_per_iter": float(slope),
               "intercept_us": float(intercept),
               "loop_us_per_iter": float(loop_us),
               "speedup": float(loop_us / slope) if slope > 0 else None,
               "relres": relres,
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"{tag}: fused {slope:9.2f} us/iter vs loop "
              f"{loop_us:9.2f} us/iter  ({loop_us/slope:5.1f}x)  "
              f"relres={relres:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001 — cell isolation
        _record({"ts": time.time(), "kind": "cg-fused", "name": tag,
                 "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{tag} FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("spd-small", 18_000, 200)
    run_cell("spd-large", 1_000_000, 50)
    print(f"session16 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
