"""One-shot TPU measurement session (minimizes remote compiles).

Runs, in one process with the persistent compile cache enabled:
  1. SELL v2 kernel correctness + fused timing on memplus and pwt
  2. HIGH-precision variant accuracy/speed comparison on memplus
Prints incremental results; safe to rerun (cache makes it cheap).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.ops import spmv_pallas as sp


def run_matrix(name, chunk=1024, precision=None):
    coo = read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
    op = sp.SellSpMV(plan, interpret=False, precision=precision)
    x = jnp.ones((coo.shape[1],), jnp.float32)
    y = np.asarray(op(x)).astype(np.float64)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
    pname = str(precision).split(".")[-1] if precision else "HIGHEST"
    print(f"{name} chunk={chunk} prec={pname} S={plan.n_sublanes} "
          f"WT={plan.window_tiles} err={err:.2e}", flush=True)
    stats = bench_spmv_fused(lambda m, xx: op(xx), coo, x,
                             iterations=200, repeats=3)
    nnzs = coo.nnz / (stats.avg_ms * 1e-3)
    ref_nnzs = coo.nnz / _ref_ms(name)
    print(f"{name} SELLv2[{pname}]: {stats.avg_ms*1e3:8.1f} us  "
          f"{nnzs/1e9:.2f} Gnnz/s  vs_ref_csr {nnzs/ref_nnzs:.1f}x",
          flush=True)
    return err, stats


def _ref_ms(name):
    return {"memplus": 0.387638e-3, "pwt": 0.569281e-3}[name]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    t0 = time.time()
    jobs = [
        ("memplus", 1024, None),
        ("pwt", 1024, None),
        ("memplus", 1024, jax.lax.Precision.HIGH),
        ("memplus", 2048, None),
        ("pwt", 2048, None),
        ("pwt", 1024, jax.lax.Precision.HIGH),
    ]
    for name, chunk, prec in jobs:
        try:
            run_matrix(name, chunk, prec)
        except Exception as e:
            print(f"{name} chunk={chunk} FAILED: {str(e)[:160]}", flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
