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


def run_matrix(name, chunk=1024):
    coo = read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
    op = sp.SellSpMV(plan, interpret=False)
    x = jnp.ones((coo.shape[1],), jnp.float32)
    y = np.asarray(op(x)).astype(np.float64)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
    print(f"{name} chunk={chunk} S={plan.n_sublanes} WT={plan.window_tiles} "
          f"err={err:.2e}", flush=True)
    stats = bench_spmv_fused(lambda m, xx: op(xx), coo, x,
                             iterations=200, repeats=3)
    nnzs = coo.nnz / (stats.avg_ms * 1e-3)
    print(f"{name} SELLv2: {stats.avg_ms*1e3:8.1f} us  "
          f"{nnzs/1e9:.2f} Gnnz/s  vs_ref_csr {nnzs/ (coo.nnz/ _ref_ms(name)):.1f}x",
          flush=True)
    return err, stats


def _ref_ms(name):
    return {"memplus": 0.387638e-3, "pwt": 0.569281e-3}[name]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    t0 = time.time()
    for name in ["memplus", "pwt"]:
        for chunk in [1024, 2048]:
            try:
                run_matrix(name, chunk)
            except Exception as e:
                print(f"{name} chunk={chunk} FAILED: {str(e)[:160]}",
                      flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
