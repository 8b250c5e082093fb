#!/usr/bin/env python
"""Occupancy engineering: the co-clustering planner end to end.

SELL-T1 throughput is linear in slot occupancy (PERFORMANCE.md,
"slot-rate law"). This demo shows the whole round-5 pipeline on a
reference matrix:

1. natural-order plan occupancy (what any fixed layout gives you),
2. the joint row x column co-clustering refinement (`ops/cocluster.py`
   — C++ local search over the exact sublane objective),
3. the permuted-coordinate operator (`CoClusteredSellSpMV`) with
   bit-correct boundary conversions, and
4. the production autotuner's chunk/split/VMEM choice on the permuted
   coordinates.

On hardware (v5e) this pipeline took the memplus headline from
13.6 to 20.7-23.7 Gnnz/s; here it runs on CPU (interpreter) and prints
the plan statistics that predict the win.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.cocluster import cocluster
from smvp_toolkit_tpu.ops.spmv_pallas import (
    CoClusteredSellSpMV,
    _split_policy,
)

MTX = os.environ.get(
    "SMVP_DEMO_MTX", "/root/reference/sample-data/memplus.mtx"
)


def main():
    coo = read_mtx(MTX)
    r, c, v = coo.to_numpy()
    print(f"matrix: {MTX}  {coo.shape[0]}x{coo.shape[1]}  nnz={coo.nnz}")

    res = cocluster(
        np.asarray(r, np.int64), np.asarray(c, np.int64), coo.shape
    )
    if res is None:
        print("native libcocluster.so not built — run "
              "make -C smvp_toolkit_tpu/native")
        return
    occ_nat = coo.nnz / (res.s_true_natural * 128.0)
    print(f"occupancy: natural {occ_nat:.3f} -> co-clustered "
          f"{res.occupancy(coo.nnz):.3f} "
          f"({res.occupancy(coo.nnz) / occ_nat:.2f}x; "
          f"{res.moves} refinement moves)")

    op = CoClusteredSellSpMV(coo, value_dtype=jnp.bfloat16)
    plan = op.inner.plan
    print(f"autotuned plan: chunk {plan.chunk}, "
          f"chain split {_split_policy(plan.chunk, 1)}, "
          f"window {plan.window_tiles} tiles, "
          f"{plan.n_chunks} chunk(s)")

    rng = np.random.RandomState(0)
    x = rng.randn(coo.shape[1]).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))  # natural coords in/out
    import ml_dtypes

    oracle = np.zeros(coo.shape[0])
    np.add.at(
        oracle, r,
        v.astype(ml_dtypes.bfloat16).astype(np.float64)
        * x.astype(ml_dtypes.bfloat16)[c].astype(np.float64),
    )
    err = np.abs(y - oracle).max() / (np.abs(oracle).max() + 1e-30)
    print(f"permuted-coordinate SpMV vs bf16 oracle: rel err {err:.2e}")
    assert err < 1e-3
    print("OK — solvers keep x/y in permuted space via "
          "op.to_permuted/from_permuted at zero per-iteration cost.")


if __name__ == "__main__":
    main()
