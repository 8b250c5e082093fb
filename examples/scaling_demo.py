#!/usr/bin/env python
"""Parallel-scaling tour on CPU-simulated devices (8 virtual chips).

Shows the three sharding strategies on one skewed matrix:
1-D equal-rows, 1-D nnz-balanced, and 2-D row x column (x sharded).

Run: PYTHONPATH=. JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/scaling_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import numpy as np

from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.ops.algebra import transpose
from smvp_toolkit_tpu.parallel import (
    make_mesh,
    make_mesh_2d,
    shard_csr,
    shard_csr_2d,
    spmv_csr_2d,
    spmv_csr_sharded,
)
from smvp_toolkit_tpu.utils.synth import synth_powerlaw

# Power-law ROW lengths (hub rows): the worst case for equal-rows DP.
coo = transpose(synth_powerlaw(3000, 60000, alpha=1.2, seed=0).pad(512))
csr = csr_encode(coo)
x = np.random.RandomState(1).randn(coo.shape[1]).astype(np.float32)
y_ref = coo.to_dense() @ x.astype(np.float64)

mesh = make_mesh(8)
for balance in ("rows", "nnz"):
    sh = shard_csr(csr, mesh, balance=balance)
    widths = (np.asarray(sh.local_rows) < sh.rows_per_shard).sum(axis=1)
    y = np.asarray(spmv_csr_sharded(sh, x, mesh))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    print(f"1-D balance={balance:4s}: per-device nnz "
          f"max/mean = {widths.max()}/{widths.mean():.0f} "
          f"(imbalance {widths.max()/widths.mean():.2f}x)")

mesh2 = make_mesh_2d(2, 4)
y2 = np.asarray(spmv_csr_2d(shard_csr_2d(csr, mesh2), x, mesh2))
np.testing.assert_allclose(y2, y_ref, rtol=1e-4, atol=1e-4)
print("2-D (2x4): x sharded along columns, psum over dpc — correct ✓")
