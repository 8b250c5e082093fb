#!/usr/bin/env python
"""Solve A x = b with CG on an encoded sparse matrix + df64 verification."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from smvp_toolkit_tpu import csr_encode
from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.models import conjugate_gradient
from smvp_toolkit_tpu.ops.precision import df_split, df_to_f64, spmv_csr_df64
from smvp_toolkit_tpu.utils.synth import synth_banded

# Build a sparse SPD system: symmetrize a banded pattern and add a
# dominant diagonal (all host-side numpy; encode once on device).
coo = synth_banded(2000, nnz_per_row=7, bandwidth=32, seed=0)
r, c, v = coo.to_numpy()
r2 = np.concatenate([r, c])
c2 = np.concatenate([c, r])
v2 = np.concatenate([v, v])  # A + A^T
absrow = np.zeros(coo.shape[0])
np.add.at(absrow, r2, np.abs(v2))
rd = np.arange(coo.shape[0], dtype=r.dtype)
spd = COOMatrix.from_numpy(
    np.concatenate([r2, rd]),
    np.concatenate([c2, rd]),
    np.concatenate([v2, absrow + 1.0]),
    shape=coo.shape,
    pad_to=512,
)
csr = csr_encode(spd)

b = jnp.ones((coo.shape[0],), jnp.float32)
x, res = conjugate_gradient(csr, b, num_iters=200)
print("CG residual: first", float(res[0]), "last", float(res[-1]))
assert float(res[-1]) < 1e-3 * float(res[0])

# High-accuracy residual check in double-float arithmetic.
x_hi, x_lo = df_split(np.asarray(x, np.float64))
ax = df_to_f64(*spmv_csr_df64(csr, x_hi, x_lo))
print("df64 residual inf-norm:", float(np.abs(ax - 1.0).max()))

# Mixed-precision iterative refinement: the same system to ~f64
# accuracy on f32 hardware — df64 residuals, f32 CG corrections.
from smvp_toolkit_tpu.models import refine_solve

inner = lambda rr: conjugate_gradient(csr, rr, num_iters=200,
                                      tol=1e-7)[0]
xh, xl, sweeps = refine_solve(csr, np.ones(coo.shape[0]), inner=inner)
x64 = np.asarray(df_to_f64(xh, xl), np.float64)
r64 = df_to_f64(*spmv_csr_df64(csr, *df_split(x64))) - 1.0
print("refined residual inf-norm:", float(np.abs(np.asarray(r64)).max()),
      f"(per-sweep norms {[f'{s:.1e}' for s in sweeps]})")
