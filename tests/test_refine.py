"""Mixed-precision iterative refinement: ~f64-quality solves on f32
hardware (df64 residuals + any f32 inner solver)."""

import numpy as np

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.models import (
    amg_preconditioner,
    pcg_precond,
    refine_solve,
)
from smvp_toolkit_tpu.ops.precision import df_to_f64

from conftest import poisson2d


def _encode(a, pad_to=128):
    r, c = np.nonzero(a)
    return csr_encode(COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32),
        a[r, c].astype(np.float32), shape=a.shape, pad_to=pad_to,
    ))


def test_refine_reaches_f64_floor():
    """Refinement with an AMG-PCG inner solver lands ~7 orders below
    the plain f32 solve floor, and the per-sweep residual norms shrink
    monotonically to the df64 floor."""
    a = poisson2d(24)
    n = a.shape[0]
    csr = _encode(a)
    m = amg_preconditioner(csr)
    inner = lambda r: pcg_precond(  # noqa: E731
        csr, r, m, num_iters=40, tol=1e-7
    )[0]
    b = np.random.RandomState(0).randn(n)

    xh, xl, norms = refine_solve(csr, b, inner=inner, num_refinements=3)
    x64 = np.asarray(df_to_f64(xh, xl), np.float64)
    rel = np.linalg.norm(a @ x64 - b) / np.linalg.norm(b)
    assert rel < 1e-12

    x32 = np.asarray(inner(jnp.asarray(b, jnp.float32)), np.float64)
    rel32 = np.linalg.norm(a @ x32 - b) / np.linalg.norm(b)
    assert rel < 1e-4 * rel32  # orders below the f32 floor
    assert norms[1] < 1e-3 * norms[0]  # each sweep contracts hard


def test_refine_plain_cg_inner():
    """Any f32 inner solver works — plain CG, no preconditioner."""
    from smvp_toolkit_tpu.models import conjugate_gradient

    a = poisson2d(12)
    csr = _encode(a, pad_to=64)
    inner = lambda r: conjugate_gradient(  # noqa: E731
        csr, r, num_iters=200, tol=1e-7
    )[0]
    b = np.random.RandomState(1).randn(a.shape[0])
    xh, xl, _ = refine_solve(csr, b, inner=inner, num_refinements=3)
    x64 = np.asarray(df_to_f64(xh, xl), np.float64)
    rel = np.linalg.norm(a @ x64 - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_refine_f64_operator_values():
    """vals_lo carries the low words of f64 matrix values: refinement
    then converges to the TRUE f64 operator's solution, while without
    it the f32-rounded operator floors the error ~7 orders higher."""
    from smvp_toolkit_tpu.models import conjugate_gradient
    from smvp_toolkit_tpu.ops.precision import df_split

    rng = np.random.RandomState(3)
    a64 = poisson2d(10) * (1.0 / 3.0)  # values not f32-representable
    n = a64.shape[0]
    r, c = np.nonzero(a64)
    v64 = a64[r, c]
    v_hi, v_lo = df_split(v64)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), np.asarray(v_hi),
        shape=(n, n), pad_to=64,
    )
    csr = csr_encode(coo)
    # vals_lo must align with the ENCODED (sorted, padded) value plane:
    # encode the low words through the same row/col keys.
    coo_lo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), np.asarray(v_lo),
        shape=(n, n), pad_to=64,
    )
    vals_lo = csr_encode(coo_lo).vals

    inner = lambda rr: conjugate_gradient(  # noqa: E731
        csr, rr, num_iters=200, tol=1e-7
    )[0]
    b = rng.randn(n)

    from smvp_toolkit_tpu.ops.precision import df_to_f64

    xh, xl, _ = refine_solve(csr, b, inner=inner, num_refinements=4,
                             vals_lo=vals_lo)
    x64 = np.asarray(df_to_f64(xh, xl), np.float64)
    rel_true = np.linalg.norm(a64 @ x64 - b) / np.linalg.norm(b)
    assert rel_true < 1e-12

    xh2, xl2, _ = refine_solve(csr, b, inner=inner, num_refinements=4)
    x2 = np.asarray(df_to_f64(xh2, xl2), np.float64)
    rel_f32op = np.linalg.norm(a64 @ x2 - b) / np.linalg.norm(b)
    assert rel_f32op > 1e-9  # floored by the f32-rounded operator
