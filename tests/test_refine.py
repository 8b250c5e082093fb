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
