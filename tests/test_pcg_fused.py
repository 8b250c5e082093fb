"""Fused Chebyshev / PCG-IC0 kernels vs their scan-loop references.

Interpret mode (CPU); exact parity targets are the XLA solvers in
models.solvers — same recurrences, f32 state — so tolerances are the
re-association level, and the dense solve anchors correctness.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
from smvp_toolkit_tpu.ops.pcg_fused import fused_chebyshev, fused_pcg_ic0

from conftest import poisson2d


def _poisson_coo(nx):
    a = poisson2d(nx)
    n = a.shape[0]
    r, c = np.nonzero(a)
    return COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32),
        a[r, c].astype(np.float32), shape=(n, n),
    ), a


def test_fused_chebyshev_matches_scan_solver():
    from smvp_toolkit_tpu.models.solvers import chebyshev

    coo, a = _poisson_coo(12)
    n = a.shape[0]
    b = np.random.RandomState(0).rand(n).astype(np.float32)
    lam = np.linalg.eigvalsh(a)
    lmin, lmax = float(lam[0]), float(lam[-1])
    op = SellSpMV.from_coo(coo)
    x = np.asarray(fused_chebyshev(op, jnp.asarray(b), lmin, lmax, 80))
    x_ref, _ = chebyshev(
        coo, jnp.asarray(b), lmin, lmax, num_iters=80,
        spmv=lambda m_, z: op(z),
    )
    x_ref = np.asarray(x_ref)
    scale = np.abs(x_ref).max() + 1e-30
    assert np.abs(x - x_ref).max() / scale < 1e-4
    # and it actually solves
    xd = np.linalg.solve(a, b.astype(np.float64))
    assert np.abs(x - xd).max() / np.abs(xd).max() < 1e-2


def test_fused_chebyshev_rejects_rectangular():
    coo = COOMatrix.from_numpy(
        np.array([0], np.int32), np.array([0], np.int32),
        np.array([1.0], np.float32), shape=(4, 6),
    )
    op = SellSpMV.from_coo(coo)
    with pytest.raises(ValueError):
        fused_chebyshev(op, jnp.ones(4), 0.1, 1.0, 3)


@pytest.mark.parametrize("sweeps", [2, 4])
def test_fused_pcg_ic0_matches_scan_solver(sweeps):
    from smvp_toolkit_tpu.models.solvers import (
        ic0_preconditioner, pcg_precond,
    )
    from smvp_toolkit_tpu.ops.ilu import ic0

    coo, a = _poisson_coo(12)
    n = a.shape[0]
    b = np.random.RandomState(1).rand(n).astype(np.float32)
    csr = csr_encode(coo)
    factors = ic0(csr)
    op = SellSpMV.from_coo(coo)
    iters = 40
    x = np.asarray(
        fused_pcg_ic0(op, factors, jnp.asarray(b), iters, sweeps=sweeps)
    )
    precond = ic0_preconditioner(factors, sweeps=sweeps)
    x_ref, _ = pcg_precond(
        coo, jnp.asarray(b), precond, num_iters=iters,
        spmv=lambda m_, z: op(z),
    )
    x_ref = np.asarray(x_ref)
    scale = np.abs(x_ref).max() + 1e-30
    assert np.abs(x - x_ref).max() / scale < 1e-4
    xd = np.linalg.solve(a, b.astype(np.float64))
    assert np.abs(x - xd).max() / np.abs(xd).max() < 1e-3


def test_fused_pcg_ic0_rejects_sweeps_1():
    coo, _ = _poisson_coo(6)
    from smvp_toolkit_tpu.ops.ilu import ic0

    csr = csr_encode(coo)
    op = SellSpMV.from_coo(coo)
    with pytest.raises(ValueError):
        fused_pcg_ic0(op, ic0(csr), jnp.ones(coo.shape[0]), 3, sweeps=1)
