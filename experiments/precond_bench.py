"""Preconditioner family comparison: iterations + wall time to 1e-6.

Measures the round-3 preconditioner ladder (none → Jacobi → Neumann →
SSOR → IC(0)) on 2-D Poisson systems (the canonical SPD benchmark whose
condition number grows with the grid), plus ILU(0)-BiCGSTAB on a
convection-diffusion perturbation. CPU or TPU — solves run as single
jitted programs (fixed-iteration scans with on-device early stop), so
the numbers are dispatch-floor-free either way.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python experiments/precond_bench.py
"""

import time

import numpy as np

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.models import (
    bicgstab,
    conjugate_gradient,
    ic0_preconditioner,
    ilu_preconditioner,
    jacobi_preconditioner,
    pcg,
    pcg_precond,
    ssor_preconditioner,
)
from smvp_toolkit_tpu.ops import spmv_csr
from smvp_toolkit_tpu.ops.algebra import diagonal
from smvp_toolkit_tpu.ops.ilu import ic0, ilu0

TOL = 1e-6
MAX_ITERS = 600


def poisson2d(nx):
    n = nx * nx
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    for i in range(nx):
        for j in range(nx):
            k = i * nx + j
            add(k, k, 4.0)
            if i > 0:
                add(k, k - nx, -1.0)
            if i < nx - 1:
                add(k, k + nx, -1.0)
            if j > 0:
                add(k, k - 1, -1.0)
            if j < nx - 1:
                add(k, k + 1, -1.0)
    r = np.asarray(rows, np.int32)
    c = np.asarray(cols, np.int32)
    v = np.asarray(vals, np.float64)
    order = np.lexsort((c, r))
    return COOMatrix.from_numpy(
        r[order], c[order], v[order], shape=(n, n), pad_to=128
    )


def iters_to_tol(res, b_norm):
    ok = np.asarray(res) / b_norm < TOL
    return int(np.argmax(ok)) + 1 if ok.any() else None


def run_spd(nx):
    coo = poisson2d(nx)
    csr = csr_encode(coo)
    n = coo.shape[0]
    rng = np.random.RandomState(0)
    b = rng.randn(n).astype(np.float32)
    b_norm = float(np.linalg.norm(b))
    d = diagonal(coo)

    setups = {}
    t0 = time.perf_counter()
    f_ic = ic0(csr)
    setups["pcg-ic0"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    from smvp_toolkit_tpu.models import amg_preconditioner

    m_amg = amg_preconditioner(csr)
    setups["pcg-amg"] = time.perf_counter() - t0

    import jax

    # jit-wrap every case so walls compare compiled programs (the
    # factory-built pcg_precond closures otherwise re-trace per call).
    m_neu = jacobi_preconditioner(csr, d, order=3)
    m_ssor = ssor_preconditioner(csr, sweeps=4)
    m_ic = ic0_preconditioner(f_ic, sweeps=4)
    cases = {
        "cg": jax.jit(lambda bb: conjugate_gradient(
            csr, bb, num_iters=MAX_ITERS, tol=TOL)),
        "pcg (jacobi)": jax.jit(lambda bb: pcg(
            csr, bb, d, num_iters=MAX_ITERS, tol=TOL)),
        "pcg-neumann o3": jax.jit(lambda bb: pcg_precond(
            csr, bb, m_neu, num_iters=MAX_ITERS, tol=TOL)),
        "pcg-ssor s4": jax.jit(lambda bb: pcg_precond(
            csr, bb, m_ssor, num_iters=MAX_ITERS, tol=TOL)),
        "pcg-ic0 s4": jax.jit(lambda bb: pcg_precond(
            csr, bb, m_ic, num_iters=MAX_ITERS, tol=TOL)),
        "pcg-amg v(1,1)": jax.jit(lambda bb: pcg_precond(
            csr, bb, m_amg, num_iters=MAX_ITERS, tol=TOL)),
    }
    print(f"\n== 2-D Poisson {nx}x{nx} (n={n}, nnz={coo.nnz}) "
          f"to rel.res {TOL} ==")
    print(f"  (ic0 setup: {setups['pcg-ic0'] * 1e3:.1f} ms, "
          f"amg setup: {setups['pcg-amg'] * 1e3:.1f} ms — host-side)")
    for name, fn in cases.items():
        x, res = fn(b)  # compile
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        x, res = fn(b)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) * 1e3
        it = iters_to_tol(res, b_norm)
        true = float(
            np.linalg.norm(
                np.asarray(b, np.float64)
                - np.asarray(spmv_csr(csr, x), np.float64)
            )
            / b_norm
        )
        print(
            f"  {name:16s} iters={it if it else f'>{MAX_ITERS}':>4} "
            f"wall={ms:8.1f} ms  true rel.res={true:.2e}"
        )


def run_general(nx):
    coo = poisson2d(nx)
    n = coo.shape[0]
    r, c, v = coo.to_numpy()
    rng = np.random.RandomState(1)
    v = v.astype(np.float64)
    upwind = (c == r + 1) & (rng.rand(v.size) < 0.7)
    v[upwind] -= 0.35  # convection: nonsymmetric, still near-dominant
    coo = COOMatrix.from_numpy(r, c, v, shape=coo.shape, pad_to=128)
    csr = csr_encode(coo)
    b = rng.randn(n).astype(np.float32)
    b_norm = float(np.linalg.norm(b))

    t0 = time.perf_counter()
    f = ilu0(csr)
    setup = time.perf_counter() - t0
    m_apply = ilu_preconditioner(f, sweeps=4)
    # AMG on the symmetric part (A+Aᵀ)/2: the standard recipe for
    # mildly nonsymmetric systems.
    from smvp_toolkit_tpu.models import amg_preconditioner
    from smvp_toolkit_tpu.ops.algebra import add, scale, transpose

    t0 = time.perf_counter()
    m_amg = amg_preconditioner(csr_encode(scale(add(coo, transpose(coo)),
                                                0.5)))
    setup_amg = time.perf_counter() - t0

    import jax

    print(f"\n== convection-diffusion {nx}x{nx} (nonsymmetric) ==")
    print(f"  (ilu0 setup: {setup * 1e3:.1f} ms, amg(sym) setup: "
          f"{setup_amg * 1e3:.1f} ms — host-side)")
    wrapped = lambda mat, z: spmv_csr(mat, m_apply(z))  # noqa: E731
    wrapped_amg = lambda mat, z: spmv_csr(mat, m_amg(z))  # noqa: E731
    applies = {"bicgstab-ilu s4": m_apply, "bicgstab-amg": m_amg}
    for name, fn in {
        "bicgstab": jax.jit(lambda bb: bicgstab(
            csr, bb, num_iters=MAX_ITERS, tol=TOL)),
        "bicgstab-ilu s4": jax.jit(lambda bb: bicgstab(
            csr, bb, num_iters=MAX_ITERS, tol=TOL, spmv=wrapped)),
        "bicgstab-amg": jax.jit(lambda bb: bicgstab(
            csr, bb, num_iters=MAX_ITERS, tol=TOL, spmv=wrapped_amg)),
    }.items():
        u, res = fn(b)
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        u, res = fn(b)
        jax.block_until_ready(u)
        ms = (time.perf_counter() - t0) * 1e3
        it = iters_to_tol(res, b_norm)
        x = applies[name](u) if name in applies else u
        true = float(
            np.linalg.norm(
                np.asarray(b, np.float64)
                - np.asarray(spmv_csr(csr, x), np.float64)
            )
            / b_norm
        )
        print(
            f"  {name:16s} iters={it if it else f'>{MAX_ITERS}':>4} "
            f"wall={ms:8.1f} ms  true rel.res={true:.2e}"
        )


if __name__ == "__main__":
    for nx in (32, 96):
        run_spd(nx)
    # 32x32: cond ~4e4 — the edge of what f32 BiCGSTAB resolves. At 64x64
    # (cond ~2e5) BOTH variants stagnate in f32; that is a BiCGSTAB-in-f32
    # breakdown, not a preconditioner property (probed 2026-08-17).
    run_general(32)
