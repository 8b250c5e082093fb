"""Sparse algebra utilities (ops/algebra.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.ops.algebra import (
    add,
    col_sums,
    diagonal,
    row_sums,
    scale,
    transpose,
)

from conftest import random_coo


def _coo(seed=0, m=23, n=19, nnz=120, pad=64):
    rng = np.random.RandomState(seed)
    r, c, v = random_coo(rng, m, n, nnz)
    return COOMatrix.from_numpy(r, c, v, shape=(m, n), pad_to=pad)


def test_diagonal():
    coo = _coo()
    d = np.asarray(diagonal(coo))
    dense = coo.to_dense()
    np.testing.assert_allclose(d, np.diag(dense)[: len(d)], rtol=1e-6,
                               atol=1e-7)


def test_diagonal_duplicates_summed():
    coo = COOMatrix.from_numpy(
        np.array([1, 1, 0], np.int32), np.array([1, 1, 1], np.int32),
        np.array([2.0, 3.0, 9.0]), shape=(3, 3), pad_to=8,
    )
    np.testing.assert_allclose(np.asarray(diagonal(coo)), [0.0, 5.0, 0.0])


def test_row_col_sums():
    coo = _coo(seed=1)
    dense = coo.to_dense()
    np.testing.assert_allclose(np.asarray(row_sums(coo)),
                               dense.sum(axis=1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(col_sums(coo)),
                               dense.sum(axis=0), rtol=1e-5, atol=1e-6)


def test_transpose_dense_equal_and_padding_last():
    coo = _coo(seed=2)
    t = transpose(coo)
    assert t.shape == (coo.shape[1], coo.shape[0])
    np.testing.assert_allclose(t.to_dense(), coo.to_dense().T, rtol=1e-6,
                               atol=1e-7)
    # Padding entries sort last (sentinel row), true entries row-major.
    r = np.asarray(t.rows)
    assert np.all(r[t.nnz:] == t.shape[0])
    assert np.all(np.diff(r[: t.nnz]) >= 0)


def test_transpose_drops_symmetry_claim():
    from smvp_toolkit_tpu.io.mtx import MMTypeCode

    coo = COOMatrix.from_numpy(
        np.array([1], np.int32), np.array([0], np.int32),
        np.array([2.0]), shape=(2, 2),
        typecode=MMTypeCode(symmetry="symmetric"),
    )
    assert transpose(coo).typecode.symmetry == "general"


def test_scale_and_add():
    a = _coo(seed=3)
    b = _coo(seed=4)
    np.testing.assert_allclose(scale(a, 2.5).to_dense(),
                               2.5 * a.to_dense(), rtol=1e-6)
    s = add(a, b, beta=-0.5)
    assert s.nnz == a.nnz + b.nnz
    np.testing.assert_allclose(
        s.to_dense(), a.to_dense() - 0.5 * b.to_dense(), rtol=1e-5,
        atol=1e-6,
    )


def test_add_shape_mismatch():
    with pytest.raises(ValueError):
        add(_coo(), _coo(m=5, n=5, nnz=10))


def _sym_coo():
    """4x4 symmetric matrix stored lower-triangle-only."""
    from smvp_toolkit_tpu.io.mtx import MMTypeCode

    r = np.array([0, 2, 3, 3], np.int32)
    c = np.array([0, 1, 2, 3], np.int32)
    v = np.array([2.0, -1.5, 4.0, 1.0])
    return COOMatrix.from_numpy(
        r, c, v, shape=(4, 4), typecode=MMTypeCode(symmetry="symmetric"),
    )


def test_add_mixed_symmetry_expands():
    """general + symmetric (either order) mirrors the stored triangle.

    Regression: raw-triplet concatenation kept operand a's typecode, so
    general+symmetric never expanded b's mirror and symmetric+general
    effectively added B+Bᵀ.
    """
    sym = _sym_coo()
    gen = _coo(m=4, n=4, nnz=6, seed=7)
    sym_full = sym.to_scipy().toarray()  # to_scipy expands the mirror
    want = gen.to_dense() + 2.0 * sym_full
    got = add(gen, sym, beta=2.0)
    assert got.typecode.is_general
    np.testing.assert_allclose(got.to_dense(), want, rtol=1e-5, atol=1e-6)
    want2 = sym_full + 2.0 * gen.to_dense()
    got2 = add(sym, gen, beta=2.0)
    assert got2.typecode.is_general
    np.testing.assert_allclose(got2.to_dense(), want2, rtol=1e-5, atol=1e-6)


def test_add_same_symmetry_keeps_triangle_storage():
    """symmetric + symmetric stays one-triangle (still a valid operator)."""
    a, b = _sym_coo(), _sym_coo()
    got = add(a, b, beta=0.5)
    assert got.typecode.symmetry == "symmetric"
    np.testing.assert_allclose(
        got.to_dense(), 1.5 * a.to_dense(), rtol=1e-6, atol=1e-7,
    )


def test_diagonal_feeds_pcg():
    """End-to-end: diagonal() output drives the Jacobi preconditioner."""
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models import pcg

    rng = np.random.RandomState(5)
    n = 20
    a = np.diag(np.abs(rng.randn(n)) + 2.0)
    a[0, 1] = a[1, 0] = 0.3
    r, c = np.nonzero(a)
    coo = COOMatrix.from_numpy(r.astype(np.int32), c.astype(np.int32),
                               a[r, c], shape=(n, n), pad_to=64)
    csr = csr_encode(coo)
    b = jnp.asarray(rng.randn(n), jnp.float32)
    x, _ = pcg(csr, b, diagonal(coo), num_iters=40)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(a, np.asarray(b, np.float64)),
                               rtol=1e-3, atol=1e-4)


def test_matmul_matches_dense():
    from smvp_toolkit_tpu.ops.algebra import matmul

    rng = np.random.RandomState(5)
    ra, ca, va = random_coo(rng, 30, 40, 120)
    rb, cb, vb = random_coo(rng, 40, 25, 100)
    a = COOMatrix.from_numpy(ra, ca, va, shape=(30, 40), pad_to=64)
    b = COOMatrix.from_numpy(rb, cb, vb, shape=(40, 25), pad_to=64)
    p = matmul(a, b)
    assert p.shape == (30, 25)
    np.testing.assert_allclose(
        p.to_dense(), a.to_dense() @ b.to_dense(), rtol=1e-5, atol=1e-6
    )


def test_matmul_normal_equations_feed_solver():
    # AtA from SpGEMM is consumable by the device solvers directly.
    import jax.numpy as jnp

    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models import conjugate_gradient
    from smvp_toolkit_tpu.ops.algebra import matmul, transpose

    rng = np.random.RandomState(6)
    r, c, v = random_coo(rng, 50, 30, 200)
    a = COOMatrix.from_numpy(r, c, v, shape=(50, 30), pad_to=64)
    ata = matmul(transpose(a), a)
    ad = a.to_dense()
    np.testing.assert_allclose(
        ata.to_dense(), ad.T @ ad, rtol=1e-5, atol=1e-6
    )
    # regularize to SPD and solve on device
    from smvp_toolkit_tpu.ops.algebra import add, diagonal

    n = 30
    eye = COOMatrix.from_numpy(
        np.arange(n, dtype=np.int32), np.arange(n, dtype=np.int32),
        np.ones(n), shape=(n, n), pad_to=64,
    )
    spd = add(ata, eye)
    csr = csr_encode(spd.pad(256))
    bvec = jnp.asarray(rng.randn(n).astype(np.float32))
    x, res = conjugate_gradient(csr, bvec, num_iters=60)
    x_ref = np.linalg.solve(ad.T @ ad + np.eye(n), np.asarray(bvec, np.float64))
    assert np.abs(np.asarray(x, np.float64) - x_ref).max() < 1e-3


def test_matmul_shape_mismatch():
    from smvp_toolkit_tpu.ops.algebra import matmul

    rng = np.random.RandomState(7)
    r, c, v = random_coo(rng, 10, 10, 30)
    a = COOMatrix.from_numpy(r, c, v, shape=(10, 10), pad_to=32)
    r2, c2, v2 = random_coo(rng, 7, 7, 20)
    b = COOMatrix.from_numpy(r2, c2, v2, shape=(7, 7), pad_to=32)
    with pytest.raises(ValueError, match="inner dimensions"):
        matmul(a, b)


def test_matmul_expands_symmetric_operand():
    from smvp_toolkit_tpu.io.mtx import MMTypeCode
    from smvp_toolkit_tpu.ops.algebra import matmul

    r = np.array([0, 1, 2, 2], np.int32)
    c = np.array([0, 0, 1, 2], np.int32)
    v = np.array([1.0, 2.0, 3.0, 4.0])
    tc = MMTypeCode(field="real", symmetry="symmetric")
    a = COOMatrix.from_numpy(r, c, v, shape=(3, 3), typecode=tc)
    dense = np.array([[1, 2, 0], [2, 0, 3], [0, 3, 4]], np.float64)
    p = matmul(a, a)
    np.testing.assert_allclose(p.to_dense(), dense @ dense,
                               rtol=1e-5, atol=1e-6)
