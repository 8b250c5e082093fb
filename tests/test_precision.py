"""Extended-precision (double-float) and SpMM tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.formats.tjds import tjds_encode
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops import spmm_csr, spmm_tjds, spmv_csr
from smvp_toolkit_tpu.ops.precision import (
    df_split,
    df_to_f64,
    spmv_csr_df64,
    two_prod,
    two_sum,
)

from conftest import SAMPLE_DIR, random_coo


def _load(name, pad=128):
    return read_mtx(os.path.join(SAMPLE_DIR, name), use_native=False).pad(pad)


# ---------------------------------------------------------------------------
# Error-free transformations
# ---------------------------------------------------------------------------


def test_two_sum_exact():
    a = jnp.asarray([1e8, 1.0, -1e8], jnp.float32)
    b = jnp.asarray([1.0, 1e-8, 1e8], jnp.float32)
    s, e = two_sum(a, b)
    # s + e reproduces the exact sum in f64.
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_df_split_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(100) * np.exp(rng.randn(100) * 5)
    hi, lo = df_split(x)
    back = df_to_f64(hi, lo)
    np.testing.assert_allclose(back, x, rtol=1e-14)


# ---------------------------------------------------------------------------
# df64 SpMV accuracy
# ---------------------------------------------------------------------------


def test_df64_beats_f32_on_memplus():
    coo = _load("memplus.mtx", pad=512)
    csr = csr_encode(coo)
    rng = np.random.RandomState(0)
    x64 = rng.randn(coo.shape[1])
    x_hi, x_lo = df_split(x64)
    y_df = df_to_f64(*spmv_csr_df64(csr, x_hi, x_lo))
    y_f32 = np.asarray(spmv_csr(csr, jnp.asarray(x64, jnp.float32))).astype(
        np.float64
    )
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64) * x64[c])
    scale = np.abs(y_ref).max()
    err_df = np.abs(y_df - y_ref).max() / scale
    err_f32 = np.abs(y_f32 - y_ref).max() / scale
    assert err_df < 1e-11
    assert err_df < err_f32 / 100


def test_df64_with_f64_matrix_values():
    # Pass the low words of f64 matrix values too.
    rng = np.random.RandomState(2)
    r, c, v = random_coo(rng, 50, 50, 300)
    coo = COOMatrix.from_numpy(r, c, v, shape=(50, 50), pad_to=64)
    csr = csr_encode(coo)
    # Low words of the original f64 values in CSR order.
    dec_r, dec_c, _ = (np.asarray(a) for a in (csr.row_ids, csr.col_ind, csr.vals))
    dense64 = np.zeros((50, 50))
    dense64[r, c] = v
    order_vals = dense64[dec_r[: csr.nnz], dec_c[: csr.nnz]]
    vals_lo = np.zeros(csr.nnz_padded, dtype=np.float32)
    vals_lo[: csr.nnz] = (order_vals - np.asarray(csr.vals)[: csr.nnz]).astype(
        np.float32
    )
    x64 = rng.randn(50)
    x_hi, x_lo = df_split(x64)
    y = df_to_f64(*spmv_csr_df64(csr, x_hi, x_lo, jnp.asarray(vals_lo)))
    y_ref = dense64 @ x64
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [1, 4, 8])
def test_spmm_matches_dense(k):
    rng = np.random.RandomState(3)
    r, c, v = random_coo(rng, 60, 40, 400)
    coo = COOMatrix.from_numpy(r, c, v, shape=(60, 40), pad_to=64)
    csr = csr_encode(coo)
    tj = tjds_encode(coo)
    X = rng.randn(40, k).astype(np.float32)
    Y1 = np.asarray(spmm_csr(csr, jnp.asarray(X)))
    Y2 = np.asarray(spmm_tjds(tj, jnp.asarray(X)))
    Y_ref = coo.to_dense() @ X.astype(np.float64)
    np.testing.assert_allclose(Y1, Y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Y2, Y_ref, rtol=1e-4, atol=1e-5)


def test_spmm_consistent_with_spmv():
    coo = _load("curtis54.mtx")
    csr = csr_encode(coo)
    rng = np.random.RandomState(4)
    X = rng.randn(coo.shape[1], 3).astype(np.float32)
    Y = np.asarray(spmm_csr(csr, jnp.asarray(X)))
    for j in range(3):
        yj = np.asarray(spmv_csr(csr, jnp.asarray(X[:, j])))
        np.testing.assert_allclose(Y[:, j], yj, rtol=1e-6)
