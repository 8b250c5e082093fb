"""Differential testing of MatrixMarket I/O against scipy.io.

scipy's mmread/mmwrite is an independent, widely-trusted implementation
of the same format — a much stronger oracle than hand-written
expectations. Both directions are fuzzed:

* scipy-written files must load identically here (reader differential),
* files written here must load identically in scipy (writer
  differential),

across field types (real/integer/pattern/complex), symmetries
(general/symmetric/skew-symmetric/hermitian) and both the Python and
native C++ parsers.
"""

import io
import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")
import scipy.sparse

from smvp_toolkit_tpu.io.mtx import read_mtx, write_mtx


def _random_sparse(rng, n=19, m=17, density=0.2, field="real",
                   symmetry="general"):
    """Dense numpy matrix with the requested structure."""
    a = (rng.rand(n, m if symmetry == "general" else n) < density).astype(
        np.float64
    )
    vals = rng.randn(*a.shape)
    if field == "integer":
        vals = np.round(vals * 10)
    if field == "complex":
        vals = vals + 1j * rng.randn(*a.shape)
    if field == "pattern":
        vals = np.ones_like(a)
    a = a * vals
    if symmetry == "symmetric":
        a = np.tril(a) + np.tril(a, -1).T
    elif symmetry == "skew-symmetric":
        a = np.tril(a, -1) - np.tril(a, -1).T
    elif symmetry == "hermitian":
        a = np.tril(a) + np.tril(a, -1).conj().T
        np.fill_diagonal(a, a.diagonal().real)
    return a


def _scipy_bytes(a, field, symmetry):
    """MatrixMarket text for a dense matrix, written by scipy."""
    buf = io.BytesIO()
    sp = scipy.sparse.coo_matrix(a)
    kw = {}
    if field == "pattern":
        kw["field"] = "pattern"
    elif field == "integer":
        kw["field"] = "integer"
    scipy_io.mmwrite(buf, sp, symmetry=symmetry, **kw)
    return buf.getvalue()


CASES = [
    ("real", "general"),
    ("real", "symmetric"),
    ("real", "skew-symmetric"),
    ("integer", "general"),
    ("integer", "symmetric"),
    ("pattern", "general"),
    ("pattern", "symmetric"),
    ("complex", "general"),
    ("complex", "hermitian"),
]


@pytest.mark.parametrize("field,symmetry", CASES)
@pytest.mark.parametrize("seed", [0, 1])
def test_reader_matches_scipy(field, symmetry, seed, tmp_path):
    rng = np.random.RandomState(seed)
    a = _random_sparse(rng, field=field, symmetry=symmetry)
    if field == "pattern" and symmetry == "symmetric":
        a = (np.abs(a) > 0).astype(np.float64)  # pattern stores structure
    text = _scipy_bytes(a, field, symmetry)
    path = tmp_path / "m.mtx"
    path.write_bytes(text)

    a_scipy = scipy_io.mmread(str(path))
    if scipy.sparse.issparse(a_scipy):
        a_scipy = a_scipy.toarray()

    dtype = np.complex128 if field == "complex" else np.float64
    for use_native in (False, True):
        coo = read_mtx(str(path), expand_symmetry=True,
                       use_native=use_native)
        np.testing.assert_allclose(
            coo.to_dense(dtype=dtype), a_scipy, rtol=1e-6, atol=1e-9,
            err_msg=f"{field}/{symmetry} native={use_native}",
        )


@pytest.mark.parametrize("field,symmetry", [
    ("real", "general"),
    ("integer", "general"),
    ("pattern", "general"),
    ("complex", "general"),
])
def test_writer_matches_scipy(field, symmetry, tmp_path):
    """Files we write must round-trip through scipy identically."""
    rng = np.random.RandomState(3)
    a = _random_sparse(rng, field=field, symmetry=symmetry)
    r, c = np.nonzero(a)
    v = a[r, c]
    path = str(tmp_path / "w.mtx")
    write_mtx(
        path, r, c, None if field == "pattern" else v, a.shape, field=field
    )
    back = scipy_io.mmread(path)
    if scipy.sparse.issparse(back):
        back = back.toarray()
    if field == "pattern":
        a = (np.abs(a) > 0).astype(np.float64)
    np.testing.assert_allclose(back, a, rtol=1e-5, atol=1e-6)
