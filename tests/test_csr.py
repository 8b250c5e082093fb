"""CSR codec tests: encode structure, decode bit-exactness, property tests.

Oracle strategy per SURVEY.md §4: every sample matrix is checked against a
scipy/numpy dense oracle; random patterns cover empty rows/columns and
single-nnz first rows (the reference's §B6 bug class).
"""

import os

import numpy as np
import pytest

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode, csr_decode
from smvp_toolkit_tpu.io.mtx import read_mtx

from conftest import SAMPLE_DIR, SAMPLES_ALL, random_coo

try:
    import scipy.sparse as sp

    HAVE_SCIPY = True
except ImportError:  # pragma: no cover
    HAVE_SCIPY = False


def _load(name, pad=128):
    coo = read_mtx(os.path.join(SAMPLE_DIR, name), use_native=False)
    return coo.pad(pad)


@pytest.mark.parametrize("name", SAMPLES_ALL)
def test_encode_matches_scipy(name):
    if not HAVE_SCIPY:
        pytest.skip("scipy not available")
    coo = _load(name)
    csr = csr_encode(coo)
    r, c, v = coo.to_numpy()
    ref = sp.coo_matrix((v, (r, c)), shape=coo.shape).tocsr()
    # scipy sums duplicates; samples have none, so structure matches 1:1.
    np.testing.assert_array_equal(np.asarray(csr.row_ptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(csr.col_ind)[: csr.nnz], ref.indices)
    np.testing.assert_allclose(np.asarray(csr.vals)[: csr.nnz], ref.data, rtol=1e-6)


@pytest.mark.parametrize("name", SAMPLES_ALL)
def test_decode_bit_exact(name):
    coo = _load(name)
    csr = csr_encode(coo)
    dec = csr_decode(csr)
    canon = coo.canonical_order()
    r, c, v = dec.to_numpy()
    R, C, V = canon.to_numpy()
    np.testing.assert_array_equal(r, R)
    np.testing.assert_array_equal(c, C)
    # Bit-exact at stored precision: identical f32 bit patterns.
    np.testing.assert_array_equal(
        np.asarray(v).view(np.uint32), np.asarray(V).view(np.uint32)
    )


def test_row_ptr_structure():
    coo = _load("ibm32.mtx")
    csr = csr_encode(coo)
    rp = np.asarray(csr.row_ptr)
    assert rp[0] == 0
    assert rp[-1] == coo.nnz
    assert (np.diff(rp) >= 0).all()


def test_empty_rows_handled():
    # Fixes-by-construction check for reference bug SURVEY.md §B6:
    # empty rows and a single-nnz first row.
    r = np.array([0, 2, 2, 5], dtype=np.int32)
    c = np.array([1, 0, 3, 2], dtype=np.int32)
    v = np.array([1.0, 2.0, 3.0, 4.0])
    coo = COOMatrix.from_numpy(r, c, v, shape=(7, 4), pad_to=8)
    csr = csr_encode(coo)
    rp = np.asarray(csr.row_ptr)
    np.testing.assert_array_equal(rp, [0, 1, 1, 3, 3, 3, 4, 4])
    dense = coo.to_dense()
    x = np.arange(4, dtype=np.float32)
    from smvp_toolkit_tpu.ops import spmv_csr

    y = np.asarray(spmv_csr(csr, np.asarray(x, dtype=np.float32)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-6)


def test_unsorted_input_sorted_by_encoder():
    rng = np.random.RandomState(3)
    r, c, v = random_coo(rng, 20, 30, 100)
    perm = rng.permutation(len(r))
    coo = COOMatrix.from_numpy(r[perm], c[perm], v[perm], shape=(20, 30), pad_to=128)
    csr = csr_encode(coo)
    cols = np.asarray(csr.col_ind)[: csr.nnz]
    rows = np.asarray(csr.row_ids)[: csr.nnz]
    # Row-major sorted
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(order, np.arange(len(order)))


@pytest.mark.parametrize("seed", range(5))
def test_property_random_patterns(seed):
    rng = np.random.RandomState(seed)
    nrows = rng.randint(1, 60)
    ncols = rng.randint(1, 60)
    nnz = rng.randint(1, max(2, nrows * ncols // 2))
    r, c, v = random_coo(rng, nrows, ncols, nnz)
    coo = COOMatrix.from_numpy(r, c, v, shape=(nrows, ncols), pad_to=64)
    csr = csr_encode(coo)
    # Decode round trip.
    dec = csr_decode(csr).to_numpy()
    canon = coo.canonical_order().to_numpy()
    for a, b in zip(dec, canon):
        np.testing.assert_array_equal(a, b)
    # row_ptr totals
    assert int(np.asarray(csr.row_ptr)[-1]) == coo.nnz


def test_duplicates_preserved():
    # MatrixMarket files shouldn't have duplicates, but the codec must not
    # silently merge them (decode bit-exactness is entry-level).
    r = np.array([1, 1, 1], dtype=np.int32)
    c = np.array([2, 2, 0], dtype=np.int32)
    v = np.array([1.0, 2.0, 3.0])
    coo = COOMatrix.from_numpy(r, c, v, shape=(3, 3), pad_to=8)
    csr = csr_encode(coo)
    assert csr.nnz == 3
    dec = csr_decode(csr)
    assert dec.to_numpy()[2].sum() == 6.0
    dense = coo.to_dense()
    assert dense[1, 2] == 3.0  # duplicates summed in the oracle


def test_footprint_accounting():
    coo = _load("ibm32.mtx")
    csr = csr_encode(coo)
    # row_ptr (33*4) + nnz*(4+4) bytes
    assert csr.footprint_bytes() == 33 * 4 + 126 * 8
