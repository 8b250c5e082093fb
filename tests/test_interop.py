"""scipy.sparse interop bridge (COOMatrix.from_scipy / to_scipy)."""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.ops.spmv_xla import spmv_csr


def _random_scipy(m=37, n=23, density=0.15, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    mat = scipy_sparse.random(
        m, n, density=density, random_state=rng, dtype=np.float64
    )
    return mat.astype(dtype)


@pytest.mark.parametrize("fmt", ["coo", "csr", "csc"])
def test_round_trip_dense_equal(fmt):
    sp = _random_scipy()
    sp_fmt = getattr(sp, "to" + fmt)()
    coo = COOMatrix.from_scipy(sp_fmt)
    np.testing.assert_allclose(
        coo.to_dense(), sp.toarray(), rtol=1e-6, atol=1e-6
    )
    back = coo.to_scipy()
    np.testing.assert_allclose(
        back.toarray(), sp.toarray(), rtol=1e-6, atol=1e-6
    )


def test_spmv_matches_scipy():
    sp = _random_scipy(m=64, n=64, density=0.1, seed=1)
    coo = COOMatrix.from_scipy(sp, pad_to=128)
    csr = csr_encode(coo)
    x = np.random.RandomState(2).randn(64)
    y = np.asarray(spmv_csr(csr, jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(y, sp @ x, rtol=1e-5, atol=1e-5)


def test_duplicates_are_preserved_and_summed():
    r = np.array([0, 0, 1])
    c = np.array([1, 1, 2])
    v = np.array([2.0, 3.0, 4.0])
    sp = scipy_sparse.coo_matrix((v, (r, c)), shape=(3, 4))
    coo = COOMatrix.from_scipy(sp)
    assert coo.nnz == 3  # duplicates kept as entries
    assert coo.to_dense()[0, 1] == 5.0  # summed on materialization
    assert coo.to_scipy().toarray()[0, 1] == 5.0


def test_complex_promotes():
    sp = _random_scipy(dtype=np.complex128)
    sp = sp + 1j * _random_scipy(seed=3, dtype=np.float64)
    coo = COOMatrix.from_scipy(sp.tocoo())
    assert coo.dtype == jnp.complex64
    np.testing.assert_allclose(
        coo.to_dense(dtype=np.complex128), sp.toarray(), rtol=1e-5, atol=1e-5
    )


def test_pad_to_respected():
    sp = _random_scipy()
    coo = COOMatrix.from_scipy(sp, pad_to=256)
    assert coo.nnz_padded % 256 == 0
    assert coo.nnz == sp.nnz


# ---------------------------------------------------------------------------
# torch interop
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("layout", ["coo", "csr", "dense"])
def test_torch_round_trip(layout):
    rng = np.random.RandomState(40)
    dense = rng.randn(21, 17) * (rng.rand(21, 17) < 0.2)
    t = torch.tensor(dense)
    if layout == "coo":
        t = t.to_sparse_coo()
    elif layout == "csr":
        t = t.to_sparse_csr()
    coo = COOMatrix.from_torch(t)
    np.testing.assert_allclose(coo.to_dense(), dense, rtol=1e-6, atol=1e-9)
    back = coo.to_torch().to_dense().numpy()
    np.testing.assert_allclose(back, dense, rtol=1e-6, atol=1e-9)


def test_torch_spmv_matches():
    rng = np.random.RandomState(41)
    dense = rng.randn(33, 33) * (rng.rand(33, 33) < 0.15)
    coo = COOMatrix.from_torch(torch.tensor(dense).to_sparse_coo(),
                               pad_to=64)
    csr = csr_encode(coo)
    x = rng.randn(33).astype(np.float32)
    y = np.asarray(spmv_csr(csr, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=1e-5)


def test_torch_duplicates_coalesced():
    idx = torch.tensor([[0, 0, 1], [1, 1, 2]])
    vals = torch.tensor([2.0, 3.0, 4.0])
    t = torch.sparse_coo_tensor(idx, vals, size=(3, 4))
    coo = COOMatrix.from_torch(t)
    assert coo.nnz == 2  # torch coalesce sums duplicates on entry
    assert coo.to_dense()[0, 1] == 5.0


def test_to_scipy_expands_symmetric_storage():
    """Stored-triangle typecodes must export the full matrix (scipy has
    no symmetry metadata)."""
    from smvp_toolkit_tpu.io.mtx import read_mtx
    import io as _io

    text = (
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 3\n1 1 2.0\n3 1 5.0\n2 2 3.0\n"
    )
    coo = read_mtx(_io.StringIO(text))
    dense = coo.to_scipy().toarray()
    expected = np.array([[2, 0, 5], [0, 3, 0], [5, 0, 0.0]])
    np.testing.assert_allclose(dense, expected)
    np.testing.assert_allclose(
        coo.to_torch().to_dense().numpy(), expected
    )


def test_to_scipy_torch_bf16_upcasts():
    import jax.numpy as jnp_

    sp = _random_scipy()
    coo = COOMatrix.from_scipy(sp, dtype=jnp_.bfloat16)
    out = coo.to_scipy()
    assert out.dtype == np.float32
    np.testing.assert_allclose(out.toarray(), sp.toarray(), rtol=1e-2,
                               atol=1e-2)
    t = coo.to_torch()
    np.testing.assert_allclose(t.to_dense().numpy(), sp.toarray(),
                               rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# jax.experimental.sparse (BCOO) bridge
# ---------------------------------------------------------------------------

def _bcoo():
    from jax.experimental import sparse as jsparse

    return jsparse


def test_bcoo_round_trip_dense_equal():
    jsparse = _bcoo()
    sp = _random_scipy(m=41, n=29, density=0.12, seed=3)
    b = jsparse.BCOO.fromdense(jnp.asarray(sp.toarray(), jnp.float32))
    coo = COOMatrix.from_bcoo(b)
    np.testing.assert_allclose(
        coo.to_dense(), sp.toarray(), rtol=1e-6, atol=1e-6
    )
    back = coo.to_bcoo()
    np.testing.assert_allclose(
        np.asarray(back.todense()), sp.toarray(), rtol=1e-6, atol=1e-6
    )


def test_bcoo_padding_slots_dropped():
    # BCOO marks padding with out-of-range indices; conversion must drop
    # those slots, not alias them onto real entries.
    jsparse = _bcoo()
    data = jnp.asarray([1.0, 2.0, 7.0], jnp.float32)
    indices = jnp.asarray([[0, 1], [2, 0], [4, 4]], jnp.int32)  # last OOB
    b = jsparse.BCOO((data, indices), shape=(4, 3))
    coo = COOMatrix.from_bcoo(b)
    assert coo.nnz == 2
    dense = np.zeros((4, 3))
    dense[0, 1], dense[2, 0] = 1.0, 2.0
    np.testing.assert_array_equal(coo.to_dense(), dense)


def test_bcoo_spmv_matches():
    jsparse = _bcoo()
    sp = _random_scipy(m=64, n=48, density=0.1, seed=4)
    b = jsparse.BCOO.fromdense(jnp.asarray(sp.toarray(), jnp.float32))
    coo = COOMatrix.from_bcoo(b, pad_to=128)
    csr = csr_encode(coo)
    x = np.random.RandomState(0).randn(48).astype(np.float32)
    y = np.asarray(spmv_csr(csr, jnp.asarray(x)))
    np.testing.assert_allclose(y, sp @ x, rtol=1e-4, atol=1e-4)


def test_bcoo_batch_or_dense_dims_rejected():
    jsparse = _bcoo()
    dense = jnp.zeros((2, 4, 4), jnp.float32).at[:, 0, 1].set(1.0)
    batched = jsparse.BCOO.fromdense(dense, n_batch=1)
    with pytest.raises(ValueError, match="n_batch"):
        COOMatrix.from_bcoo(batched)


def test_to_bcoo_expands_symmetric_and_keeps_bf16():
    from smvp_toolkit_tpu.io.mtx import MMTypeCode

    # lower triangle of a symmetric matrix, stored bf16
    r = np.array([0, 1, 2, 2], np.int32)
    c = np.array([0, 0, 1, 2], np.int32)
    v = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    tc = MMTypeCode(field="real", symmetry="symmetric")
    coo = COOMatrix.from_numpy(
        r, c, v, shape=(3, 3), typecode=tc, dtype=jnp.bfloat16
    )
    b = coo.to_bcoo()
    assert b.dtype == jnp.bfloat16
    dense = np.asarray(b.todense(), np.float32)
    expect = np.array(
        [[1, 2, 0], [2, 0, 3], [0, 3, 4]], np.float32
    )
    np.testing.assert_array_equal(dense, expect)
