"""RCM reordering utilities: bandwidth reduction, bit-exact symmetric
permutes, and solver equivalence under P·A·Pᵀ."""

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.utils.reorder import (
    bandwidth,
    permute_symmetric,
    rcm_permutation,
)

from conftest import poisson2d


def _coo(a, pad_to=128):
    r, c = np.nonzero(a)
    return COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32),
        a[r, c].astype(np.float32), shape=a.shape, pad_to=pad_to,
    )


def test_rcm_reduces_bandwidth():
    """A randomly permuted banded matrix recovers a small bandwidth."""
    rng = np.random.RandomState(0)
    n = 200
    base = poisson2d(14)  # n=196, bandwidth 14
    a = np.zeros((n, n))
    a[:196, :196] = base
    a[196:, 196:] = np.eye(4)
    shuffle = rng.permutation(n)
    a = a[np.ix_(shuffle, shuffle)]  # scrambled: bandwidth ~ n
    coo = _coo(a)
    assert bandwidth(coo) > 100
    perm = rcm_permutation(coo)
    re = permute_symmetric(coo, perm)
    assert bandwidth(re) <= 30  # near the original band


def test_permute_is_exact_similarity():
    """P·A·Pᵀ holds entrywise and preserves the spectrum/solution."""
    rng = np.random.RandomState(1)
    a = poisson2d(8)
    coo = _coo(a)
    perm = rcm_permutation(coo)
    re = permute_symmetric(coo, perm)
    dense_re = re.to_dense()
    np.testing.assert_array_equal(dense_re, a[np.ix_(perm, perm)])

    # solving the permuted system and un-permuting gives the same x
    from smvp_toolkit_tpu.models import conjugate_gradient

    b = rng.randn(a.shape[0]).astype(np.float32)
    x_ref, _ = conjugate_gradient(csr_encode(coo), jnp.asarray(b),
                                  num_iters=200, tol=1e-8)
    x_p, _ = conjugate_gradient(csr_encode(re), jnp.asarray(b[perm]),
                                num_iters=200, tol=1e-8)
    x_back = np.empty_like(np.asarray(x_p))
    x_back[perm] = np.asarray(x_p)[: a.shape[0]]
    np.testing.assert_allclose(x_back, np.asarray(x_ref), rtol=1e-3,
                               atol=1e-4)


def test_permute_validation():
    rect = COOMatrix.from_numpy(
        np.array([0], np.int32), np.array([1], np.int32),
        np.array([1.0], np.float32), shape=(2, 3), pad_to=8,
    )
    with pytest.raises(ValueError, match="square"):
        rcm_permutation(rect)
    sq = _coo(poisson2d(4), pad_to=32)
    with pytest.raises(ValueError, match="permutation"):
        permute_symmetric(sq, np.zeros(16, np.int64))
