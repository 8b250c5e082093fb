"""Seeded fuzz sweep of the SELL kernel surface.

Random shapes (tall/wide/tiny/empty-heavy), dtypes, env-flag rungs and
SpMV/SpMM both checked against the dense oracle — one parametrized
sweep that catches layout/padding regressions the targeted tests'
fixed shapes might miss. Fully deterministic (seeded per case).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.ops import spmv_pallas as sp

# (seed, nrows, ncols, nnz, k, value_dtype, env)
_CASES = [
    (0, 513, 129, 3000, 1, "f32", {}),
    (1, 129, 513, 3000, 4, "f32", {}),
    (2, 1000, 1000, 50, 3, "f32", {}),           # ultra-sparse
    (3, 64, 64, 4000, 2, "f32", {}),             # dense-ish, duplicates
    (4, 2048, 100, 6000, 5, "bf16", {}),         # tall, bf16
    (5, 100, 2048, 6000, 7, "f32", {"SMVP_SELL_REDUCE2": "1"}),
    (6, 777, 333, 2000, 9, "f32", {"SMVP_SELL_NOWINDOW": "1"}),
    (7, 333, 777, 2000, 2, "bf16", {"SMVP_SELL_LIDX32": "1"}),
    (8, 300, 300, 1, 3, "f32", {}),              # single entry
    (9, 555, 444, 2500, 17, "f32", {}),          # k > group
]


@pytest.mark.parametrize(
    "seed,n,m,nnz,k,vdt,env", _CASES,
    ids=[f"case{c[0]}" for c in _CASES],
)
def test_fuzz_sell_spmv_spmm(seed, n, m, nnz, k, vdt, env, monkeypatch):
    for key, val in env.items():
        monkeypatch.setenv(key, val)
    rng = np.random.RandomState(seed)
    r = rng.randint(0, n, nnz).astype(np.int32)
    c = rng.randint(0, m, nnz).astype(np.int32)
    v = rng.randn(nnz).astype(np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(n, m), pad_to=64)
    dense = np.zeros((n, m))
    np.add.at(dense, (r, c), v)
    value_dtype = jnp.bfloat16 if vdt == "bf16" else None
    op = sp.SellSpMV.from_coo(coo, value_dtype=value_dtype)

    if vdt == "bf16":
        import ml_dtypes

        dense = dense.astype(ml_dtypes.bfloat16).astype(np.float64)
        tol = 3e-2
        cast = ml_dtypes.bfloat16
    else:
        tol = 2e-5
        cast = np.float32

    x = rng.randn(m).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)), np.float64)
    y_ref = dense @ x.astype(cast).astype(np.float64)
    scale = max(np.abs(y_ref).max(), 1e-9)
    assert np.abs(y - y_ref).max() / scale < tol

    if k > 1:
        X = rng.randn(m, k).astype(np.float32)
        Y = np.asarray(op.matmat(jnp.asarray(X)), np.float64)
        Y_ref = dense @ X.astype(cast).astype(np.float64)
        scale = max(np.abs(Y_ref).max(), 1e-9)
        assert np.abs(Y - Y_ref).max() / scale < tol
