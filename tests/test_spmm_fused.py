"""Fused SELL SpMM (``SellSpMV.matmat``): the k-wide kernel launch.

The fused path widens x/y to k*128 lanes so the packed value/index
planes are read once per chunk for ALL k columns (the vmap fallback
replays them per column). These tests pin the lane layout, the group
split, every kernel mode (bf16 / reduce2 / NOWINDOW / prefetch), and
the documented fallbacks (streamed-y plans, compat, SMVP_SELL_SPMM=0).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.ops import spmv_pallas as sp


def _random_case(rng, n, m, nnz):
    r = rng.randint(0, n, nnz).astype(np.int32)
    c = rng.randint(0, m, nnz).astype(np.int32)
    v = rng.randn(nnz).astype(np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(n, m), pad_to=64)
    dense = np.zeros((n, m))
    np.add.at(dense, (r, c), v)
    return coo, dense


def _check(op, dense, X, tol):
    Y = np.asarray(op.matmat(jnp.asarray(X)), np.float64)
    Yref = dense @ X.astype(np.float64)
    scale = max(np.abs(Yref).max(), 1e-9)
    assert np.abs(Y - Yref).max() / scale < tol


def test_spmm_fused_shapes_and_groups():
    """Square/rectangular, k below/at/above the group size (17 splits
    into launches of 8 + 8 + 1)."""
    rng = np.random.RandomState(0)
    for (n, m, nnz, k) in [
        (300, 250, 2000, 4),
        (300, 250, 2000, 8),
        (129, 257, 900, 17),
        (64, 64, 200, 2),
    ]:
        coo, dense = _random_case(rng, n, m, nnz)
        op = sp.SellSpMV.from_coo(coo)
        _check(op, dense, rng.randn(m, k).astype(np.float32), 1e-5)


def test_spmm_fused_k1_column():
    """A (ncols, 1) block routes through plain SpMV unchanged."""
    rng = np.random.RandomState(2)
    coo, dense = _random_case(rng, 100, 80, 500)
    op = sp.SellSpMV.from_coo(coo)
    X = rng.randn(80, 1).astype(np.float32)
    _check(op, dense, X, 1e-5)


def test_spmm_fused_value_modes(monkeypatch):
    """bf16 value mode, the reduce2 ladder, and the NOWINDOW escape
    hatch all produce the fused result within their documented error."""
    rng = np.random.RandomState(1)
    coo, dense = _random_case(rng, 400, 300, 3000)
    X = rng.randn(300, 6).astype(np.float32)
    # bf16 storage: inputs round to bf16 (~3e-3 relative)
    _check(
        sp.SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16), dense, X,
        3e-2,
    )
    monkeypatch.setenv("SMVP_SELL_REDUCE2", "1")
    _check(sp.SellSpMV.from_coo(coo), dense, X, 1e-4)
    monkeypatch.delenv("SMVP_SELL_REDUCE2")
    monkeypatch.setenv("SMVP_SELL_NOWINDOW", "1")
    _check(sp.SellSpMV.from_coo(coo), dense, X, 1e-5)


def test_spmm_fused_prefetch_x(monkeypatch):
    """Non-resident X (k multiplies the VMEM footprint) takes the
    scalar-prefetch window path."""
    rng = np.random.RandomState(3)
    coo, dense = _random_case(rng, 400, 300, 3000)
    monkeypatch.setattr(sp, "_RESIDENT_X_LIMIT", 1024)
    _check(
        sp.SellSpMV.from_coo(coo), dense,
        rng.randn(300, 5).astype(np.float32), 1e-5,
    )


def test_spmm_fallbacks(monkeypatch):
    """Streamed-y plans, compat mode, and SMVP_SELL_SPMM=0 fall back to
    vmap-over-columns with identical results."""
    rng = np.random.RandomState(4)
    coo, dense = _random_case(rng, 400, 300, 3000)
    X = rng.randn(300, 6).astype(np.float32)

    monkeypatch.setattr(sp, "_RESIDENT_Y_LIMIT", 1024)
    op = sp.SellSpMV.from_coo(coo)
    assert op.plan.y_block_slices > 0  # really a streamed plan
    _check(op, dense, X, 1e-5)
    monkeypatch.undo()

    monkeypatch.setenv("SMVP_SELL_COMPAT", "1")
    _check(sp.SellSpMV.from_coo(coo), dense, X, 1e-5)
    monkeypatch.delenv("SMVP_SELL_COMPAT")

    monkeypatch.setenv("SMVP_SELL_SPMM", "0")
    _check(sp.SellSpMV.from_coo(coo), dense, X, 1e-5)


def test_spmm_empty_rows_and_cols():
    """Rows with no entries produce exact zeros in every column."""
    rng = np.random.RandomState(5)
    n, m = 200, 150
    r = rng.randint(0, 50, 600).astype(np.int32)  # rows 50.. empty
    c = rng.randint(0, m, 600).astype(np.int32)
    v = rng.randn(600).astype(np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(n, m), pad_to=64)
    dense = np.zeros((n, m))
    np.add.at(dense, (r, c), v)
    op = sp.SellSpMV.from_coo(coo)
    X = rng.randn(m, 3).astype(np.float32)
    Y = np.asarray(op.matmat(jnp.asarray(X)))
    assert np.all(Y[50:] == 0.0)
    _check(op, dense, X, 1e-5)


def test_spmm_call_rejects_unsupported_k():
    """The launch layer refuses k>1 on kernel variants without a fused
    SpMM (the operator routes those to vmap instead)."""
    rng = np.random.RandomState(6)
    coo, _ = _random_case(rng, 100, 80, 400)
    op = sp.SellSpMV.from_coo(coo)
    with pytest.raises(ValueError, match="resident/prefetch"):
        sp._sell_spmv_call(
            jnp.zeros((coo.shape[1] // 128 + 1, 2 * 128), jnp.float32),
            op.vals, op.lidx, op.rel_tile, op.slice_of, op.bases,
            n_chunks=op.plan.n_chunks, chunk=op.plan.chunk,
            ns=op.plan.n_slices, nsw=op.nsw, wt=op.plan.window_tiles,
            interpret=True, resident=True, onehot_dense=True, k=2,
        )


def test_spmm_fused_drives_gcn_and_block_cg():
    """The fused matmat drops into the injectable ``spmm`` seams: GCN
    forward matches the XLA-SpMM forward, and block CG converges on an
    SPD system with one fused SpMM per iteration."""
    import jax

    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models import block_cg
    from smvp_toolkit_tpu.models.graph import gcn_forward, gcn_init
    from smvp_toolkit_tpu.ops.spmv_xla import spmm_csr

    rng = np.random.RandomState(7)
    n = 120
    a = np.zeros((n, n))
    for _ in range(4 * n):
        i, j = rng.randint(0, n, 2)
        w = abs(rng.rand())
        a[i, j] += w
        a[j, i] += w
    a += np.diag(np.abs(a).sum(axis=1) + 1.0)
    r, c = np.nonzero(a)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), a[r, c].astype(np.float32),
        shape=(n, n), pad_to=64,
    )
    csr = csr_encode(coo)
    op = sp.sell_op_csr(csr)
    fused = lambda m, X: op.matmat(X)  # noqa: E731

    h = rng.randn(n, 5).astype(np.float32)
    params = gcn_init(jax.random.PRNGKey(0), [5, 8, 3])
    out_fused = np.asarray(gcn_forward(csr, params, jnp.asarray(h),
                                       spmm=fused))
    out_xla = np.asarray(gcn_forward(csr, params, jnp.asarray(h),
                                     spmm=spmm_csr))
    np.testing.assert_allclose(out_fused, out_xla, rtol=1e-4, atol=1e-4)

    B = rng.randn(n, 4).astype(np.float32)
    X, res = block_cg(csr, jnp.asarray(B), num_iters=60, spmm=fused)
    rel = np.linalg.norm(a @ np.asarray(X, np.float64) - B, axis=0)
    rel /= np.linalg.norm(B, axis=0)
    assert rel.max() < 1e-4


def test_spmm_differentiable_mat_gcn_training():
    """``differentiable_mat`` trains a GCN end-to-end on the fused
    path: gradients match the XLA-spmm training step."""
    import jax

    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models.graph import gcn_init, gcn_train_step
    from smvp_toolkit_tpu.ops.spmv_xla import spmm_csr

    rng = np.random.RandomState(8)
    n = 90
    r = rng.randint(0, n, 400).astype(np.int32)
    c = rng.randint(0, n, 400).astype(np.int32)
    v = np.abs(rng.rand(400)).astype(np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(n, n), pad_to=64)
    csr = csr_encode(coo)
    op = sp.sell_op_csr(csr)
    f = op.differentiable_mat()
    fused = lambda m, X: f(X)  # noqa: E731

    h = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, n))
    mask = jnp.asarray((rng.rand(n) > 0.5))
    params = gcn_init(jax.random.PRNGKey(1), [4, 6, 3])
    p_fused, loss_fused = gcn_train_step(csr, params, h, labels, mask,
                                         spmm=fused)
    p_xla, loss_xla = gcn_train_step(csr, params, h, labels, mask,
                                     spmm=spmm_csr)
    np.testing.assert_allclose(float(loss_fused), float(loss_xla),
                               rtol=1e-5)
    for (wf, bf), (wx, bx) in zip(p_fused, p_xla):
        np.testing.assert_allclose(np.asarray(wf), np.asarray(wx),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bf), np.asarray(bx),
                                   rtol=1e-4, atol=1e-5)


def test_spmm_traffic_accounting():
    """traffic_bytes(k): planes charged once, x/y scaled by k — the
    fused launch must always beat k independent SpMV launches."""
    rng = np.random.RandomState(9)
    coo, _ = _random_case(rng, 500, 400, 4000)
    plan = sp.SellSpMV.from_coo(coo).plan
    one = plan.traffic_bytes()
    for k in (2, 8, 16):
        assert plan.traffic_bytes(k=k) < k * one
    # exact decomposition: planes once + k * (x + y)
    xy = plan.traffic_bytes(k=2) - plan.traffic_bytes(k=1)
    assert plan.traffic_bytes(k=5) == plan.traffic_bytes(k=1) + 4 * xy


def test_spmm_edge_training_gradients():
    """differentiable_edges_mat: forward A(v)·X plus BOTH cotangents
    (d/dv via the k-wide vals-grad kernel, d/dX via the transpose fused
    matmat) match the dense oracle; vjp_vals_mat splits k>group into
    multiple accumulated launches."""
    import jax

    rng = np.random.RandomState(11)
    n, m, k = 200, 160, 6
    r = rng.randint(0, n, 1200).astype(np.int32)
    c = rng.randint(0, m, 1200).astype(np.int32)
    v = rng.randn(1200).astype(np.float32)
    _, keep = np.unique(np.stack([r, c]), axis=1, return_index=True)
    r, c, v = r[keep], c[keep], v[keep]  # dedupe: 1 param per edge
    coo = COOMatrix.from_numpy(r, c, v, shape=(n, m), pad_to=64)
    op = sp.SellSpMV.from_coo(coo)
    f = op.differentiable_edges_mat()

    X = jnp.asarray(rng.randn(m, k).astype(np.float32))
    W = jnp.asarray(rng.randn(n, k).astype(np.float32))
    vj = jnp.asarray(v)
    gv, gX = jax.grad(
        lambda vv, XX: jnp.sum(W * f(vv, XX)), argnums=(0, 1)
    )(vj, X)
    Wn, Xn = np.asarray(W, np.float64), np.asarray(X, np.float64)
    dense = np.zeros((n, m))
    dense[r, c] = v
    gv_ref = (Wn[r] * Xn[c]).sum(axis=1)
    gX_ref = dense.T @ Wn
    np.testing.assert_allclose(np.asarray(gv), gv_ref, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gX), gX_ref, rtol=1e-4,
                               atol=1e-5)

    # k=17 exercises the multi-launch accumulation path
    X17 = jnp.asarray(rng.randn(m, 17).astype(np.float32))
    W17 = jnp.asarray(rng.randn(n, 17).astype(np.float32))
    gvm = np.asarray(op.vjp_vals_mat(X17, W17)).reshape(-1)[op.slot_map()]
    ref = (np.asarray(W17, np.float64)[r]
           * np.asarray(X17, np.float64)[c]).sum(axis=1)
    np.testing.assert_allclose(gvm, ref, rtol=1e-4, atol=1e-5)


def test_spmm_relsl_layout_and_gridfused_bench(monkeypatch):
    """The fused SpMM on the relsl layout (the default) is bit-exact vs
    the split-plane launch, and bench_loop_mat's final Y matches one
    matmat call."""
    import os as _os
    import sys

    sys.path.insert(0, _os.path.dirname(__file__))
    import numpy as np

    import jax.numpy as jnp

    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo = read_mtx("/root/reference/sample-data/memplus.mtx")
    rng = np.random.RandomState(31)
    X = jnp.asarray(rng.randn(coo.shape[1], 8).astype(np.float32))
    # Cross-layout BIT-exact comparison: pin the unsplit chain (the
    # split-plane launch has no split variant; split4 is a different —
    # equally valid — summation order) and drop stale cached traces.
    monkeypatch.setenv("SMVP_SELL_SPLIT_CHAIN", "1")
    from smvp_toolkit_tpu.ops.spmv_pallas import _sell_spmv_call

    _sell_spmv_call.clear_cache()
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    base = np.asarray(op.matmat(X))
    monkeypatch.setenv("SMVP_SELL_RELSL", "0")
    assert np.array_equal(np.asarray(op.matmat(X)), base)
    monkeypatch.delenv("SMVP_SELL_RELSL")
    assert np.array_equal(np.asarray(op.bench_loop_mat(X, 2)), base)
