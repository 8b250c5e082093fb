"""Streamed-y (v7 flush-behind) SELL kernel tests.

The v6 kernel keeps the full (NS, 128) y block VMEM-resident — a wall
at ~3M rows. The v7 plan groups sublanes by y block and the kernel
flushes completed (NSB, 128) blocks behind the sweep via a
prefetch-driven output index map (ops/spmv_pallas.py). These tests run
the Pallas interpreter with small y blocks so multi-block streaming is
exercised without multi-million-row fixtures.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.ops.sell_plan import (
    LANES,
    build_sell_plan,
    build_streamed_sell_plan,
)
from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

BLOCK_ROWS = 2048  # minimum legal (16 slices * 128 lanes) — max blocks


def _random_coo(nrows, ncols, nnz, seed=0, banded=None):
    rng = np.random.RandomState(seed)
    r = rng.randint(0, nrows, size=nnz).astype(np.int64)
    if banded is not None:
        c = np.clip(r + rng.randint(-banded, banded + 1, size=nnz), 0,
                    ncols - 1)
    else:
        c = rng.randint(0, ncols, size=nnz).astype(np.int64)
    v = rng.randn(nnz)
    key = r * ncols + c
    _, idx = np.unique(key, return_index=True)
    return r[idx], c[idx], v[idx]


def _oracle(r, c, v, x, nrows):
    y = np.zeros(nrows)
    np.add.at(y, r, v * x[c].astype(np.float64))
    return y


@pytest.mark.parametrize("banded", [64, None])
def test_streamed_matches_oracle_and_flat(banded):
    nrows, ncols, nnz = 5000, 700, 9000
    r, c, v = _random_coo(nrows, ncols, nnz, seed=1, banded=banded)
    plan_s = build_streamed_sell_plan(
        r, c, v, (nrows, ncols), chunk=256, y_block_rows=BLOCK_ROWS
    )
    # invariants: multiple blocks, monotone block ids, local windows fit
    assert plan_s.y_block_slices == BLOCK_ROWS // LANES
    assert plan_s.y_block_id.max() == (nrows - 1) // BLOCK_ROWS
    assert (np.diff(plan_s.y_block_id) >= 0).all()
    sb, nsw = plan_s.reduce_window()
    assert (sb + nsw <= plan_s.y_block_slices).all()
    assert (plan_s.slice_of < plan_s.y_block_slices).all()

    x = np.random.RandomState(2).randn(ncols).astype(np.float32)
    op_s = SellSpMV(plan_s, interpret=True)
    y_s = np.asarray(op_s(jnp.asarray(x))).astype(np.float64)

    y_ref = _oracle(r, c, v, x, nrows)
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y_s - y_ref).max() / scale < 1e-5

    # flat (resident-y) plan must agree bit-for-bit in structure-free
    # terms (same products, same f32 accumulation order per row block)
    plan_f = build_sell_plan(r, c, v, (nrows, ncols), chunk=256)
    y_f = np.asarray(SellSpMV(plan_f, interpret=True)(jnp.asarray(x)))
    assert np.abs(y_s - y_f.astype(np.float64)).max() / scale < 1e-6


def test_streamed_empty_middle_block_zeroed():
    # rows only in blocks 0 and 2: block 1 must come back as zeros (its
    # sub-plan is a dead chunk that zero-initializes the block).
    nrows, ncols = 3 * BLOCK_ROWS, 500
    r = np.array([5, 17, 2 * BLOCK_ROWS + 9], dtype=np.int64)
    c = np.array([3, 499, 123], dtype=np.int64)
    v = np.array([1.5, -2.0, 4.25])
    plan = build_streamed_sell_plan(
        r, c, v, (nrows, ncols), chunk=256, y_block_rows=BLOCK_ROWS
    )
    assert set(np.asarray(plan.y_block_id)) == {0, 1, 2}
    x = np.arange(1.0, ncols + 1, dtype=np.float32)
    y = np.asarray(SellSpMV(plan, interpret=True)(jnp.asarray(x)))
    y_ref = _oracle(r, c, v, x, nrows)
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-6)
    assert (y[BLOCK_ROWS: 2 * BLOCK_ROWS] == 0).all()


def test_streamed_bf16_and_nowindow_modes():
    nrows, ncols = 4500, 600
    r, c, v = _random_coo(nrows, ncols, 6000, seed=3, banded=96)
    plan = build_streamed_sell_plan(
        r, c, v, (nrows, ncols), chunk=256, y_block_rows=BLOCK_ROWS
    )
    x = np.random.RandomState(4).randn(ncols).astype(np.float32)

    import ml_dtypes

    y_bref = _oracle(
        r, c,
        v.astype(ml_dtypes.bfloat16).astype(np.float64),
        x.astype(ml_dtypes.bfloat16).astype(np.float32), nrows,
    )
    op = SellSpMV(plan, interpret=True, value_dtype=jnp.bfloat16)
    y_b = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    scale = np.abs(y_bref).max() + 1e-30
    assert np.abs(y_b - y_bref).max() / scale < 1e-5

    # NOWINDOW on a streamed plan = full LOCAL-block reduce, y streams
    os.environ["SMVP_SELL_NOWINDOW"] = "1"
    try:
        y_nw = np.asarray(SellSpMV(plan, interpret=True)(jnp.asarray(x)))
    finally:
        os.environ.pop("SMVP_SELL_NOWINDOW", None)
    y_ref = _oracle(r, c, v, x, nrows)
    assert np.abs(y_nw - y_ref).max() / (np.abs(y_ref).max() + 1e-30) < 1e-5


def test_auto_plan_threshold():
    from smvp_toolkit_tpu.ops import spmv_pallas as sp

    r = np.array([0, 10], dtype=np.int64)
    c = np.array([1, 2], dtype=np.int64)
    v = np.array([1.0, 2.0])
    small = sp._auto_plan(r, c, v, (1000, 128))
    assert small.y_block_slices == 0
    old = sp._RESIDENT_Y_LIMIT
    sp._RESIDENT_Y_LIMIT = 1024  # force the streamed path
    try:
        big = sp._auto_plan(r, c, v, (3000, 128))
    finally:
        sp._RESIDENT_Y_LIMIT = old
    assert big.y_block_slices > 0


def test_streamed_rectangular_wide():
    # ncols >> nrows per block: x windows + streamed y together
    nrows, ncols = 2 * BLOCK_ROWS + 100, 3000
    r, c, v = _random_coo(nrows, ncols, 5000, seed=5)
    plan = build_streamed_sell_plan(
        r, c, v, (nrows, ncols), chunk=256, y_block_rows=BLOCK_ROWS
    )
    x = np.random.RandomState(6).randn(ncols).astype(np.float32)
    y = np.asarray(SellSpMV(plan, interpret=True)(jnp.asarray(x)))
    y_ref = _oracle(r, c, v, x, nrows)
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < 1e-5


def test_streamed_plan_checkpoint_roundtrip(tmp_path):
    from smvp_toolkit_tpu.utils.checkpoint import load_plan, save_plan

    r, c, v = _random_coo(5000, 700, 4000, seed=7, banded=64)
    plan = build_streamed_sell_plan(
        r, c, v, (5000, 700), chunk=256, y_block_rows=BLOCK_ROWS
    )
    p = tmp_path / "plan.npz"
    save_plan(p, plan)
    back = load_plan(p)
    assert back.y_block_slices == plan.y_block_slices
    np.testing.assert_array_equal(back.y_block_id, plan.y_block_id)
    x = np.random.RandomState(8).randn(700).astype(np.float32)
    y_a = np.asarray(SellSpMV(plan, interpret=True)(jnp.asarray(x)))
    y_b = np.asarray(SellSpMV(back, interpret=True)(jnp.asarray(x)))
    np.testing.assert_array_equal(y_a, y_b)
