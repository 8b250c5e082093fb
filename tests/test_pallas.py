"""Pallas SELL-T1 SpMV kernel tests (interpreter mode on CPU).

The kernel itself is exercised in the Pallas interpreter; numerical
parity with the dense oracle and the XLA kernels is the contract. The
compiled-mode path is exercised on real TPU by bench.py.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.formats.tjds import tjds_encode
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.ops.spmv_pallas import (
    SellSpMV,
    spmv_coo_pallas,
    spmv_csr_pallas,
    spmv_tjds_pallas,
)

from conftest import SAMPLE_DIR, SAMPLES_SMALL, random_coo


def _load(name):
    return read_mtx(os.path.join(SAMPLE_DIR, name), use_native=False)


@pytest.mark.parametrize("name", SAMPLES_SMALL)
def test_kernel_matches_dense_oracle(name):
    coo = _load(name)
    op = SellSpMV.from_coo(coo)
    rng = np.random.RandomState(0)
    x = rng.randn(coo.shape[1]).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    y_ref = coo.to_dense() @ x.astype(np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_plan_structure():
    coo = _load("curtis54.mtx")
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    # Every nonzero occupies exactly one live slot.
    assert (plan.vals != 0).sum() <= coo.nnz  # (zero-valued entries allowed)
    # Dense one-hot views are one-hot (at most a single 1).
    oht, seg = plan.oht_dense(), plan.seg_dense()
    assert oht.max() <= 1 and (oht.sum(axis=1) <= 1).all()
    assert seg.max() <= 1 and (seg.sum(axis=0) <= 1).all()
    # Live sublanes route to exactly one slice; window offsets in range.
    live = plan.slice_of.reshape(-1) >= 0
    assert live.sum() <= plan.n_sublanes
    rel = plan.rel_tile.reshape(-1)
    assert ((rel[live] >= 0) & (rel[live] < plan.window_tiles)).all()
    # Padded shapes.
    assert plan.n_sublanes % plan.chunk == 0
    assert plan.vals.shape == (plan.n_sublanes, 128)


def test_duplicate_entries_same_tile():
    # A row with several entries in one column tile needs dup sublanes.
    r = np.array([3, 3, 3, 3], dtype=np.int32)
    c = np.array([5, 17, 63, 100], dtype=np.int32)
    v = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(8, 128))
    op = SellSpMV.from_coo(coo)
    x = np.arange(128, dtype=np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    expected = 1 * 5 + 2 * 17 + 3 * 63 + 4 * 100
    assert y[3] == expected
    assert np.count_nonzero(y) == 1


def test_coo_duplicates_summed():
    # True duplicate (row, col) pairs must still sum.
    r = np.array([1, 1], dtype=np.int32)
    c = np.array([2, 2], dtype=np.int32)
    v = np.array([1.5, 2.5], dtype=np.float32)
    coo = COOMatrix.from_numpy(r, c, v, shape=(4, 4))
    op = SellSpMV.from_coo(coo)
    x = np.ones(4, dtype=np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    assert y[1] == 4.0


@pytest.mark.parametrize("seed", range(4))
def test_property_random(seed):
    rng = np.random.RandomState(400 + seed)
    nrows = rng.randint(1, 400)
    ncols = rng.randint(1, 400)
    nnz = rng.randint(1, max(2, min(nrows * ncols // 2, 2000)))
    r, c, v = random_coo(rng, nrows, ncols, nnz)
    coo = COOMatrix.from_numpy(r, c, v, shape=(nrows, ncols))
    op = SellSpMV.from_coo(coo)
    x = rng.randn(ncols).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    y_ref = coo.to_dense() @ x.astype(np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_format_wrappers_and_cache():
    coo = _load("pdp08-pg4.mtx").pad(32)
    csr = csr_encode(coo)
    tj = tjds_encode(coo)
    x = jnp.ones((coo.shape[1],), jnp.float32)
    y_csr = np.asarray(spmv_csr_pallas(csr, x))
    y_csr2 = np.asarray(spmv_csr_pallas(csr, 2 * x))  # cache hit path
    y_tj = np.asarray(spmv_tjds_pallas(tj, x))
    y_coo = np.asarray(spmv_coo_pallas(coo, x))
    y_ref = coo.to_dense() @ np.ones(coo.shape[1])
    np.testing.assert_allclose(y_csr, y_ref, rtol=1e-5)
    np.testing.assert_allclose(y_csr2, 2 * y_ref, rtol=1e-5)
    np.testing.assert_allclose(y_tj, y_ref, rtol=1e-5)
    np.testing.assert_allclose(y_coo, y_ref, rtol=1e-5)


def test_multi_chunk_accumulation():
    # Force several grid steps with a small chunk size.
    rng = np.random.RandomState(7)
    r, c, v = random_coo(rng, 300, 300, 3000)
    plan = build_sell_plan(r, c, v, (300, 300), chunk=8)
    assert plan.n_chunks > 1
    op = SellSpMV(plan)
    x = rng.randn(300).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    coo = COOMatrix.from_numpy(r, c, v, shape=(300, 300))
    y_ref = coo.to_dense() @ x.astype(np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_empty_matrix():
    coo = COOMatrix.from_numpy(
        np.zeros(0, np.int32), np.zeros(0, np.int32),
        np.zeros(0, np.float32), shape=(10, 10),
    )
    op = SellSpMV.from_coo(coo)
    y = np.asarray(op(jnp.ones(10, jnp.float32)))
    np.testing.assert_array_equal(y, np.zeros(10))


def test_rectangular_tall_and_wide():
    rng = np.random.RandomState(11)
    for shape in [(500, 40), (40, 500)]:
        r, c, v = random_coo(rng, shape[0], shape[1], 600)
        coo = COOMatrix.from_numpy(r, c, v, shape=shape)
        op = SellSpMV.from_coo(coo)
        x = rng.randn(shape[1]).astype(np.float32)
        y = np.asarray(op(jnp.asarray(x)))
        y_ref = coo.to_dense() @ x.astype(np.float64)
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_transpose_operator():
    coo = _load("pdp08-pg4.mtx")
    op = SellSpMV.from_coo(coo)
    op_t = op.transpose()
    rng = np.random.RandomState(12)
    y = rng.randn(coo.shape[0]).astype(np.float32)
    g = np.asarray(op_t(jnp.asarray(y)))
    g_ref = coo.to_dense().T @ y.astype(np.float64)
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-5)


def test_differentiable_spmv_grad():
    import jax

    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)
    f = op.differentiable()
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(coo.shape[1]), jnp.float32)
    w = jnp.asarray(rng.randn(coo.shape[0]), jnp.float32)
    loss = lambda x: jnp.vdot(w, f(x))  # noqa: E731
    g = np.asarray(jax.grad(loss)(x))
    g_ref = coo.to_dense().T @ np.asarray(w, np.float64)
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-4)


def test_matmat_spmm():
    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)
    rng = np.random.RandomState(14)
    X = jnp.asarray(rng.randn(coo.shape[1], 4), jnp.float32)
    Y = np.asarray(op.matmat(X))
    Y_ref = coo.to_dense() @ np.asarray(X, np.float64)
    np.testing.assert_allclose(Y, Y_ref, rtol=1e-4, atol=1e-4)


def test_cache_does_not_retain_matrices():
    import gc

    from smvp_toolkit_tpu.ops import spmv_pallas

    coo = _load("pdp08-pg4.mtx").pad(32)
    csr = csr_encode(coo)
    spmv_csr_pallas(csr, jnp.ones((coo.shape[1],), jnp.float32))
    key = id(csr)
    assert key in spmv_pallas._CACHE
    del csr
    gc.collect()
    assert key not in spmv_pallas._CACHE


def test_transpose_inherits_precision():
    import jax

    coo = _load("pdp08-pg4.mtx")
    op = SellSpMV.from_coo(coo, precision=jax.lax.Precision.HIGH)
    assert op.transpose().precision == jax.lax.Precision.HIGH


def test_bf16_value_mode_accuracy():
    """bf16 value mode: vals + x stream in bfloat16, f32 accumulation.
    Error vs the f64 oracle must be within bf16 rounding of the inputs
    (~1e-2 relative), and the operator's buffers must actually be bf16."""
    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    assert op.vals.dtype == jnp.bfloat16
    rng = np.random.RandomState(1)
    x = rng.randn(coo.shape[1]).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)))
    assert y.dtype == np.float32
    y_ref = coo.to_dense() @ x.astype(np.float64)
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < 2e-2
    # And it must be *exact* w.r.t. bf16-rounded inputs.
    import ml_dtypes

    vals_bf = np.asarray(op.plan.vals).astype(ml_dtypes.bfloat16)
    x_bf = x.astype(ml_dtypes.bfloat16)
    r, c, v = coo.to_numpy()
    dense = np.zeros(coo.shape, dtype=np.float64)
    # rebuild the bf16-rounded dense operator from the plan's slot values
    y_bf_ref = np.zeros(coo.shape[0], dtype=np.float64)
    np.add.at(
        y_bf_ref, r,
        v.astype(ml_dtypes.bfloat16).astype(np.float64)
        * x_bf[c].astype(np.float64),
    )
    assert np.abs(y - y_bf_ref).max() / scale < 1e-6


def test_bf16_mode_via_format_wrapper():
    """A bfloat16-encoded CSR routes through the kernel in bf16 value mode
    (--dtype bfloat16 changes kernel traffic, not just encode dtype)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import _cached_op, _triplets_from_csr_host

    coo = _load("ibm32.mtx")
    csr = csr_encode(
        COOMatrix.from_numpy(*coo.to_numpy(), shape=coo.shape,
                             dtype=jnp.bfloat16)
    )
    op = _cached_op(csr, _triplets_from_csr_host)
    assert op.value_dtype == jnp.dtype(jnp.bfloat16)
    x = jnp.ones((coo.shape[1],), jnp.bfloat16)
    y = np.asarray(op(x))
    assert float(y.sum()) == 126.0  # pattern matrix, exact in bf16


def test_native_planner_matches_numpy():
    """The C++ planner pass must produce bit-identical plans to the numpy
    planner (stable dup ordering included)."""
    import smvp_toolkit_tpu.ops.sell_plan as sp

    if sp._plan_lib() is None:
        pytest.skip("libsellplan.so not built")
    rng = np.random.RandomState(11)
    nrows, ncols, nnz = 700, 900, 6000
    r = rng.randint(0, nrows, nnz).astype(np.int64)
    c = rng.randint(0, ncols, nnz).astype(np.int64)
    # Inject duplicates (same row+col) and same-tile collisions.
    k = min(len(r[::7]), len(r[1::7]))
    r[: 7 * k : 7] = r[1 : 7 * k : 7]
    c[: 7 * k : 7] = c[1 : 7 * k : 7]
    v = rng.randn(nnz).astype(np.float32)
    p_nat = sp.build_sell_plan(r, c, v, (nrows, ncols))
    assert sp._PLAN_LIB is not None  # native path was really taken
    numpy_impl = sp.__dict__["build_sell_plan"]
    saved, sp._PLAN_LIB, sp._PLAN_LIB_FAILED = sp._PLAN_LIB, None, True
    try:
        p_np = numpy_impl(r, c, v, (nrows, ncols))
    finally:
        sp._PLAN_LIB, sp._PLAN_LIB_FAILED = saved, False
    for f in ("vals", "lane_idx", "rel_tile", "slice_of", "tile_base"):
        np.testing.assert_array_equal(
            getattr(p_nat, f), getattr(p_np, f), err_msg=f
        )
    assert (p_nat.n_slices, p_nat.n_coltiles, p_nat.window_tiles,
            p_nat.chunk) == (p_np.n_slices, p_np.n_coltiles,
                             p_np.window_tiles, p_np.chunk)


@pytest.mark.parametrize("resident", [True, False])
def test_resident_and_windowed_variants_agree(resident):
    """The VMEM-resident-x kernel (SMEM tile_base + in-kernel dynamic
    window slice) and the windowed-stack fallback compute identical y."""
    from smvp_toolkit_tpu.ops.spmv_pallas import _sell_spmv_call

    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    plan = op.plan
    ncols_pad = plan.n_coltiles * 128
    xp = jnp.pad(x, (0, ncols_pad - x.shape[0])).reshape(plan.n_coltiles, 128)
    y = _sell_spmv_call(
        xp, op.vals, op.lidx, op.rel_tile, op.slice_of, op.bases,
        n_chunks=plan.n_chunks, chunk=plan.chunk, ns=plan.n_slices,
        nsw=op.nsw, wt=plan.window_tiles, interpret=True,
        resident=resident,
    )
    y_ref = coo.to_dense() @ np.asarray(x, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1)[: coo.shape[0]], y_ref,
        rtol=1e-4, atol=1e-5,
    )


def test_int8_lane_index_compression():
    """Chunk-aligned plans store lane indices as int8 (1/4 the HBM
    traffic); results must be identical to int32 storage."""
    import os as _os

    rng = np.random.RandomState(21)
    nrows, ncols, nnz = 9000, 9000, 60000
    r = rng.randint(0, nrows, nnz).astype(np.int64)
    c = rng.randint(0, ncols, nnz).astype(np.int64)
    v = rng.randn(nnz).astype(np.float32)
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    plan = build_sell_plan(r, c, v, (nrows, ncols))
    assert plan.chunk % 32 == 0  # big enough to qualify for compression
    op8 = SellSpMV(plan)
    assert op8.lidx.dtype == jnp.int8
    _os.environ["SMVP_SELL_LIDX32"] = "1"
    try:
        op32 = SellSpMV(plan)
    finally:
        del _os.environ["SMVP_SELL_LIDX32"]
    assert op32.lidx.dtype == jnp.int32
    x = jnp.asarray(rng.randn(ncols).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(op8(x)), np.asarray(op32(x)))


def test_windowed_fallback_auto_selected(monkeypatch):
    """Above the VMEM budget the operator picks the windowed-stack path
    automatically and still computes the same y."""
    import smvp_toolkit_tpu.ops.spmv_pallas as spp

    coo = _load("ibm32.mtx")
    op = SellSpMV.from_coo(coo)
    x = jnp.asarray(np.random.RandomState(2).randn(coo.shape[1]).astype(np.float32))
    y_resident = np.asarray(op(x))
    monkeypatch.setattr(spp, "_RESIDENT_X_LIMIT", -1)
    y_windowed = np.asarray(op(x))
    np.testing.assert_array_equal(y_resident, y_windowed)


@pytest.mark.parametrize("scale", [1e-30, 1.0, 1e30])
def test_extreme_value_magnitudes(scale):
    """The one-hot select/reduce path must not overflow or round away
    extreme-magnitude values (HIGHEST passes decompose f32 into bf16
    limbs — exponent range is preserved)."""
    rng = np.random.RandomState(int(np.log10(scale)) % 7)
    n, nnz = 300, 900
    r = rng.randint(0, n, nnz).astype(np.int64)
    c = rng.randint(0, n, nnz).astype(np.int64)
    v = (rng.randn(nnz) * scale).astype(np.float32)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), v.astype(np.float64),
        shape=(n, n),
    )
    op = SellSpMV.from_coo(coo)
    x = rng.randn(n).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    y_ref = np.zeros(n)
    np.add.at(y_ref, r, v.astype(np.float64) * x[c].astype(np.float64))
    sc = np.abs(y_ref).max() + 1e-300
    assert np.abs(y - y_ref).max() / sc < 1e-4


def test_negative_zero_and_inf_free():
    """Zeros stored as explicit entries stay zero; no NaN/Inf appears
    from dead-slot arithmetic."""
    r = np.array([0, 1, 2], dtype=np.int32)
    c = np.array([0, 1, 2], dtype=np.int32)
    v = np.array([0.0, -0.0, 5.0])
    coo = COOMatrix.from_numpy(r, c, v, shape=(3, 3))
    op = SellSpMV.from_coo(coo)
    x = jnp.asarray(np.array([1e30, -1e30, 2.0], np.float32))
    y = np.asarray(op(x))
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, [0.0, 0.0, 10.0])


def test_onehot_compat_mode_agrees(monkeypatch):
    """SMVP_SELL_COMPAT=1 (dense one-hot planes, the round-1-proven
    Mosaic configuration) must compute identical y."""
    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)
    x = jnp.asarray(
        np.random.RandomState(4).randn(coo.shape[1]).astype(np.float32)
    )
    y_default = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_COMPAT", "1")
    y_compat = np.asarray(op(x))
    np.testing.assert_allclose(y_compat, y_default, rtol=1e-6, atol=1e-7)


def test_autotune_pick_plan():
    """pick_plan returns a valid plan whose kernel matches the default
    plan's results; the cost model must monotonically credit a smaller
    tile window at equal traffic."""
    from smvp_toolkit_tpu.ops.autotune import pick_plan, plan_cost_us
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    coo = _load("curtis54.mtx")
    r, c, v = coo.to_numpy()
    plan, cost = pick_plan(r, c, v, coo.shape)
    assert cost > 0
    op = SellSpMV(plan)
    x = jnp.asarray(
        np.random.RandomState(6).randn(coo.shape[1]).astype(np.float32)
    )
    y_ref = np.asarray(SellSpMV(build_sell_plan(r, c, v, coo.shape))(x))
    np.testing.assert_allclose(np.asarray(op(x)), y_ref, rtol=1e-5,
                               atol=1e-6)
    # bf16 must model cheaper than f32 for the same plan.
    p = build_sell_plan(r, c, v, coo.shape)
    assert plan_cost_us(p, 2, table_passes=1, reduce_passes=3) < \
        plan_cost_us(p, 4, table_passes=6, reduce_passes=6)


def test_reduce2_bf16_mode_bit_identical(monkeypatch):
    """SMVP_SELL_REDUCE2=1 (double-bf16 2-pass reduce) is lossless in
    bf16 value mode: every product of two bf16 inputs carries <= 16
    mantissa bits, and the hi/lo bf16 split represents that exactly."""
    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(5).randn(coo.shape[1]).astype(np.float32)
    )
    y_default = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_REDUCE2", "1")
    y_r2 = np.asarray(op(x))
    np.testing.assert_array_equal(y_r2, y_default)


def test_reduce2_f32_mode_near_exact(monkeypatch):
    """For f32 values the 2-pass ladder keeps ~16 mantissa bits per
    product: relative error vs the exact reduce stays ~1e-4."""
    rng = np.random.RandomState(6)
    r, c, v = random_coo(rng, 90, 80, 600)
    coo = COOMatrix.from_numpy(r, c, v, shape=(90, 80), pad_to=128)
    op = SellSpMV.from_coo(coo)
    x = jnp.asarray(rng.randn(80).astype(np.float32))
    y_exact = np.asarray(op(x), dtype=np.float64)
    monkeypatch.setenv("SMVP_SELL_REDUCE2", "1")
    y_r2 = np.asarray(op(x), dtype=np.float64)
    scale = np.abs(y_exact).max() + 1e-30
    assert np.abs(y_r2 - y_exact).max() / scale < 5e-4


def test_prefetch_window_variant_agrees(monkeypatch):
    """Scalar-prefetch x windows (non-resident default) == resident."""
    import smvp_toolkit_tpu.ops.spmv_pallas as spp

    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)
    x = jnp.asarray(
        np.random.RandomState(7).randn(coo.shape[1]).astype(np.float32)
    )
    y_resident = np.asarray(op(x))
    monkeypatch.setattr(spp, "_RESIDENT_X_LIMIT", -1)  # force non-resident
    y_prefetch = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_PREFETCH", "0")  # host window stack
    y_stack = np.asarray(op(x))
    np.testing.assert_allclose(y_prefetch, y_resident, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(y_stack, y_resident, rtol=1e-6, atol=1e-7)


def test_windowed_reduce_engages_on_banded():
    """On a tall banded matrix the per-chunk slice window NSW is far
    smaller than NS, and the windowed reduce stays exact."""
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(20_000, nnz_per_row=6, bandwidth=80, seed=3).pad(512)
    r_, c_, v_ = coo.to_numpy()
    plan = build_sell_plan(r_, c_, v_, coo.shape, chunk=256)
    op = SellSpMV(plan)
    assert plan.n_slices >= 144  # 20k rows -> NS >= 157 slices (padded)
    sb, nsw = plan.reduce_window()
    assert nsw < plan.n_slices // 2  # the window genuinely engages
    assert nsw % 16 == 0 and np.all(sb % 16 == 0)
    assert np.all(sb >= 0) and np.all(sb + nsw <= plan.n_slices)
    # Bases must be monotone nondecreasing in natural banded order so a
    # future flush-behind y scheme stays possible.
    x = np.random.RandomState(4).randn(coo.shape[1]).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)), dtype=np.float64)
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64) * x.astype(np.float64)[c])
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < 1e-5


def test_windowed_reduce_uniform_matrix_falls_back():
    """Uniform scatter touches every slice from every chunk: NSW == NS
    and results stay exact (the window degrades to the full reduce)."""
    rng = np.random.RandomState(6)
    r, c, v = random_coo(rng, 2000, 300, 4000)
    coo = COOMatrix.from_numpy(r, c, v, shape=(2000, 300), pad_to=512)
    op = SellSpMV.from_coo(coo)
    x = rng.randn(300).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x)), dtype=np.float64)
    y_ref = coo.to_dense() @ x.astype(np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_nowindow_escape_hatch_identical(monkeypatch):
    """SMVP_SELL_NOWINDOW=1 (static full-block reduce, the pre-v6 path)
    must compute identical y to the windowed default."""
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(20_000, nnz_per_row=6, bandwidth=60, seed=8).pad(512)
    r_, c_, v_ = coo.to_numpy()
    op = SellSpMV(build_sell_plan(r_, c_, v_, coo.shape, chunk=256))
    assert op.nsw < op.plan.n_slices  # window engaged by default
    x = jnp.asarray(
        np.random.RandomState(9).randn(coo.shape[1]).astype(np.float32)
    )
    y_windowed = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_NOWINDOW", "1")
    y_full = np.asarray(op(x))
    np.testing.assert_allclose(y_full, y_windowed, rtol=1e-6, atol=1e-7)


def test_rewindow_plan_matches_rebuild():
    # One-pass sharded planning: widening a plan's window with
    # rewindow_plan must be bit-identical to rebuilding the plan with
    # min_window_tiles (what shard_sell formerly did, at 2x planner cost).
    from smvp_toolkit_tpu.ops.sell_plan import rewindow_plan

    rng = np.random.RandomState(7)
    n = 700
    r = rng.randint(0, n, size=4000).astype(np.int64)
    c = np.clip(r + rng.randint(-90, 91, size=4000), 0, n - 1)
    v = rng.randn(4000)
    # dedup (planner requires coalesced input for exact value match)
    key = r * n + c
    _, idx = np.unique(key, return_index=True)
    r, c, v = r[idx], c[idx], v[idx]

    base = build_sell_plan(r, c, v, (n, n), chunk=256,
                           allow_small_chunk=False)
    for wt in (base.window_tiles, base.window_tiles + 16,
               base.window_tiles + 64):
        a = rewindow_plan(base, wt)
        b = build_sell_plan(r, c, v, (n, n), chunk=256,
                            min_window_tiles=wt, allow_small_chunk=False)
        assert a.window_tiles == b.window_tiles
        np.testing.assert_array_equal(a.tile_base, b.tile_base)
        np.testing.assert_array_equal(a.rel_tile, b.rel_tile)
        np.testing.assert_array_equal(a.vals, b.vals)
        np.testing.assert_array_equal(a.lane_idx, b.lane_idx)
        np.testing.assert_array_equal(a.slice_of, b.slice_of)
        np.testing.assert_array_equal(*(p.reduce_window()[0] for p in (a, b)))
        assert a.slice_window == b.slice_window

    # Empty plan: rewindow is a no-op, not an error.
    empty = build_sell_plan(
        np.array([], np.int64), np.array([], np.int64), np.array([]),
        (n, n), chunk=256, allow_small_chunk=False,
    )
    assert rewindow_plan(empty, 999).window_tiles == empty.window_tiles


# ---------------------------------------------------------------------------
# Env-flag cross-product matrix (round 3)
# ---------------------------------------------------------------------------
# The hardware canary ladder can settle on NOWINDOW=1 or COMPAT=1, and
# every subsequent session A/B stage (bf16, reduce2, lidx32, prefetch)
# then runs UNDER that rung — so flag COMBINATIONS occur on hardware.
# Every combination the session can produce must be interpreter-correct
# before it can burn a tunnel window.

_LADDER = [{}, {"SMVP_SELL_NOWINDOW": "1"}, {"SMVP_SELL_COMPAT": "1"}]
# "xwin" forces the non-resident x paths (scalar-prefetch windows, and
# the host window-stack escape hatch with SMVP_SELL_PREFETCH=0).
_STAGE = [
    {},
    {"SMVP_SELL_REDUCE2": "1"},
    {"SMVP_SELL_LIDX32": "1"},
    {"SMVP_SELL_REDUCE2": "1", "SMVP_SELL_LIDX32": "1"},
    {"xwin": True},
    {"xwin": True, "SMVP_SELL_PREFETCH": "0"},
    {"xwin": True, "SMVP_SELL_REDUCE2": "1"},
]


@pytest.mark.parametrize("rung", range(len(_LADDER)))
@pytest.mark.parametrize("stage", range(len(_STAGE)))
@pytest.mark.parametrize("bf16", [False, True])
def test_env_flag_matrix(rung, stage, bf16, monkeypatch):
    env = dict(_LADDER[rung], **_STAGE[stage])
    if env.pop("xwin", False):
        import smvp_toolkit_tpu.ops.spmv_pallas as _sp

        monkeypatch.setattr(_sp, "_RESIDENT_X_LIMIT", -1)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    rng = np.random.RandomState(7)
    r, c, v = random_coo(rng, 200, 170, 900)
    coo = COOMatrix.from_numpy(r, c, v, shape=(200, 170), pad_to=128)
    rn, cn, vn = coo.to_numpy()
    vdt = jnp.bfloat16 if bf16 else None
    op = SellSpMV.from_coo(coo, interpret=True, value_dtype=vdt)
    x = rng.randn(170).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    xe = x.astype(np.float64)
    ve = vn.astype(np.float64)
    if bf16:
        import ml_dtypes

        xe = x.astype(ml_dtypes.bfloat16).astype(np.float64)
        ve = vn.astype(ml_dtypes.bfloat16).astype(np.float64)
    y_ref = np.zeros(200)
    np.add.at(y_ref, rn, ve * xe[cn])
    scale = np.abs(y_ref).max() + 1e-30
    tol = 5e-5 if (bf16 or env.get("SMVP_SELL_REDUCE2")) else 1e-6
    assert np.abs(y - y_ref).max() / scale < tol, env


# ---------------------------------------------------------------------------
# Mosaic static-constraint validator (ops/mosaic_check.py) — the off-TPU
# guard that makes round-3's failure class (interpreter-green kernels
# that Mosaic rejects on hardware) unreachable.
# ---------------------------------------------------------------------------


def test_mosaic_check_rejects_round3_blockspec():
    """The exact round-3 failure: (1, chunk) block over (8, chunk)."""
    from smvp_toolkit_tpu.ops.mosaic_check import (
        MosaicConstraintError, check_block,
    )

    with pytest.raises(MosaicConstraintError):
        check_block((1, 1024), (8, 1024), np.float32)
    # ...and the legal shapes around it
    check_block((1, 1, 1024), (8, 1, 1024), np.int32)  # the r4 fix
    check_block((1, 1024), (1, 1024), np.float32)  # 1-chunk canary
    check_block((1024, 128), (8192, 128), np.float32)
    check_block((1024, 1), (8192, 1), np.int32)


def test_mosaic_check_dtype_tiles():
    from smvp_toolkit_tpu.ops.mosaic_check import (
        MosaicConstraintError, check_block, sublane_tile,
    )

    assert sublane_tile(np.float32) == 8
    assert sublane_tile(jnp.bfloat16) == 16
    assert sublane_tile(np.int8) == 32
    # 8-row bf16 block over a taller array: not a 16-multiple
    with pytest.raises(MosaicConstraintError):
        check_block((8, 128), (64, 128), jnp.bfloat16)
    # int8 needs 32-row tiles
    with pytest.raises(MosaicConstraintError):
        check_block((16, 128), (64, 128), np.int8)
    check_block((32, 128), (64, 128), np.int8)


def test_mosaic_check_element_mixing():
    from jax.experimental import pallas as pl

    from smvp_toolkit_tpu.ops.mosaic_check import (
        MosaicConstraintError, check_block,
    )

    with pytest.raises(MosaicConstraintError):
        check_block((pl.Element(16), 128), (256, 128), np.float32)
    check_block((pl.Element(16), pl.Element(128)), (256, 128), np.float32)


def test_mosaic_check_runs_in_every_launch(monkeypatch):
    """Every kernel variant's actual specs pass the validator — the
    checks fire at trace time inside _sell_spmv_call, so simply tracing
    each variant over a MULTI-CHUNK plan is the regression test."""
    import smvp_toolkit_tpu.ops.spmv_pallas as sp

    coo = _load("memplus.mtx").pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    assert plan.n_chunks >= 2
    op = SellSpMV(plan, _triplets=(r, c, v))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    op(x)  # resident
    monkeypatch.setattr(sp, "_RESIDENT_X_LIMIT", -1)
    op(x)  # scalar-prefetch Element windows
    monkeypatch.setenv("SMVP_SELL_PREFETCH", "0")
    op(x)  # host window stack
    monkeypatch.undo()
    X = jnp.asarray(rng.randn(coo.shape[1], 4).astype(np.float32))
    op.matmat(X)  # fused SpMM
    op.vjp_vals(x, jnp.asarray(rng.randn(coo.shape[0]).astype(np.float32)))


def test_mosaic_check_plan_alignment_guards():
    """A plan with a mis-aligned base must fail at operator build."""
    import dataclasses

    from smvp_toolkit_tpu.ops.mosaic_check import (
        MosaicConstraintError, check_plan_alignment,
    )

    coo = _load("curtis54.mtx").pad(128)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    check_plan_alignment(plan)  # planner output is always legal
    bad = dataclasses.replace(
        plan, tile_base=plan.tile_base + np.int32(1)
    )
    with pytest.raises(MosaicConstraintError):
        check_plan_alignment(bad)
    with pytest.raises(MosaicConstraintError):
        SellSpMV(bad)


def test_precision_high_rejected_compiled_only():
    """Precision.HIGH raises for compiled operators (Mosaic rejects it
    on v5e) but stays allowed in interpreter mode (CPU tests)."""
    import jax

    from smvp_toolkit_tpu.ops.mosaic_check import MosaicConstraintError

    coo = _load("curtis54.mtx").pad(128)
    op = SellSpMV.from_coo(coo, precision=jax.lax.Precision.HIGH)
    assert op.interpret  # CPU: interpreter mode, HIGH tolerated
    with pytest.raises(MosaicConstraintError):
        SellSpMV.from_coo(
            coo, interpret=False, precision=jax.lax.Precision.HIGH
        )


def test_bf16_defaults_to_reduce2():
    """bf16 value mode runs the double-bf16 reduce by default (HIGH is
    unavailable on hardware; reduce2 is lossless for bf16 products) and
    still matches the bf16-rounded oracle exactly."""
    import ml_dtypes

    coo = _load("memplus.mtx").pad(512)
    r, c, v = coo.to_numpy()
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    rng = np.random.RandomState(7)
    x = rng.randn(coo.shape[1]).astype(np.float32)
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    xb = x.astype(ml_dtypes.bfloat16)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(
        y_ref, r,
        v.astype(ml_dtypes.bfloat16).astype(np.float64)
        * xb[c].astype(np.float64),
    )
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < 1e-6


@pytest.mark.parametrize("name", SAMPLES_SMALL + ["memplus.mtx"])
def test_packed_plane_bit_exact(name, monkeypatch):
    """The packed val‖rel‖lidx int32 plane (SMVP_SELL_PACK=1, bf16 value
    mode) must be BIT-exact vs the split-plane kernel: the value field is
    the same bf16 rounding and bf16→f32 extension appends zero bits, so
    the arithmetic is identical — only the HBM layout changes (micro3's
    stream-count finding, experiments/micro3_tpu.py)."""
    coo = _load(name)
    # Pin the unsplit chain: the packed kernel has no split-chain
    # variant, and split4 (the production default for big chunks) is a
    # different — equally valid — summation order, not bit-identical.
    # Env knobs are read at trace time, so drop cached traces from
    # earlier tests.
    monkeypatch.setenv("SMVP_SELL_SPLIT_CHAIN", "1")
    from smvp_toolkit_tpu.ops.spmv_pallas import _sell_spmv_call

    _sell_spmv_call.clear_cache()
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    base = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_PACK", "1")
    y = np.asarray(op(x))
    assert np.array_equal(y, base)


def test_packed_plane_roundtrip():
    """Unpacking the packed plane recovers vals/lidx/rel exactly
    (dead sublanes' rel becomes the out-of-window marker)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import (
        _PACK_REL_DEAD,
        _PACK_REL_SHIFT,
    )

    coo = _load("memplus.mtx")
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    pk = np.asarray(op._packed())
    vals = (pk & np.int32(-65536)).view(np.float32)
    lidx = pk & 127
    rel = (pk.view(np.uint32) >> _PACK_REL_SHIFT).astype(np.int64) & 511
    assert np.array_equal(vals, np.asarray(op.vals).astype(np.float32))
    assert np.array_equal(lidx, np.asarray(op.lidx).astype(np.int32))
    expect_rel = np.where(op.plan.rel_tile < 0, _PACK_REL_DEAD,
                          op.plan.rel_tile)
    assert np.array_equal(rel, np.broadcast_to(expect_rel, rel.shape))


def test_packed_plane_gates(monkeypatch):
    """f32 value mode never routes to the packed kernel (the plane has
    no room for 32-bit values) — SMVP_SELL_PACK=1 must be a no-op."""
    coo = _load("curtis54.mtx")
    op = SellSpMV.from_coo(coo)  # f32
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    base = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_PACK", "1")
    assert np.array_equal(np.asarray(op(x)), base)
    assert op._packed_cache is None  # gate short-circuits the build


@pytest.mark.parametrize("n_split", [2, 3])
def test_split_launch_agrees(n_split, monkeypatch):
    """SMVP_SELL_SPLIT=N partitions the chunk sweep across N launches
    whose partial ys sum to the single-launch result (up to f32
    re-association at the split boundaries)."""
    coo = _load("memplus.mtx")
    for vd in (jnp.float32, jnp.bfloat16):
        op = SellSpMV.from_coo(coo, value_dtype=vd)
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
        base = np.asarray(op(x))
        monkeypatch.setenv("SMVP_SELL_SPLIT", str(n_split))
        y = np.asarray(op(x))
        monkeypatch.delenv("SMVP_SELL_SPLIT")
        scale = np.abs(base).max() + 1e-30
        assert np.abs(y - base).max() / scale < 1e-5


def test_split_and_packed_compose(monkeypatch):
    """Packed planes slice per split range (host-cached device arrays,
    no in-trace copies) and the composition stays correct."""
    coo = _load("pdp08-pg4.mtx")
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    base = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_PACK", "1")
    monkeypatch.setenv("SMVP_SELL_SPLIT", "2")
    y = np.asarray(op(x))
    scale = np.abs(base).max() + 1e-30
    assert np.abs(y - base).max() / scale < 1e-5


def test_packed_plane_spmm_and_streamed(monkeypatch):
    """The packed plane also drives the fused SpMM (k-wide lanes) and
    streamed-y v7 launches — both bit-exact vs their split-plane twins."""
    from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan

    coo = _load("memplus.mtx")
    rng = np.random.RandomState(17)
    X = jnp.asarray(rng.randn(coo.shape[1], 8).astype(np.float32))

    # Cross-layout bit-exact comparison: pin the unsplit chain (the
    # packed plane has no split variant) and drop stale traces.
    monkeypatch.setenv("SMVP_SELL_SPLIT_CHAIN", "1")
    from smvp_toolkit_tpu.ops.spmv_pallas import _sell_spmv_call

    _sell_spmv_call.clear_cache()
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    base_mm = np.asarray(op.matmat(X))
    r, c, v = coo.to_numpy()
    plan_s = build_streamed_sell_plan(
        r, c, v, coo.shape, chunk=1024, y_block_rows=4096
    )
    op_s = SellSpMV(plan_s, value_dtype=jnp.bfloat16)
    base_st = np.asarray(op_s(X[:, 0]))

    monkeypatch.setenv("SMVP_SELL_PACK", "1")
    assert np.array_equal(np.asarray(op.matmat(X)), base_mm)
    assert np.array_equal(np.asarray(op_s(X[:, 0])), base_st)


def test_bench_loop_matches_single_apply(monkeypatch):
    """The grid-fused benchmark runner (iteration loop inside the Mosaic
    grid) recomputes y from scratchevery iteration — its final y must be
    BIT-identical to one __call__, packed or not."""
    coo = _load("memplus.mtx")
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    for vd in (jnp.float32, jnp.bfloat16):
        op = SellSpMV.from_coo(coo, value_dtype=vd)
        base = np.asarray(op(x))
        assert np.array_equal(np.asarray(op.bench_loop(x, 3)), base)
    monkeypatch.setenv("SMVP_SELL_PACK", "1")
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    assert np.array_equal(np.asarray(op.bench_loop(x, 2)),
                          np.asarray(op(x)))


@pytest.mark.parametrize("vd", [jnp.float32, jnp.bfloat16])
def test_relsl_plane_bit_exact(vd, monkeypatch):
    """The merged rel‖slice plane (SMVP_SELL_RELSL=1, 3 input streams,
    transposed one-hot table build) is bit-exact vs the split planes in
    both value dtypes, through __call__, bench_loop, and split."""
    coo = _load("memplus.mtx")
    op = SellSpMV.from_coo(coo, value_dtype=vd)
    rng = np.random.RandomState(29)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    base = np.asarray(op(x))
    monkeypatch.setenv("SMVP_SELL_RELSL", "1")
    assert np.array_equal(np.asarray(op(x)), base)
    assert np.array_equal(np.asarray(op.bench_loop(x, 2)), base)
    monkeypatch.setenv("SMVP_SELL_SPLIT", "2")
    scale = np.abs(base).max() + 1e-30
    assert np.abs(np.asarray(op(x)) - base).max() / scale < 1e-5


def test_relsl_roundtrip():
    """Unpacking the rel‖slice plane recovers rel_tile and slice_of
    exactly (dead markers land outside every window)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import (
        _PACK_REL_DEAD,
        _RELSL_SL_DEAD,
        _RELSL_SL_SHIFT,
    )

    coo = _load("pdp08-pg4.mtx")
    op = SellSpMV.from_coo(coo)
    rs = np.asarray(op._relsl()).view(np.uint32)
    plan = op.plan
    rel = (rs & 511).astype(np.int64)
    sl = (rs >> _RELSL_SL_SHIFT).astype(np.int64)
    exp_rel = np.where(plan.rel_tile < 0, _PACK_REL_DEAD, plan.rel_tile)
    exp_sl = np.where(plan.slice_of < 0, _RELSL_SL_DEAD, plan.slice_of)
    assert np.array_equal(
        rel, exp_rel.reshape(plan.n_chunks, plan.chunk)
    )
    assert np.array_equal(sl, exp_sl)


def test_fused_cg_solves_spd():
    """The fused in-kernel CG (grid = (iters, chunks), solver state in
    VMEM scratch — ops/cg_fused.py) matches the dense solve and the
    XLA conjugate_gradient to f32 accuracy, in both metadata layouts."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import _spd_coo

    from smvp_toolkit_tpu.ops.cg_fused import fused_cg

    coo, a = _spd_coo(n=300, seed=2)
    b = np.random.RandomState(3).rand(300).astype(np.float32)
    op = SellSpMV.from_coo(coo)
    x = np.asarray(fused_cg(op, jnp.asarray(b), 60))
    xref = np.linalg.solve(a, b.astype(np.float64))
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-5


def test_fused_cg_split_plane_variant(monkeypatch):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import _spd_coo

    from smvp_toolkit_tpu.ops.cg_fused import fused_cg

    coo, a = _spd_coo(n=24, seed=0)
    b = np.random.RandomState(1).rand(24).astype(np.float32)
    op = SellSpMV.from_coo(coo)
    x1 = np.asarray(fused_cg(op, jnp.asarray(b), 30))
    monkeypatch.setenv("SMVP_SELL_RELSL", "0")
    x2 = np.asarray(fused_cg(op, jnp.asarray(b), 30))
    xref = np.linalg.solve(a, b.astype(np.float64))
    assert np.abs(x1 - xref).max() / np.abs(xref).max() < 1e-5
    assert np.abs(x2 - x1).max() <= 1e-5 * np.abs(x1).max()


def test_fused_cg_rejects_rectangular():
    from smvp_toolkit_tpu.ops.cg_fused import fused_cg

    r, c, v = random_coo(np.random.RandomState(0), 64, 32, 200)
    op = SellSpMV.from_coo(
        COOMatrix.from_numpy(r, c, v, shape=(64, 32), pad_to=64)
    )
    with pytest.raises(ValueError, match="square"):
        fused_cg(op, jnp.ones(64), 5)


def test_fused_cg_vmem_gate():
    """Systems whose five (T,128) state vectors exceed the VMEM budget
    must be rejected with a clear message (the 1M-row attempt crashes
    the Mosaic compile on real hardware)."""
    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.ops.cg_fused import fused_cg

    n = 600_000
    rd = np.arange(n, dtype=np.int64)
    coo = COOMatrix.from_numpy(
        rd, rd, np.ones(n, np.float32), shape=(n, n), pad_to=512
    )
    op = SellSpMV.from_coo(coo)
    with pytest.raises(ValueError, match="VMEM"):
        fused_cg(op, jnp.ones(n), 3)


def test_split_policy_gates():
    """Production chain-split policy: 4-way only for lane-tile-aligned
    big chunks, never for SpMM (round-5 measured constraints)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import _split_policy

    assert _split_policy(2048, 1) == 4
    assert _split_policy(4096, 1) == 4
    assert _split_policy(2048, 8) == 4          # fused SpMM splits too
    assert _split_policy(1024, 1) == 1          # below the measured win
    assert _split_policy(7192, 1) == 1          # 7192 % 512 != 0
    assert _split_policy(16, 1) == 1


def test_split_chain_matches_unsplit_numerics():
    """split4 is a different (equally valid) summation order: results
    agree with the unsplit chain to f32 re-association tolerance."""
    import os as _os

    from smvp_toolkit_tpu.ops.spmv_pallas import _sell_spmv_call

    coo = _load("memplus.mtx")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(coo.shape[1]).astype(np.float32))
    op = SellSpMV.from_coo(coo, value_dtype=jnp.bfloat16)
    y_split = np.asarray(op(x), np.float64)
    _os.environ["SMVP_SELL_SPLIT_CHAIN"] = "1"
    try:
        _sell_spmv_call.clear_cache()
        y_unsplit = np.asarray(op(x), np.float64)
    finally:
        _os.environ.pop("SMVP_SELL_SPLIT_CHAIN", None)
        _sell_spmv_call.clear_cache()
    scale = np.abs(y_unsplit).max() + 1e-30
    assert np.abs(y_split - y_unsplit).max() / scale < 1e-6
