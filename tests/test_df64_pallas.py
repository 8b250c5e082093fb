"""Pallas df64 SELL kernel: accuracy vs the f64 oracle.

The kernel's claim (ops/spmv_df64.py): exact bf16-expansion selection,
error-free products, grid-quantized EXACT MXU accumulation — ~1e-14
relative to the f64 oracle, versus ~1e-7 for the f32 paths.
"""

import numpy as np
import pytest

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.ops.precision import df_split, df_to_f64
from smvp_toolkit_tpu.ops.spmv_df64 import SellDf64SpMV, sell_df64_op

from conftest import SAMPLE_DIR


def _oracle(r, c, v64, x64, n):
    y = np.zeros(n)
    np.add.at(y, r, v64 * x64[c])
    return y


@pytest.mark.parametrize("seed,chunk", [(0, 512), (1, 256)])
def test_df64_random_f64_values(seed, chunk):
    rng = np.random.RandomState(seed)
    n, m, nnz = 900, 800, 12000
    r = rng.randint(0, n, nnz).astype(np.int64)
    c = rng.randint(0, m, nnz).astype(np.int64)
    v64 = rng.randn(nnz) * np.exp2(rng.randint(-8, 8, nnz))
    x64 = rng.randn(m)
    op = SellDf64SpMV.from_coo_f64(r, c, v64, (n, m), chunk=chunk)
    xh, xl = df_split(x64)
    y = df_to_f64(*op(xh, xl))
    oracle = _oracle(r, c, v64, x64, n)
    scale = np.abs(oracle).max() + 1e-300
    assert np.abs(y - oracle).max() / scale < 5e-14


def test_df64_f32_values_no_lo_plane():
    """f32-valued operator: the lo plane elides; accuracy still df64
    w.r.t. the exact (f32-valued) operator."""
    rng = np.random.RandomState(2)
    n, m, nnz = 500, 500, 6000
    r = rng.randint(0, n, nnz).astype(np.int64)
    c = rng.randint(0, m, nnz).astype(np.int64)
    v32 = rng.randn(nnz).astype(np.float32)
    x64 = rng.randn(m)
    op = SellDf64SpMV.from_coo_f64(r, c, v32.astype(np.float64),
                                   (n, m), chunk=256)
    assert op.vals_lo is None
    xh, xl = df_split(x64)
    y = df_to_f64(*op(xh, xl))
    oracle = _oracle(r, c, v32.astype(np.float64), x64, n)
    scale = np.abs(oracle).max() + 1e-300
    assert np.abs(y - oracle).max() / scale < 5e-14


def test_df64_beats_f32_on_cancelling_rows():
    """Rows whose sums cancel: f32 loses most digits, df64 does not."""
    n = 256
    rng = np.random.RandomState(3)
    base = rng.randn(n // 2) * 1e4
    r = np.repeat(np.arange(n // 2), 2).astype(np.int64)
    c = np.arange(n).astype(np.int64)
    v64 = np.empty(n)
    v64[0::2] = base
    v64[1::2] = -base + 1e-4 * rng.randn(n // 2)
    x64 = np.ones(n)
    op = SellDf64SpMV.from_coo_f64(r, c, v64, (n // 2, n), chunk=8)
    xh, xl = df_split(x64)
    y = df_to_f64(*op(xh, xl))
    oracle = _oracle(r, c, v64, x64, n // 2)
    # the cancelled sums are ~1e-4 against 1e4 operands (1e8 dynamic
    # range): the kernel's error is ~2^-49 of the PRODUCT scale
    # (design bound), so ~1e8 * 2^-49 ≈ 2e-7 relative to the cancelled
    # output — f32 keeps nothing at all (err > 1).
    f32 = np.zeros(n // 2, np.float32)
    np.add.at(f32, r, (v64.astype(np.float32)
                       * x64[c].astype(np.float32)))
    err64 = np.abs(y - oracle).max() / np.abs(oracle).max()
    err32 = np.abs(f32 - oracle).max() / np.abs(oracle).max()
    assert err64 < 1e-5 < 1.0 < err32


def test_df64_memplus_vs_xla_df64():
    """The Pallas df64 matches the XLA compensated-scan path's accuracy
    class on a real matrix."""
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo = read_mtx(f"{SAMPLE_DIR}/curtis54.mtx")
    r, c, v = coo.to_numpy()
    rng = np.random.RandomState(4)
    x64 = rng.randn(coo.shape[1])
    op = sell_df64_op(coo, chunk=64)
    xh, xl = df_split(x64)
    y = df_to_f64(*op(xh, xl))
    oracle = _oracle(np.asarray(r), np.asarray(c),
                     np.asarray(v, np.float64), x64, coo.shape[0])
    scale = np.abs(oracle).max() + 1e-300
    assert np.abs(y - oracle).max() / scale < 5e-14


def test_df64_bench_loop_bit_exact():
    rng = np.random.RandomState(5)
    n, m, nnz = 400, 400, 4000
    r = rng.randint(0, n, nnz).astype(np.int64)
    c = rng.randint(0, m, nnz).astype(np.int64)
    v64 = rng.randn(nnz)
    op = SellDf64SpMV.from_coo_f64(r, c, v64, (n, m), chunk=128)
    xh, xl = df_split(rng.randn(m))
    y1h, y1l = op(xh, xl)
    y2h, y2l = op.bench_loop(xh, xl, 3)
    assert np.array_equal(np.asarray(y1h), np.asarray(y2h))
    assert np.array_equal(np.asarray(y1l), np.asarray(y2l))


def test_df64_rejects_streamed_plan():
    from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan

    rng = np.random.RandomState(6)
    r = rng.randint(0, 4096, 3000).astype(np.int64)
    c = rng.randint(0, 4096, 3000).astype(np.int64)
    plan = build_streamed_sell_plan(
        r, c, np.ones(3000, np.float32), (4096, 4096),
        chunk=64, y_block_rows=2048,
    )
    with pytest.raises(ValueError):
        SellDf64SpMV(plan)


def test_df64_edge_scales_no_nan():
    """Zero chunks and in-band extreme scales must not NaN (the
    unclamped per-chunk grids used to overflow/underflow — measured)."""
    def run(v64, cols, n=4):
        v64 = np.asarray(v64, np.float64)
        rr = np.zeros(len(v64), np.int64)
        cc = np.asarray(cols, np.int64)
        op = SellDf64SpMV.from_coo_f64(rr, cc, v64, (n, n), chunk=8)
        xh, xl = df_split(np.ones(n))
        return df_to_f64(*op(xh, xl))[0]

    assert run([0.0], [0]) == 0.0
    # scale 2^-115 sits BELOW the clamp band: degraded (documented)
    # but sane — within ~0.1% and finite.
    assert abs(run([1e-35, 2e-35], [0, 1]) - 3e-35) < 1e-37
    # in-band large scale: relative error at the sigma*2^-49 contract
    y = run([1e30, -1e30, 3.0], [0, 1, 2])
    assert np.isfinite(y) and abs(y - 3.0) < 1e30 * 2.0 ** -45
    # adversarial cancellation BELOW the contract band: the answer is
    # unrecoverable at MXU-dot accumulation (documented); finite only.
    assert np.isfinite(run([1e30, 1e-30, -1e30, 3.0], [0, 1, 2, 3]))
