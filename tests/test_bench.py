"""Benchmark harness + report writer + roofline accounting tests."""

import re

import numpy as np

from smvp_toolkit_tpu.bench.harness import TimingStats, time_fn
from smvp_toolkit_tpu.bench.report import generate_report_text, write_report
from smvp_toolkit_tpu.bench.roofline import (
    hbm_bandwidth_gbs,
    roofline_fraction,
    spmv_bytes_csr,
    spmv_bytes_tjds,
)


def test_stats_reduction():
    # Analog of the reference reduction main-cli.c:428-456.
    s = TimingStats(times_ms=np.array([1.0, 2.0, 3.0, 4.0]), iterations=4)
    assert s.total_ms == 10.0
    assert s.avg_ms == 2.5
    assert s.min_ms == 1.0
    assert s.max_ms == 4.0
    np.testing.assert_allclose(s.stdev_ms, np.std([1, 2, 3, 4]))
    assert s.nnz_per_s(1000) == 1000 / 2.5e-3
    assert s.gb_per_s(2.5e6) == 1.0


def test_time_fn_counts():
    import jax.numpy as jnp

    calls = []

    def fn():
        calls.append(1)
        return jnp.zeros(4)

    stats = time_fn(fn, iterations=5, warmup=2)
    assert stats.iterations == 5
    assert len(stats.times_ms) == 5
    assert len(calls) == 7  # warmup + timed
    assert (stats.times_ms > 0).all()


def test_time_fn_inner_amortization():
    import jax.numpy as jnp

    stats = time_fn(lambda: jnp.zeros(4), iterations=3, warmup=1, inner=4)
    assert len(stats.times_ms) == 3


def test_fused_device_loop_matches_reference_semantics():
    # N sequential SpMVs inside one program; result must equal N * (A @ x).
    import jax.numpy as jnp

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.ops import spmv_csr

    r = np.array([0, 1, 2], dtype=np.int32)
    c = np.array([1, 0, 2], dtype=np.int32)
    v = np.array([2.0, 3.0, 4.0])
    coo = COOMatrix.from_numpy(r, c, v, shape=(3, 3), pad_to=8)
    csr = csr_encode(coo)
    x = jnp.ones((3,), jnp.float32)
    stats = bench_spmv_fused(spmv_csr, csr, x, iterations=10, repeats=3)
    assert stats.iterations == 10
    assert len(stats.times_ms) == 10  # one sample per reported iteration
    assert (stats.times_ms > 0).all()


def test_report_format_matches_reference():
    # Section order per main-cli.c:294-317.
    stats = TimingStats(times_ms=np.array([0.5, 0.7]), iterations=2)
    text = generate_report_text(
        alg_name="CSR",
        input_file="./sample-data/ibm32.mtx",
        nnz=126,
        iterations=2,
        stats=stats,
        output_vector=np.array([6.0, 6.0, 8.0]),
        unix_time=1615284655,
    )
    lines = text.splitlines()
    assert lines[0].endswith("CSR algorithm")
    assert lines[1] == "Generated on 1615284655 (Unix time)"
    assert "Sparse matrix file in use:" in lines
    assert "Non-zero numbers contained in matrix: 126" in lines
    assert "Compute times for 2 iterations:" in lines
    assert "Total Time: 1.2 ms" in lines
    assert "Average Time: 0.6 ms" in lines
    assert "Fastest Time: 0.5 ms" in lines
    assert "Slowest Time: 0.7 ms" in lines
    assert any(ln.startswith("Time StDev: 0.1 ms") for ln in lines)
    i = lines.index("[")
    assert lines[i + 1 : i + 4] == ["6", "6", "8"]
    assert lines[i + 4] == "]"


def test_g_formatting():
    # %g semantics: 6 significant digits, exponent switch like C.
    stats = TimingStats(times_ms=np.array([0.0004319]), iterations=1)
    text = generate_report_text(
        alg_name="CSR",
        input_file="f",
        nnz=1,
        iterations=1,
        stats=stats,
        output_vector=np.array([1234567.0, 0.000012345]),
    )
    assert "Average Time: 0.0004319 ms" in text
    assert "1.23457e+06" in text
    assert "1.2345e-05" in text


def test_write_report_filename(tmp_path):
    stats = TimingStats(times_ms=np.array([1.0]), iterations=1)
    path = write_report(
        str(tmp_path),
        alg_name="TJDS",
        input_file="x.mtx",
        nnz=5,
        iterations=1,
        stats=stats,
        output_vector=np.zeros(2),
    )
    assert re.match(r".*smvp-toolbox_report_TJDS_\d+\.txt$", path)
    assert (tmp_path / path.split("/")[-1]).exists()


def test_extra_metrics_block():
    stats = TimingStats(times_ms=np.array([1.0]), iterations=1)
    text = generate_report_text(
        alg_name="CSR",
        input_file="f",
        nnz=1,
        iterations=1,
        stats=stats,
        output_vector=np.zeros(1),
        extra_metrics={"nnz/s": "1e9"},
    )
    assert "Device metrics:" in text
    assert "nnz/s: 1e9" in text


def test_byte_accounting():
    # CSR: nnz*(val+col+x) + rows*(ptr+y) with f32 values.
    assert spmv_bytes_csr(100, 10, 4) == 100 * 12 + 10 * 8
    assert spmv_bytes_tjds(100, 10, 5, 4) == 100 * 12 + 6 * 4 + 10 * 4


def test_roofline_positive():
    bw = hbm_bandwidth_gbs()
    assert bw > 0
    assert roofline_fraction(bw / 2) == 0.5


def test_fused_stats_match_report_semantics():
    # Total Time must be ~iterations x avg, not the repeat-sample sum.
    import jax.numpy as jnp

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.ops import spmv_csr

    r = np.array([0, 1], dtype=np.int32)
    c = np.array([0, 1], dtype=np.int32)
    coo = COOMatrix.from_numpy(r, c, np.ones(2), shape=(2, 2), pad_to=8)
    csr = csr_encode(coo)
    stats = bench_spmv_fused(
        spmv_csr, csr, jnp.ones((2,), jnp.float32), iterations=50, repeats=3
    )
    assert len(stats.times_ms) == 50
    np.testing.assert_allclose(stats.total_ms, 50 * stats.avg_ms, rtol=1e-6)


def test_bench_native_batched_and_per_launch_label(tmp_path):
    """bench_native_batched batches iterations inside the C loop and marks
    the stats per-launch; the report labels the extrema accordingly."""
    import numpy as np

    from smvp_toolkit_tpu.bench import generate_report_text
    from smvp_toolkit_tpu.bench.harness import bench_native_batched
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.spmv_native import (
        NativeCsrSpMV,
        native_spmv_available,
    )

    if not native_spmv_available():
        import pytest

        pytest.skip("libspmv.so not built")
    coo = read_mtx("/root/reference/sample-data/ibm32.mtx").pad(128)
    op = NativeCsrSpMV(csr_encode(coo))
    x = np.ones(coo.shape[1], dtype=np.float32)
    stats = bench_native_batched(op, x, iterations=64, repeats=4)
    assert stats.per_launch
    assert stats.times_ms.shape == (64,)
    assert stats.avg_ms > 0
    text = generate_report_text(
        alg_name="CSR", input_file="x.mtx", nnz=coo.nnz, iterations=64,
        stats=stats, output_vector=np.zeros(4),
    )
    assert "per-launch averages" in text


def test_fused_return_final_accumulator():
    # return_final rides validation on the timing loop's own compile:
    # acc must equal iterations * (A @ x) bit-for-bit in f32 order.
    import jax.numpy as jnp

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.ops import spmv_csr

    r = np.array([0, 1, 2, 2], dtype=np.int32)
    c = np.array([1, 0, 2, 0], dtype=np.int32)
    v = np.array([2.0, 3.0, 4.0, -1.5])
    coo = COOMatrix.from_numpy(r, c, v, shape=(3, 3), pad_to=8)
    csr = csr_encode(coo)
    x = jnp.arange(1.0, 4.0, dtype=jnp.float32)
    stats, acc = bench_spmv_fused(
        spmv_csr, csr, x, iterations=7, repeats=2, return_final=True
    )
    y = np.asarray(spmv_csr(csr, x))
    np.testing.assert_allclose(np.asarray(acc), 7 * y, rtol=1e-6)
    assert stats.iterations == 7


def test_bench_cached_tpu_record_replay(tmp_path, capsys, monkeypatch):
    # When no live TPU run is possible, the supervisor replays the last
    # persisted hardware record, tagged cached — never silently dropping
    # a real measurement for a CPU surrogate. Fallback/CPU/absent
    # records must NOT replay.
    import importlib
    import json as _json
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")

    rec_path = tmp_path / "bench_tpu_last.json"
    monkeypatch.setattr(bench, "TPU_RECORD", str(rec_path))

    assert bench._replay_cached("skipped (test)") is False  # absent

    good = {
        "metric": "memplus CSR SpMV throughput (pallas kernel, TPU v5e)",
        "value": 5000.0, "unit": "Mnnz/s", "vs_baseline": 15.4,
        "fallback": False, "measured_at": "2026-08-17T00:00:00Z",
    }
    rec_path.write_text(_json.dumps(dict(good, fallback=True)))
    assert bench._replay_cached("x") is False  # fallback record

    rec_path.write_text(_json.dumps(
        dict(good, metric="memplus CSR SpMV throughput (xla kernel, cpu)")
    ))
    assert bench._replay_cached("x") is False  # cpu record

    rec_path.write_text(_json.dumps(good))
    assert bench._replay_cached("stalled") is True
    out = capsys.readouterr().out.strip()
    replayed = _json.loads(out.splitlines()[-1])
    assert replayed["cached"] is True
    assert replayed["live_attempt"] == "stalled"
    assert replayed["value"] == 5000.0
    assert replayed["measured_at"] == "2026-08-17T00:00:00Z"


def test_bench_tpu_ladder_path_runs_on_interpreter(capsys):
    # The TPU child's minimal-compile path (bench._main_tpu) must work
    # end-to-end off-hardware too (Pallas interpreter): host-side SELL
    # planning from COO, ONE fused-loop program, accumulator-gated
    # validation, JSON emission.
    import importlib
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")

    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(96, nnz_per_row=5, bandwidth=4, seed=0)
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))
    ref_scale = np.abs(y_ref).max() + 1e-30

    rc = bench._main_tpu(coo, y_ref, ref_scale)
    out = capsys.readouterr().out.strip()
    assert rc == 0
    import json as _json

    rec = _json.loads(out.splitlines()[-1])
    assert rec["unit"] == "Mnnz/s"
    assert rec["value"] > 0
    assert "pallas" in rec["metric"]
