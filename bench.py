#!/usr/bin/env python
"""Headline benchmark: CSR SpMV on memplus.mtx (the largest-nnz reference
benchmark with a trustworthy golden vector).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference C toolkit's memplus CSR run — 325 Mnnz/s
(BASELINE.md: 0.387638 ms avg over 1000 iterations on a ca. 2021 CPU).

Run on whatever device JAX exposes (TPU under axon; CPU fallback works).
"""

from __future__ import annotations

import json
import os
import sys

BASELINE_NNZ_PER_S = 325e6  # memplus CSR, reference hardware (BASELINE.md)
MATRIX = "/root/reference/sample-data/memplus.mtx"

# The TPU here is reached through a network tunnel whose compile service
# can wedge (observed: compiler crash leaves the endpoint accepting TCP
# but never answering, with the hang inside a GIL-holding C call — so an
# in-process SIGALRM cannot fire). A hung benchmark is worse than a CPU
# number, so the watchdog runs OUT of process: this script supervises a
# child copy of itself and reruns it on the CPU backend if the TPU run
# makes no progress in time.
WATCHDOG_SECS = int(os.environ.get("SMVP_BENCH_WATCHDOG", "480"))


def _supervise() -> int:
    import subprocess

    def _run(extra_env, timeout):
        env = dict(os.environ)
        env.update(extra_env)
        env["SMVP_BENCH_CHILD"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                timeout=timeout,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                start_new_session=True,  # isolate so we can kill the tree
            )
            return proc.returncode, proc.stdout
        except subprocess.TimeoutExpired:
            return None, ""

    rc_out = _run({}, WATCHDOG_SECS if WATCHDOG_SECS > 0 else None)
    if rc_out[0] == 0 and rc_out[1].strip():
        sys.stdout.write(rc_out[1])
        return 0
    sys.stderr.write(
        f"bench.py: TPU run failed or made no progress in {WATCHDOG_SECS}s; "
        "falling back to CPU backend\n"
    )
    cpu_env = {
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": os.pathsep.join(
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and os.path.normpath(p) != "/root/.axon_site"
        ),
    }
    rc, out = _run(cpu_env, None)
    sys.stdout.write(out)
    return rc if rc is not None else 1


def main() -> int:
    if os.environ.get("SMVP_BENCH_CHILD") != "1":
        return _supervise()

    # Persistent compilation cache: remote compiles cost ~2 min each in
    # this environment; cache survivors make reruns near-instant.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smvp_toolkit_tpu.bench import (
        bench_spmv_fused,
        spmv_bytes_csr,
        hbm_bandwidth_gbs,
    )
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops import spmv_csr

    device = jax.devices()[0]

    coo = read_mtx(MATRIX).pad(512)
    csr = csr_encode(coo)
    x = jnp.ones((coo.shape[1],), dtype=jnp.float32)

    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))
    ref_scale = np.abs(y_ref).max() + 1e-30

    spmv_fn = spmv_csr
    kernel = "xla"
    if device.platform != "cpu":
        from smvp_toolkit_tpu.ops import spmv_pallas

        y_x = np.asarray(spmv_csr(csr, x))
        for mode, env in (("pallas", None), ("pallas-compat", "1")):
            try:
                if env is not None:
                    os.environ["SMVP_SELL_COMPAT"] = env
                # Validate before trusting.
                y_p = np.asarray(spmv_pallas.spmv_csr_pallas(csr, x))
                if np.allclose(y_p, y_x, rtol=1e-3, atol=1e-4):
                    spmv_fn = spmv_pallas.spmv_csr_pallas
                    kernel = mode
                    break
            except Exception:
                continue
            finally:
                if env is not None and kernel != mode:
                    os.environ.pop("SMVP_SELL_COMPAT", None)

    # Correctness gate before publishing a number.
    y = np.asarray(spmv_fn(csr, x)).astype(np.float64)
    err = np.abs(y - y_ref).max() / ref_scale
    assert err < 1e-3, f"CSR SpMV wrong (rel err {err})"

    # Device-loop timing: N sequential SpMVs inside one program, the
    # honest analog of the reference's timed loop (main-cli.c:402-420)
    # without paying a host->device dispatch per iteration.
    stats = bench_spmv_fused(spmv_fn, csr, x, iterations=200, repeats=5)

    if device.platform == "cpu":
        # No TPU attached: also try the native C++ CPU backend
        # (single-threaded, like the reference) and report the faster.
        try:
            import time as _t

            from smvp_toolkit_tpu.bench.harness import TimingStats
            from smvp_toolkit_tpu.ops.spmv_native import NativeCsrSpMV

            xn = np.asarray(x)
            for threads in (1, os.cpu_count() or 1):
                op = NativeCsrSpMV(csr, threads=threads)
                y_n = op(xn).astype(np.float64)
                n_err = np.abs(y_n - y_ref).max() / ref_scale
                if n_err >= 1e-3:
                    continue
                op(xn, iterations=20)  # warm
                samples = []
                for _ in range(5):
                    t0 = _t.perf_counter_ns()
                    op(xn, iterations=200)
                    samples.append((_t.perf_counter_ns() - t0) / 1e6 / 200)
                n_stats = TimingStats(
                    times_ms=np.repeat(np.asarray(samples), 40)[:200],
                    iterations=200,
                )
                if n_stats.avg_ms < stats.avg_ms:
                    stats = n_stats
                    kernel = f"cpu-native-{op.threads}thread"
        except Exception:
            pass

    nnzs = stats.nnz_per_s(coo.nnz)
    gbs = stats.gb_per_s(spmv_bytes_csr(coo.nnz, coo.shape[0]))

    # Roofline honesty: the north-star target (BASELINE.json) is the TPU
    # chip's HBM. A CPU fallback run must not print a near-1.0 fraction
    # against a nominal DRAM constant — report against the TPU target and
    # tag the record as a fallback.
    fallback = device.platform == "cpu"
    roof_gbs = 819.0 if fallback else hbm_bandwidth_gbs(device)
    roof_dev = "v5e-target" if fallback else device.device_kind

    print(
        json.dumps(
            {
                "metric": f"memplus CSR SpMV throughput ({kernel} kernel, "
                f"{device.device_kind})",
                "value": round(nnzs / 1e6, 1),
                "unit": "Mnnz/s",
                "vs_baseline": round(nnzs / BASELINE_NNZ_PER_S, 3),
                "avg_ms": round(stats.avg_ms, 6),
                "eff_gb_s": round(gbs, 2),
                "roofline_frac": round(gbs / roof_gbs, 4),
                "roofline_device": roof_dev,
                "fallback": fallback,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
