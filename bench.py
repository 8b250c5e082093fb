#!/usr/bin/env python
"""Headline benchmark: CSR SpMV on memplus.mtx (the largest-nnz reference
benchmark with a trustworthy golden vector).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference C toolkit's memplus CSR run — 325 Mnnz/s
(BASELINE.md: 0.387638 ms avg over 1000 iterations on a ca. 2021 CPU).

Run on whatever device JAX exposes (TPU under axon; CPU fallback works).

TPU compile budget (each remote compile costs ~90-120 s through the
tunnel): the TPU child performs exactly ONE mandatory XLA compile — the
fused timing loop. Matrix I/O, SELL planning, and plan upload are
host-side (``sell_op_coo``), x is uploaded with ``device_put`` (a
transfer, not a program), and correctness is gated on the timing loop's
own accumulator (``iterations·y``) against a numpy oracle, so no
separate validation program is ever compiled. A fallback rung
(NOWINDOW → compat) costs one more compile only if the previous rung
fails validation.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_NNZ_PER_S = 325e6  # memplus CSR, reference hardware (BASELINE.md)
MATRIX = "/root/reference/sample-data/memplus.mtx"
TPU_LOCK = "/tmp/smvp_tpu.lock"  # held (with a PID inside) by any long TPU job
# Any successful TPU headline run persists its record here. If a later
# run cannot reach the TPU live (tunnel busy or wedged), the supervisor
# replays this record — clearly tagged "cached" with its measurement
# time — instead of silently regressing the headline to a CPU fallback.
TPU_RECORD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "experiments", "results", "bench_tpu_last.json",
)

# The TPU here is reached through a network tunnel whose compile service
# can wedge (observed: compiler crash leaves the endpoint accepting TCP
# but never answering, with the hang inside a GIL-holding C call — so an
# in-process SIGALRM cannot fire). A hung benchmark is worse than a CPU
# number, so the watchdog runs OUT of process: this script supervises a
# child copy of itself. The child emits "HB <stage>" heartbeats on
# stderr before each potentially-slow step; the supervisor kills the
# child only when it has been SILENT for SMVP_BENCH_STALL seconds
# (default 420 — a legitimate remote compile is 90-120 s of silence,
# a wedged tunnel is silent forever) or when the hard cap expires.
STALL_SECS = int(os.environ.get("SMVP_BENCH_STALL", "420"))
HARD_CAP_SECS = int(os.environ.get("SMVP_BENCH_HARD_CAP", "2400"))


def _hb(stage: str) -> None:
    """Child-side heartbeat: one stderr line the supervisor watches for."""
    sys.stderr.write(f"HB {time.strftime('%H:%M:%S')} {stage}\n")
    sys.stderr.flush()


def _cached_tpu_record():
    """A previously measured (non-fallback) TPU record, or None."""
    try:
        with open(TPU_RECORD) as f:
            rec = json.load(f)
        if rec.get("fallback") or "measured_at" not in rec:
            return None
        if "cpu" in rec.get("metric", "").lower():  # defense in depth
            return None
        return rec
    except (OSError, ValueError):
        return None


def _replay_cached(reason: str) -> bool:
    """Emit the saved TPU record (tagged cached) if one exists."""
    rec = _cached_tpu_record()
    if rec is None:
        return False
    rec = dict(rec, cached=True, live_attempt=reason)
    sys.stderr.write(
        "bench.py: replaying TPU record measured at "
        f"{rec['measured_at']} (live TPU attempt: {reason})\n"
    )
    print(json.dumps(rec))
    return True


def _lock_holder_alive() -> bool:
    """True if TPU_LOCK names a live PID (another TPU job owns the tunnel)."""
    try:
        with open(TPU_LOCK) as f:
            pid = int(f.read().strip() or "0")
        if pid <= 0:
            return False
        os.kill(pid, 0)
        return True
    except PermissionError:
        # The PID exists but belongs to another user — the holder is
        # very much alive; treating this as "free" would create exactly
        # the two-owner tunnel contention the lock prevents.
        return True
    except (FileNotFoundError, ValueError, ProcessLookupError):
        return False


def _supervise() -> int:
    import signal
    import subprocess
    import threading

    # Only one process may own the TPU tunnel. If a measurement session
    # (the watcher's) holds the lock, wait for it — its compiles are
    # warming the very cache this run will hit. The watcher pipeline can
    # hold the lock for hours; if it still does after the wait cap, do
    # NOT contend (two owners can wedge the tunnel for both) — go
    # straight to the CPU fallback instead.
    waited = 0
    wait_cap = int(os.environ.get("SMVP_BENCH_LOCK_WAIT", "1800"))
    while _lock_holder_alive() and waited < wait_cap:
        if waited == 0:
            sys.stderr.write(
                "bench.py: TPU tunnel busy (another session holds "
                f"{TPU_LOCK}); waiting up to {wait_cap}s\n"
            )
        time.sleep(15)
        waited += 15
    skip_tpu = _lock_holder_alive()
    if skip_tpu:
        sys.stderr.write(
            "bench.py: tunnel still busy after wait; skipping the TPU "
            "child (no contention) and using the CPU backend\n"
        )

    def _run_watched(extra_env):
        """Run a child; kill it on heartbeat stall or hard cap."""
        env = dict(os.environ)
        env.update(extra_env)
        env["SMVP_BENCH_CHILD"] = "1"
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            start_new_session=True,  # isolate so we can kill the tree
        )
        last_progress = [time.monotonic()]
        stderr_tail = []
        stdout_chunks = []

        def _drain_err():
            for line in proc.stderr:
                last_progress[0] = time.monotonic()
                stderr_tail.append(line)
                del stderr_tail[:-40]

        def _drain_out():
            # stdout must drain concurrently too: a child that fills the
            # pipe buffer blocks in write(), stops heartbeating, and
            # would be misdiagnosed as a stall.
            for line in proc.stdout:
                stdout_chunks.append(line)

        threads = [threading.Thread(target=_drain_err, daemon=True),
                   threading.Thread(target=_drain_out, daemon=True)]
        for t in threads:
            t.start()
        t0 = time.monotonic()
        timed_out = False
        while proc.poll() is None:
            now = time.monotonic()
            if now - last_progress[0] > STALL_SECS or now - t0 > HARD_CAP_SECS:
                timed_out = True
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                break
            time.sleep(2)
        proc.wait()
        for t in threads:
            t.join(timeout=5)
        out = "" if timed_out else "".join(stdout_chunks)
        return (None if timed_out else proc.returncode, out,
                "".join(stderr_tail))

    reason = "skipped (tunnel busy)"
    if not skip_tpu:
        rc, out, err = _run_watched({})
        if rc == 0 and out.strip():
            sys.stdout.write(out)
            return 0
        reason = "made no progress (heartbeat stall)" if rc is None else (
            f"exited rc={rc}")
        sys.stderr.write(
            f"bench.py: TPU run {reason}; falling back to CPU backend\n"
        )
        if err:
            sys.stderr.write("bench.py: child stderr tail:\n" + err)
    # A real measurement from earlier this build beats a CPU surrogate.
    if _replay_cached(reason):
        return 0
    cpu_env = {
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": os.pathsep.join(
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and os.path.normpath(p) != "/root/.axon_site"
        ),
    }
    rc, out, err = _run_watched(cpu_env)
    sys.stdout.write(out)
    if rc != 0:
        sys.stderr.write("bench.py: CPU child failed:\n" + err)
    return rc if rc is not None else 1


def _emit(kernel, device, stats, coo, fallback, rungs_failed=(),
          extra=None):
    from smvp_toolkit_tpu.bench import hbm_bandwidth_gbs, spmv_bytes_csr

    nnzs = stats.nnz_per_s(coo.nnz)
    gbs = stats.gb_per_s(spmv_bytes_csr(coo.nnz, coo.shape[0]))

    # Roofline honesty: the north-star target (BASELINE.json) is the TPU
    # chip's HBM. A CPU fallback run must not print a near-1.0 fraction
    # against a nominal DRAM constant — report against the TPU target and
    # tag the record as a fallback.
    roof_gbs = 819.0 if fallback else hbm_bandwidth_gbs(device)
    roof_dev = "v5e-target" if fallback else device.device_kind
    rec = {
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
    if rungs_failed:
        # Self-describing degradation (VERDICT r3): a record produced by
        # a lower ladder rung must say which rungs failed and why, so a
        # green-looking headline can never mask a broken flagship kernel.
        rec["rungs_failed"] = list(rungs_failed)
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    if not fallback and device.platform == "tpu":
        # Persist the measurement so later runs that cannot reach the
        # TPU can replay it (tagged cached) instead of regressing.
        # Platform-gated: interpreter-mode runs of the TPU path (tests,
        # dry runs) must never masquerade as hardware records.
        try:
            os.makedirs(os.path.dirname(TPU_RECORD), exist_ok=True)
            with open(TPU_RECORD, "w") as f:
                json.dump(
                    dict(rec, measured_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                        time.gmtime())),
                    f,
                )
        except OSError:
            pass


def _main_tpu(coo, y_ref, ref_scale) -> int:
    """Minimal-compile TPU path: ONE fused-loop compile per ladder rung,
    validation riding the loop's own accumulator.

    The top rungs run the GRID-FUSED protocol (``SellSpMV.bench_loop``):
    the benchmark's N sequential SpMVs execute inside ONE Mosaic grid
    (y re-zeroed and the packed planes re-streamed from HBM every
    iteration — the reference's timed loop, main-cli.c:402-420). On
    this tunneled dev stack an XLA while-loop iteration costs ~140 µs
    regardless of body (measured, PERFORMANCE.md round-4 session 9/10)
    — a harness artifact a production TPU does not pay — so the
    grid-fused rate is the kernel's true steady-state rate. Timing is
    the least-squares slope of T(N), T(2N), T(4N) (5 fetch-synced
    samples each), which cancels dispatch and one-time costs exactly;
    validation gates the final-iteration y against a dtype-matched
    oracle.
    """
    import jax
    import numpy as np

    from smvp_toolkit_tpu.bench import bench_spmv_fused
    from smvp_toolkit_tpu.bench.harness import TimingStats
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV, sell_op_coo

    device = jax.devices()[0]
    _hb(f"device acquired: {device.device_kind}")

    # device_put is a transfer, not a compiled program — unlike jnp.ones.
    x = jax.device_put(np.ones((coo.shape[1],), dtype=np.float32))

    # bf16 oracle: the kernel rounds v (and x — exact for ones) to bf16,
    # so the gate must compare against the bf16-rounded row sums, not
    # report input rounding (~4e-3) as kernel error.
    import jax.numpy as jnp
    import ml_dtypes

    r_h, _c_h, v_h = coo.to_numpy()
    y_ref16 = np.zeros(coo.shape[0])
    np.add.at(y_ref16, r_h,
              v_h.astype(ml_dtypes.bfloat16).astype(np.float64))
    ref16_scale = np.abs(y_ref16).max() + 1e-30

    rungs_failed = []

    def _gridfused(mode, env, value_dtype, oracle, oscale,
                   op_factory=None, x_arr=None, extra_fields=None):
        """One grid-fused rung; returns True when emitted.

        ``op_factory``/``x_arr`` override the operator and input (the
        co-clustered rung runs in permuted coordinates: x scattered
        through col_map at upload, oracle gathered through row_map).
        """
        os.environ.update(env)
        try:
            _hb(f"planning SELL ({mode}, host-side)")
            if op_factory is None:
                op = SellSpMV.from_coo(coo, value_dtype=value_dtype)
            else:
                op = op_factory()
            xx_in = x if x_arr is None else x_arr
            base_n = 4000
            pts, times = [base_n, 2 * base_n, 4 * base_n], []
            y_last = None
            for n in pts:
                _hb(f"compiling+running grid-fused loop ({mode}, N={n})")
                f = jax.jit(lambda xx, _n=n: op.bench_loop(xx, _n))
                y_last = np.asarray(f(xx_in))
                samples = []
                for _ in range(5):
                    t0 = time.perf_counter_ns()
                    np.asarray(f(xx_in))
                    samples.append((time.perf_counter_ns() - t0) / 1e3)
                times.append(min(samples))
            err = np.abs(
                y_last.astype(np.float64) - oracle
            ).max() / oscale
            if err >= 1e-3:
                raise ValueError(f"validation rel err {err:.3g}")
            A = np.vstack([pts, np.ones(3)]).T
            (slope, intercept), *_ = np.linalg.lstsq(
                A, np.asarray(times), rcond=None
            )
            if slope <= 0:
                raise ValueError(
                    f"non-positive fitted slope {slope:.3g} us/iter "
                    f"(times {times})"
                )
            stats = TimingStats(
                times_ms=np.full(pts[-1], slope / 1e3),
                iterations=pts[-1], per_launch=True,
            )
            inner = getattr(op, "inner", op)  # cc wrapper or plain op
            plan_fields = {
                "chunk": int(inner.plan.chunk),
                "vmem_mb": getattr(inner, "vmem_mb", None),
                "plan_occupancy": round(
                    inner.plan.nnz / max(inner.plan.slots(), 1), 4
                ),
            }
            _emit(mode, device, stats, coo, fallback=False,
                  rungs_failed=rungs_failed,
                  extra=dict({"method": "grid-fused",
                              "value_dtype": str(np.dtype(value_dtype)),
                              "fit_points": pts,
                              "fit_times_us": [round(t, 1) for t in times],
                              "intercept_ms": round(float(intercept) / 1e3,
                                                    3),
                              "validation_err": float(err),
                              **plan_fields},
                             **(extra_fields or {})))
            return True
        except Exception as e:  # noqa: BLE001 — try the next rung
            _hb(f"{mode} failed: {type(e).__name__}: {e}; next rung")
            rungs_failed.append(
                {"mode": mode,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
            )
            return False
        finally:
            for k in env:
                os.environ.pop(k, None)

    # Top rung: co-clustered coordinates (ops/cocluster.py) — the joint
    # row x column planner lifts occupancy (the linear factor of the
    # slot-rate law) ~1.4x on memplus; the kernel runs in permuted
    # space (x scattered through col_map at upload — the SELL-C-sigma
    # preprocessing contract) and validates against the row_map-mapped
    # oracle including the padded rows staying zero.
    def _cc_factory():
        if "op" in _cc_state:
            return _cc_state["op"]
        from smvp_toolkit_tpu.ops.spmv_pallas import CoClusteredSellSpMV

        op_cc = CoClusteredSellSpMV(coo, value_dtype=jnp.bfloat16)
        res = op_cc.result
        _cc_state["op"] = op_cc
        _cc_state["res"] = res
        _cc_state["occ"] = op_cc.occupancy
        xp = np.zeros(res.shape_padded[1], dtype=np.float32)
        xp[res.col_map] = 1.0
        _cc_state["x"] = jax.device_put(xp)
        yp = np.zeros(res.shape_padded[0], dtype=np.float64)
        yp[res.row_map] = y_ref16
        _cc_state["oracle"] = yp
        return op_cc

    _cc_state = {}
    try:
        _hb("co-clustering memplus (host-side refinement)")
        _cc_factory()
        cc_ready = _cc_state.get("res") is not None
    except Exception as e:  # noqa: BLE001 — planner is optional
        _hb(f"co-clustering unavailable: {type(e).__name__}: {e}")
        cc_ready = False
    if cc_ready and _gridfused(
        "pallas-gridfused-cc-bf16", {}, jnp.bfloat16,
        _cc_state["oracle"], ref16_scale,
        op_factory=lambda: _cc_factory(),
        x_arr=_cc_state["x"],
        extra_fields={"occupancy": round(_cc_state["occ"], 4),
                      "coordinates": "coclustered"},
    ):
        return 0
    if _gridfused("pallas-gridfused-bf16", {}, jnp.bfloat16,
                  y_ref16, ref16_scale):
        return 0
    if _gridfused("pallas-gridfused", {"SMVP_SELL_REDUCE2": "1"},
                  jnp.float32, y_ref, ref_scale):
        return 0

    iterations, repeats = 200, 5
    # Fallback ladder (XLA-loop protocol — carries the ~140 µs/iter
    # harness tax): double-bf16 reduce → exact HIGHEST kernel → static
    # full-reduce (NOWINDOW) → compat one-hot. The lower rungs pin the
    # default relsl layout OFF so a broken new layout can never take
    # down the whole ladder. Each rung is exactly one remote compile;
    # failed rungs ride the emitted JSON.
    ladder = (("pallas-reduce2", {"SMVP_SELL_REDUCE2": "1",
                                  "SMVP_SELL_RELSL": "0"}),
              ("pallas", {"SMVP_SELL_RELSL": "0"}),
              ("pallas-nowindow", {"SMVP_SELL_NOWINDOW": "1",
                                   "SMVP_SELL_RELSL": "0"}),
              ("pallas-compat", {"SMVP_SELL_COMPAT": "1"}))
    for mode, env in ladder:
        os.environ.update(env)
        try:
            _hb(f"planning SELL ({mode}, host-side)")
            op = sell_op_coo(coo)
            _hb(f"compiling+running fused loop ({mode}) — expect "
                "~2 min of silence on a cold cache")
            stats, acc = bench_spmv_fused(
                lambda m, xx: op(xx), coo, x,
                iterations=iterations, repeats=repeats, return_final=True,
            )
            _hb("fused loop done; validating accumulator")
            y = np.asarray(acc).astype(np.float64) / iterations
            err = np.abs(y - y_ref).max() / ref_scale
            if err < 1e-3:
                _emit(mode, device, stats, coo, fallback=False,
                      rungs_failed=rungs_failed)
                return 0
            _hb(f"{mode} FAILED validation (rel err {err:.3g}); "
                "next ladder rung")
            rungs_failed.append(
                {"mode": mode, "error": f"validation rel err {err:.3g}"}
            )
        except Exception as e:  # noqa: BLE001 — try the next rung
            _hb(f"{mode} raised {type(e).__name__}: {e}; next ladder rung")
            rungs_failed.append(
                {"mode": mode,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
            )
        finally:
            for k in env:
                os.environ.pop(k, None)
    sys.stderr.write("bench.py: every TPU ladder rung failed\n")
    return 1


def _main_cpu(coo, y_ref, ref_scale) -> int:
    """CPU path: XLA kernel vs native C++ backend, report the faster."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smvp_toolkit_tpu.bench import bench_spmv_fused
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.ops import spmv_csr

    device = jax.devices()[0]
    csr = csr_encode(coo)
    x = jnp.ones((coo.shape[1],), dtype=jnp.float32)

    # Correctness gate before publishing a number.
    y = np.asarray(spmv_csr(csr, x)).astype(np.float64)
    err = np.abs(y - y_ref).max() / ref_scale
    assert err < 1e-3, f"CSR SpMV wrong (rel err {err})"

    stats = bench_spmv_fused(spmv_csr, csr, x, iterations=200, repeats=5)
    kernel = "xla"

    # Also try the native C++ CPU backend and report the faster.
    try:
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
                t0 = time.perf_counter_ns()
                op(xn, iterations=200)
                samples.append((time.perf_counter_ns() - t0) / 1e6 / 200)
            n_stats = TimingStats(
                times_ms=np.repeat(np.asarray(samples), 40)[:200],
                iterations=200,
            )
            if n_stats.avg_ms < stats.avg_ms:
                stats = n_stats
                kernel = f"cpu-native-{op.threads}thread"
    except Exception:
        pass

    _emit(kernel, device, stats, coo, fallback=True)
    return 0


def main() -> int:
    if os.environ.get("SMVP_BENCH_CHILD") != "1":
        return _supervise()

    # Persistent compilation cache: remote compiles cost ~2 min each in
    # this environment; cache survivors make reruns near-instant. The
    # watcher session warms this cache with the same fused-loop program
    # before the driver ever runs bench.py.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    _hb("importing jax + toolkit")
    import jax
    import numpy as np

    from smvp_toolkit_tpu.io.mtx import read_mtx

    _hb("loading matrix (host-side)")
    coo = read_mtx(MATRIX).pad(512)
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))
    ref_scale = np.abs(y_ref).max() + 1e-30

    _hb("initializing backend (TPU session setup takes ~95 s)")
    device = jax.devices()[0]
    if device.platform == "cpu":
        return _main_cpu(coo, y_ref, ref_scale)
    return _main_tpu(coo, y_ref, ref_scale)


if __name__ == "__main__":
    sys.exit(main())
