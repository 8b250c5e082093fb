#!/usr/bin/env python
"""Full benchmark suite: every sample matrix x {CSR, TJDS} x {xla, pallas}
plus the synthetic 10M-nnz scaling input (BASELINE.json configs).

Emits one JSON line per (matrix, algorithm, kernel) with timing and
roofline metrics; mirrors the reference's benchmark campaign
(output-test/ reports) with the TPU metrics the reference lacks.

Usage: python benchmarks/run_all.py [--quick] [--out results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLES = {
    "ibm32": "/root/reference/sample-data/ibm32.mtx",
    "curtis54": "/root/reference/sample-data/curtis54.mtx",
    "pdp08-pg4": "/root/reference/sample-data/pdp08-pg4.mtx",
    "memplus": "/root/reference/sample-data/memplus.mtx",
    "pwt": "/root/reference/sample-data/pwt.mtx",
}

# Reference avg iteration times (ms) from BASELINE.md (1000-iter runs).
REFERENCE_MS = {
    ("ibm32", "CSR"): 0.0004319,
    ("ibm32", "TJDS"): 0.0007779,
    ("curtis54", "CSR"): 0.0009249,
    ("curtis54", "TJDS"): 0.0014113,
    ("memplus", "CSR"): 0.387638,
    ("memplus", "TJDS"): 0.549908,
    ("pwt", "CSR"): 0.569281,
    ("pwt", "TJDS"): 1.1823,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small iteration counts")
    ap.add_argument("--out", default=None, help="also append JSONL here")
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--kernels", default="xla,pallas")
    ap.add_argument(
        "--matrices",
        default=None,
        help="comma-separated subset of sample matrices (default: all)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from smvp_toolkit_tpu.bench import (
        bench_spmv_fused,
        hbm_bandwidth_gbs,
        spmv_bytes_csr,
        spmv_bytes_tjds,
    )
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.formats.tjds import tjds_encode
    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops import spmv_csr, spmv_tjds
    from smvp_toolkit_tpu.ops.spmv_pallas import spmv_csr_pallas, spmv_tjds_pallas
    from smvp_toolkit_tpu.utils.synth import synth_banded

    device = jax.devices()[0]
    iters = 50 if args.quick else 200
    kernels = args.kernels.split(",")
    if device.platform == "cpu" and "pallas" in kernels and args.kernels == "xla,pallas":
        # Default kernel list on CPU: the Pallas interpreter is orders of
        # magnitude slower than compiled mode — only run it when asked.
        kernels = ["xla"]
    results = []

    def record(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        results.append(rec)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")

    wanted = args.matrices.split(",") if args.matrices else list(SAMPLES)
    matrices = {}
    for name, path in SAMPLES.items():
        if name in wanted:
            matrices[name] = read_mtx(path).pad(512)
    if not args.skip_synth:
        matrices["synth-10M"] = synth_banded(
            1_000_000, nnz_per_row=10, bandwidth=256, seed=0
        ).pad(512)
        # goodwin.mtx (7320^2, 324784 nnz, strongly nonuniform rows) is
        # stripped from the reference snapshot (.MISSING_LARGE_BLOBS);
        # a power-law surrogate at its shape stands in for the
        # BASELINE.json "jagged-diagonal pack with nonuniform row
        # lengths" config. NOT comparable to the reference's goodwin
        # timings — no vs_reference is emitted for it.
        from smvp_toolkit_tpu.utils.synth import synth_powerlaw

        matrices["goodwin-surrogate"] = synth_powerlaw(
            7320, nnz=324784, alpha=1.2, seed=3
        ).pad(512)

    import time as _time

    from smvp_toolkit_tpu.formats.csr import csr_decode
    from smvp_toolkit_tpu.formats.tjds import tjds_decode

    def sell_plan_of(fn, enc):
        """The cached SELL plan behind a pallas wrapper (None if absent)."""
        from smvp_toolkit_tpu.ops.spmv_pallas import _CACHE

        hit = _CACHE.get(id(enc))
        return hit[1].plan if hit is not None else None

    def sell_op_of(enc):
        """The cached SELL operator behind a pallas wrapper."""
        from smvp_toolkit_tpu.ops.spmv_pallas import _CACHE

        hit = _CACHE.get(id(enc))
        return hit[1] if hit is not None else None

    def gridfused_ms(enc, x, nnz):
        """Grid-fused per-iteration ms on TPU (None off-TPU/unsupported).

        The slope over iteration counts is the honest per-iteration
        rate: per-CALL wall times carry the stack's dispatch floor
        (~25 ms on the current runtime — divided by the iteration
        count it masquerades as a per-iteration cost; PERFORMANCE.md
        round-5 session 2), which the slope cancels exactly."""
        if device.platform != "tpu":
            return None
        op = sell_op_of(enc)
        if op is None:
            return None
        return gridfused_ms_op(op, x, nnz)

    def gridfused_ms_op(op, x, nnz):
        """3-point slope fit with a linearity (bend) gate — the 2-point
        difference emitted garbage under chip contention (measured:
        a 0.0 ms delta on synth-10M printing 2e12 Gnnz/s)."""
        base_n = max(200, min(4000, int(2e8 / max(nnz, 1))))
        try:
            pts = [base_n, 2 * base_n, 4 * base_n]
            times = []
            for n in pts:
                f = jax.jit(lambda xx, _n=n: op.bench_loop(xx, _n))
                np.asarray(f(x))
                samples = []
                for _ in range(3):
                    t0 = _time.perf_counter_ns()
                    np.asarray(f(x))
                    samples.append((_time.perf_counter_ns() - t0) / 1e6)
                times.append(min(samples))
            A = np.vstack([pts, np.ones(3)]).T
            (slope, intercept), *_ = np.linalg.lstsq(
                A, np.asarray(times), rcond=None
            )
            if slope <= 0:
                return None
            bend = (times[1] - (slope * pts[1] + intercept)) / max(
                times[1], 1e-9
            )
            if abs(bend) > 0.15:
                return None  # contention-bent fit — don't publish
            return float(slope)
        except Exception:
            return None

    for name, coo in matrices.items():
        x = jnp.ones((coo.shape[1],), jnp.float32)
        r, c, v = coo.to_numpy()
        y_ref = np.zeros(coo.shape[0])
        np.add.at(y_ref, r, v.astype(np.float64))
        scale = np.abs(y_ref).max() + 1e-30

        # Encode throughput + decode bit-exactness (BASELINE.json metric:
        # "encode MB/s; decode bit-exactness").
        coo_bytes = coo.nnz * 12  # 2 x int32 + f32 per entry
        for alg, enc_fn, dec_fn in [
            ("CSR", csr_encode, csr_decode),
            ("TJDS", tjds_encode, tjds_decode),
        ]:
            try:
                jax.block_until_ready(jax.tree_util.tree_leaves(enc_fn(coo)))
                t0 = _time.perf_counter()
                reps = 3
                for _ in range(reps):
                    enc = enc_fn(coo)
                    jax.block_until_ready(jax.tree_util.tree_leaves(enc))
                dt = (_time.perf_counter() - t0) / reps
                dec = dec_fn(enc).canonical_order()
                canon = coo.canonical_order()
                dr, dc, dv = dec.to_numpy()
                cr, cc, cv = canon.to_numpy()
                exact = bool(
                    np.array_equal(dr, cr)
                    and np.array_equal(dc, cc)
                    and np.array_equal(
                        np.asarray(dv).view(np.uint32),
                        np.asarray(cv).view(np.uint32),
                    )
                )
                record({
                    "matrix": name,
                    "alg": alg,
                    "op": "encode+decode",
                    "encode_ms": round(dt * 1e3, 3),
                    "encode_mb_s": round(coo_bytes / dt / 1e6, 1),
                    "decode_bit_exact": exact,
                })
            except Exception as e:  # pragma: no cover
                record({"matrix": name, "alg": alg, "op": "encode",
                        "error": str(e)[:200]})

        # CISR: schedule encode + the schedule-consuming SpMV kernel
        # (capability the reference never implemented; skip the 10M synth
        # where the beat-count explodes the schedule).
        if name != "synth-10M":
            try:
                from smvp_toolkit_tpu.formats.cisr import (
                    cisr_decode,
                    cisr_encode,
                )
                from smvp_toolkit_tpu.ops import spmv_cisr

                t0 = _time.perf_counter()
                cisr = cisr_encode(coo, slot_count=16)
                dt = _time.perf_counter() - t0
                dec = cisr_decode(cisr).canonical_order()
                dr, dc, dv = dec.to_numpy()
                cr, cc, cv = coo.canonical_order().to_numpy()
                exact = bool(
                    np.array_equal(dr, cr) and np.array_equal(dc, cc)
                )
                y = np.asarray(spmv_cisr(cisr, x)).astype(np.float64)
                err = float(np.abs(y - y_ref).max() / scale)
                stats = bench_spmv_fused(
                    spmv_cisr, cisr, x, iterations=iters, repeats=3
                )
                record({
                    "matrix": name, "alg": "CISR", "kernel": "xla",
                    "nnz": coo.nnz, "encode_ms": round(dt * 1e3, 3),
                    "decode_index_exact": exact,
                    "avg_ms": round(stats.avg_ms, 6),
                    "gnnz_per_s": round(
                        stats.nnz_per_s(coo.nnz) / 1e9, 3
                    ),
                    "rel_err": err,
                    "device": device.device_kind,
                })
            except Exception as e:  # pragma: no cover
                record({"matrix": name, "alg": "CISR", "op": "bench",
                        "error": str(e)[:200]})

            # CISR performance path: the schedule replanned into the
            # SELL layout (spmv_cisr_pallas) — the interleaving exists
            # to feed parallel lanes (reference scheduler
            # main-cli.c:542-612) and this is the TPU way to compute
            # with it. The schedule-faithful row above stays as the
            # capability/debug surface.
            if "pallas" in kernels:
                try:
                    from smvp_toolkit_tpu.ops.spmv_pallas import (
                        spmv_cisr_pallas,
                    )

                    y = np.asarray(
                        spmv_cisr_pallas(cisr, x)
                    ).astype(np.float64)
                    err = float(np.abs(y - y_ref).max() / scale)
                    if err > 1e-3:
                        raise ValueError(f"wrong result ({err:.2e})")
                    stats = bench_spmv_fused(
                        spmv_cisr_pallas, cisr, x,
                        iterations=iters, repeats=3,
                    )
                    rec = {
                        "matrix": name, "alg": "CISR",
                        "kernel": "pallas",
                        "nnz": coo.nnz,
                        "avg_ms": round(stats.avg_ms, 6),
                        "gnnz_per_s": round(
                            stats.nnz_per_s(coo.nnz) / 1e9, 3
                        ),
                        "rel_err": err,
                        "device": device.device_kind,
                    }
                    gf_ms = gridfused_ms(cisr, x, coo.nnz)
                    if gf_ms is not None:
                        rec["gridfused_avg_ms"] = round(gf_ms, 6)
                        rec["gridfused_gnnz_per_s"] = round(
                            coo.nnz / gf_ms / 1e6, 3
                        )
                    record(rec)
                except Exception as e:  # pragma: no cover
                    record({"matrix": name, "alg": "CISR",
                            "kernel": "pallas",
                            "error": str(e)[:200]})

        # SELL plan throughput (the Pallas performance path's encode;
        # BASELINE.json "encode MB/s" applies to it too — the C++ planner
        # pass makes the 10M-nnz config tractable).
        try:
            from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

            t0 = _time.perf_counter()
            plan = build_sell_plan(r, c, v, coo.shape)
            dt = _time.perf_counter() - t0
            record({
                "matrix": name,
                "alg": "SELL",
                "op": "plan",
                "encode_ms": round(dt * 1e3, 3),
                "encode_mb_s": round(coo_bytes / dt / 1e6, 1),
                "sublanes": plan.n_sublanes,
                "window_tiles": plan.window_tiles,
            })
        except Exception as e:  # pragma: no cover
            record({"matrix": name, "alg": "SELL", "op": "plan",
                    "error": str(e)[:200]})

        encs = {
            "CSR": (csr_encode(coo), spmv_csr, spmv_csr_pallas,
                    spmv_bytes_csr(coo.nnz, coo.shape[0])),
        }
        if name != "synth-10M":
            tj = tjds_encode(coo)
            encs["TJDS"] = (tj, spmv_tjds, spmv_tjds_pallas,
                            spmv_bytes_tjds(coo.nnz, coo.shape[0],
                                            int(tj.num_diags)))

        for alg, (enc, fn_xla, fn_pal, bytes_per) in encs.items():
            for kernel in kernels:
                if kernel == "native":
                    try:
                        from smvp_toolkit_tpu.ops.spmv_native import (
                            NativeCsrSpMV,
                            NativeTjdsSpMV,
                            native_spmv_available,
                        )
                    except ImportError:
                        continue
                    if not native_spmv_available():
                        continue
                    op = (NativeCsrSpMV if alg == "CSR" else NativeTjdsSpMV)(enc)
                    xn = np.ones(coo.shape[1], dtype=np.float32)
                    y = op(xn).astype(np.float64)
                    err = float(np.abs(y - y_ref).max() / scale)
                    if err > 1e-3:
                        record({"matrix": name, "alg": alg, "kernel": kernel,
                                "error": f"wrong result ({err:.2e})"})
                        continue
                    import time as _t2

                    op(xn, iterations=20)
                    t0 = _t2.perf_counter()
                    op(xn, iterations=iters)
                    dt_ms = (_t2.perf_counter() - t0) / iters * 1e3
                    nnzs = coo.nnz / (dt_ms * 1e-3)
                    rec = {
                        "matrix": name, "alg": alg,
                        "kernel": f"native-{op.threads}t",
                        "nnz": coo.nnz, "avg_ms": round(dt_ms, 6),
                        "gnnz_per_s": round(nnzs / 1e9, 3),
                        "rel_err": err, "device": "cpu-native",
                    }
                    ref_ms = REFERENCE_MS.get((name, alg))
                    if ref_ms:
                        rec["vs_reference"] = round(ref_ms / dt_ms, 2)
                    record(rec)
                    continue
                fn = fn_xla if kernel == "xla" else fn_pal
                try:
                    y = np.asarray(fn(enc, x)).astype(np.float64)
                    err = float(np.abs(y - y_ref).max() / scale)
                    if err > 1e-3:
                        record({"matrix": name, "alg": alg, "kernel": kernel,
                                "error": f"wrong result (rel err {err:.2e})"})
                        continue
                    stats = bench_spmv_fused(
                        fn, enc, x, iterations=iters, repeats=3
                    )
                    nnzs = stats.nnz_per_s(coo.nnz)
                    gbs = stats.gb_per_s(bytes_per)
                    rec = {
                        "matrix": name,
                        "alg": alg,
                        "kernel": kernel,
                        "nnz": coo.nnz,
                        "avg_ms": round(stats.avg_ms, 6),
                        "gnnz_per_s": round(nnzs / 1e9, 3),
                        "eff_gb_s": round(gbs, 2),
                        "roofline_frac": round(
                            gbs / hbm_bandwidth_gbs(device), 5
                        ),
                        "rel_err": err,
                        "device": device.device_kind,
                    }
                    if kernel == "pallas":
                        # Honest roofline for the SELL kernel: padding
                        # slots move real bytes, so the achieved-GB/s
                        # against actual plan traffic is what compares to
                        # the HBM speed of light.
                        plan = sell_plan_of(fn, enc)
                        if plan is not None:
                            actual = plan.traffic_bytes()
                            agbs = stats.gb_per_s(actual)
                            rec["sell_occupancy"] = round(
                                coo.nnz / plan.slots(), 4
                            )
                            rec["sell_gb_s"] = round(agbs, 2)
                            rec["sell_roofline_frac"] = round(
                                agbs / hbm_bandwidth_gbs(device), 5
                            )
                        gf_ms = gridfused_ms(enc, x, coo.nnz)
                        if gf_ms is not None:
                            rec["gridfused_avg_ms"] = round(gf_ms, 6)
                            rec["gridfused_gnnz_per_s"] = round(
                                coo.nnz / gf_ms / 1e6, 3
                            )
                            if ref_ms := REFERENCE_MS.get((name, alg)):
                                rec["gridfused_vs_reference"] = round(
                                    ref_ms / gf_ms, 2
                                )
                    ref_ms = REFERENCE_MS.get((name, alg))
                    if ref_ms:
                        rec["vs_reference"] = round(ref_ms / stats.avg_ms, 2)
                    record(rec)
                except Exception as e:  # pragma: no cover
                    record({"matrix": name, "alg": alg, "kernel": kernel,
                            "error": str(e)[:200]})

        # Co-clustered coordinates row (ops/cocluster.py): the joint
        # row x column planner's occupancy gain on the grid-fused
        # protocol, in permuted space (x scattered through col_map at
        # upload — the SELL-C-sigma preprocessing contract). Large
        # matrices only: the small samples are launch-bound.
        if "pallas" in kernels and name in ("memplus", "pwt",
                                            "synth-10M",
                                            "goodwin-surrogate"):
            try:
                from smvp_toolkit_tpu.ops.spmv_pallas import (
                    CoClusteredSellSpMV,
                )

                import ml_dtypes

                t0 = _time.perf_counter()
                # bf16 value mode: the bench.py headline's shipped
                # default — one consistent benchmark surface.
                op_cc = CoClusteredSellSpMV(
                    coo, value_dtype=jnp.bfloat16
                )
                cc_plan_s = _time.perf_counter() - t0
                res = op_cc.result
                xp = np.zeros(res.shape_padded[1], dtype=np.float32)
                xp[res.col_map] = np.ones(coo.shape[1], np.float32)
                xp = jnp.asarray(xp)
                y_ref16 = np.zeros(coo.shape[0])
                np.add.at(
                    y_ref16, r,
                    v.astype(ml_dtypes.bfloat16).astype(np.float64),
                )
                scale16 = np.abs(y_ref16).max() + 1e-30
                yp = np.asarray(op_cc.inner(xp)).astype(np.float64)
                err = float(
                    np.abs(yp[res.row_map] - y_ref16).max() / scale16
                )
                if err > 1e-3:
                    raise ValueError(f"wrong result ({err:.2e})")
                stats = bench_spmv_fused(
                    lambda _m, xx: op_cc.inner(xx), coo, xp,
                    iterations=iters, repeats=3,
                )
                plan = op_cc.inner.plan
                nnzs = stats.nnz_per_s(coo.nnz)
                gbs = stats.gb_per_s(spmv_bytes_csr(coo.nnz,
                                                    coo.shape[0]))
                agbs = stats.gb_per_s(plan.traffic_bytes())
                rec = {
                    "matrix": name, "alg": "CSR",
                    "kernel": "pallas-cocluster",
                    "nnz": coo.nnz,
                    "avg_ms": round(stats.avg_ms, 6),
                    "gnnz_per_s": round(nnzs / 1e9, 3),
                    "eff_gb_s": round(gbs, 2),
                    "roofline_frac": round(
                        gbs / hbm_bandwidth_gbs(device), 5
                    ),
                    "sell_occupancy": round(
                        coo.nnz / plan.slots(), 4
                    ),
                    "sell_gb_s": round(agbs, 2),
                    "sell_roofline_frac": round(
                        agbs / hbm_bandwidth_gbs(device), 5
                    ),
                    "chunk": int(plan.chunk),
                    "cocluster_plan_s": round(cc_plan_s, 1),
                    "rel_err": err,
                    "device": device.device_kind,
                }
                if device.platform == "tpu":
                    gf_ms = gridfused_ms_op(op_cc.inner, xp, coo.nnz)
                    if gf_ms is not None:
                        rec["gridfused_avg_ms"] = round(gf_ms, 6)
                        rec["gridfused_gnnz_per_s"] = round(
                            coo.nnz / gf_ms / 1e6, 3
                        )
                        if ref_ms := REFERENCE_MS.get((name, "CSR")):
                            rec["gridfused_vs_reference"] = round(
                                ref_ms / gf_ms, 2
                            )
                record(rec)
            except Exception as e:  # pragma: no cover
                record({"matrix": name, "alg": "CSR",
                        "kernel": "pallas-cocluster",
                        "error": str(e)[:200]})

        # Data-parallel row (BASELINE.json: "memplus row-block sharded",
        # "pwt + synth multi-host DP") whenever >1 device is visible
        # (real chips, or the CPU-simulated mesh in CI).
        n_dev = len(jax.devices())
        if n_dev > 1 and name in ("memplus", "pwt", "synth-10M"):
            try:
                from smvp_toolkit_tpu.parallel import shard_and_bench

                stats, y = shard_and_bench(
                    "CSR", encs["CSR"][0], x, n_dev, iterations=iters
                )
                err = float(
                    np.abs(np.asarray(y, dtype=np.float64) - y_ref).max()
                    / scale
                )
                record({
                    "matrix": name, "alg": "CSR",
                    "kernel": f"xla-sharded-{n_dev}dev",
                    "nnz": coo.nnz,
                    "avg_ms": round(stats.avg_ms, 6),
                    "gnnz_per_s": round(
                        stats.nnz_per_s(coo.nnz) / 1e9, 3
                    ),
                    "rel_err": err,
                    "device": device.device_kind,
                })
            except Exception as e:  # pragma: no cover
                record({"matrix": name, "alg": "CSR", "kernel": "sharded",
                        "error": str(e)[:200]})
    return 0


if __name__ == "__main__":
    sys.exit(main())
