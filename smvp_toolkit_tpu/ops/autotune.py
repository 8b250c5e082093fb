"""SELL plan auto-tuning: pick the chunk size by a calibrated cost model.

The execution cost of the SELL-T1 kernel decomposes into measurable
terms (PERFORMANCE.md "Realistic roofline"):

* HBM traffic    — ``plan.traffic_bytes()`` / bandwidth,
* table matmul   — S x WT x 128 MACs (per precision pass count),
* reduce matmul  — NS x S x 128 MACs (chunk-invariant),
* lane shuffle   — S x 128 elements.

Smaller chunks tighten the per-chunk tile window (fewer table MACs) but
add grid steps; the sweet spot is matrix-dependent (the auto-tuning
idea of run-time data-transformation selection, arXiv:2407.00019,
re-cast for this kernel's cost structure). ``RATES`` carries the chip
constants — the defaults are the round-1 v5e microbenchmarks
(PERFORMANCE.md "Primitive microbenchmarks") and are meant to be
recalibrated from hardware sessions.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np

from smvp_toolkit_tpu.ops.sell_plan import LANES, SellPlan, build_sell_plan

__all__ = ["RATES", "production_rates", "plan_cost_us", "pick_plan",
           "calibrate_rates", "check_pick_plan"]

# v5e defaults — recalibrate from tpu_r2_session output. The MXU rate
# is a *throughput* figure (pipelined in-kernel matmuls): the round-1
# standalone micro (28 MMAC/us for one small matmul) was latency-bound
# and under-predicts the in-kernel rate by ~3 orders (the v1 kernel's
# measured 241 us on memplus implies >= 7e6 MAC/us at 6 passes; v5e
# peak is ~98e6 MAC/us bf16 — assume ~40% sustained for skinny one-hot
# shapes until a hardware session calibrates it).
#
# CAVEAT (round 4, sessions 9-13): the round-4 calibration
# (experiments/results/autotune_rates.json) was fit to XLA-loop-protocol
# records, which carry a ~140 µs/ITERATION harness tax on the tunneled
# dev stack (PERFORMANCE.md) — its absolute terms are inflated, though
# the chunk ORDERING it predicted matched the loop-protocol sweeps.
# The HONEST calibration (experiments/calibrate_gridfused.py, fit to 14
# clean grid-fused cells incl. the session-24 chunk-up sweep) SHIPS IN
# THE PACKAGE as ops/autotune_rates.json and is the round-5 production
# default (spmv_pallas._tuned_plan): per-matrix chunk + VMEM with no
# env knobs. Verdicts vs measured sweeps: memplus c8192 MATCH, synth-10M
# c2048 MATCH, synth-dense c2048 MATCH; pwt picks c1024 (8% from the
# measured best c2048 — inside the chip's contention spread).
# SMVP_SELL_AUTOTUNE=0 pins the old fixed c2048 behavior.
RATES = {
    "hbm_gb_s": 819.0,          # HBM speed of light
    "mxu_mac_us": 4.0e7,        # sustained MXU MAC/us per DEFAULT pass
    "shuffle_gel_s": 150.0,     # take_along_axis lane shuffle
    "grid_step_us": 0.5,        # per-grid-step overhead
}

_PASSES = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}

_PRODUCTION_RATES = None


def production_rates() -> dict:
    """The shipped hardware calibration (autotune_rates.json).

    Fit to the 11 clean grid-fused v5e cells of the round-4 hardware
    campaign (experiments/calibrate_gridfused.py); falls back to the
    RATES defaults when the data file is missing. This is what the
    production operator path (spmv_pallas._cached_op / from_coo) uses —
    per-matrix chunk/VMEM selection with no env knobs.
    """
    global _PRODUCTION_RATES
    if _PRODUCTION_RATES is None:
        import json
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "autotune_rates.json",
        )
        rates = dict(RATES)
        try:
            with open(path) as f:
                data = json.load(f)
            rates.update(
                {k: v for k, v in data.items() if k in RATES}
            )
        except (OSError, ValueError):  # pragma: no cover
            pass
        _PRODUCTION_RATES = rates
    return _PRODUCTION_RATES


# Chunks past this need a raised Mosaic VMEM budget: the c8192 remote
# compile fails at the default budget and compiles at 100 MB, while
# c4096 compiles at the default (PERFORMANCE.md sessions 23/24 —
# memplus c8192+VMEM measured 15.0 vs 13.7 Gnnz/s at c2048).
_VMEM_CHUNK_THRESHOLD = 4096
_VMEM_MB = 100


def pick_vmem_mb(chunk: int) -> Optional[int]:
    return _VMEM_MB if chunk > _VMEM_CHUNK_THRESHOLD else None


def plan_cost_us(
    plan: SellPlan,
    value_dtype_bytes: int = 4,
    *,
    table_passes: int = 6,
    reduce_passes: int = 6,
    rates: Optional[dict] = None,
) -> float:
    """Modelled single-launch kernel time in microseconds."""
    r = dict(RATES)
    if rates:
        r.update(rates)
    s = plan.n_sublanes
    traffic = plan.traffic_bytes(
        value_dtype_bytes, None, value_dtype_bytes
    )
    t_hbm = traffic / (r["hbm_gb_s"] * 1e3)  # bytes / (GB/s) -> us
    t_table = (
        s * plan.window_tiles * LANES * table_passes / r["mxu_mac_us"]
    )
    t_reduce = (  # windowed reduce contracts NSW, not NS (v6)
        plan.reduce_window()[1] * s * LANES * reduce_passes
        / r["mxu_mac_us"]
    )
    t_shuffle = s * LANES / (r["shuffle_gel_s"] * 1e3)
    t_grid = plan.n_chunks * r["grid_step_us"]
    return float(
        max(t_hbm, t_table + t_reduce + t_shuffle) + t_grid
    )


def pick_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    *,
    chunks: Iterable[int] = (512, 1024, 2048, 4096, 8192),
    value_dtype_bytes: int = 4,
    bf16: bool = False,
    rates: Optional[dict] = None,
) -> Tuple[SellPlan, float]:
    """Build candidate plans across chunk sizes, return (best, cost_us).

    bf16 value mode runs a single-pass table matmul and a 3-pass reduce
    (ops/spmv_pallas.py precision rules); f32 runs 6-pass both. The
    candidate set covers the measured production sweet spots (memplus
    wants c8192+VMEM, pwt c2048 — PERFORMANCE.md session 24); pair the
    winner with :func:`pick_vmem_mb` for the operator's VMEM budget.
    """
    table_p = 1 if bf16 else 6
    reduce_p = 3 if bf16 else 6
    vb = 2 if bf16 else value_dtype_bytes
    # Outputs too large for VMEM must take the streamed-y (v7) plan
    # regardless of the tuned chunk — the flat plan cannot run.
    from smvp_toolkit_tpu.ops.spmv_pallas import _auto_plan

    from smvp_toolkit_tpu.ops.spmv_pallas import _split_policy

    # Chain-split win (round-5 session 1, measured): split-compatible
    # chunks run ~0.78x the unsplit step time (c2048+split4 beats the
    # former single-chunk picks on every benchmark matrix).
    split_factor = {1: 1.0, 4: 0.78}

    cands = []
    for chunk in sorted(chunks):
        plan = _auto_plan(rows, cols, vals, shape, chunk=chunk)
        split = _split_policy(plan.chunk, 1)
        cost = plan_cost_us(
            plan, vb, table_passes=table_p, reduce_passes=reduce_p,
            rates=rates,
        ) * split_factor.get(split, 1.0)
        cands.append((plan, cost, split))
        if plan.chunk < chunk:
            # Small matrix: the planner shrank the chunk to the true
            # sublane count — every larger candidate yields the same
            # plan, so stop here (keeps construction cheap for the
            # small-matrix-heavy paths, e.g. the test suite).
            break
    # Measured preference (round-5 cells): within the cost model's
    # noise band, split-compatible chunks win on hardware (the model
    # over-prices pwt-class wide-window c2048 by ~30% while the
    # measured c2048+split cells beat the single-chunk picks 1.5x+).
    best_cost = min(c for _p, c, _s in cands)
    near = [t for t in cands if t[1] <= 1.2 * best_cost]
    plan, cost, _split = min(near, key=lambda t: (-t[2], t[1]))
    return plan, cost


def _passes(rec: dict) -> Tuple[int, int]:
    """(table_passes, reduce_passes) implied by a session record's flags.

    Mirrors the precision rules in ops/spmv_pallas.py: bf16 value mode
    runs a single-pass table matmul; the reduce is 3-pass (HIGH) for
    bf16 and f32-HIGH, 6-pass (HIGHEST) for plain f32. The double-bf16
    reduce2 ladder replaces BOTH matmuls with 2 single-pass bf16
    matmuls each (_table_select/_seg_reduce take the reduce2 branch
    before consulting ``precision``); in bf16 value mode the table
    select stays single-pass (x is already bf16 — no hi/lo split).
    """
    # "HIGHEST" contains "HIGH" as a substring — classify it as the
    # 6-pass default, not the 3-pass HIGH mode.
    prec = str(rec.get("precision") or "")
    high = "HIGH" in prec and "HIGHEST" not in prec
    if rec.get("bf16"):
        table = 1
    elif rec.get("reduce2"):
        table = 2
    else:
        table = 3 if high else 6
    if rec.get("reduce2"):
        reduce = 2
    else:
        reduce = 3 if (rec.get("bf16") or high) else 6
    return table, reduce


def _cost_terms(rec: dict) -> Tuple[float, float, float, float]:
    """(total MACs, shuffle elements, grid steps, traffic bytes)."""
    tp, rp = _passes(rec)
    macs = rec["S"] * rec["WT"] * LANES * tp + rec["NSW"] * rec["S"] * (
        LANES * rp
    )
    return (float(macs), float(rec["S"] * LANES),
            float(rec["n_chunks"]), float(rec["traffic_bytes"]))


def _usable(records: Iterable[dict]) -> list:
    return [
        r for r in records
        if r.get("avg_us") and r.get("err", 1.0) < 1e-2
        and not r.get("env_compat") and not r.get("env_nowindow")
        # only plain SpMV stages carry the plan geometry the cost terms
        # need — grad/spmm records (kind != None) have no "S"/"WT"
        and "S" in r and "WT" in r
    ]


def calibrate_rates(records: Iterable[dict]) -> dict:
    """Fit RATES from measured session records (tpu_r3_session.py JSONL).

    Fits the additive compute model t = a·MACs + b·shuffle + c·chunks +
    d·traffic by non-negative least squares (the measured matrices are
    low-occupancy — compute-dominated — so the max(hbm, compute) roof is
    approximated as a sum; terms the data can't identify keep their
    default RATES). Returns a full rates dict usable by pick_plan.
    """
    recs = _usable(records)
    out = dict(RATES)
    if len(recs) < 3:
        return out
    A = np.array([_cost_terms(r) for r in recs])
    y = np.array([r["avg_us"] for r in recs])
    try:
        from scipy.optimize import nnls

        coef, _ = nnls(A, y)
    except Exception:
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        coef = np.clip(coef, 0.0, None)
    a, b, c, d = coef
    if a > 0:
        out["mxu_mac_us"] = 1.0 / a
    if b > 0:
        out["shuffle_gel_s"] = 1.0 / (b * 1e3)
    if c > 0:
        out["grid_step_us"] = float(c)
    if d > 0:
        out["hbm_gb_s"] = 1.0 / (d * 1e3)
    out["calibrated_on"] = len(recs)
    return out


def check_pick_plan(records: Iterable[dict], rates: dict) -> list:
    """Compare the model's chunk choice with the measured best per
    (matrix, bf16) group that has a chunk sweep. Returns verdict lines.
    """
    r = {k: v for k, v in rates.items() if k in RATES}
    groups: dict = {}
    for rec in _usable(records):
        # only sweep-comparable rows: default kernel config (streamed-y
        # records are a different kernel structure — separate sweep)
        if rec.get("reduce2") or rec.get("lidx32") or rec.get("precision") \
                or rec.get("resident") is not None \
                or rec.get("stream_y_blocks"):
            continue
        groups.setdefault((rec["name"], bool(rec.get("bf16"))), {})[
            rec["chunk"]
        ] = rec
    verdicts = []
    for (name, bf16), by_chunk in sorted(groups.items()):
        if len(by_chunk) < 2:
            continue
        measured_best = min(by_chunk, key=lambda ch: by_chunk[ch]["avg_us"])

        def model_us(rec):
            macs, shuf, chunks, traffic = _cost_terms(rec)
            return max(
                traffic / (r["hbm_gb_s"] * 1e3),
                macs / r["mxu_mac_us"] + shuf / (r["shuffle_gel_s"] * 1e3),
            ) + chunks * r["grid_step_us"]

        model_best = min(by_chunk, key=lambda ch: model_us(by_chunk[ch]))
        ok = measured_best == model_best
        verdicts.append(
            f"{name} bf16={bf16}: measured best chunk={measured_best} "
            f"({by_chunk[measured_best]['avg_us']:.1f} us), model picks "
            f"{model_best} -> {'MATCH' if ok else 'MISMATCH'}"
        )
    return verdicts
