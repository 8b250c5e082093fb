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

__all__ = ["RATES", "plan_cost_us", "pick_plan"]

# v5e defaults — recalibrate from tpu_r2_session output. The MXU rate
# is a *throughput* figure (pipelined in-kernel matmuls): the round-1
# standalone micro (28 MMAC/us for one small matmul) was latency-bound
# and under-predicts the in-kernel rate by ~3 orders (the v1 kernel's
# measured 241 us on memplus implies >= 7e6 MAC/us at 6 passes; v5e
# peak is ~98e6 MAC/us bf16 — assume ~40% sustained for skinny one-hot
# shapes until a hardware session calibrates it).
RATES = {
    "hbm_gb_s": 819.0,          # HBM speed of light
    "mxu_mac_us": 4.0e7,        # sustained MXU MAC/us per DEFAULT pass
    "shuffle_gel_s": 150.0,     # take_along_axis lane shuffle
    "grid_step_us": 0.5,        # per-grid-step overhead
}

_PASSES = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}


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
    chunks: Iterable[int] = (256, 512, 1024, 2048),
    value_dtype_bytes: int = 4,
    bf16: bool = False,
    rates: Optional[dict] = None,
) -> Tuple[SellPlan, float]:
    """Build candidate plans across chunk sizes, return (best, cost_us).

    bf16 value mode runs a single-pass table matmul and a 3-pass reduce
    (ops/spmv_pallas.py precision rules); f32 runs 6-pass both.
    """
    table_p = 1 if bf16 else 6
    reduce_p = 3 if bf16 else 6
    vb = 2 if bf16 else value_dtype_bytes
    best: Optional[Tuple[SellPlan, float]] = None
    for chunk in chunks:
        plan = build_sell_plan(rows, cols, vals, shape, chunk=chunk)
        cost = plan_cost_us(
            plan, vb, table_passes=table_p, reduce_passes=reduce_p,
            rates=rates,
        )
        if best is None or cost < best[1]:
            best = (plan, cost)
    assert best is not None
    return best
