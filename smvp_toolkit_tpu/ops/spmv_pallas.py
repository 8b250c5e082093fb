"""Pallas TPU SpMV kernel (SELL-T1 layout) — the performance path.

Replaces the reference's sequential hot loops (CSR main-cli.c:410-416,
TJDS main-cli.c:1013-1020) with a four-op device kernel over the SELL-T1
plan (see ``sell_plan.py``): one-hot MXU table build → lane-shuffle
x-gather → elementwise multiply → one-hot MXU row reduce. No per-element
gather or scatter instruction anywhere: XLA's generic TPU lowering of
gather/segment-sum is ~8 ns/element (measured), while these four ops
sustain >100 Gelem/s.

The kernel runs a 1-D sequential grid over sublane chunks so VMEM holds
only one chunk of the packed arrays at a time; y accumulates across grid
steps in a revisited output block (grid iterations execute in order on a
TPU core).
"""

from __future__ import annotations

import os
import weakref
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import CSRMatrix
from smvp_toolkit_tpu.formats.tjds import TJDSMatrix
from smvp_toolkit_tpu.ops.mosaic_check import (
    check_pallas_args,
    check_plan_alignment,
    check_precision,
)
from smvp_toolkit_tpu.ops.sell_plan import LANES, SellPlan, build_sell_plan

__all__ = [
    "SellSpMV",
    "spmv_csr_pallas",
    "spmv_tjds_pallas",
    "spmv_coo_pallas",
    "spmv_cisr_pallas",
]


def _use_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu",)


def _mosaic_kwargs(vmem_mb: "int | None" = None) -> dict:
    """Optional pallas_call kwargs: VMEM budget raise.

    Mosaic's default VMEM budget can sit below the physical VMEM;
    raising it restores input double-buffering for launches whose
    resident blocks + intermediates crowd the default (the overlap
    question of PERFORMANCE.md sessions 17-20). ``vmem_mb`` is the
    per-operator override (set by the autotuner); the
    SMVP_SELL_VMEM_MB env knob remains as a global fallback."""
    mb = vmem_mb if vmem_mb else os.environ.get("SMVP_SELL_VMEM_MB")
    if not mb:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=int(mb) * 2**20
        )
    }


def _table_select(rel, x_win, wt, precision, bf16_values, reduce2):
    """One-hot select of each sublane's 128-wide x tile (MXU matmul).

    ``rel`` is the (chunk, 1) int32 tile-offset column (values outside
    [0, wt) — dead markers — produce an all-zero one-hot row).

    bf16 value mode: x is already bf16, a single DEFAULT pass selects it
    exactly. f32 mode: ``precision`` (HIGHEST = 6-pass by default), or
    with ``reduce2`` the double-bf16 ladder — the one-hot operand is
    exact in bf16 and x splits hi/lo, so two single-pass matmuls select
    x to ~16 mantissa bits (~1e-5 relative on the gathered values).
    """
    wt_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wt), 1)
    if bf16_values:
        oht = (rel == wt_iota).astype(jnp.bfloat16)
        return jnp.dot(oht, x_win, preferred_element_type=jnp.float32)
    if reduce2:
        oht = (rel == wt_iota).astype(jnp.bfloat16)
        hi = x_win.astype(jnp.bfloat16)
        lo = (x_win - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.dot(
            oht, hi, preferred_element_type=jnp.float32
        ) + jnp.dot(oht, lo, preferred_element_type=jnp.float32)
    oht = (rel == wt_iota).astype(jnp.float32)
    return jnp.dot(
        oht, x_win, preferred_element_type=jnp.float32, precision=precision
    )


# Packed-plane layout (bf16 value mode): ONE int32 plane carries the
# value, the one-hot tile offset, and the lane index of every slot —
#   bits 16..31  bfloat16 value bits (f32 extension = `& 0xFFFF0000`
#                bitcast to f32: bf16→f32 is exactly "append 16 zeros")
#   bits  7..15  rel tile offset, replicated across the sublane's lanes
#                (dead sublanes store _PACK_REL_DEAD, which lies outside
#                every [0, wt) one-hot window since wt <= 511 is gated)
#   bits  0..6   lane index (always in [0, 128))
# This fuses the kernel's three per-chunk input streams (bf16 values,
# int8 lane indices, i32 rel column) into one: micro3 measured the
# 4-stream plane layout at ~125-250 GB/s against ~480 GB/s for a single
# stream (experiments/micro3_tpu.py) — DMA stream count, not byte
# count, throttles the launch, so one 4 B/slot stream beats the
# 3.03 B/slot split. Unpack is three VPU bit-ops per chunk.
_PACK_REL_SHIFT = 7  # rel sits above the 7 lane-index bits
_PACK_REL_DEAD = (1 << 9) - 1  # 9-bit rel field; 511 marks dead sublanes
_PACK_WT_MAX = _PACK_REL_DEAD  # plans with wt > 511 keep split planes


def _unpack_plane(w):
    """(vals_f32, lidx_i32, rel_col) from one packed int32 chunk block."""
    vals = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(w, jnp.int32(-65536)), jnp.float32
    )
    lidx = jnp.bitwise_and(w, jnp.int32(127))
    rel = jnp.bitwise_and(
        jax.lax.shift_right_logical(w[:, 0:1], _PACK_REL_SHIFT),
        jnp.int32(_PACK_REL_DEAD),
    )
    return vals, lidx, rel


# rel‖slice plane (SMVP_SELL_RELSL): the two per-SUBLANE metadata
# streams — rel tile offsets ((chunk, 1) column) and slice ids
# ((1, chunk) row) — merge into ONE (1, 1, chunk) int32 stream:
#   bits 0..8   rel tile offset (dead sublanes: _PACK_REL_DEAD = 511,
#               outside every [0, wt) window since wt <= 511 is gated)
#   bits 9..31  slice id, logical-shifted (dead: _RELSL_SL_DEAD, which
#               stays above every reduce window after the - sb shift)
# This drops the launch to 3 input streams at the split planes'
# 3.03 B/slot (vs the packed plane's 2 streams at 4 B/slot). The table
# one-hot is built TRANSPOSED from the (1, chunk) row (no in-kernel
# transpose): ohtT[w, s] = (w == rel[s]), and the select contracts
# dim 0 of both operands (ohtT^T · x_win on the MXU).
_RELSL_SL_SHIFT = 9  # rel occupies bits 0..8 (no lane index in this word)
_RELSL_SL_DEAD = (1 << (32 - _RELSL_SL_SHIFT)) - 1


def _table_select_t(rel_row, x_win, wt, precision, bf16_values, reduce2):
    """:func:`_table_select` from the (1, chunk) rel orientation.

    Builds the one-hot transposed — (wt, chunk) — and contracts dim 0
    of both operands, avoiding a sublane↔lane transpose of rel."""
    wt_iota = jax.lax.broadcasted_iota(jnp.int32, (wt, 1), 0)
    dims = (((0,), (0,)), ((), ()))
    if bf16_values:
        ohtT = (wt_iota == rel_row).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            ohtT, x_win, dims, preferred_element_type=jnp.float32
        )
    if reduce2:
        ohtT = (wt_iota == rel_row).astype(jnp.bfloat16)
        hi = x_win.astype(jnp.bfloat16)
        lo = (x_win - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            ohtT, hi, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            ohtT, lo, dims, preferred_element_type=jnp.float32
        )
    ohtT = (wt_iota == rel_row).astype(jnp.float32)
    return jax.lax.dot_general(
        ohtT, x_win, dims, preferred_element_type=jnp.float32,
        precision=precision,
    )


def relsl_plane_host(plan) -> np.ndarray:
    """Host-side rel‖slice plane for a plan — THE single packing rule
    (consumed by SellSpMV._relsl, the fused solvers and the df64
    operator; a layout change edits exactly this function)."""
    rel = np.where(
        plan.rel_tile < 0, _PACK_REL_DEAD, plan.rel_tile
    ).astype(np.uint32).reshape(plan.n_chunks, plan.chunk)
    sl = np.where(
        plan.slice_of < 0, _RELSL_SL_DEAD, plan.slice_of
    ).astype(np.uint32)
    return (rel | (sl << _RELSL_SL_SHIFT)).view(np.int32)


def _chain_setting(chunk: int, k: int):
    """(split, bf16_taa) for a launch — env overrides, else policy.

    Resolved at CALL time and threaded as STATIC jit args (reading env
    inside the traced kernel made cached traces go stale when the knob
    changed — measured as cross-test bit-mismatches)."""
    env_split = os.environ.get("SMVP_SELL_SPLIT_CHAIN")
    split = int(env_split) if env_split else _split_policy(chunk, k)
    bf16_taa = os.environ.get("SMVP_SELL_BF16_TAA") == "1"
    return split, bf16_taa


def _split_policy(chunk: int, k: int) -> int:
    """Production chain-split choice (measured, round-5 session 1).

    Four independent sub-chunk chains let Mosaic overlap MXU passes of
    one sub-chain with VPU shuffles of another: measured at c2048,
    split4 is the sweet spot on every benchmark matrix (synth-10M
    46.3->58.9, memplus 18.4(s2)->22.0, split8 regresses to 51.3) and
    c2048+split4 beats the former single-chunk autotuner picks
    outright. Sub-chunks must be lane-tile aligned — per-half widths
    that are not multiples of 128 lanes 500 the remote Mosaic compile
    (measured on the odd single-chunk sizes). Applies to fused SpMM
    (k > 1) too — the sub-chunk reshapes are sublane-dim only and
    k-width-agnostic (interpret-verified; TPU cell in session 1).
    """
    if chunk >= 2048 and chunk % (4 * LANES) == 0:
        return 4
    return 1




def _sub_windows(plan, split: int):
    """Per-sub-chain tile/slice windows for the split chain (host, O(S)).

    The chunk's WT/NSW windows are set by the FULL chunk's spans, but
    each (chunk/split)-sublane sub-chain spans only ~1/split of the
    tiles and slices (tile-major sort). Narrowing the one-hot windows
    per sub-chain cuts the occupancy-invariant MXU work by ~WT/sub_wt
    (measured 112->48 / 128->48 on the co-clustered flagship).

    Returns ``(stb, ssb, sub_wt, sub_nsw)`` — int32 (n_chunks, split)
    window bases (16-aligned, clamped) + static window sizes — or
    ``None`` when the plan is ineligible (out-of-window sublanes, or a
    base shift that would pull the dead-marker rel into a window).
    """
    if plan.nnz == 0 or plan.y_block_slices:
        return None
    rel = plan.rel_tile.reshape(-1).astype(np.int64)
    if ((rel < 0) & (plan.slice_of.reshape(-1) >= 0)).any():
        return None  # live out-of-window sublanes: rebuild the plan
    nch, chunk = plan.n_chunks, plan.chunk
    per = chunk // split
    tb = np.repeat(plan.tile_base.astype(np.int64), chunk)
    live = plan.slice_of.reshape(-1) >= 0
    ut = np.where(live, rel + tb, -1).reshape(nch, split, per)
    sl = np.where(
        live, plan.slice_of.reshape(-1).astype(np.int64), -1
    ).reshape(nch, split, per)
    big = 1 << 40
    t_lo = np.where(ut >= 0, ut, big).min(axis=2)
    t_hi = np.where(ut >= 0, ut, -1).max(axis=2)
    t_lo = np.where(t_hi < 0, 0, np.minimum(t_lo, big - 1))
    t_hi = np.maximum(t_hi, 0)
    t_lo16 = (t_lo // 16) * 16
    sub_wt = int(max(int((t_hi - t_lo16).max()) + 1, 8))
    sub_wt = min(-(-sub_wt // 16) * 16, plan.n_coltiles)
    stb = np.minimum(t_lo16, max(plan.n_coltiles - sub_wt, 0))
    s_lo = np.where(sl >= 0, sl, big).min(axis=2)
    s_hi = np.where(sl >= 0, sl, -1).max(axis=2)
    s_lo = np.where(s_hi < 0, 0, np.minimum(s_lo, big - 1))
    s_hi = np.maximum(s_hi, 0)
    s_lo16 = (s_lo // 16) * 16
    sub_nsw = int(max(int((s_hi - s_lo16).max()) + 1, 8))
    sub_nsw = min(-(-sub_nsw // 16) * 16, plan.n_slices)
    ssb = np.minimum(s_lo16, max(plan.n_slices - sub_nsw, 0))
    # Dead-marker guard: rel_adj(dead) = DEAD - (stb - tile_base) must
    # stay outside [0, sub_wt).
    shift = (stb - plan.tile_base.astype(np.int64)[:, None]).max()
    if shift > _PACK_REL_DEAD - sub_wt or shift < 0:
        return None
    return (stb.astype(np.int32), ssb.astype(np.int32),
            sub_wt, sub_nsw)


def _relsl_chain_store(y_ref, rs, x_win, val_raw, lidx, wt, k, sb, ns, nsw,
                       precision, bf16_values, reduce2, split=1,
                       bf16_taa=False, subwin=None):
    """relsl chain: table -> gather -> multiply -> windowed reduce+store.

    Shared by the production relsl kernel and the grid-fused benchmark
    kernel so the experimental chain knobs stay in one place:

    * ``SMVP_SELL_BF16_TAA=1`` (bf16 value mode only): cast the table
      to bf16 before the lane gather. EXACT — in bf16 mode the table's
      f32 entries are selected bf16 x values, so the cast round-trips —
      and halves the bytes the serial VPU shuffle moves (the measured
      ~0.87 us/step chain stage, PERFORMANCE.md sessions 18/26).
    * ``SMVP_SELL_SPLIT_CHAIN=N``: run the chain as N independent
      sub-chunk chains and sum their reduces into one store. MAC count
      is unchanged; independence lets Mosaic's scheduler overlap half A
      MXU passes with half B VPU shuffles (chain-serialization attack).

    Both default off pending hardware A/Bs.
    """
    chunk = rs.shape[1]
    bf16_taa = bf16_taa and bf16_values
    if (split < 2 or chunk % (split * LANES)
            or (chunk // split) % 8):
        split = 1
    if split == 1:
        # Default (and bf16_taa) path: identical trace to the r4-proven
        # kernel apart from the optional exact table cast — no
        # sub-chunk slicing ops anywhere near Mosaic (lane-dim slices
        # of the rel‖slice row HANG the remote Mosaic compile —
        # measured round 5; hence the reshape route below).
        rel_row = jnp.bitwise_and(rs, jnp.int32(_PACK_REL_DEAD))
        sl_row = jax.lax.shift_right_logical(rs, _RELSL_SL_SHIFT)
        table = _table_select_t(
            rel_row, x_win, wt, precision, bf16_values, reduce2
        )
        if bf16_taa:
            table = table.astype(jnp.bfloat16)
        g = _gather_tile(table, lidx, k)
        if bf16_taa:
            g = g.astype(jnp.float32)
        vals = val_raw.astype(jnp.float32)
        prod = (vals if k == 1
                else jnp.concatenate([vals] * k, axis=1)) * g
        _reduce_store(y_ref, prod, sl_row, sb, ns, nsw, precision,
                      reduce2)
        return
    per = chunk // split
    # Sub-chunk views via SUBLANE-dim reshape + static leading index
    # (a relayout-free op, unlike lane-dim slicing).
    rs3 = rs.reshape(split, 1, per)
    lidx3 = lidx.reshape(split, per, LANES)
    val3 = val_raw.reshape(split, per, LANES)
    if subwin is not None:
        # Per-sub-chain windows (_sub_windows): each sub-chain selects
        # from its OWN narrow x window and reduces into its OWN narrow
        # y window — ~1/split of the one-hot MXU work per stage.
        bases_ref, ch, x_ref, row0, sub_wt, sub_nsw = subwin
        for h in range(split):
            rs_h = rs3[h]
            rel_h = jnp.bitwise_and(rs_h, jnp.int32(_PACK_REL_DEAD))
            sl_h = jax.lax.shift_right_logical(rs_h, _RELSL_SL_SHIFT)
            stb = bases_ref[row0 + h, ch]
            ssb = bases_ref[row0 + split + h, ch]
            rel_adj = rel_h - (stb - bases_ref[0, ch])
            xb = pl.multiple_of(stb, 16)
            x_win_h = x_ref[pl.ds(xb, sub_wt), :]
            table = _table_select_t(
                rel_adj, x_win_h, sub_wt, precision, bf16_values,
                reduce2,
            )
            if bf16_taa:
                table = table.astype(jnp.bfloat16)
            g = _gather_tile(table, lidx3[h], 1)
            if bf16_taa:
                g = g.astype(jnp.float32)
            prod = val3[h].astype(jnp.float32) * g
            red = _seg_reduce(prod, sl_h, ssb, sub_nsw, precision,
                              reduce2)
            sbh = pl.multiple_of(ssb, 8)
            y_ref[pl.ds(sbh, sub_nsw), :] += red
        return
    parts = []
    for h in range(split):
        rs_h = rs3[h]
        rel_h = jnp.bitwise_and(rs_h, jnp.int32(_PACK_REL_DEAD))
        sl_h = jax.lax.shift_right_logical(rs_h, _RELSL_SL_SHIFT)
        table = _table_select_t(
            rel_h, x_win, wt, precision, bf16_values, reduce2
        )
        if bf16_taa:
            table = table.astype(jnp.bfloat16)
        g = _gather_tile(table, lidx3[h], k)
        if bf16_taa:
            g = g.astype(jnp.float32)
        v = val3[h].astype(jnp.float32)
        prod = (v if k == 1 else jnp.concatenate([v] * k, axis=1)) * g
        parts.append((prod, sl_h))
    if nsw >= ns:
        total = None
        for prod, sl_h in parts:
            red = _seg_reduce(prod, sl_h, 0, ns, precision, reduce2)
            total = red if total is None else total + red
        y_ref[:] += total
    else:
        sb = pl.multiple_of(sb, 8)
        total = None
        for prod, sl_h in parts:
            red = _seg_reduce(prod, sl_h, sb, nsw, precision, reduce2)
            total = red if total is None else total + red
        y_ref[pl.ds(sb, nsw), :] += total


def _make_sell_kernel_relsl(precision, ns, nsw, wt, bf16_values, reduce2,
                            resident=True, k=1, split=1, bf16_taa=False):
    """3-stream kernel: vals + lane indices + the rel‖slice plane.

    ``k > 1`` is the fused SpMM: x/y widen to ``k*128`` lanes (column j
    in lanes ``j*128:(j+1)*128``) and the transposed one-hot select and
    the reduce simply run k× wider — same packing as the split-plane
    fused SpMM (see the resident variant)."""

    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rs_ref, y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        rs = rs_ref[0]  # (1, chunk)
        if resident:
            xb = pl.multiple_of(bases_ref[0, step], 16)
            x_win = x_ref[pl.ds(xb, wt), :]
        else:
            x_win = x_ref[:]
        _relsl_chain_store(
            y_ref, rs, x_win, val_ref[:], lidx_ref[:].astype(jnp.int32),
            wt, k, bases_ref[1, step], ns, nsw, precision, bf16_values,
            reduce2, split=split, bf16_taa=bf16_taa,
        )

    return _sell_kernel


def spmm_launch_group(n_slices: int, n_coltiles: int,
                      itemsize: int) -> int:
    """Per-launch column group for fused SpMM — THE shared VMEM policy.

    Used by ``SellSpMV.matmat``, the sharded SpMM paths, and the plan's
    ``traffic_bytes(k)`` accounting so the three never drift: the
    (n_slices, group*128) f32 y block must stay VMEM-resident, and with
    the prefetch escape hatch off (``SMVP_SELL_PREFETCH=0`` — no
    windowed x for k > 1) the group's x block must be resident too.
    A result < 2 means per-column launches (the vmap fallback).
    """
    group = max(1, int(os.environ.get("SMVP_SELL_SPMM_GROUP", "8")))
    y_bytes = n_slices * LANES * 4
    group = max(1, min(group, _RESIDENT_Y_LIMIT // max(y_bytes, 1)))
    if os.environ.get("SMVP_SELL_PREFETCH") == "0":
        x_launch = n_coltiles * LANES * itemsize
        if x_launch * group > _RESIDENT_X_LIMIT:
            group = max(1, _RESIDENT_X_LIMIT // max(x_launch, 1))
    return group


def pack_columns(X: jax.Array, ct: int, kg: int) -> jax.Array:
    """Pack a dense (ct*128, kg) block into the fused-SpMM lane layout.

    Column j of the block lives in lanes ``j*128:(j+1)*128`` of each
    column tile: ``out[t, j*128 + l] = X[t*128 + l, j]``. The single
    definition shared by ``SellSpMV._matmat_group`` and both sharded
    SpMM paths — the kernel's gather/reduce assume exactly this layout.
    """
    return (
        X.T.reshape(kg, ct, LANES).transpose(1, 0, 2).reshape(ct, kg * LANES)
    )


def unpack_columns(y: jax.Array, ns: int, kg: int) -> jax.Array:
    """Inverse of :func:`pack_columns` on the output side:
    (ns, kg*128) → (ns*128, kg) rows-by-columns."""
    return (
        y.reshape(ns, kg, LANES).transpose(0, 2, 1).reshape(ns * LANES, kg)
    )


def _gather_tile(table, lidx, k):
    """In-tile x gather: one VPU lane shuffle per 128-lane column block.

    SpMV (``k == 1``) is the plain 2-D ``take_along_axis`` the kernel
    has always used. SpMM widens ``table`` to ``(S, k*128)`` — column j
    of the dense block lives in lanes ``j*128:(j+1)*128`` — and every
    block gathers with the SAME lane indices, so the k-loop unrolls to
    k copies of the proven 2-D shuffle shape (no >128-lane dynamic
    gather for Mosaic to choke on).
    """
    if k == 1:
        return jnp.take_along_axis(table, lidx, axis=1)
    return jnp.concatenate(
        [
            jnp.take_along_axis(
                table[:, j * LANES:(j + 1) * LANES], lidx, axis=1
            )
            for j in range(k)
        ],
        axis=1,
    )


def _seg_reduce(prod, sl_row, sb, nsw, precision, reduce2):
    """Row reduce: sum sublanes into their slice (one-hot MXU matmul).

    Windowed (v6): the one-hot contracts only the chunk's NSW-slice
    window starting at ``sb`` (the full (NS, chunk) reduce is O(NS x S)
    MACs — NS grows with matrix rows, 98% of modelled time at 1M rows).
    Dead sublanes (``sl_ref == -1``) fall outside any window. The
    caller accumulates the (nsw, LANES) result at y offset ``sb``.

    ``sl_row`` is the chunk's (1, chunk) slice-id row (read from the
    3-D slice-id block — stored 3-D
    so the BlockSpec's last two dims (1, chunk) EQUAL the array dims and
    satisfy Mosaic's tiling rule for any chunk count (a 2-D (1, chunk)
    block over an (n_chunks, chunk) array is rejected whenever
    n_chunks > 1: sublane dim 1 is neither a multiple of 8 nor the
    array dim — the round-3 hardware failure).

    ``reduce2`` runs the double-bf16 ladder instead of a ``precision``
    matmul: the one-hot matrix is exact in bf16 and ``prod`` splits as
    ``hi + lo`` with two bf16 components, so two DEFAULT (single-pass)
    matmuls replace HIGH's 3 or HIGHEST's 6 passes. Lossless whenever
    products carry <= 16 mantissa bits (always true in bf16 value mode);
    ~1e-5 relative for arbitrary f32 products.
    """
    rel = sl_row - sb  # (1, chunk); dead (-1 - sb) stays negative
    nsw_iota = jax.lax.broadcasted_iota(jnp.int32, (nsw, 1), 0)
    if reduce2 == "1pass":
        # Single-pass bf16 reduce (SMVP_SELL_REDUCE1=1): the product is
        # rounded to bf16 before the MXU — trades ~8 product mantissa
        # bits for half of reduce2's MXU passes. Accumulation stays f32.
        seg = (nsw_iota == rel).astype(jnp.bfloat16)
        return jnp.dot(
            seg, prod.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if reduce2:
        seg = (nsw_iota == rel).astype(jnp.bfloat16)
        hi = prod.astype(jnp.bfloat16)
        lo = (prod - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.dot(
            seg, hi, preferred_element_type=jnp.float32
        ) + jnp.dot(seg, lo, preferred_element_type=jnp.float32)
    seg = (nsw_iota == rel).astype(jnp.float32)
    return jnp.dot(
        seg, prod, preferred_element_type=jnp.float32, precision=precision
    )


def _reduce_store(y_ref, prod, sl_row, sb, ns, nsw, precision,
                  reduce2):
    """Windowed reduce + dynamic store; static full-block store when
    the window covers all slices (NSW == NS) — that path is bit-for-bit
    the pre-v6 kernel and doubles as the Mosaic escape hatch
    (SMVP_SELL_NOWINDOW=1 forces it).

    The dynamic store offset carries a ``pl.multiple_of`` proof: the
    planner 16-aligns every slice_base (sell_plan._finish_plan), and
    Mosaic rejects dynamic sublane offsets it cannot statically prove
    aligned (the round-3 shard_map hardware failure)."""
    if nsw >= ns:
        y_ref[:] += _seg_reduce(prod, sl_row, 0, ns, precision, reduce2)
    else:
        sb = pl.multiple_of(sb, 8)
        y_ref[pl.ds(sb, nsw), :] += _seg_reduce(
            prod, sl_row, sb, nsw, precision, reduce2
        )


def _make_sell_kernel(precision, ns, nsw, wt, bf16_values, reduce2=False):
    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref,
                     y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        # One-hot matrices are rebuilt per chunk from one int32 per
        # sublane (storing them dense would be O(S x NS) bytes — 7 GB at
        # 10M nnz). An iota compare is a few hundred ns on the VPU.
        #
        # 1. Materialize each sublane's 128-wide x tile (one-hot MXU
        # select from this chunk's WT-tile x window). Precision matters:
        # when x is f32, the MXU's single-pass bf16 default would round
        # the selected x values to ~3 decimal digits (observed 1e-2
        # error) — HIGHEST (6-pass) is f32-exact, and the reduce2 ladder
        # trades 2 passes for ~1e-5. In bf16 value mode x is *already*
        # bf16, so a single MXU pass selects it exactly — the precision
        # tax disappears along with half the HBM traffic.
        table = _table_select(
            rel_ref[:], x_ref[0], wt, precision, bf16_values, reduce2
        )
        # 2. In-tile gather: a single VPU lane shuffle (indices may be
        # int8-compressed in HBM; widen in-register).
        g = jnp.take_along_axis(
            table, lidx_ref[:].astype(jnp.int32), axis=1
        )
        # 3. Products (dead slots have val == 0). Arithmetic stays f32;
        # bf16 is a storage format here.
        prod = val_ref[:].astype(jnp.float32) * g
        # 4. Windowed row reduce, accumulated at the chunk's y offset.
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], ns, nsw,
                      precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_resident(precision, ns, nsw, wt, bf16_values,
                               reduce2=False, k=1):
    """Kernel variant with the full x tile array resident in VMEM.

    The per-chunk (wt, 128) x window is a dynamic sublane slice of the
    resident block, started at ``bases[0, chunk]`` read from SMEM — no
    host-side window stack, no duplicated x traffic: x crosses HBM once.
    ``bases[1, chunk]`` is the slice-window start for the reduce.

    ``k > 1`` is the fused SpMM: the x block widens to ``(…, k*128)``
    (dense column j in lanes ``j*128:(j+1)*128``) and the select +
    reduce matmuls simply run k× wider — the packed value/index planes,
    the dominant HBM traffic at SELL occupancies, are read ONCE for all
    k columns instead of once per column as the vmap fallback does.
    """

    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref,
                     y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        # tile_base is 16-aligned by the planner; the multiple_of proof
        # is required for Mosaic to accept a dynamic sublane slice (16
        # covers the bf16 sublane tile as well as f32's 8).
        xb = pl.multiple_of(bases_ref[0, step], 16)
        x_win = x_ref[pl.ds(xb, wt), :]  # (wt, k*LANES)
        table = _table_select(
            rel_ref[:], x_win, wt, precision, bf16_values, reduce2
        )
        g = _gather_tile(table, lidx_ref[:].astype(jnp.int32), k)
        vals = val_ref[:].astype(jnp.float32)
        # k > 1: replicate the value plane across the k lane blocks with
        # the same concatenate idiom as the gather (one Mosaic pattern).
        prod = (vals if k == 1
                else jnp.concatenate([vals] * k, axis=1)) * g
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], ns, nsw,
                      precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_prefetch(precision, ns, nsw, wt, bf16_values,
                               reduce2, k=1):
    """Kernel variant fed per-chunk x windows by scalar-prefetch DMA.

    ``tile_base`` rides as a scalar-prefetch argument so the x-window
    BlockSpec's index map can start each chunk's (wt, LANES) window at
    ``tile_base[chunk]`` (``pl.Element`` offset, 16-aligned by the
    planner) — x stays in HBM and each window is DMA'd once per chunk.
    This replaces the host-side windowed stack (which duplicates x
    ~WT-fold in HBM) for matrices whose x tile array exceeds the VMEM
    residency budget. ``k > 1``: fused SpMM, see the resident variant.
    """

    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref,
                     y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        table = _table_select(
            rel_ref[:], x_ref[:], wt, precision, bf16_values, reduce2
        )
        g = _gather_tile(table, lidx_ref[:].astype(jnp.int32), k)
        vals = val_ref[:].astype(jnp.float32)
        # k > 1: replicate the value plane across the k lane blocks with
        # the same concatenate idiom as the gather (one Mosaic pattern).
        prod = (vals if k == 1
                else jnp.concatenate([vals] * k, axis=1)) * g
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], ns, nsw,
                      precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_packed(precision, ns, nsw, wt, reduce2,
                             resident=True, k=1, nsb=0):
    """Packed-plane kernel (bf16 value mode): val‖rel‖lidx ride in ONE
    int32 plane (see ``_unpack_plane``), so each grid step issues two
    input DMAs (packed plane + slice ids) instead of four. x is either
    VMEM-resident (dynamic wt-window at bases[0]) or a per-chunk
    scalar-prefetch window, exactly as the split-plane variants.

    ``k > 1`` is the fused SpMM (k-wide x/y lanes, see the resident
    variant's note); ``nsb > 0`` is the streamed-y v7 flush-behind mode
    (one (nsb, 128) output block selected by bases[2], zeroed when the
    block id advances, block-LOCAL slice offsets) — mutually exclusive,
    enforced by the caller.
    """
    out_ns = nsb if nsb > 0 else ns

    def _sell_kernel(bases_ref, x_ref, pk_ref, sl_ref, y_ref):
        step = pl.program_id(0)

        if nsb > 0:
            blk = bases_ref[2, step]
            prev = bases_ref[2, jnp.maximum(step - 1, 0)]

            @pl.when(jnp.logical_or(step == 0, blk != prev))
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)
        else:
            @pl.when(step == 0)
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

        vals, lidx, rel = _unpack_plane(pk_ref[:])
        if resident:
            xb = pl.multiple_of(bases_ref[0, step], 16)
            x_win = x_ref[pl.ds(xb, wt), :]
        else:
            x_win = x_ref[:]
        table = _table_select(rel, x_win, wt, precision, True, reduce2)
        g = _gather_tile(table, lidx, k)
        prod = (vals if k == 1 else jnp.concatenate([vals] * k, axis=1)) * g
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], out_ns,
                      min(nsw, out_ns), precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_bench(precision, ns, nsw, wt, bf16_values, reduce2,
                            packed=False, relsl=False, nsb=0, k=1,
                            resident=True, split=1, bf16_taa=False,
                            sub_wt=0, sub_nsw=0):
    """Grid-fused benchmark kernel: grid = (iterations, n_chunks).

    The benchmark's iteration loop lives INSIDE the Mosaic grid instead
    of an XLA while loop: on the tunneled dev stack every XLA loop
    iteration costs ~130-150 µs regardless of body (measured:
    experiments/tpu_r4_session9/10 — a bare scalar-carry fori_loop
    iteration is as expensive as a full memplus SpMV), while pallas
    grid steps cost < 0.3 µs. Semantics match the reference's timed
    loop (main-cli.c:402-420): y is recomputed from scratch every
    iteration (re-zeroed when the chunk index wraps), and the packed
    planes are genuinely re-streamed from HBM each iteration (their
    block index changes every step, so the pipeline re-fetches), so
    the measured rate is the kernel's steady-state HBM + compute rate
    with no loop-apparatus tax. x stays VMEM-resident across
    iterations (the reference's x stays cache-resident likewise).
    """

    out_ns = nsb if nsb > 0 else ns
    out_nsw = min(nsw, out_ns)

    def _init_pred(bases_ref, ch):
        # Streamed-y: re-zero whenever the prefetched block id advances
        # (and at every iteration's first chunk). Resident-y: first
        # chunk only.
        if nsb > 0:
            blk = bases_ref[2, ch]
            prev = bases_ref[2, jnp.maximum(ch - 1, 0)]
            return jnp.logical_or(ch == 0, blk != prev)
        return ch == 0

    def _body(bases_ref, x_win_fn, vals, lidx, rel, sl_ref, y_ref, ch):
        @pl.when(_init_pred(bases_ref, ch))
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        table = _table_select(
            rel, x_win_fn(), wt, precision, bf16_values, reduce2
        )
        g = jnp.take_along_axis(table, lidx, axis=1)
        prod = vals * g
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, ch], out_ns,
                      out_nsw, precision, reduce2)

    if packed:
        def _sell_kernel(bases_ref, x_ref, pk_ref, sl_ref, y_ref):
            ch = pl.program_id(1)
            vals, lidx, rel = _unpack_plane(pk_ref[:])
            xb = pl.multiple_of(bases_ref[0, ch], 16)
            _body(bases_ref, lambda: x_ref[pl.ds(xb, wt), :], vals, lidx,
                  rel, sl_ref, y_ref, ch)
    elif relsl:
        def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rs_ref,
                         y_ref):
            ch = pl.program_id(1)

            @pl.when(_init_pred(bases_ref, ch))
            def _init():
                y_ref[:] = jnp.zeros_like(y_ref)

            rs = rs_ref[0]
            subwin = None
            if sub_wt > 0 and resident and nsb == 0:
                subwin = (bases_ref, ch, x_ref, 2, sub_wt, sub_nsw)
                x_win = None
            elif resident:
                xb = pl.multiple_of(bases_ref[0, ch], 16)
                x_win = x_ref[pl.ds(xb, wt), :]
            else:
                x_win = x_ref[:]  # scalar-prefetch (wt, k*128) window
            _relsl_chain_store(
                y_ref, rs, x_win, val_ref[:],
                lidx_ref[:].astype(jnp.int32), wt, k, bases_ref[1, ch],
                out_ns, out_nsw, precision, bf16_values, reduce2,
                split=split, bf16_taa=bf16_taa, subwin=subwin,
            )
    else:
        def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rel_ref,
                         sl_ref, y_ref):
            ch = pl.program_id(1)
            xb = pl.multiple_of(bases_ref[0, ch], 16)
            _body(bases_ref, lambda: x_ref[pl.ds(xb, wt), :],
                  val_ref[:].astype(jnp.float32),
                  lidx_ref[:].astype(jnp.int32), rel_ref[:], sl_ref,
                  y_ref, ch)

    return _sell_kernel


# Above this many bytes of x tile array the resident-x variant would
# crowd VMEM (~16 MB/core on v5e, shared with the double-buffered packed
# planes); larger matrices take the scalar-prefetch windowed variant
# (SMVP_SELL_PREFETCH=0 reverts to the host-side window stack).
_RESIDENT_X_LIMIT = 6 * 2**20

# Above this many bytes of y (NS x 128 x 4) the VMEM-resident output of
# the v6 kernel no longer fits; operators switch to the streamed-y plan
# (v7 flush-behind): y blocks of _STREAM_Y_BLOCK_ROWS rows are flushed
# behind the sweep via a prefetch-driven output index map.
_RESIDENT_Y_LIMIT = 8 * 2**20
_STREAM_Y_BLOCK_ROWS = 512 * LANES  # 512 slices = 256 KB f32 per block


def _make_sell_kernel_streamy(precision, nsb, nsw, wt, bf16_values,
                              reduce2, resident_x):
    """Streamed-y kernel (v7): the output block is ONE (nsb, 128) y
    block, selected per chunk by the scalar-prefetched block id
    (bases[2]) — when the id advances, the pipeline flushes the
    completed block to HBM behind the sweep (block ids are
    non-decreasing by plan construction, so no block is ever revisited).
    The block is zeroed on first entry; slice offsets (bases[1]) are
    LOCAL to the block. x is either VMEM-resident (dynamic wt-window at
    bases[0]) or a per-chunk scalar-prefetch DMA window, as in v6.
    """

    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref,
                     y_ref):
        step = pl.program_id(0)
        blk = bases_ref[2, step]
        prev = bases_ref[2, jnp.maximum(step - 1, 0)]

        @pl.when(jnp.logical_or(step == 0, blk != prev))
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        x_win = (
            x_ref[pl.ds(pl.multiple_of(bases_ref[0, step], 16), wt), :]
            if resident_x
            else x_ref[:]
        )
        table = _table_select(
            rel_ref[:], x_win, wt, precision, bf16_values, reduce2
        )
        g = jnp.take_along_axis(
            table, lidx_ref[:].astype(jnp.int32), axis=1
        )
        prod = val_ref[:].astype(jnp.float32) * g
        _reduce_store(y_ref, prod, sl_ref[0], bases_ref[1, step], nsb, nsw,
                      precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_streamy_relsl(precision, nsb, nsw, wt, bf16_values,
                                    reduce2, resident_x):
    """Streamed-y v7 kernel on the 3-stream rel‖slice layout — the
    flagship configuration at scale: session 19 showed the RESIDENT y
    block's VMEM pressure blocks DMA/compute overlap past ~0.5M rows
    (69 vs 46 Gnnz/s at 10M nnz); small streamed y blocks restore it.
    Slice offsets in the rel‖slice plane are block-LOCAL (the streamed
    planner's convention)."""

    def _sell_kernel(bases_ref, x_ref, val_ref, lidx_ref, rs_ref, y_ref):
        step = pl.program_id(0)
        blk = bases_ref[2, step]
        prev = bases_ref[2, jnp.maximum(step - 1, 0)]

        @pl.when(jnp.logical_or(step == 0, blk != prev))
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        rs = rs_ref[0]
        rel_row = jnp.bitwise_and(rs, jnp.int32(_PACK_REL_DEAD))
        sl_row = jax.lax.shift_right_logical(rs, _RELSL_SL_SHIFT)
        x_win = (
            x_ref[pl.ds(pl.multiple_of(bases_ref[0, step], 16), wt), :]
            if resident_x
            else x_ref[:]
        )
        table = _table_select_t(
            rel_row, x_win, wt, precision, bf16_values, reduce2
        )
        g = jnp.take_along_axis(
            table, lidx_ref[:].astype(jnp.int32), axis=1
        )
        prod = val_ref[:].astype(jnp.float32) * g
        _reduce_store(y_ref, prod, sl_row, bases_ref[1, step], nsb, nsw,
                      precision, reduce2)

    return _sell_kernel


def _make_sell_kernel_onehot(precision, ns, wt):
    """Maximum-compatibility kernel: dense one-hot planes as inputs.

    No iota-compare, no dynamic slices, no sub-word dtypes — the input
    shapes/ops of the round-1 v1 kernel, the only configuration proven
    through Mosaic on real hardware before the tunnel outage. Costs
    S x (WT + NS) x 4 bytes of extra plane traffic per launch; used as
    the escape hatch (SMVP_SELL_COMPAT=1 or onehot_dense=True) if the
    compiler rejects the compact generators.
    """

    def _sell_kernel(x_ref, val_ref, lidx_ref, oht_ref, seg_ref, y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        table = jnp.dot(
            oht_ref[0], x_ref[0],
            preferred_element_type=jnp.float32, precision=precision,
        )
        g = jnp.take_along_axis(table, lidx_ref[:], axis=1)
        prod = val_ref[:].astype(jnp.float32) * g
        y_ref[:] += jnp.dot(
            seg_ref[0], prod,
            preferred_element_type=jnp.float32, precision=precision,
        )

    return _sell_kernel


def _make_vals_grad_kernel(nsw, wt, precision, bf16_values, resident,
                           k=1):
    """Backward kernel for d(loss)/d(packed values plane).

    SpMV is bilinear: with g the output cotangent,
    ``grad_vals[s, l] = g[slice_of(s), l] * x[col(s, l)]``. Both factors
    are the kernel's native one-hot selects — x by column tile exactly
    as the forward (table matmul + lane shuffle), and g by slice via
    the TRANSPOSE of the forward's reduce one-hot (a dot_general
    contracting sublane 0 of both operands). No scatter anywhere; the
    (chunk, LANES) grad block streams straight out per grid step. Dead
    SUBLANES (rel/slice == -1) fall outside every one-hot, so their
    whole lane row is exactly 0; unused lanes within a live sublane
    carry that slot's true (generally nonzero) partial derivative —
    harmless, since the triplet-space API gathers live slots only.

    ``resident``: True slices the chunk's x window out of the resident
    (CT, LANES) x block; False receives pre-windowed (1, wt, LANES)
    blocks (the same escape-hatch split as the forward kernel).

    ``k > 1`` is the SpMM cotangent ``Σ_j G_j[row]·X_j[col]``: x/g
    widen to k*128 lanes (fused-SpMM layout) and the per-column
    products accumulate into the same (chunk, LANES) grad block — the
    packed index planes are read once for all k columns.
    """

    def _kernel(bases_ref, x_ref, g_ref, lidx_ref, rel_ref, sl_ref,
                out_ref):
        step = pl.program_id(0)
        x_win = (
            x_ref[pl.ds(pl.multiple_of(bases_ref[0, step], 16), wt), :]
            if resident
            else x_ref[0]
        )
        table = _table_select(
            rel_ref[:], x_win, wt, precision, bf16_values, False
        )
        xg = _gather_tile(table, lidx_ref[:].astype(jnp.int32), k)
        sb = pl.multiple_of(bases_ref[1, step], 8)
        g_win = g_ref[pl.ds(sb, nsw), :]          # (nsw, k*LANES)
        rel_s = sl_ref[0] - sb                    # (1, chunk)
        nsw_iota = jax.lax.broadcasted_iota(jnp.int32, (nsw, 1), 0)
        seg = (nsw_iota == rel_s).astype(jnp.float32)  # (nsw, chunk)
        gsel = jax.lax.dot_general(                # segᵀ @ g_win
            seg, g_win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,   # exact 1-hot select
        )                                          # (chunk, k*LANES)
        prod = gsel * xg
        acc = prod[:, :LANES]
        for j in range(1, k):
            acc = acc + prod[:, j * LANES:(j + 1) * LANES]
        out_ref[:] = acc

    return _kernel


@partial(
    jax.jit,
    static_argnames=("chunk", "ns", "nsw", "wt", "interpret",
                     "precision", "resident", "bf16_values", "k",
                     "vmem_mb"),
)
def _sell_vals_grad_call(
    x_tiles, g2d, lidx, rel_tile, slice_of, bases, *, chunk, ns, nsw, wt,
    interpret, precision, resident, bf16_values, k=1, vmem_mb=None,
):
    """Dispatch the packed-values backward kernel; returns (S, LANES)."""
    n_chunks = slice_of.shape[0] * slice_of.shape[1] // chunk
    # 3-D layout so the per-chunk block's last two dims (1, chunk) equal
    # the array dims — see _seg_reduce's Mosaic note.
    sl3 = slice_of.reshape(n_chunks, 1, chunk)
    if not resident:
        # Host-side per-chunk x windows (same escape hatch as the
        # forward's non-prefetch fallback; backward runs are training-
        # time, so the duplicated x traffic is acceptable there).
        xw = jnp.stack(
            [
                jax.lax.dynamic_slice(x_tiles, (bases[0, i], 0),
                                      (wt, k * LANES))
                for i in range(n_chunks)
            ]
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wt, k * LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((ns, k * LANES), lambda i: (0, 0)),
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
        ]
        opnds = (bases, xw, g2d, lidx, rel_tile, sl3)
        check_pallas_args(in_specs, opnds, label="vals-grad-windowstack")
        return pl.pallas_call(
            _make_vals_grad_kernel(nsw, wt, precision, bf16_values,
                                   resident=False, k=k),
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * chunk, LANES), jnp.float32
            ),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(*opnds)
    ct = x_tiles.shape[0]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ct, k * LANES), lambda i: (0, 0)),  # res. x
        pl.BlockSpec((ns, k * LANES), lambda i: (0, 0)),  # res. g
        pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
        pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
        pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
    ]
    opnds = (bases, x_tiles, g2d, lidx, rel_tile, sl3)
    check_pallas_args(in_specs, opnds, label="vals-grad-resident")
    return pl.pallas_call(
        _make_vals_grad_kernel(nsw, wt, precision, bf16_values,
                               resident=True, k=k),
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * chunk, LANES), jnp.float32
        ),
        interpret=interpret,
        **_mosaic_kwargs(vmem_mb),
    )(*opnds)


@partial(
    jax.jit,
    static_argnames=("n_chunks", "chunk", "ns", "nsw", "wt", "interpret",
                     "precision", "resident", "onehot_dense", "reduce2",
                     "prefetch", "nsb", "k", "vmem_mb", "split_chain",
                     "bf16_taa"),
)
def _sell_spmv_call(
    x_tiles, vals, lidx, rel_tile, slice_of, bases, *, n_chunks, chunk,
    ns, nsw, wt, interpret, precision=jax.lax.Precision.HIGHEST,
    resident=True, onehot_dense=False, reduce2=False, prefetch=True,
    nsb=0, k=1, packed_plane=None, relsl_plane=None, vmem_mb=None,
    split_chain=1, bf16_taa=False,
):
    """Dispatch one SELL launch. ``bases`` is i32 (2, n_chunks):
    row 0 = per-chunk x tile-window starts, row 1 = per-chunk y
    slice-window starts (both 16-aligned; see sell_plan). Streamed-y
    plans (``nsb > 0``) carry a third row — per-chunk y block ids —
    and ``slice_of``/row 1 hold block-LOCAL slice positions.

    ``k > 1`` is the fused SpMM launch (x_tiles/y carry k*128 lanes);
    only the resident and scalar-prefetch variants support it — the
    caller (``SellSpMV.matmat``) routes streamed-y/compat plans to the
    vmap fallback instead."""
    bf16_values = vals.dtype == jnp.bfloat16
    if k > 1 and (nsb > 0 or onehot_dense):
        raise ValueError(
            "fused SpMM supports the resident/prefetch kernels only"
        )
    # slice_of rides as (n_chunks, 1, chunk): the per-chunk block's last
    # two dims (1, chunk) EQUAL the array dims, satisfying Mosaic's
    # tiling rule for every chunk count (see _seg_reduce's note — the
    # 2-D (1, chunk) block was the round-3 hardware failure).
    sl3 = slice_of.reshape(n_chunks, 1, chunk)
    if relsl_plane is not None:
        # 3-stream launch: vals + lane indices + the rel‖slice plane
        # (the two per-sublane metadata streams merged — see
        # _make_sell_kernel_relsl). 3.03 B/slot at 3 streams.
        if onehot_dense or (k != 1 and nsb > 0):
            raise ValueError(
                "relsl plane: SpMV, fused SpMM, or streamed-y SpMV"
            )
        rs3 = relsl_plane.reshape(n_chunks, 1, chunk)
        if nsb > 0:
            # Streamed-y v7 on the relsl layout (block ids prefetched
            # via bases[2]; see _make_sell_kernel_streamy_relsl).
            in_specs = [
                (
                    pl.BlockSpec(
                        (x_tiles.shape[0], LANES), lambda i, b: (0, 0)
                    )
                    if resident
                    else pl.BlockSpec(
                        (pl.Element(wt), pl.Element(LANES)),
                        lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
                    )
                ),
                pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
            ]
            opnds = (x_tiles, vals, lidx, rs3)
            check_pallas_args(in_specs, opnds,
                              label="sell-relsl-streamy")
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (nsb, LANES), lambda i, b: (b[2, i], 0)
                ),
            )
            return pl.pallas_call(
                _make_sell_kernel_streamy_relsl(
                    precision, nsb, min(nsw, nsb), wt, bf16_values,
                    reduce2, resident,
                ),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
                interpret=interpret,
                **_mosaic_kwargs(vmem_mb),
            )(bases, *opnds)
        kern = _make_sell_kernel_relsl(
            precision, ns, nsw, wt, bf16_values, reduce2,
            resident=resident, k=k, split=split_chain,
            bf16_taa=bf16_taa,
        )
        if resident:
            ct = x_tiles.shape[0]
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
                pl.BlockSpec((ct, k * LANES), lambda i: (0, 0)),  # res. x
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
            ]
            opnds = (bases, x_tiles, vals, lidx, rs3)
            check_pallas_args(in_specs, opnds, label="sell-relsl")
            return pl.pallas_call(
                kern,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((ns, k * LANES), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (ns, k * LANES), jnp.float32
                ),
                interpret=interpret,
                **_mosaic_kwargs(vmem_mb),
            )(*opnds)
        in_specs = [
            pl.BlockSpec(
                (pl.Element(wt), pl.Element(k * LANES)),
                lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
            ),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
        ]
        opnds = (x_tiles, vals, lidx, rs3)
        check_pallas_args(in_specs, opnds, label="sell-relsl-prefetch")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, k * LANES), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns, k * LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(bases, *opnds)
    if packed_plane is not None:
        # Packed-plane launch (bf16 values; val‖rel‖lidx in one int32
        # plane): two input streams per grid step instead of four —
        # stream count, not byte count, throttles the plane DMA
        # (micro3 ladder, experiments/micro3_tpu.py).
        if onehot_dense or (k != 1 and nsb > 0):
            raise ValueError(
                "packed plane: resident/prefetch SpMV, fused SpMM, or "
                "streamed-y SpMV (not fused+streamed)"
            )
        kern = _make_sell_kernel_packed(
            precision, ns, nsw, wt, reduce2, resident=resident, k=k,
            nsb=nsb,
        )
        if nsb > 0:
            # Streamed-y v7: the output index map needs the prefetched
            # block ids, so this launch is always scalar-prefetch.
            in_specs = [
                (
                    pl.BlockSpec(
                        (x_tiles.shape[0], LANES), lambda i, b: (0, 0)
                    )
                    if resident
                    else pl.BlockSpec(
                        (pl.Element(wt), pl.Element(LANES)),
                        lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
                    )
                ),
                pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
                pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
            ]
            opnds = (x_tiles, packed_plane, sl3)
            check_pallas_args(in_specs, opnds, label="sell-packed-streamy")
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (nsb, LANES), lambda i, b: (b[2, i], 0)
                ),
            )
            return pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
                interpret=interpret,
                **_mosaic_kwargs(vmem_mb),
            )(bases, *opnds)
        if resident:
            ct = x_tiles.shape[0]
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
                pl.BlockSpec((ct, k * LANES), lambda i: (0, 0)),  # res. x
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
            ]
            opnds = (bases, x_tiles, packed_plane, sl3)
            check_pallas_args(in_specs, opnds, label="sell-packed")
            return pl.pallas_call(
                kern,
                grid=(n_chunks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((ns, k * LANES), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct(
                    (ns, k * LANES), jnp.float32
                ),
                interpret=interpret,
                **_mosaic_kwargs(vmem_mb),
            )(*opnds)
        in_specs = [
            pl.BlockSpec(
                (pl.Element(wt), pl.Element(k * LANES)),
                lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
            ),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
        ]
        opnds = (x_tiles, packed_plane, sl3)
        check_pallas_args(in_specs, opnds, label="sell-packed-prefetch")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, k * LANES), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns, k * LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(bases, *opnds)
    if nsb > 0:
        # v7 flush-behind: y streams through VMEM one (nsb, 128) block
        # at a time; the scalar-prefetched bases drive both the x window
        # (non-resident x) and the output block selection. The compat
        # one-hot kernel has no streamed variant (it exists for small
        # matrices); NOWINDOW maps to a full-block local reduce.
        in_specs = [
            (
                pl.BlockSpec(
                    (x_tiles.shape[0], LANES), lambda i, b: (0, 0)
                )
                if resident
                else pl.BlockSpec(
                    # Mosaic requires ALL dims Element when any is;
                    # the offset is 16-aligned by the planner and
                    # carries the multiple_of proof.
                    (pl.Element(wt), pl.Element(LANES)),
                    lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
                )
            ),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((chunk, 1), lambda i, b: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
        ]
        opnds = (x_tiles, vals, lidx, rel_tile, sl3)
        check_pallas_args(in_specs, opnds, label="sell-streamy")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nsb, LANES), lambda i, b: (b[2, i], 0)),
        )
        return pl.pallas_call(
            _make_sell_kernel_streamy(
                precision, nsb, min(nsw, nsb), wt, bf16_values, reduce2,
                resident,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(bases, *opnds)
    if onehot_dense:
        # Compatibility mode: build the one-hot planes with XLA outside
        # the kernel (loop-invariant, so fused benchmark loops hoist
        # them) and feed f32/int32 only.
        xw = jnp.stack(
            [
                jax.lax.dynamic_slice(
                    x_tiles.astype(jnp.float32), (bases[0, i], 0),
                    (wt, LANES),
                )
                for i in range(n_chunks)
            ]
        )
        oht = (
            rel_tile.reshape(n_chunks, chunk, 1)
            == jnp.arange(wt, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        seg = (
            jnp.arange(ns, dtype=jnp.int32)[None, :, None]
            == slice_of.reshape(n_chunks, 1, chunk)
        ).astype(jnp.float32)
        in_specs = [
            pl.BlockSpec((1, wt, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            pl.BlockSpec((1, chunk, wt), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ns, chunk), lambda i: (i, 0, 0)),
        ]
        opnds = (
            xw,
            vals.astype(jnp.float32),
            lidx.astype(jnp.int32),
            oht,
            seg,
        )
        check_pallas_args(in_specs, opnds, label="sell-compat")
        return pl.pallas_call(
            _make_sell_kernel_onehot(precision, ns, wt),
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(*opnds)
    if resident:
        ct = x_tiles.shape[0]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
            pl.BlockSpec((ct, k * LANES), lambda i: (0, 0)),  # res. x
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
        ]
        opnds = (bases, x_tiles, vals, lidx, rel_tile, sl3)
        check_pallas_args(in_specs, opnds, label="sell-resident")
        return pl.pallas_call(
            _make_sell_kernel_resident(
                precision, ns, nsw, wt, bf16_values, reduce2, k
            ),
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, k * LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, k * LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(*opnds)

    if prefetch:
        # x stays in HBM; each chunk's (wt, LANES) window is DMA'd by
        # the pipeline at the 16-aligned Element offset tile_base[i].
        in_specs = [
            pl.BlockSpec(
                # All-Element spec (Mosaic: no mixed Element/block
                # dims); 16-aligned by the planner.
                (pl.Element(wt), pl.Element(k * LANES)),
                lambda i, b: (pl.multiple_of(b[0, i], 16), 0),
            ),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((chunk, LANES), lambda i, b: (i, 0)),
            pl.BlockSpec((chunk, 1), lambda i, b: (i, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, b: (i, 0, 0)),
        ]
        opnds = (x_tiles, vals, lidx, rel_tile, sl3)
        check_pallas_args(in_specs, opnds, label="sell-prefetch")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, k * LANES), lambda i, b: (0, 0)),
        )
        return pl.pallas_call(
            _make_sell_kernel_prefetch(precision, ns, nsw, wt,
                                       bf16_values, reduce2, k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns, k * LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(vmem_mb),
        )(bases, *opnds)

    # Fallback: per-chunk x windows as a handful of overlapping dynamic
    # slices (XLA host of the pallas_call; n_chunks is small and static).
    if k > 1:
        raise ValueError(
            "fused SpMM supports the resident/prefetch kernels only"
        )
    xw = jnp.stack(
        [
            jax.lax.dynamic_slice(x_tiles, (bases[0, i], 0), (wt, LANES))
            for i in range(n_chunks)
        ]
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
        pl.BlockSpec((1, wt, LANES), lambda i: (i, 0, 0)),
        pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
        pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
        pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
        pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
    ]
    opnds = (bases, xw, vals, lidx, rel_tile, sl3)
    check_pallas_args(in_specs, opnds, label="sell-windowstack")
    return pl.pallas_call(
        _make_sell_kernel(precision, ns, nsw, wt, bf16_values, reduce2),
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ns, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
        interpret=interpret,
        **_mosaic_kwargs(vmem_mb),
    )(*opnds)


class SellSpMV:
    """Encoded SELL-T1 operator: ``y = op(x)`` on TPU via Pallas.

    Build once per matrix (host planning + device upload), call many
    times. ``interpret=True`` runs the kernel in the Pallas interpreter
    (used automatically off-TPU, e.g. in the CPU test suite).
    """

    def __init__(
        self,
        plan: SellPlan,
        interpret: bool | None = None,
        precision=None,
        value_dtype=None,
        vmem_mb: int | None = None,
        _triplets=None,
    ):
        self.plan = plan
        self.shape = plan.shape
        self.interpret = _use_interpret() if interpret is None else interpret
        # Per-operator Mosaic VMEM budget override (the autotuner sets
        # this for big-chunk plans whose resident blocks exceed the
        # default budget; SMVP_SELL_VMEM_MB remains a global fallback).
        self.vmem_mb = vmem_mb
        # bf16 value mode: vals AND the x stream are stored/streamed in
        # bfloat16 (halving the dominant HBM traffic) while all kernel
        # arithmetic accumulates in f32. Exact w.r.t. the bf16-rounded
        # inputs — see the kernel's table-matmul note.
        self.value_dtype = (
            jnp.dtype(value_dtype) if value_dtype is not None
            else jnp.dtype(jnp.float32)
        )
        if precision is not None:
            self.precision = precision
        else:
            # HIGHEST (6-pass) everywhere precision is consulted: Mosaic
            # on v5e rejects Precision.HIGH outright ("Unsupported dot
            # precision: HIGH", measured in the r4 hardware session), so
            # the 3-pass ladder is not available. bf16 value mode rarely
            # reaches this: it defaults to the reduce2 double-bf16 ladder
            # (see _apply) whose two DEFAULT passes are lossless for
            # <= 16-mantissa-bit bf16 products and measured faster.
            self.precision = jax.lax.Precision.HIGHEST
        if self.value_dtype not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)
        ):
            raise ValueError("value_dtype must be float32 or bfloat16")
        self._bf16 = self.value_dtype == jnp.dtype(jnp.bfloat16)
        # Static Mosaic-rule gate (ops/mosaic_check.py): a plan whose
        # base alignment or a precision the hardware rejects must fail
        # HERE, in every CPU test run, not on the first real compile.
        check_plan_alignment(plan)
        if not self.interpret:
            check_precision(self.precision)
        # Eager upload even if construction happens inside a jit trace
        # (e.g. the fused benchmark loop builds the cached operator during
        # tracing): without this the arrays would be trace-local tracers
        # and leak through the operator cache.
        with jax.ensure_compile_time_eval():
            self.vals = jnp.asarray(plan.vals, dtype=self.value_dtype)
            # Lane indices are 0..127: int8 storage carries the same
            # information at 1/4 the HBM traffic (lane_idx is otherwise
            # as large as the values plane). Mosaic tiles int8 as
            # (32, 128), so only chunk sizes that stay tile-aligned
            # compress; SMVP_SELL_LIDX32=1 forces int32 (fallback knob).
            lidx_dtype = (
                jnp.int8
                if plan.chunk % 32 == 0
                and os.environ.get("SMVP_SELL_LIDX32") != "1"
                else jnp.int32
            )
            self.lidx = jnp.asarray(plan.lane_idx, dtype=lidx_dtype)
            self.rel_tile = jnp.asarray(plan.rel_tile)
            self.slice_of = jnp.asarray(plan.slice_of)
            # bases[0] = per-chunk x tile-window starts, bases[1] =
            # per-chunk y slice-window starts (v6 reduce; block-LOCAL
            # for streamed plans), bases[2] (streamed-y plans only) =
            # per-chunk y block ids (v7 flush-behind).
            sb, self.nsw = plan.reduce_window()
            rows = [
                jnp.asarray(plan.tile_base, dtype=jnp.int32),
                jnp.asarray(sb, dtype=jnp.int32),
            ]
            if plan.y_block_slices:
                rows.append(jnp.asarray(plan.y_block_id, dtype=jnp.int32))
            self.bases = jnp.stack(rows)
        self._triplets = _triplets  # host (r, c, v) for lazy transpose
        self._t_op: "SellSpMV | None" = None
        self._slot_map: np.ndarray | None = None  # triplet -> flat slot
        self._packed_cache: jax.Array | None = None  # val‖rel‖lidx plane

    def _packed(self) -> jax.Array:
        """The packed val‖rel‖lidx int32 plane (built lazily, cached).

        Only meaningful in bf16 value mode with wt <= _PACK_WT_MAX (the
        9-bit rel field; dead sublanes store _PACK_REL_DEAD, which falls
        outside every one-hot window). Bit-exact vs the split planes:
        the value field is the SAME bf16 rounding as ``self.vals``, and
        bf16→f32 extension appends zero bits.
        """
        if self._packed_cache is None:
            plan = self.plan
            # The whole build sits under ensure_compile_time_eval: the
            # fused benchmark loop constructs/calls operators during a
            # jit trace, where a bare jnp.asarray would hand numpy a
            # tracer (plan arrays themselves are always host numpy).
            with jax.ensure_compile_time_eval():
                bits = (
                    np.asarray(jnp.asarray(plan.vals, jnp.bfloat16))
                    .view(np.uint16)
                    .astype(np.uint32)
                    << 16
                )
                rel = np.where(
                    plan.rel_tile < 0, _PACK_REL_DEAD, plan.rel_tile
                ).astype(np.uint32)  # (S, 1) broadcasts over lanes
                pk = bits | (rel << _PACK_REL_SHIFT) | plan.lane_idx.astype(
                    np.uint32
                )
                self._packed_cache = jnp.asarray(pk.view(np.int32))
        return self._packed_cache

    def _relsl(self) -> jax.Array:
        """The merged rel‖slice (n_chunks, chunk) int32 plane (cached).

        Gated on wt <= _PACK_WT_MAX and n_slices < _RELSL_SL_DEAD; dead
        markers land outside every one-hot window (see the module-level
        layout note)."""
        if getattr(self, "_relsl_cache", None) is None:
            with jax.ensure_compile_time_eval():
                self._relsl_cache = jnp.asarray(
                    relsl_plane_host(self.plan)
                )
        return self._relsl_cache

    @staticmethod
    def from_coo(coo: COOMatrix, **kw) -> "SellSpMV":
        r, c, v = coo.to_numpy()
        bf16 = jnp.dtype(kw.get("value_dtype") or jnp.float32) == \
            jnp.dtype(jnp.bfloat16)
        plan, vmem = _tuned_plan(r, c, v, coo.shape, bf16=bf16)
        kw.setdefault("vmem_mb", vmem)
        return SellSpMV(plan, _triplets=(r, c, v), **kw)

    def transpose(self) -> "SellSpMV":
        """Operator for Aᵀ (planned lazily from the stored triplets)."""
        if self._t_op is None:
            if self._triplets is None:
                raise ValueError(
                    "transpose requires an operator built via from_coo"
                )
            r, c, v = self._triplets
            plan_t = _auto_plan(
                np.asarray(c), np.asarray(r), v,
                (self.shape[1], self.shape[0]),
            )
            self._t_op = SellSpMV(
                plan_t,
                interpret=self.interpret,
                vmem_mb=self.vmem_mb,
                precision=self.precision,
                value_dtype=self.value_dtype,
                _triplets=(c, r, v),
            )
        return self._t_op

    def matmat(self, X: jax.Array, vals: jax.Array | None = None
               ) -> jax.Array:
        """Y = A·X for a dense block X (ncols, k) — fused SpMM.

        The fused kernel widens the x/y lanes to ``k*128`` (column j in
        lanes ``j*128:(j+1)*128``) so the packed value/index planes —
        the dominant HBM traffic at SELL occupancies — are read ONCE
        per chunk for all k columns; the vmap-over-columns fallback
        replays them k times. Columns are grouped into launches whose
        (NS, group*128) y block stays VMEM-resident (default group 8,
        ``SMVP_SELL_SPMM_GROUP``); streamed-y plans, compat mode, and
        ``SMVP_SELL_SPMM=0`` take the vmap fallback.
        """
        plan = self.plan
        if vals is None:
            vals = self.vals
        k = int(X.shape[1])
        if k == 1:
            return self._apply(X[:, 0], vals)[:, None]
        compat = (
            getattr(self, "onehot_dense", False)
            or os.environ.get("SMVP_SELL_COMPAT") == "1"
        )
        group = spmm_launch_group(
            plan.n_slices, plan.n_coltiles,
            jnp.dtype(self.value_dtype).itemsize,
        )
        if (
            os.environ.get("SMVP_SELL_SPMM") == "0"
            or plan.y_block_slices
            or compat
            or group < 2
        ):
            return jax.vmap(
                lambda xx: self._apply(xx, vals), in_axes=1, out_axes=1
            )(X)
        outs = [
            self._matmat_group(X[:, g0:g0 + group], vals)
            for g0 in range(0, k, group)
        ]
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    def _matmat_group(self, X: jax.Array, vals: jax.Array) -> jax.Array:
        """One fused SpMM launch over a column group that fits VMEM."""
        plan = self.plan
        kg = int(X.shape[1])
        ncols_pad = plan.n_coltiles * LANES
        X = X.astype(self.value_dtype)
        if X.shape[0] < ncols_pad:
            X = jnp.pad(X, ((0, ncols_pad - X.shape[0]), (0, 0)))
        x_tiles = pack_columns(X, plan.n_coltiles, kg)
        resident = (
            plan.n_coltiles * kg * LANES * x_tiles.dtype.itemsize
            <= _RESIDENT_X_LIMIT
        )
        prefetch = (
            not resident and os.environ.get("SMVP_SELL_PREFETCH") != "0"
        )
        if not resident and not prefetch:
            # No windowed-stack SpMM variant; vmap the SpMV fallback.
            return jax.vmap(
                lambda xx: self._apply(xx, vals), in_axes=1, out_axes=1
            )(X[: self.shape[1]])
        reduce2 = os.environ.get(
            "SMVP_SELL_REDUCE2", "1" if self._bf16 else "0"
        ) == "1"
        if os.environ.get("SMVP_SELL_REDUCE1") == "1":
            reduce2 = "1pass"  # single-pass bf16 reduce (see _seg_reduce)
        nsw = (
            plan.n_slices
            if os.environ.get("SMVP_SELL_NOWINDOW") == "1"
            else self.nsw
        )
        packed = (
            os.environ.get("SMVP_SELL_PACK") == "1"
            and self._bf16
            and vals is self.vals
            and plan.window_tiles <= _PACK_WT_MAX
        )
        relsl = (
            not packed
            and os.environ.get("SMVP_SELL_RELSL", "1") == "1"
            and plan.window_tiles <= _PACK_WT_MAX
            and plan.n_slices < _RELSL_SL_DEAD
        )
        y = _sell_spmv_call(
            x_tiles,
            vals.astype(self.value_dtype),
            self.lidx,
            self.rel_tile,
            self.slice_of,
            self.bases,
            n_chunks=plan.n_chunks,
            chunk=plan.chunk,
            ns=plan.n_slices,
            nsw=nsw,
            wt=plan.window_tiles,
            interpret=self.interpret,
            precision=self.precision,
            resident=resident,
            onehot_dense=False,
            reduce2=reduce2,
            prefetch=prefetch,
            nsb=0,
            k=kg,
            packed_plane=self._packed() if packed else None,
            relsl_plane=self._relsl() if relsl else None,
            vmem_mb=self.vmem_mb,
            split_chain=_chain_setting(plan.chunk, kg)[0],
            bf16_taa=_chain_setting(plan.chunk, kg)[1],
        )  # (NS, kg*LANES)
        return unpack_columns(y, plan.n_slices, kg)[: self.shape[0]]

    def differentiable(self):
        """A jax-differentiable ``f(x) = A·x`` (vjp via the Aᵀ operator).

        The XLA kernels are differentiable out of the box; the Pallas
        kernel is not, so the linear-map cotangent ``Aᵀ·g`` is supplied
        explicitly through a second SELL operator. Enables gradient-based
        consumers (GNN layers, iterative refinement) on the fast kernel.
        """
        op_t = self.transpose()
        this = self

        @jax.custom_vjp
        def f(x):
            return this(x)

        def fwd(x):
            return this(x), None

        def bwd(_, g):
            return (op_t(g),)

        f.defvjp(fwd, bwd)
        return f

    def differentiable_mat(self):
        """A jax-differentiable ``f(X) = A·X`` on the fused SpMM launch.

        Same construction as :meth:`differentiable` one k-block wider:
        the cotangent of the linear map is ``Aᵀ·G``, supplied through
        the transpose operator's own fused ``matmat``. Drops into the
        ``spmm=`` seams of :func:`gcn_train_step` / :func:`block_cg`
        as ``spmm=lambda m, X: f(X)`` — the whole GCN training step
        (forward and backward aggregation) then runs on the Pallas path.
        """
        op_t = self.transpose()
        this = self

        @jax.custom_vjp
        def f(X):
            return this.matmat(X)

        def fwd(X):
            return this.matmat(X), None

        def bwd(_, G):
            return (op_t.matmat(G),)

        f.defvjp(fwd, bwd)
        return f

    def vjp_vals(self, x: jax.Array, g: jax.Array) -> jax.Array:
        """Cotangent w.r.t. the packed values plane: (S, LANES) f32.

        SpMV is bilinear, so ``d(loss)/d(vals[s, l]) = g[row(s, l)] *
        x[col(s, l)]`` — computed by a dedicated Pallas kernel
        (:func:`_make_vals_grad_kernel`) whose two factors are the same
        one-hot MXU selects the forward uses; no scatter. Dead/padding
        slots receive exactly 0.
        """
        plan = self.plan
        if plan.y_block_slices:
            raise ValueError(
                "vals-grad needs a resident-y plan; streamed-y operators "
                "(> ~2M rows) train via the XLA kernels instead"
            )
        ncols_pad = plan.n_coltiles * LANES
        x = x.astype(self.value_dtype)
        if x.shape[0] < ncols_pad:
            x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
        x_tiles = x.reshape(plan.n_coltiles, LANES)
        nrows_pad = plan.n_slices * LANES
        g = g.astype(jnp.float32)
        if g.shape[0] < nrows_pad:
            g = jnp.pad(g, (0, nrows_pad - g.shape[0]))
        g2d = g.reshape(plan.n_slices, LANES)
        resident = (
            plan.n_coltiles * LANES * x_tiles.dtype.itemsize
            <= _RESIDENT_X_LIMIT
        )
        return _sell_vals_grad_call(
            x_tiles, g2d, self.lidx, self.rel_tile, self.slice_of,
            self.bases,
            chunk=plan.chunk,
            ns=plan.n_slices,
            nsw=self.nsw,
            wt=plan.window_tiles,
            interpret=self.interpret,
            vmem_mb=self.vmem_mb,
            precision=self.precision,
            resident=resident,
            bf16_values=self.value_dtype == jnp.dtype(jnp.bfloat16),
        )

    def vjp_vals_mat(self, X: jax.Array, G: jax.Array) -> jax.Array:
        """SpMM cotangent w.r.t. the packed values plane: (S, LANES).

        ``d(loss)/d(vals[s, l]) = Σ_j G_j[row(s, l)] · X_j[col(s, l)]``
        — the k-wide generalization of :meth:`vjp_vals`, computed by
        the same backward kernel with x/g in the fused-SpMM lane layout
        and the per-column products accumulated in-kernel. Columns
        group into launches under the usual VMEM policy; the packed
        index planes are read once per launch for all its columns.
        """
        plan = self.plan
        if plan.y_block_slices:
            raise ValueError(
                "vals-grad needs a resident-y plan; streamed-y operators "
                "(> ~2M rows) train via the XLA kernels instead"
            )
        k = int(X.shape[1])
        if k == 1:
            return self.vjp_vals(X[:, 0], G[:, 0])
        group = max(1, int(os.environ.get("SMVP_SELL_SPMM_GROUP", "8")))
        # The (NS, group*128) g block must stay VMEM-resident, same
        # budget rule as the forward's y block.
        g_bytes = plan.n_slices * LANES * 4
        group = max(1, min(group, _RESIDENT_Y_LIMIT // max(g_bytes, 1)))
        out = None
        for g0 in range(0, k, group):
            part = self._vjp_vals_group(
                X[:, g0:g0 + group], G[:, g0:g0 + group]
            )
            out = part if out is None else out + part
        return out

    def _vjp_vals_group(self, X: jax.Array, G: jax.Array) -> jax.Array:
        """One k-wide vals-grad launch over a VMEM-sized column group."""
        plan = self.plan
        kg = int(X.shape[1])
        ncols_pad = plan.n_coltiles * LANES
        X = X.astype(self.value_dtype)
        if X.shape[0] < ncols_pad:
            X = jnp.pad(X, ((0, ncols_pad - X.shape[0]), (0, 0)))
        x_tiles = pack_columns(X, plan.n_coltiles, kg)
        nrows_pad = plan.n_slices * LANES
        G = G.astype(jnp.float32)
        if G.shape[0] < nrows_pad:
            G = jnp.pad(G, ((0, nrows_pad - G.shape[0]), (0, 0)))
        g2d = pack_columns(G, plan.n_slices, kg)
        resident = (
            plan.n_coltiles * LANES * x_tiles.dtype.itemsize * kg
            <= _RESIDENT_X_LIMIT
        )
        return _sell_vals_grad_call(
            x_tiles, g2d, self.lidx, self.rel_tile, self.slice_of,
            self.bases,
            chunk=plan.chunk,
            ns=plan.n_slices,
            nsw=self.nsw,
            wt=plan.window_tiles,
            interpret=self.interpret,
            vmem_mb=self.vmem_mb,
            precision=self.precision,
            resident=resident,
            bf16_values=self.value_dtype == jnp.dtype(jnp.bfloat16),
            k=kg,
        )

    def slot_map(self) -> np.ndarray:
        """Flat slot index (into ``vals.reshape(-1)``) of each triplet.

        Derived planner-agnostically: the slot layout depends only on
        (rows, cols), so re-planning with probe values 1..nnz and
        reading the probe ids back out of the packed plane recovers the
        mapping bit-exactly for WHATEVER planner built it (numpy or
        native). Cached per operator; requires ``from_coo`` triplets.
        """
        if self._slot_map is None:
            if self._triplets is None:
                raise ValueError(
                    "slot_map requires an operator built via from_coo"
                )
            if self.plan.y_block_slices:
                # The probe below rebuilds a FLAT plan; a streamed-y
                # operator's sublane order is block-major, so the flat
                # slot indices would silently mis-scatter values into
                # the streamed plane (and the backward has no streamed
                # kernel anyway — see vjp_vals).
                raise ValueError(
                    "slot_map/differentiable_edges need a resident-y "
                    "plan; streamed-y operators (> ~2M rows) train via "
                    "the XLA kernels instead"
                )
            r, c, _v = self._triplets
            nnz = len(r)
            if nnz >= (1 << 24):
                raise ValueError(
                    "slot_map probe ids must stay exact in f32 "
                    "(nnz < 2^24); train larger matrices on the XLA path"
                )
            probe = np.arange(1, nnz + 1, dtype=np.float32)
            p = build_sell_plan(
                np.asarray(r), np.asarray(c), probe, self.shape,
                chunk=self.plan.chunk,
            )
            flat = p.vals.reshape(-1)
            nz = np.flatnonzero(flat)
            if len(nz) != nnz:
                raise AssertionError(
                    "probe plan slot count mismatch (planner drift?)"
                )
            ids = flat[nz].astype(np.int64) - 1
            slot = np.empty(nnz, dtype=np.int64)
            slot[ids] = nz
            self._slot_map = slot
        return self._slot_map

    def differentiable_edges(self):
        """``f(v, x) = A(v)·x``, differentiable in BOTH arguments.

        ``v`` is the nnz-vector of matrix values in the from_coo triplet
        order — the natural parameterization for trainable edge weights
        (GCN attention-free edge learning, sparse weight fine-tuning).
        Inside the trace ``v`` is scattered into the packed SELL plane
        (and, for the x-cotangent, into the transpose plane), so ONE set
        of live parameters drives the forward kernel, the d/dx kernel
        (Aᵀ·g) and the d/dv kernel (:meth:`vjp_vals`) — all three on the
        Pallas performance path.
        """
        plan = self.plan
        op_t = self.transpose()
        slots = jnp.asarray(self.slot_map())
        slots_t = jnp.asarray(op_t.slot_map())
        n_slot = plan.n_sublanes * LANES
        n_slot_t = op_t.plan.n_sublanes * LANES
        vdt = self.value_dtype
        this = self

        def _scatter(v, slot_idx, n):
            return (
                jnp.zeros((n,), vdt).at[slot_idx].set(v.astype(vdt))
            )

        @jax.custom_vjp
        def f(v, x):
            vals = _scatter(v, slots, n_slot).reshape(-1, LANES)
            return this._apply(x, vals)

        def fwd(v, x):
            return f(v, x), (v, x)

        def bwd(res, g):
            v, x = res
            gv = this.vjp_vals(x, g).reshape(-1)[slots]
            vals_t = _scatter(v, slots_t, n_slot_t).reshape(-1, LANES)
            gx = op_t._apply(g, vals_t)[: x.shape[0]].astype(x.dtype)
            return gv.astype(v.dtype), gx

        f.defvjp(fwd, bwd)
        return f

    def differentiable_edges_mat(self):
        """``f(v, X) = A(v)·X``, differentiable in both arguments.

        The SpMM generalization of :meth:`differentiable_edges`: one
        nnz-vector of trainable edge values drives the fused forward
        SpMM, the d/dX cotangent (Aᵀ·G through the transpose operator's
        fused matmat), and the d/dv cotangent (:meth:`vjp_vals_mat`) —
        GCN edge-weight training over full feature matrices, every pass
        on the Pallas path.
        """
        plan = self.plan
        op_t = self.transpose()
        slots = jnp.asarray(self.slot_map())
        slots_t = jnp.asarray(op_t.slot_map())
        n_slot = plan.n_sublanes * LANES
        n_slot_t = op_t.plan.n_sublanes * LANES
        vdt = self.value_dtype
        this = self

        def _scatter(v, slot_idx, n):
            return (
                jnp.zeros((n,), vdt).at[slot_idx].set(v.astype(vdt))
            )

        @jax.custom_vjp
        def f(v, X):
            vals = _scatter(v, slots, n_slot).reshape(-1, LANES)
            return this.matmat(X, vals=vals)

        def fwd(v, X):
            return f(v, X), (v, X)

        def bwd(res, G):
            v, X = res
            gv = this.vjp_vals_mat(X, G).reshape(-1)[slots]
            vals_t = _scatter(v, slots_t, n_slot_t).reshape(-1, LANES)
            gX = op_t.matmat(G, vals=vals_t)[: X.shape[0]].astype(X.dtype)
            return gv.astype(v.dtype), gX

        f.defvjp(fwd, bwd)
        return f

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._apply(x, self.vals)

    def bench_loop_mat(self, X: jax.Array, iterations: int) -> jax.Array:
        """N sequential fused SpMMs in ONE launch (grid-fused, k-wide).

        The SpMM twin of :meth:`bench_loop`: Y = A·X recomputed each
        iteration inside the Mosaic grid, planes re-streamed per
        iteration, X resident in the fused lane layout. relsl layout,
        resident-x/-y plans only.
        """
        plan = self.plan
        if plan.y_block_slices:
            raise ValueError("bench_loop_mat requires a resident-y plan")
        kg = int(X.shape[1])
        if kg == 1:
            return self.bench_loop(X[:, 0], iterations)[:, None]
        if not (
            os.environ.get("SMVP_SELL_RELSL", "1") == "1"
            and plan.window_tiles <= _PACK_WT_MAX
            and plan.n_slices < _RELSL_SL_DEAD
        ):
            raise ValueError("bench_loop_mat runs the relsl layout only")
        ncols_pad = plan.n_coltiles * LANES
        X = X.astype(self.value_dtype)
        if X.shape[0] < ncols_pad:
            X = jnp.pad(X, ((0, ncols_pad - X.shape[0]), (0, 0)))
        x_tiles = pack_columns(X, plan.n_coltiles, kg)
        resident = (
            plan.n_coltiles * kg * LANES * x_tiles.dtype.itemsize
            <= _RESIDENT_X_LIMIT
        )
        reduce2 = os.environ.get(
            "SMVP_SELL_REDUCE2", "1" if self._bf16 else "0"
        ) == "1"
        if os.environ.get("SMVP_SELL_REDUCE1") == "1":
            reduce2 = "1pass"
        nsw = (
            plan.n_slices
            if os.environ.get("SMVP_SELL_NOWINDOW") == "1"
            else self.nsw
        )
        chunk, nch, ns = plan.chunk, plan.n_chunks, plan.n_slices
        ct = plan.n_coltiles
        split, bf16_taa = _chain_setting(plan.chunk, kg)
        kern = _make_sell_kernel_bench(
            self.precision, ns, nsw, plan.window_tiles, self._bf16,
            reduce2, relsl=True, k=kg, resident=resident,
            split=split, bf16_taa=bf16_taa,
        )
        rs3 = self._relsl().reshape(nch, 1, chunk)
        if resident:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, kg * LANES), lambda it, ch: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
            ]
            opnds = (self.bases, x_tiles, self.vals, self.lidx, rs3)
            check_pallas_args(in_specs[1:], opnds[1:],
                              label="sell-bench-grid-spmm")
            y = pl.pallas_call(
                kern,
                grid=(iterations, nch),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((ns, kg * LANES),
                                       lambda it, ch: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((ns, kg * LANES),
                                               jnp.float32),
                interpret=self.interpret,
                **_mosaic_kwargs(self.vmem_mb),
            )(*opnds)
            return unpack_columns(y, ns, kg)[: self.shape[0]]
        # > VMEM X: per-chunk scalar-prefetch windows (the production
        # fused-SpMM mode at scale) — X stays in HBM, each (wt, k*128)
        # window is DMA'd per chunk per iteration.
        in_specs = [
            pl.BlockSpec(
                (pl.Element(plan.window_tiles), pl.Element(kg * LANES)),
                lambda it, ch, b: (pl.multiple_of(b[0, ch], 16), 0),
            ),
            pl.BlockSpec((chunk, LANES), lambda it, ch, b: (ch, 0)),
            pl.BlockSpec((chunk, LANES), lambda it, ch, b: (ch, 0)),
            pl.BlockSpec((1, 1, chunk), lambda it, ch, b: (ch, 0, 0)),
        ]
        opnds = (x_tiles, self.vals, self.lidx, rs3)
        check_pallas_args(in_specs, opnds,
                          label="sell-bench-grid-spmm-prefetch")
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(iterations, nch),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, kg * LANES),
                                   lambda it, ch, b: (0, 0)),
        )
        y = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns, kg * LANES), jnp.float32),
            interpret=self.interpret,
            **_mosaic_kwargs(self.vmem_mb),
        )(self.bases, *opnds)
        return unpack_columns(y, ns, kg)[: self.shape[0]]

    def bench_loop(self, x: jax.Array, iterations: int) -> jax.Array:
        """N sequential SpMVs in ONE launch: grid = (iterations, chunks).

        Returns the final iteration's y (each iteration recomputes y
        from scratch; the packed planes re-stream from HBM per
        iteration — see :func:`_make_sell_kernel_bench`). This is the
        benchmark-protocol runner for the tunneled dev stack, where an
        XLA loop iteration costs ~140 µs regardless of body; production
        consumers compose ``__call__`` normally. Resident-x,
        resident-y plans only (the benchmark matrices all qualify).
        """
        plan = self.plan
        ncols_pad = plan.n_coltiles * LANES
        x = x.astype(self.value_dtype)
        if x.shape[0] < ncols_pad:
            x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
        x_tiles = x.reshape(plan.n_coltiles, LANES)
        if (plan.n_coltiles * LANES * x_tiles.dtype.itemsize
                > _RESIDENT_X_LIMIT):
            raise ValueError("bench_loop requires a VMEM-resident x")
        reduce2 = os.environ.get(
            "SMVP_SELL_REDUCE2", "1" if self._bf16 else "0"
        ) == "1"
        if os.environ.get("SMVP_SELL_REDUCE1") == "1":
            reduce2 = "1pass"  # single-pass bf16 reduce (see _seg_reduce)
        nsw = (
            plan.n_slices
            if os.environ.get("SMVP_SELL_NOWINDOW") == "1"
            else self.nsw
        )
        packed = (
            os.environ.get("SMVP_SELL_PACK") == "1"
            and self._bf16
            and plan.window_tiles <= _PACK_WT_MAX
        )
        relsl = (
            not packed
            and os.environ.get("SMVP_SELL_RELSL", "1") == "1"
            and plan.window_tiles <= _PACK_WT_MAX
            and plan.n_slices < _RELSL_SL_DEAD
        )
        chunk, nch, ns = plan.chunk, plan.n_chunks, plan.n_slices
        ct = plan.n_coltiles
        nsb = plan.y_block_slices
        sl3 = self.slice_of.reshape(nch, 1, chunk)
        split, bf16_taa = _chain_setting(plan.chunk, 1)
        # Per-sub-chain windows (_sub_windows): ~1/split of the one-hot
        # MXU work — measured 35% SLOWER on v5e (the four dynamic
        # x/y windows per step serialize harder than the MACs they
        # save; the dots were never the bottleneck). Kept as an
        # opt-in experiment: SMVP_SELL_SUBWIN=1.
        sub_wt = sub_nsw = 0
        bases = self.bases
        if (relsl and nsb == 0 and split > 1
                and os.environ.get("SMVP_SELL_SUBWIN") == "1"):
            sub = _sub_windows(plan, split)
            if sub is not None:
                stb, ssb, sub_wt, sub_nsw = sub
                with jax.ensure_compile_time_eval():
                    bases = jnp.concatenate([
                        self.bases[:2],
                        jnp.asarray(stb.T),
                        jnp.asarray(ssb.T),
                    ])
        kern = _make_sell_kernel_bench(
            self.precision, ns, nsw, plan.window_tiles, self._bf16,
            reduce2, packed=packed, relsl=relsl, nsb=nsb,
            split=split, bf16_taa=bf16_taa, sub_wt=sub_wt,
            sub_nsw=sub_nsw,
        )
        if nsb > 0 and packed:
            raise ValueError(
                "streamed-y bench_loop supports relsl/split-plane modes"
            )
        if nsb > 0:
            # Streamed-y v7: 2-D grid with scalar-prefetched block ids
            # driving the output index map; blocks re-write per
            # iteration (flush on id change, exactly the production
            # flush-behind).
            if relsl:
                in_specs = [
                    pl.BlockSpec((ct, LANES), lambda it, ch, b: (0, 0)),
                    pl.BlockSpec((chunk, LANES),
                                 lambda it, ch, b: (ch, 0)),
                    pl.BlockSpec((chunk, LANES),
                                 lambda it, ch, b: (ch, 0)),
                    pl.BlockSpec((1, 1, chunk),
                                 lambda it, ch, b: (ch, 0, 0)),
                ]
                opnds = (x_tiles, self.vals, self.lidx,
                         self._relsl().reshape(nch, 1, chunk))
            else:
                in_specs = [
                    pl.BlockSpec((ct, LANES), lambda it, ch, b: (0, 0)),
                    pl.BlockSpec((chunk, LANES),
                                 lambda it, ch, b: (ch, 0)),
                    pl.BlockSpec((chunk, LANES),
                                 lambda it, ch, b: (ch, 0)),
                    pl.BlockSpec((chunk, 1), lambda it, ch, b: (ch, 0)),
                    pl.BlockSpec((1, 1, chunk),
                                 lambda it, ch, b: (ch, 0, 0)),
                ]
                opnds = (x_tiles, self.vals, self.lidx, self.rel_tile,
                         sl3)
            check_pallas_args(in_specs, opnds,
                              label="sell-bench-grid-streamy")
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(iterations, nch),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (nsb, LANES), lambda it, ch, b: (b[2, ch], 0)
                ),
            )
            y = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
                interpret=self.interpret,
                **_mosaic_kwargs(self.vmem_mb),
            )(self.bases, *opnds)
            return y.reshape(-1)[: self.shape[0]]
        if packed:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda it, ch: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
            ]
            opnds = (self.bases, x_tiles, self._packed(), sl3)
        elif relsl:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda it, ch: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
            ]
            opnds = (bases, x_tiles, self.vals, self.lidx,
                     self._relsl().reshape(nch, 1, chunk))
        else:
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda it, ch: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((chunk, 1), lambda it, ch: (ch, 0)),
                pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
            ]
            opnds = (self.bases, x_tiles, self.vals, self.lidx,
                     self.rel_tile, sl3)
        check_pallas_args(in_specs[1:], opnds[1:],
                          label="sell-bench-grid")
        y = pl.pallas_call(
            kern,
            grid=(iterations, nch),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((ns, LANES), lambda it, ch: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
            interpret=self.interpret,
            **_mosaic_kwargs(self.vmem_mb),
        )(*opnds)
        return y.reshape(-1)[: self.shape[0]]

    def _apply(self, x: jax.Array, vals: jax.Array) -> jax.Array:
        """y = A·x with the packed values plane passed explicitly.

        ``__call__`` passes the operator's own (static) plane; the
        trainable-edge path (:meth:`differentiable_edges`) passes a
        plane scattered from live parameters inside the trace.
        """
        plan = self.plan
        ncols_pad = plan.n_coltiles * LANES
        x = x.astype(self.value_dtype)
        if x.shape[0] < ncols_pad:
            x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
        x_tiles = x.reshape(plan.n_coltiles, LANES)
        return self._apply_tiles(x_tiles, vals)

    def _apply_tiles(self, x_tiles: jax.Array,
                     vals: jax.Array | None = None) -> jax.Array:
        """The launch half of :meth:`_apply`: x already cast to the
        value dtype and packed as (n_coltiles, 128) tiles. Exposed so
        per-apply x prep can be hoisted out of tight benchmark loops
        (experiments/tpu_r4_session7.py measures its cost)."""
        plan = self.plan
        if vals is None:
            vals = self.vals
        resident = (
            plan.n_coltiles * LANES * x_tiles.dtype.itemsize
            <= _RESIDENT_X_LIMIT
        )
        onehot_dense = (
            getattr(self, "onehot_dense", False)
            or os.environ.get("SMVP_SELL_COMPAT") == "1"
        )
        # Double-bf16 row reduce (SMVP_SELL_REDUCE2): two single-pass
        # matmuls instead of HIGHEST's 6 — lossless in bf16 value mode
        # (its default; products carry <= 16 mantissa bits), ~1e-5
        # relative for f32 values (opt-in). Read here (outside jit) so
        # toggling retraces.
        reduce2 = os.environ.get(
            "SMVP_SELL_REDUCE2", "1" if self._bf16 else "0"
        ) == "1"
        if os.environ.get("SMVP_SELL_REDUCE1") == "1":
            reduce2 = "1pass"  # single-pass bf16 reduce (see _seg_reduce)
        # Escape hatch: SMVP_SELL_NOWINDOW=1 forces the static
        # full-block reduce store (the pre-v6 kernel path; for streamed
        # plans this is a full LOCAL-block reduce — y still streams).
        nsw = (
            (plan.y_block_slices or plan.n_slices)
            if os.environ.get("SMVP_SELL_NOWINDOW") == "1"
            else self.nsw
        )
        # Non-resident x: scalar-prefetch windows by default (x crosses
        # HBM ~once), host-side window stack as the escape hatch.
        prefetch = (
            not resident
            and os.environ.get("SMVP_SELL_PREFETCH") != "0"
        )
        # Packed-plane route (SMVP_SELL_PACK=1, bf16 values): val‖rel‖
        # lidx fused into one int32 stream — only for the operator's own
        # static plane (trainable-vals traces pass a live plane) and
        # plans whose rel fits the 9-bit field.
        packed = (
            os.environ.get("SMVP_SELL_PACK") == "1"
            and self._bf16
            and vals is self.vals
            and plan.window_tiles <= _PACK_WT_MAX
            and not onehot_dense
            and (resident or prefetch)
        )
        # 3-stream rel‖slice route (the DEFAULT where its gates pass —
        # SMVP_SELL_RELSL=0 reverts to split planes): the two
        # per-sublane metadata streams merge; vals/lidx ride unchanged
        # (works for traced vals planes and both value dtypes).
        # Measured fastest layout at every grid-fused cell (session 13:
        # synth-10M c2048 44.7 vs 33.5 packed / ~32 split Gnnz/s).
        relsl = (
            not packed
            and os.environ.get("SMVP_SELL_RELSL", "1") == "1"
            and plan.window_tiles <= _PACK_WT_MAX
            and plan.n_slices < _RELSL_SL_DEAD
            and not onehot_dense
            and (resident or prefetch)
        )
        # Split launch (SMVP_SELL_SPLIT=N): partition the chunk sweep
        # across N pallas_calls and sum the partial ys — an A/B probe of
        # whether independent launches overlap their plane DMA (micro3's
        # "dual" rung measured 2 x 2-stream calls at 579 GB/s aggregate
        # vs ~250 GB/s for one 4-stream call). Plane slices are pre-cut
        # on the host and cached as separate device arrays: an in-trace
        # slice feeding a pallas_call cannot fuse into the custom call,
        # so XLA would materialize a copy and double the plane traffic.
        n_split = max(1, int(os.environ.get("SMVP_SELL_SPLIT", "1")))
        if (
            plan.y_block_slices
            or onehot_dense
            or not (resident or prefetch)
            or vals is not self.vals
        ):
            n_split = 1
        n_split = min(n_split, plan.n_chunks)

        def launch(a, b, planes):
            pvals, plidx, prel, psl, pbases, ppk, prs = planes
            return _sell_spmv_call(
                x_tiles,
                pvals.astype(self.value_dtype),
                plidx,
                prel,
                psl,
                pbases,
                n_chunks=b - a,
                chunk=plan.chunk,
                ns=plan.n_slices,
                nsw=nsw,
                wt=plan.window_tiles,
                interpret=self.interpret,
                precision=self.precision,
                resident=resident,
                # The compat one-hot kernel has no streamed-y variant —
                # streamed plans always run the main kernel family.
                onehot_dense=onehot_dense and not plan.y_block_slices,
                reduce2=reduce2,
                prefetch=prefetch,
                nsb=plan.y_block_slices,
                packed_plane=ppk,
                relsl_plane=prs,
                vmem_mb=self.vmem_mb,
                split_chain=_chain_setting(plan.chunk, 1)[0],
                bf16_taa=_chain_setting(plan.chunk, 1)[1],
            )

        if n_split == 1:
            full = (
                vals, self.lidx, self.rel_tile, self.slice_of, self.bases,
                self._packed() if packed else None,
                self._relsl() if relsl else None,
            )
            y = launch(0, plan.n_chunks, full)
        else:
            y = None
            for a, b, planes in self._split_planes(n_split, packed, relsl):
                part = launch(a, b, planes)
                y = part if y is None else y + part
        return y.reshape(-1)[: self.shape[0]]

    def _split_planes(self, n_split: int, packed: bool, relsl: bool = False):
        """Host-cached per-range plane slices for the split launch."""
        key = (n_split, packed, relsl)
        cache = getattr(self, "_split_cache", None)
        if cache is None:
            cache = self._split_cache = {}
        if key not in cache:
            plan = self.plan
            per = -(-plan.n_chunks // n_split)
            pk = self._packed() if packed else None
            rs = self._relsl() if relsl else None
            out = []
            with jax.ensure_compile_time_eval():
                for a in range(0, plan.n_chunks, per):
                    b = min(a + per, plan.n_chunks)
                    lo, hi = a * plan.chunk, b * plan.chunk
                    out.append((
                        a, b,
                        (
                            jnp.asarray(self.vals[lo:hi]),
                            jnp.asarray(self.lidx[lo:hi]),
                            jnp.asarray(self.rel_tile[lo:hi]),
                            jnp.asarray(self.slice_of[a:b]),
                            jnp.asarray(self.bases[:, a:b]),
                            jnp.asarray(pk[lo:hi])
                            if pk is not None
                            else None,
                            jnp.asarray(rs[a:b])
                            if rs is not None
                            else None,
                        ),
                    ))
            cache[key] = out
        return cache[key]


# ---------------------------------------------------------------------------
# Format-level wrappers with per-matrix operator caching
# ---------------------------------------------------------------------------

_CACHE: Dict[int, Tuple[object, SellSpMV]] = {}


def _triplets_from_csr_host(csr: CSRMatrix):
    """Host (numpy) CSR → COO triplets — safe to call inside a jit trace
    (the format arrays are concrete closure constants; the *jitted*
    decode would inline into the trace and hand us tracers)."""
    row_ptr = np.asarray(csr.row_ptr)
    col = np.asarray(csr.col_ind)[: csr.nnz]
    val = np.asarray(csr.vals)[: csr.nnz]
    rows = np.repeat(
        np.arange(csr.nrows, dtype=np.int64), np.diff(row_ptr.astype(np.int64))
    )
    return rows, col, val, csr.shape


def _triplets_from_tjds_host(tjds: TJDSMatrix):
    """Host (numpy) TJDS → COO triplets (mirrors formats/tjds.py decode)."""
    sp = np.asarray(tjds.start_pos).astype(np.int64)
    j = np.arange(tjds.nnz, dtype=np.int64)
    d = np.searchsorted(sp, j, side="right") - 1
    offset = j - sp[d]
    perm = np.asarray(tjds.perm)
    cols = perm[np.clip(offset, 0, max(tjds.ncols - 1, 0))]
    rows = np.asarray(tjds.row_ind)[: tjds.nnz]
    vals = np.asarray(tjds.vals)[: tjds.nnz]
    return rows, cols, vals, tjds.shape


def _triplets_from_coo_host(coo: COOMatrix):
    r, c, v = coo.to_numpy()
    return r, c, v, coo.shape


def _tuned_plan(rows, cols, vals, shape, *, bf16: bool):
    """Production plan choice: calibrated per-matrix chunk + VMEM.

    The autotuner (ops/autotune.py, fit to 14 clean grid-fused v5e
    cells) picks the chunk per matrix — memplus-class wants one big
    chunk + a raised VMEM budget, pwt/synth want c2048-class — with no
    env knobs. SMVP_SELL_AUTOTUNE=0 pins the old fixed c2048 default.
    Returns (plan, vmem_mb).
    """
    if os.environ.get("SMVP_SELL_AUTOTUNE") == "0":
        return _auto_plan(rows, cols, vals, shape), None
    from smvp_toolkit_tpu.ops.autotune import (
        pick_plan, pick_vmem_mb, production_rates,
    )

    plan, _cost = pick_plan(
        rows, cols, vals, shape, bf16=bf16, rates=production_rates()
    )
    return plan, pick_vmem_mb(plan.chunk)


def _auto_plan(rows, cols, vals, shape, chunk: int = 2048) -> SellPlan:
    """Flat plan while y fits VMEM; streamed-y (v7) plan beyond it.

    Default chunk 2048: the measured grid-fused winner on every
    benchmark matrix (sessions 13-14 — memplus 9.3 vs 11.9 µs/iter at
    c1024, pwt 8.8 vs 9.8, synth-10M 217 vs 286)."""
    from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan

    if shape[0] * 4 > _RESIDENT_Y_LIMIT:  # NS*LANES*4 ≈ nrows*4 bytes
        return build_streamed_sell_plan(
            rows, cols, vals, shape, chunk=chunk,
            y_block_rows=_STREAM_Y_BLOCK_ROWS,
        )
    return build_sell_plan(rows, cols, vals, shape, chunk=chunk)


def _cached_op(matrix, triplets_fn) -> SellSpMV:
    """Per-matrix operator cache keyed weakly: the cache must not keep a
    discarded matrix's device buffers (or its multi-MB SELL planes) alive
    — entries evict when the matrix object is collected."""
    key = id(matrix)
    hit = _CACHE.get(key)
    if hit is not None:
        ref, op = hit
        if ref() is matrix:
            return op
        del _CACHE[key]  # stale id reuse
    r, c, v, shape = triplets_fn(matrix)
    # A bfloat16-encoded matrix runs the kernel in bf16 value mode (the
    # CLI's --dtype bfloat16 must actually change kernel traffic, not
    # just the encode dtype).
    vdt = (
        jnp.bfloat16
        if jnp.dtype(getattr(matrix, "dtype", jnp.float32)) == jnp.bfloat16
        else jnp.float32
    )
    plan, vmem = _tuned_plan(r, c, v, shape, bf16=vdt == jnp.bfloat16)
    op = SellSpMV(plan, value_dtype=vdt, vmem_mb=vmem,
                  _triplets=(r, c, v))
    try:
        ref = weakref.ref(matrix, lambda _r, _k=key: _CACHE.pop(_k, None))
    except TypeError:  # non-weakrefable input
        ref = lambda m=matrix: m  # noqa: E731 — strong fallback
    _CACHE[key] = (ref, op)
    if len(_CACHE) > 64:  # hard bound even if nothing gets collected
        _CACHE.pop(next(iter(_CACHE)))
    return op


def spmv_csr_pallas(csr: CSRMatrix, x: jax.Array) -> jax.Array:
    """y = A·x from CSR via the Pallas SELL-T1 kernel (plan cached)."""
    return _cached_op(csr, _triplets_from_csr_host)(x)


def sell_op_csr(csr: CSRMatrix) -> SellSpMV:
    """The cached SELL operator for a *concrete* CSR matrix.

    Planning happens host-side from concrete arrays, so callers that
    will trace over the matrix (solvers, jitted training steps) must
    build the operator eagerly with this and close over it — passing
    ``spmv_csr_pallas`` into a jit boundary raises on the traced matrix.
    """
    return _cached_op(csr, _triplets_from_csr_host)


def spmv_tjds_pallas(tjds: TJDSMatrix, x: jax.Array) -> jax.Array:
    """y = A·x from TJDS via the Pallas SELL-T1 kernel (plan cached)."""
    return _cached_op(tjds, _triplets_from_tjds_host)(x)


def spmv_coo_pallas(coo: COOMatrix, x: jax.Array) -> jax.Array:
    """y = A·x from COO via the Pallas SELL-T1 kernel (plan cached)."""
    return _cached_op(coo, _triplets_from_coo_host)(x)


def sell_op_coo(coo: COOMatrix) -> SellSpMV:
    """The cached SELL operator for a *concrete* COO matrix.

    Same contract as :func:`sell_op_csr` — planning is host-side, so
    this never compiles a device program; the returned operator is safe
    to close over inside jit. bench.py builds its TPU operator this way
    to avoid the jitted ``csr_encode`` remote compile entirely.
    """
    return _cached_op(coo, _triplets_from_coo_host)


def _triplets_from_cisr_host(cisr):
    """Host CISR schedule → COO triplets (live cells only)."""
    rows = np.asarray(cisr.row_of)
    mask = rows >= 0
    return (
        rows[mask].astype(np.int64),
        np.asarray(cisr.col_ind)[mask].astype(np.int64),
        np.asarray(cisr.vals)[mask],
        cisr.shape,
    )


def spmv_cisr_pallas(cisr, x: jax.Array) -> jax.Array:
    """y = A·x from a CISR schedule via the Pallas SELL-T1 kernel.

    The interleaved schedule is replanned into the SELL layout (cached),
    so CISR inputs get the same TPU performance path as CSR/TJDS; the
    schedule-faithful lane-per-channel execution lives in
    ``spmv_cisr.py``.
    """
    return _cached_op(cisr, _triplets_from_cisr_host)(x)


class CoClusteredSellSpMV:
    """SELL-T1 operator on jointly co-clustered coordinates.

    The co-clustering planner (ops/cocluster.py) re-derives the
    row->slice and col->tile assignments jointly, lifting occupancy —
    the linear factor of kernel throughput — beyond what any natural-
    order plan can reach. The price is a coordinate change: the inner
    kernel computes y' = A'·x' where x' = scatter(x, col_map) and
    y = y'[row_map].

    Fast path (solvers, benchmarks): stay in PERMUTED space via
    ``to_permuted`` / ``from_permuted`` at the boundaries and call
    ``inner`` (or ``bench_loop``) directly — zero per-iteration
    conversion cost, exactly the SELL-C-sigma preprocessing contract.
    Convenience path: ``__call__`` takes/returns natural coordinates
    (pays one device gather + scatter per call).

    Capability accelerated: the reference CSR hot loop
    (main-cli.c:410-416).
    """

    def __init__(self, coo: COOMatrix, value_dtype=None,
                 chunk: int | None = None,
                 interpret: bool | None = None, **cocluster_kw):
        from smvp_toolkit_tpu.ops.cocluster import cocluster_plan

        r, c, v = coo.to_numpy()
        bf16 = jnp.dtype(value_dtype or jnp.float32) == \
            jnp.dtype(jnp.bfloat16)
        out = cocluster_plan(
            np.asarray(r, np.int64), np.asarray(c, np.int64), v,
            coo.shape, chunk=chunk, bf16=bf16, **cocluster_kw,
        )
        if out is None:
            raise RuntimeError(
                "co-clustering needs native/libcocluster.so (run make -C "
                "smvp_toolkit_tpu/native)"
            )
        self.result, plan, vmem = out
        self.shape = coo.shape  # NATURAL shape (inner.shape is padded)
        self.inner = SellSpMV(
            plan, value_dtype=value_dtype, interpret=interpret,
            vmem_mb=vmem,
            _triplets=(
                self.result.row_map[np.asarray(r, np.int64)],
                self.result.col_map[np.asarray(c, np.int64)],
                v,
            ),
        )
        with jax.ensure_compile_time_eval():
            self._col_map = jnp.asarray(self.result.col_map)
            self._row_map = jnp.asarray(self.result.row_map)

    @property
    def occupancy(self) -> float:
        return self.inner.plan.nnz / float(self.inner.plan.slots())

    def to_permuted(self, x: jax.Array) -> jax.Array:
        """Natural x -> permuted/padded x' (one device scatter)."""
        m_pad = self.result.shape_padded[1]
        return jnp.zeros((m_pad,) + x.shape[1:], x.dtype).at[
            self._col_map
        ].set(x[: self.shape[1]])

    def from_permuted(self, y: jax.Array) -> jax.Array:
        """Permuted y' -> natural y (one device gather)."""
        return y[self._row_map]

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.from_permuted(self.inner(self.to_permuted(x)))

    def bench_loop(self, x_permuted: jax.Array, iterations: int):
        """Grid-fused benchmark loop in permuted coordinates."""
        return self.inner.bench_loop(x_permuted, iterations)


def sell_op_coo_coclustered(coo: COOMatrix, **kw) -> CoClusteredSellSpMV:
    """Co-clustered SELL operator for a concrete COO matrix (host
    planning + refinement; no device compile)."""
    return CoClusteredSellSpMV(coo, **kw)
