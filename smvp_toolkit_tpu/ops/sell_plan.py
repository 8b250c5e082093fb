"""SELL-T1 execution plan for the Pallas TPU SpMV kernel.

The TPU-native layout that replaces pointer-chasing CSR traversal
(reference hot loop main-cli.c:410-416) with four dense vector/matrix ops.

Layout rule — one **slot** per nonzero, arranged so every hard op becomes
a native TPU primitive:

* ``lane  = row mod 128``  (output lane)
* ``slice = row div 128``  (output sublane group; y is (NS, 128))
* each **sublane** of the packed arrays holds entries of ONE slice whose
  columns fall in ONE 128-wide column tile (``tb``); a row with several
  entries in the same tile occupies duplicate sublanes (``dup``).

With that invariant the whole SpMV is:

1. ``table = OHT @ x_tiles``   — one-hot MXU matmul materializes, per
   sublane, the 128 x-values of its column tile (no gather).
2. ``g     = take_along_axis(table, lane_idx)`` — a single VPU lane
   shuffle replaces the per-element x gather.
3. ``prod  = vals * g``        — elementwise.
4. ``y     = SEG @ prod``      — one-hot MXU matmul sums every sublane
   into its slice row: the entire CSR row-reduction with no scatter,
   no segment-sum, no prefix scan.

Cost ∝ S (number of sublanes) — S ≈ #(slice, coltile) pairs, measured
7078 for memplus (126k nnz) and 4545 for pwt (181k nnz). Optional RCM
ordering can shrink S for banded systems but requires on-device x/y
permutation; the default is natural order (identity, no permutes).

This module is the host-side planner (pure numpy, encode-time). The
device kernel lives in ``spmv_pallas.py``.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["SellPlan", "build_sell_plan", "build_streamed_sell_plan",
           "rewindow_plan"]

LANES = 128

_PLAN_LIB = None
_PLAN_LIB_FAILED = False
_PLAN_LOCK = threading.Lock()


def _plan_lib():
    """ctypes handle to the native planner (None if unavailable)."""
    global _PLAN_LIB, _PLAN_LIB_FAILED
    with _PLAN_LOCK:
        if _PLAN_LIB is not None:
            return _PLAN_LIB
        if _PLAN_LIB_FAILED or os.environ.get("SMVP_NO_NATIVE_PLAN") == "1":
            return None
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.abspath(
            os.path.join(here, "..", "native", "libsellplan.so")
        )
        if not os.path.exists(path):
            _PLAN_LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:  # pragma: no cover
            _PLAN_LIB_FAILED = True
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.sell_plan_create.restype = ctypes.c_void_p
        lib.sell_plan_create.argtypes = [
            i64p, i64p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_int,
        ]
        lib.sell_plan_sublanes.restype = ctypes.c_longlong
        lib.sell_plan_sublanes.argtypes = [ctypes.c_void_p]
        lib.sell_plan_fill.restype = None
        lib.sell_plan_fill.argtypes = [
            ctypes.c_void_p, i64p, f32p, ctypes.c_longlong,
            f32p, i32p, i64p, i64p,
        ]
        lib.sell_plan_free.restype = None
        lib.sell_plan_free.argtypes = [ctypes.c_void_p]
        _PLAN_LIB = lib
        return lib


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SellPlan:
    """Host-side arrays + static metadata for the SELL-T1 SpMV kernel.

    S = padded sublane count (multiple of ``chunk``), CT = column tiles
    (padded), NS = row slices (padded to 16 — native bf16 sublane tile),
    WT = window tiles per chunk (padded to 16 for the same reason).

    Sublanes are sorted by column tile so each chunk's tiles fall inside
    a narrow window ``[tile_base[chunk], tile_base[chunk] + WT)`` — the
    one-hot table matmul then contracts over WT tiles instead of all CT
    (4-16x fewer MACs on the benchmark matrices).
    """

    vals: np.ndarray  # f32 (S, 128); 0 in dead slots
    lane_idx: np.ndarray  # i32 (S, 128): column offset within tile [0,128)
    rel_tile: np.ndarray  # i32 (S, 1): tile - tile_base[chunk] (one-hot col)
    slice_of: np.ndarray  # i32 (n_chunks, chunk): slice id (-1 = dead)
    tile_base: np.ndarray  # i32 (n_chunks,): window start tile per chunk
    shape: Tuple[int, int]
    nnz: int
    n_slices: int  # NS (padded)
    n_coltiles: int  # CT (padded)
    window_tiles: int  # WT
    chunk: int  # sublane chunk size per kernel grid step
    # Windowed row reduce (v6): per-chunk slice-window start + static
    # window size NSW — the reduce contracts (NSW, chunk) instead of
    # (NS, chunk) and accumulates at a dynamic y offset. Defaults
    # (None/0, e.g. plans from old checkpoints) mean "full reduce".
    slice_base: Optional[np.ndarray] = None  # i32 (n_chunks,)
    slice_window: int = 0
    # Streamed y (v7 flush-behind): for outputs too large to keep VMEM-
    # resident, sublanes are grouped by y block (``y_block_slices``
    # slices each) and chunks never straddle a block boundary. When set
    # (> 0), ``slice_of``/``slice_base`` hold LOCAL slice ids within
    # each chunk's y block, ``y_block_id`` maps chunks to blocks
    # (non-decreasing — the kernel flushes completed blocks behind the
    # sweep), and ``n_slices`` is the TOTAL padded slice count
    # (n_yblocks x y_block_slices). Built by build_streamed_sell_plan.
    y_block_id: Optional[np.ndarray] = None  # i32 (n_chunks,)
    y_block_slices: int = 0  # NSB (0 = resident-y plan)

    def reduce_window(self) -> Tuple[np.ndarray, int]:
        """(slice_base, NSW) with the full-reduce fallback applied."""
        if self.slice_base is None or self.slice_window <= 0:
            return (
                np.zeros(self.n_chunks, dtype=np.int32),
                self.n_slices,
            )
        return self.slice_base, self.slice_window

    @property
    def n_sublanes(self) -> int:
        return int(self.vals.shape[0])

    @property
    def n_chunks(self) -> int:
        return self.n_sublanes // self.chunk

    def slots(self) -> int:
        return self.n_sublanes * LANES

    def traffic_bytes(
        self, value_bytes: int = 4, lidx_bytes: Optional[int] = None,
        x_bytes: int = 4, x_resident: Optional[bool] = None,
        k: int = 1,
    ) -> int:
        """HBM bytes one kernel launch actually moves (honest roofline).

        Padding slots cost real bandwidth — the SELL planes are dense
        (S x 128) regardless of occupancy, which is why ``slots()/nnz``
        (the padding factor) divides the achievable nnz/s. Per launch:
        vals + lane_idx planes, the per-sublane/per-chunk one-hot
        generators, x (see below), y once. ``lidx_bytes`` defaults to
        the width the operator would actually pick for this plan (int8
        only when the chunk is 32-tile-aligned — spmv_pallas.SellSpMV).

        x traffic depends on the mode the operator would run in:
        resident (x fits the VMEM budget) reads each column tile once;
        the scalar-prefetch path DMAs a ``window_tiles``-tile window per
        chunk, which is typically *more* than one full pass. When
        ``x_resident`` is None it is derived from the operator's VMEM
        limit so ``--analyze`` and the autotune cost model charge the
        path that will actually run.

        ``k > 1`` accounts a fused SpMM call (SellSpMV.matmat): x/y
        scale by k while the packed planes are read once PER LAUNCH —
        and matmat splits k across launches of at most
        ``SMVP_SELL_SPMM_GROUP`` (default 8) columns, so the planes are
        re-read ``ceil(k/group)`` times, exactly as the operator runs
        it. Divide by ``k * traffic(k=1)`` for the amortization vs the
        vmap fallback. The per-launch k·VMEM footprint also shifts the
        resident-x decision, mirroring the operator.
        """
        from smvp_toolkit_tpu.ops.spmv_pallas import spmm_launch_group

        group = spmm_launch_group(self.n_slices, self.n_coltiles,
                                  value_bytes)
        if group < 2 and k > 1:
            # The operator falls back to vmap-over-columns: planes are
            # re-read for every column.
            return k * self.traffic_bytes(
                value_bytes, lidx_bytes, x_bytes, x_resident, 1
            )
        if k > group:
            full, rem = divmod(k, group)
            return full * self.traffic_bytes(
                value_bytes, lidx_bytes, x_bytes, x_resident, group
            ) + (
                self.traffic_bytes(
                    value_bytes, lidx_bytes, x_bytes, x_resident, rem
                )
                if rem
                else 0
            )
        if lidx_bytes is None:
            lidx_bytes = (
                1
                if self.chunk % 32 == 0
                and os.environ.get("SMVP_SELL_LIDX32") != "1"
                else 4
            )
        if x_resident is None:
            from smvp_toolkit_tpu.ops.spmv_pallas import _RESIDENT_X_LIMIT

            x_resident = (
                self.n_coltiles * LANES * x_bytes * k <= _RESIDENT_X_LIMIT
            )
        x_traffic = k * (
            self.n_coltiles * LANES * x_bytes       # resident: x once
            if x_resident
            else self.n_chunks * self.window_tiles * LANES * x_bytes
        )
        s = self.n_sublanes
        return int(
            s * LANES * (value_bytes + lidx_bytes)  # packed planes
            + s * 4                                 # rel_tile (i32)
            + s * 4                                 # slice_of (i32)
            + self.n_chunks * 4                     # tile_base
            + x_traffic
            + k * self.n_slices * LANES * 4         # y
        )

    # Dense one-hot views (debug/tests only — the kernel builds these
    # per-chunk on the fly; materializing them is O(S x NS) memory).
    def oht_dense(self) -> np.ndarray:
        if self.y_block_slices:
            raise ValueError("dense views undefined for streamed-y plans")
        oht = np.zeros((self.n_sublanes, self.window_tiles), dtype=np.float32)
        rel = self.rel_tile.reshape(-1)
        ok = (rel >= 0) & (rel < self.window_tiles)
        oht[np.arange(self.n_sublanes)[ok], rel[ok]] = 1.0
        return oht

    def seg_dense(self) -> np.ndarray:
        if self.y_block_slices:
            raise ValueError("dense views undefined for streamed-y plans")
        seg = np.zeros((self.n_slices, self.n_sublanes), dtype=np.float32)
        sl = self.slice_of.reshape(-1)
        ok = (sl >= 0) & (sl < self.n_slices)
        seg[sl[ok], np.arange(self.n_sublanes)[ok]] = 1.0
        return seg


def build_sell_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    *,
    chunk: int = 1024,
    min_window_tiles: int = 8,
    allow_small_chunk: bool = True,
) -> SellPlan:
    """Build the SELL-T1 plan from COO triplets (host, encode-time).

    ``min_window_tiles`` forces WT at least that wide — used when several
    shards must share one compiled kernel (common static window).
    """
    nrows, ncols = shape
    nnz = len(rows)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if np.iscomplexobj(np.asarray(vals)):
        # Silent imaginary-part truncation is a correctness trap; complex
        # SpMV runs on the XLA kernels (the CLI routes it there).
        raise TypeError(
            "SELL plan values must be real; use the XLA kernels for "
            "complex matrices"
        )
    v = np.asarray(vals, dtype=np.float32)

    ct_true = max(-(-ncols // LANES), 1)
    ns_true = max(-(-nrows // LANES), 1)
    # CT is a matmul contraction/lane dimension — pad to a full 128-lane
    # tile so Mosaic needs no relayout; NS is a sublane dim, padded to 16
    # (not 8) so the bf16 one-hot operands of the value-mode and reduce2
    # ladders land on native (16, 128) bf16 tiles too.
    CT = _round_up(ct_true, LANES)
    NS = _round_up(ns_true, 16)

    if nnz == 0:
        if allow_small_chunk:
            chunk = 8
        S = chunk
        return SellPlan(
            vals=np.zeros((S, LANES), dtype=np.float32),
            lane_idx=np.zeros((S, LANES), dtype=np.int32),
            rel_tile=np.full((S, 1), -1, dtype=np.int32),
            slice_of=np.full((1, S), -1, dtype=np.int32),
            tile_base=np.zeros((1,), dtype=np.int32),
            shape=shape,
            nnz=0,
            n_slices=NS,
            n_coltiles=CT,
            window_tiles=16,
            chunk=chunk,
            slice_base=np.zeros((1,), dtype=np.int32),
            slice_window=min(16, NS),
        )

    # Native planner fast path: one threaded C++ sort + linear passes
    # (~10x the numpy flow at 10M nnz on this host). Falls back to the
    # numpy planner when the library is missing or field widths overflow.
    lib = _plan_lib()
    if lib is not None:
        native = _build_native(
            lib, rows, cols, v, shape, nnz, CT, NS,
            chunk=chunk,
            min_window_tiles=min_window_tiles,
            allow_small_chunk=allow_small_chunk,
        )
        if native is not None:
            return native

    slice_ = rows >> 7
    lane = rows & 127
    tile = cols >> 7

    # Stable sort by (slice, tile, lane): entries of one (slice, tile)
    # cell are adjacent, lanes ascending.
    order = np.lexsort((lane, tile, slice_))
    sl_s = slice_[order]
    tl_s = tile[order]
    ln_s = lane[order]
    lo_s = (cols & 127)[order].astype(np.int32)
    v_s = v[order]

    # dup = occurrence index within (slice, tile, lane) runs.
    cell = sl_s * ct_true + tl_s
    same_lane = np.zeros(nnz, dtype=bool)
    same_lane[1:] = (cell[1:] == cell[:-1]) & (ln_s[1:] == ln_s[:-1])
    # Vectorized run-position: dup[i] = i - start_of_run(i).
    idx = np.arange(nnz)
    run_start = np.where(~same_lane, idx, 0)
    np.maximum.accumulate(run_start, out=run_start)
    dup = idx - run_start

    # sublane key = (tile, slice, dup): tile-major so each chunk of
    # consecutive sublanes covers a narrow column-tile window.
    # Field widths: tile 24b (ncols < 2^31), slice 24b (nrows < 2^31),
    # dup 16b — guarded, not assumed.
    if dup.size and int(dup.max()) >= (1 << 16):
        raise ValueError(
            "more than 65535 duplicate entries share one (row, col-tile); "
            "coalesce duplicates before encoding"
        )
    if int(sl_s.max()) >= (1 << 24) or int(tl_s.max()) >= (1 << 24):
        raise ValueError("matrix dimensions exceed 2^31 rows/cols")
    sub_key = (
        (tl_s.astype(np.int64) << 40)
        | (sl_s.astype(np.int64) << 16)
        | dup.astype(np.int64)
    )
    uniq, sub_id = np.unique(sub_key, return_inverse=True)
    S_true = len(uniq)
    # Small matrices: shrink the chunk to the real sublane count so the
    # kernel does not churn through dead padding (static shapes per plan;
    # disabled when several shards must share one compiled kernel).
    if allow_small_chunk and S_true <= chunk:
        chunk = _round_up(S_true, 8)
    S = _round_up(S_true, chunk)

    vals_a = np.zeros((S, LANES), dtype=np.float32)
    lidx_a = np.zeros((S, LANES), dtype=np.int32)
    vals_a[sub_id, ln_s] = v_s
    lidx_a[sub_id, ln_s] = lo_s

    # Per-sublane tile and slice (uniq keys decode, tile-sorted).
    u_tile = np.full(S, -1, dtype=np.int64)
    u_slice = np.zeros(S, dtype=np.int64)
    u_tile[:S_true] = uniq >> 40
    u_slice[:S_true] = (uniq >> 16) & 0xFFFFFF
    if S > S_true:  # dead padding sublanes adopt the last real tile
        u_tile[S_true:] = u_tile[S_true - 1]

    return _finish_plan(
        vals_a, lidx_a, u_tile, u_slice, S_true, S, chunk,
        CT=CT, NS=NS, shape=shape, nnz=nnz,
        min_window_tiles=min_window_tiles,
    )


def _finish_plan(
    vals_a, lidx_a, u_tile, u_slice, S_true, S, chunk, *,
    CT, NS, shape, nnz, min_window_tiles,
):
    """Window + compact one-hot metadata (shared numpy/native tail)."""
    # Per-chunk tile windows. Window bases align down to 16 tiles so
    # every x-window start (resident pl.ds slice or scalar-prefetch
    # Element offset) sits on a native sublane-tile boundary for f32
    # AND bf16; WT absorbs the alignment shift (<= 15 extra tiles).
    n_chunks = S // chunk
    tiles_2d = u_tile.reshape(n_chunks, chunk)
    t_lo = (tiles_2d.min(axis=1) // 16) * 16
    t_hi = tiles_2d.max(axis=1)
    # WT rounds to 16 for the same bf16-tile alignment reason as NS.
    WT = _round_up(max(int((t_hi - t_lo).max()) + 1, min_window_tiles), 16)
    WT = min(WT, CT)
    # Clamp windows to stay inside the padded tile range (CT and WT are
    # both 16-multiples, so the clamp preserves alignment).
    tile_base = np.minimum(t_lo, max(CT - WT, 0)).astype(np.int32)

    # Compact one-hot generators: the kernel rebuilds the (chunk, WT) and
    # (NS, chunk) one-hot matrices per grid step by iota comparison, so
    # only one int32 per sublane is stored for each.
    rel = (u_tile - np.repeat(tile_base.astype(np.int64), chunk)).astype(
        np.int32
    )
    rel[(rel < 0) | (rel >= WT)] = -1  # dead/out-of-window -> no one-hot
    slice_compact = np.full(S, -1, dtype=np.int32)
    slice_compact[:S_true] = u_slice[:S_true]

    # Per-chunk slice windows (the windowed row reduce): the full
    # (NS, chunk) one-hot reduce costs NS x S x 128 MACs — quadratic-ish
    # in matrix size (NS grows with rows) and 98% of modelled kernel
    # time at 1M rows. In natural (tile-major) order, banded matrices
    # confine each chunk's slices to a narrow range, so the kernel can
    # reduce into a (NSW, chunk) window accumulated at a dynamic y
    # offset instead. NSW == NS (sb == 0) degrades to the full reduce.
    sl_2d = slice_compact.reshape(n_chunks, chunk)
    live = sl_2d >= 0
    sl_min = np.where(live, sl_2d, np.iinfo(np.int32).max).min(axis=1)
    sl_max = np.where(live, sl_2d, -1).max(axis=1)
    sl_min = np.where(sl_min > sl_max, 0, sl_min)  # all-dead chunk
    s_lo = (sl_min // 16) * 16
    NSW = _round_up(max(int((sl_max - s_lo).max()) + 1, 8), 16)
    NSW = min(NSW, NS)
    slice_base = np.minimum(s_lo, max(NS - NSW, 0)).astype(np.int32)

    return SellPlan(
        vals=vals_a,
        lane_idx=lidx_a,
        rel_tile=rel.reshape(S, 1),
        slice_of=sl_2d,
        tile_base=tile_base,
        shape=shape,
        nnz=nnz,
        n_slices=NS,
        n_coltiles=CT,
        window_tiles=WT,
        chunk=chunk,
        slice_base=slice_base,
        slice_window=NSW,
    )


def build_streamed_sell_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    *,
    chunk: int = 1024,
    y_block_rows: int = 512 * LANES,
) -> SellPlan:
    """SELL-T1 plan whose y streams through VMEM block by block (v7).

    The v6 kernel keeps the whole (NS, 128) y VMEM-resident — a wall at
    ~3M rows (12 MB f32). Here rows are partitioned into y blocks of
    ``y_block_rows`` (a multiple of 2048 so every block is exactly
    ``NSB = y_block_rows/128`` 16-aligned slices), each block is planned
    independently (tile-major within the block, so the measured WT
    behaviour of the flat planner is preserved), and the sub-plans are
    concatenated. Chunks therefore never straddle a block boundary, the
    per-chunk block ids are non-decreasing, and the kernel can flush
    each completed (NSB, 128) y block behind the sweep via a
    prefetch-driven output index map.

    ``slice_of`` / ``slice_base`` in the result are LOCAL to each
    chunk's y block; ``n_slices`` is the total padded slice count.
    """
    if y_block_rows % (16 * LANES) != 0:
        raise ValueError("y_block_rows must be a multiple of 2048")
    nrows, ncols = shape
    nsb = y_block_rows // LANES
    n_blocks = max(-(-nrows // y_block_rows), 1)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    v = np.asarray(vals)

    blk_of = rows // y_block_rows
    order = np.argsort(blk_of, kind="stable")
    bounds = np.searchsorted(blk_of[order], np.arange(n_blocks + 1))

    subs = []
    for g in range(n_blocks):
        sel = order[bounds[g]:bounds[g + 1]]
        subs.append(
            build_sell_plan(
                rows[sel] - g * y_block_rows, cols[sel], v[sel],
                (y_block_rows, ncols), chunk=chunk,
                allow_small_chunk=False,
            )
        )
    subs, wt_common, nsw_common, sub_bases = common_window(subs, nsb)

    return SellPlan(
        vals=np.concatenate([p.vals for p in subs]),
        lane_idx=np.concatenate([p.lane_idx for p in subs]),
        rel_tile=np.concatenate([p.rel_tile for p in subs]),
        slice_of=np.concatenate([p.slice_of for p in subs]),
        tile_base=np.concatenate([p.tile_base for p in subs]),
        shape=shape,
        nnz=len(rows),
        n_slices=n_blocks * nsb,
        n_coltiles=subs[0].n_coltiles,
        window_tiles=wt_common,
        chunk=chunk,
        slice_base=np.concatenate(sub_bases),
        slice_window=nsw_common,
        y_block_id=np.concatenate(
            [np.full(p.n_chunks, g, dtype=np.int32)
             for g, p in enumerate(subs)]
        ),
        y_block_slices=nsb,
    )


def common_window(plans, ns_cap: int):
    """Align per-block plans to one (tile window, slice window) pair.

    Blocks/shards that run under a single compiled kernel must share
    static WT and NSW. Takes the max per-plan tile window (rewindowed
    O(S)), the max per-plan slice window capped at ``ns_cap``, and
    re-clamps each plan's slice bases so every window stays inside the
    cap (coverage only grows). Used by both the streamed-y stacker
    (``build_streamed_sell_plan``) and the sharded stacker
    (``parallel/sell_dist.py``) so the window rule lives in one place.

    Returns ``(plans, wt_common, nsw_common, bases)`` with ``bases[i]``
    the re-clamped int32 slice_base of ``plans[i]``.
    """
    plans = [
        rewindow_plan(p, max(q.window_tiles for q in plans)) for p in plans
    ]
    # Recompute after rewindowing: a plan whose own column-tile count is
    # below the requested window clamps to it (WT = min(WT, CT)).
    wt_common = max(p.window_tiles for p in plans)
    nsw_common = min(max(p.reduce_window()[1] for p in plans), ns_cap)
    bases = [
        np.minimum(
            p.reduce_window()[0].astype(np.int32),
            max(ns_cap - nsw_common, 0),
        )
        for p in plans
    ]
    return plans, wt_common, nsw_common, bases


def rewindow_plan(plan: SellPlan, min_window_tiles: int) -> SellPlan:
    """Widen an existing plan's per-chunk column-tile window in place.

    Bit-identical to rebuilding with ``build_sell_plan(...,
    min_window_tiles=...)`` but O(S) numpy — no re-sort, no re-fill:
    the absolute tile of every sublane is recovered from
    ``rel_tile + tile_base`` and only the windowing tail of
    ``_finish_plan`` reruns. Sharded encode uses this so each shard is
    planned ONCE and then aligned to the common window (previously a
    probe-plan-then-rebuild double pass — 2x planner cost per shard).
    """
    rel = plan.rel_tile.reshape(-1).astype(np.int64)
    if plan.nnz == 0 or (rel < 0).all():
        # Empty plan: rel carries no tiles; its window [0, WT) already
        # sits at base 0 and widening is a no-op for a dead kernel.
        return plan
    if (rel < 0).any():
        # Out-of-window sublanes lost their absolute tile; fall back to
        # a conservative answer (never produced by build_sell_plan).
        raise ValueError("plan has out-of-window sublanes; rebuild it")
    chunk = plan.chunk
    u_tile = rel + np.repeat(plan.tile_base.astype(np.int64), chunk)
    tiles_2d = u_tile.reshape(plan.n_chunks, chunk)
    t_lo = (tiles_2d.min(axis=1) // 16) * 16
    t_hi = tiles_2d.max(axis=1)
    CT = plan.n_coltiles
    WT = _round_up(max(int((t_hi - t_lo).max()) + 1, min_window_tiles), 16)
    WT = min(WT, CT)
    tile_base = np.minimum(t_lo, max(CT - WT, 0)).astype(np.int32)
    new_rel = (
        u_tile - np.repeat(tile_base.astype(np.int64), chunk)
    ).astype(np.int32)
    new_rel[(new_rel < 0) | (new_rel >= WT)] = -1
    return dataclasses.replace(
        plan,
        rel_tile=new_rel.reshape(-1, 1),
        tile_base=tile_base,
        window_tiles=WT,
    )


def _build_native(
    lib, rows, cols, v, shape, nnz, CT, NS, *,
    chunk, min_window_tiles, allow_small_chunk,
):
    """Plan via the C++ pass (native/sellplan.cpp); None on overflow."""
    rows64 = np.ascontiguousarray(rows, dtype=np.int64)
    cols64 = np.ascontiguousarray(cols, dtype=np.int64)
    v32 = np.ascontiguousarray(v, dtype=np.float32)
    threads = min(os.cpu_count() or 1, 8)
    handle = lib.sell_plan_create(
        rows64, cols64, nnz, shape[0], shape[1], threads
    )
    if not handle:
        return None
    try:
        S_true = int(lib.sell_plan_sublanes(handle))
        if allow_small_chunk and S_true <= chunk:
            chunk = _round_up(S_true, 8)
        S = _round_up(S_true, chunk)
        vals_a = np.zeros((S, LANES), dtype=np.float32)
        lidx_a = np.zeros((S, LANES), dtype=np.int32)
        u_tile = np.empty(S, dtype=np.int64)
        u_slice = np.empty(S, dtype=np.int64)
        lib.sell_plan_fill(
            handle, cols64, v32, S,
            vals_a.reshape(-1), lidx_a.reshape(-1), u_tile, u_slice,
        )
    finally:
        lib.sell_plan_free(handle)
    return _finish_plan(
        vals_a, lidx_a, u_tile, u_slice, S_true, S, chunk,
        CT=CT, NS=NS, shape=shape, nnz=nnz,
        min_window_tiles=min_window_tiles,
    )
