"""Joint row x column co-clustering for the SELL-T1 planner.

SELL-T1 occupancy (nnz / slots — the linear factor of measured kernel
throughput, PERFORMANCE.md "slot-rate law") is fixed entirely by the
row->slice and col->tile assignments: every (slice, tile) cell costs
``max_r count(r, tile)`` sublanes. Round 4 measured that no single-axis
permutation helps; this module optimizes both assignments JOINTLY:

1. an initialization (natural order with capacity slack, or rows
   sorted by column-tile support signature for fragmentation-dominated
   matrices like memplus),
2. greedy alternating refinement over exact objective deltas in C++
   (native/cocluster.cpp): column moves between nearby tiles and row
   moves between nearby slices, capacities <= 128, locality-bounded so
   the per-chunk tile/slice windows the kernel needs stay narrow.

The result is a pair of injective coordinate maps (row_map, col_map)
into padded row/col spaces. The SpMV then runs in PERMUTED coordinates
— x is permuted/padded once at the boundary and y is returned in
natural order by inverse-mapping — exactly the SELL-C-sigma style
preprocessing contract: encode-time work, zero per-iteration cost for
solvers that stay in permuted space.

Capability accelerated: the reference CSR hot loop main-cli.c:410-416.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "CoClusterResult", "cocluster", "cocluster_plan",
    "cocluster_objective",
]

LANES = 128

_LIB = None
_LIB_FAILED = False
_LOCK = threading.Lock()


def _lib():
    """ctypes handle to native/libcocluster.so (None if unavailable)."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_FAILED or os.environ.get("SMVP_NO_NATIVE_PLAN") == "1":
            return None
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.abspath(
            os.path.join(here, "..", "native", "libcocluster.so")
        )
        if not os.path.exists(path):
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:  # pragma: no cover
            _LIB_FAILED = True
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        ll = ctypes.c_longlong
        lib.cocluster_refine.restype = ll
        lib.cocluster_refine.argtypes = [
            i64p, i64p, ll, ll, ll, i32p, i32p, ll, ll,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ll, ctypes.c_int,
            ll, ctypes.POINTER(ll),
        ]
        lib.cocluster_objective.restype = ll
        lib.cocluster_objective.argtypes = [
            i64p, i64p, ll, ll, ll, i32p, i32p, ll, ll,
        ]
        _LIB = lib
        return lib


@dataclasses.dataclass(frozen=True)
class CoClusterResult:
    """Injective coordinate maps into padded spaces + plan statistics."""

    row_map: np.ndarray  # int64 (n,): natural row -> permuted row id
    col_map: np.ndarray  # int64 (m,): natural col -> permuted col id
    shape_padded: Tuple[int, int]  # (n_slices*128, n_tiles*128)
    s_true: int  # objective: total true sublanes after refinement
    s_true_natural: int  # objective of the natural assignment
    moves: int  # accepted refinement moves
    init: str  # initialization that produced this result

    def occupancy(self, nnz: int) -> float:
        return nnz / float(max(self.s_true, 1) * LANES)

    def row_inverse(self) -> np.ndarray:
        """Padded-row -> natural-row map (-1 for padding rows)."""
        inv = np.full(self.shape_padded[0], -1, dtype=np.int64)
        inv[self.row_map] = np.arange(len(self.row_map))
        return inv

    def col_inverse(self) -> np.ndarray:
        inv = np.full(self.shape_padded[1], -1, dtype=np.int64)
        inv[self.col_map] = np.arange(len(self.col_map))
        return inv


def _spread_assign(n: int, groups: int) -> np.ndarray:
    """Assign n items to ``groups`` groups preserving order, uniform
    fill (floor(i * groups / n)) — natural adjacency plus even slack."""
    return ((np.arange(n, dtype=np.int64) * groups) // max(n, 1)).astype(
        np.int32
    )


def _signature_row_order(
    rows: np.ndarray, cols: np.ndarray, n: int, k: int = 6
) -> np.ndarray:
    """Rows ordered by their column-tile support signature.

    Rows with identical/similar tile supports become adjacent so they
    land in the same slice and SHARE sublanes (the fragmentation fix
    for scattered matrices). Signature = first ``k`` distinct tiles of
    the row's sorted support, lexicographic; ties by natural id keep
    locality. Empty rows sort to the end (their slices are dead
    anyway). Returns the new order (old row ids in new sequence).
    """
    tile = (cols >> 7).astype(np.int64)
    order = np.lexsort((tile, rows))
    r_s, t_s = rows[order], tile[order]
    # Dedup (row, tile) pairs.
    keep = np.ones(len(r_s), dtype=bool)
    keep[1:] = (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])
    r_s, t_s = r_s[keep], t_s[keep]
    # Rank of each pair within its row.
    idx = np.arange(len(r_s))
    row_start = np.where(
        np.r_[True, r_s[1:] != r_s[:-1]], idx, 0
    )
    np.maximum.accumulate(row_start, out=row_start)
    rank = idx - row_start
    sig = np.full((n, k), np.iinfo(np.int64).max, dtype=np.int64)
    sel = rank < k
    sig[r_s[sel], rank[sel]] = t_s[sel]
    keys = [np.arange(n)] + [sig[:, j] for j in range(k - 1, -1, -1)]
    return np.lexsort(keys)


def cocluster(
    rows: np.ndarray,
    cols: np.ndarray,
    shape: Tuple[int, int],
    *,
    row_slack: float = 0.04,
    col_slack: float = 0.04,
    passes: Optional[int] = None,
    col_radius: Optional[int] = None,
    row_radius: Optional[int] = None,
    alpha: int = 2,
    pot_kind: int = 0,
    s_weight: int = 0,
    init: str = "natural",
) -> Optional[CoClusterResult]:
    """Optimize row/col group assignments; None if the lib is missing.

    ``init``: "natural" (slack-spread natural order — measured the
    right start for every benchmark matrix; barycenter and signature
    sorts both LOSE, see experiments/cocluster_probe.py) or
    "signature" (support-signature row sort, kept for scattered
    patterns) or "auto" (run both, keep the better objective).
    ``alpha`` weighs cell consolidation in the plateau potential.

    ``passes``/radii default by nnz so encode time stays in the SELL
    planning budget class: the refinement converges by ~20 passes on
    the sample matrices (measured; 60 passes added < 0.2%) and large
    banded matrices saturate at radius ~6.
    """
    lib = _lib()
    if lib is None:
        return None
    n, m = shape
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = len(rows)
    if nnz == 0 or n == 0 or m == 0:
        return None

    # Budget-scaled search defaults (measured convergence points).
    if passes is None:
        passes = 30 if nnz < 1_000_000 else (12 if nnz < 20_000_000 else 6)
    if col_radius is None:
        col_radius = 16 if nnz < 1_000_000 else 6
    if row_radius is None:
        row_radius = col_radius

    ns_nat = max(-(-n // LANES), 1)
    nt_nat = max(-(-m // LANES), 1)
    n_slices = max(int(np.ceil(n / LANES * (1.0 + row_slack))), ns_nat)
    n_tiles = max(int(np.ceil(m / LANES * (1.0 + col_slack))), nt_nat)

    # Natural-assignment objective (the baseline the refinement must
    # beat — occupancy accounting uses it for the reported gain).
    nat_row = (np.arange(n, dtype=np.int64) // LANES).astype(np.int32)
    nat_col = (np.arange(m, dtype=np.int64) // LANES).astype(np.int32)
    s_nat = int(
        lib.cocluster_objective(
            rows, cols, nnz, n, m,
            np.ascontiguousarray(nat_row),
            np.ascontiguousarray(nat_col),
            ns_nat, nt_nat,
        )
    )

    inits = ["natural", "signature"] if init == "auto" else [init]
    best = None
    for mode in inits:
        if mode == "signature":
            order = _signature_row_order(rows, cols, n)
        elif mode == "natural":
            order = np.arange(n, dtype=np.int64)
        else:
            raise ValueError(f"unknown init {mode!r}")
        # row_assign over natural ids: position-in-order spread.
        ra = np.empty(n, dtype=np.int32)
        ra[order] = _spread_assign(n, n_slices)
        ca = _spread_assign(m, n_tiles)
        moves = ctypes.c_longlong(0)
        s = int(
            lib.cocluster_refine(
                rows, cols, nnz, n, m,
                ra, ca, n_slices, n_tiles,
                passes, col_radius, row_radius, alpha, pot_kind,
                s_weight, ctypes.byref(moves),
            )
        )
        if s < 0:
            return None
        if best is None or s < best[0]:
            best = (s, int(moves.value), ra, ca, mode)

    s_true, n_moves, ra, ca, mode = best

    # Build injective maps: new id = group*128 + rank-within-group
    # (rank by natural id — keeps in-group natural adjacency).
    row_map = _group_map(ra, n_slices)
    col_map = _group_map(ca, n_tiles)
    return CoClusterResult(
        row_map=row_map,
        col_map=col_map,
        shape_padded=(n_slices * LANES, n_tiles * LANES),
        s_true=s_true,
        s_true_natural=s_nat,
        moves=n_moves,
        init=mode,
    )


def _group_map(assign: np.ndarray, groups: int) -> np.ndarray:
    """item -> group*128 + rank_within_group (stable by item id)."""
    order = np.argsort(assign, kind="stable")
    sorted_groups = assign[order].astype(np.int64)
    idx = np.arange(len(assign), dtype=np.int64)
    grp_start = np.where(
        np.r_[True, sorted_groups[1:] != sorted_groups[:-1]], idx, 0
    )
    np.maximum.accumulate(grp_start, out=grp_start)
    rank = idx - grp_start
    if rank.size and int(rank.max()) >= LANES:
        raise AssertionError("group capacity exceeded (native bug)")
    out = np.empty(len(assign), dtype=np.int64)
    out[order] = sorted_groups * LANES + rank
    return out


def cocluster_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    *,
    chunk: Optional[int] = None,
    bf16: bool = False,
    **cocluster_kw,
):
    """Co-cluster, then build the SELL plan in permuted coordinates.

    Returns ``(CoClusterResult, SellPlan, vmem_mb)`` or None when the
    native optimizer is unavailable. The plan's shape is the PADDED
    permuted space (``result.shape_padded``); callers run SpMV in
    permuted coordinates (x scattered through ``col_map``, y gathered
    through ``row_map``) — see ``spmv_pallas.CoClusteredSellSpMV``.
    ``chunk=None`` lets the calibrated autotuner pick chunk + VMEM on
    the permuted coordinates.
    """
    res = cocluster(rows, cols, shape, **cocluster_kw)
    if res is None:
        return None
    r2 = res.row_map[np.asarray(rows, dtype=np.int64)]
    c2 = res.col_map[np.asarray(cols, dtype=np.int64)]
    if chunk is None:
        from smvp_toolkit_tpu.ops.autotune import (
            pick_plan, pick_vmem_mb, production_rates,
        )

        plan, _cost = pick_plan(
            r2, c2, vals, res.shape_padded, bf16=bf16,
            rates=production_rates(),
        )
        return res, plan, pick_vmem_mb(plan.chunk)
    from smvp_toolkit_tpu.ops.spmv_pallas import _auto_plan

    plan = _auto_plan(r2, c2, vals, res.shape_padded, chunk=chunk)
    return res, plan, None


def cocluster_objective(
    rows: np.ndarray,
    cols: np.ndarray,
    shape: Tuple[int, int],
    row_assign: Optional[np.ndarray] = None,
    col_assign: Optional[np.ndarray] = None,
) -> Optional[int]:
    """Exact S_true (total sublanes) for an assignment (natural default).

    The differential-test surface for the native objective: tests
    compare this against a numpy recomputation.
    """
    lib = _lib()
    if lib is None:
        return None
    n, m = shape
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    if row_assign is None:
        row_assign = (np.arange(n, dtype=np.int64) // LANES).astype(np.int32)
    if col_assign is None:
        col_assign = (np.arange(m, dtype=np.int64) // LANES).astype(np.int32)
    ns = int(row_assign.max()) + 1 if n else 1
    nt = int(col_assign.max()) + 1 if m else 1
    return int(
        lib.cocluster_objective(
            rows, cols, len(rows), n, m,
            np.ascontiguousarray(row_assign, dtype=np.int32),
            np.ascontiguousarray(col_assign, dtype=np.int32),
            ns, nt,
        )
    )
