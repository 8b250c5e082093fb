"""Occupancy-loss attribution for the SELL-T1 layout (round 5, host-side).

For each benchmark matrix, decompose the occupancy deficit into its two
mechanisms:

  * FRAGMENTATION — (slice, tile) cells touched by few of the slice's
    128 rows (each cell costs >=1 sublane regardless of how many lanes
    are live).
  * DUP IMBALANCE — within a cell, sublane count = max over rows of
    that row's entry count in the tile; rows with fewer entries leave
    dead slots in the dup tail.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/occ_analysis.py
(pure numpy; jnp never touched)
"""
import numpy as np
import sys

sys.path.insert(0, "/root/repo")

LANES = 128


def load(name):
    if name == "synth-10M":
        from smvp_toolkit_tpu.utils.synth import synth_banded
        rng = np.random.RandomState(0)
        n, k, bw = 1_000_000, 10, 256
        rows = np.repeat(np.arange(n, dtype=np.int64), k)
        offs = rng.randint(-bw, bw + 1, size=len(rows))
        cols = np.clip(rows + offs, 0, n - 1)
        key = rows * n + cols
        order = np.argsort(key, kind="stable")
        ks = key[order]
        keep = np.ones(len(ks), bool)
        keep[1:] = ks[1:] != ks[:-1]
        sel = order[keep]
        return rows[sel], cols[sel], (n, n)
    from smvp_toolkit_tpu.io.mtx import read_mtx_raw
    path = f"/root/reference/sample-data/{name}.mtx"
    tc, nrows, ncols, r, c, v = read_mtx_raw(path)
    return np.asarray(r, np.int64), np.asarray(c, np.int64), (nrows, ncols)


def analyze(name):
    rows, cols, shape = load(name)
    nnz = len(rows)
    sl = rows >> 7
    tl = cols >> 7
    ns = -(-shape[0] // LANES)
    ct = -(-shape[1] // LANES)
    cell = sl * ct + tl
    # per-(cell, row) counts -> dup depth
    cr = cell * (1 << 20) + rows  # rows < 2^20 fine here (<=1M)
    assert shape[0] < (1 << 20)
    u_cr, cnt_cr = np.unique(cr, return_counts=True)
    cell_of_cr = u_cr >> 20
    # per-cell: n_entries, n_live_rows, maxdup
    u_cell, inv = np.unique(cell_of_cr, return_inverse=True)
    n_cells = len(u_cell)
    maxdup = np.zeros(n_cells, np.int64)
    np.maximum.at(maxdup, inv, cnt_cr)
    entries = np.zeros(n_cells, np.int64)
    np.add.at(entries, inv, cnt_cr)
    live_rows = np.bincount(inv)
    sublanes = maxdup  # sublanes per cell
    S_true = int(sublanes.sum())
    occ = nnz / (S_true * LANES)

    # attribution: slots = S_true*128.
    #  - slots in dup tails beyond each row's own count:
    #    per cell: 128*maxdup - (live? no...) ; dead lanes split:
    #    lane-dead   = (128 - live_rows) * maxdup   (rows absent from cell)
    #    dup-dead    = live slots where row has < maxdup entries
    lane_dead = int(((LANES - live_rows) * maxdup).sum())
    dup_dead = S_true * LANES - nnz - lane_dead
    # slice-level packing bound: per slice, sublanes >= ceil(nnz_s/128)
    # and >= max row degree in slice
    nnz_s = np.bincount(sl, minlength=ns)
    rdeg = np.bincount(rows, minlength=shape[0])
    rdeg_sl = rdeg.reshape(-1)  # max per slice
    pad_r = -(-shape[0] // LANES) * LANES
    rdeg_p = np.zeros(pad_r, np.int64)
    rdeg_p[: shape[0]] = rdeg
    maxdeg_s = rdeg_p.reshape(-1, LANES).max(1)
    bound = int(np.maximum(-(-nnz_s // LANES), maxdeg_s).sum())
    # how many tiles does each slice touch, avg live rows per cell
    tiles_per_slice = np.bincount(u_cell // ct, minlength=ns)
    print(f"== {name}: n={shape[0]} nnz={nnz} ns={ns} ct={ct}")
    print(f"   S_true={S_true} occ={occ:.3f}  bound_S={bound} "
          f"occ_bound={nnz/(bound*LANES):.3f}")
    print(f"   cells={n_cells} avg_live_rows/cell={live_rows.mean():.1f} "
          f"avg_entries/cell={entries.mean():.1f} "
          f"maxdup: mean={maxdup.mean():.2f} p95={np.percentile(maxdup,95):.0f} max={maxdup.max()}")
    print(f"   dead slots: lane(frag)={lane_dead} ({lane_dead/(S_true*LANES):.1%}) "
          f"dup(imbal)={dup_dead} ({dup_dead/(S_true*LANES):.1%})")
    print(f"   tiles/slice: mean={tiles_per_slice[tiles_per_slice>0].mean():.1f} "
          f"p95={np.percentile(tiles_per_slice[tiles_per_slice>0],95):.0f}")
    print(f"   row degree: mean={rdeg.mean():.1f} p95={np.percentile(rdeg,95):.0f} max={rdeg.max()}")
    # column degree
    cdeg = np.bincount(cols, minlength=shape[1])
    print(f"   col degree: mean={cdeg.mean():.1f} p95={np.percentile(cdeg,95):.0f} max={cdeg.max()}")


for m in ["memplus", "pwt", "synth-10M"]:
    analyze(m)
