"""Host-side probe: can a COLUMN permutation raise SELL-T1 occupancy?

Round-4 closed the row-side orderings (RCM, min/mean-column row
clustering — both lose, PERFORMANCE.md "Realistic roofline"). This
probes the untested column side: a sublane is a (row-slice, col-tile,
dup) cell, so clustering columns that co-occur in the same row-slices
into the same 128-wide tile packs more lanes per sublane. A column
permutation changes only tile/lidx and the x gather order (x is
permuted host-side at upload; y order is untouched), so it composes
with every kernel variant unchanged.

Occupancy is a pure plan statistic — this runs entirely host-side
(numpy/C++ planner) and prints, per matrix x ordering:

    S (sublanes), occupancy nnz/(S*128), WT (window tiles), chunks,
    and the packing lower bound sum_s ceil(nnz_s / 128).

The slot-rate law (throughput ~= occupancy x 135 Gslot/s at
c2048-relsl) converts any occupancy win directly into a predicted
rate; a winner is then validated by ONE grid-fused TPU cell.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/colperm_probe.py
(JAX_PLATFORMS=cpu because the loader's COOMatrix.pad touches jnp and
the default axon platform needs the tunnel plugin on PYTHONPATH.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

SAMPLES = "/root/reference/sample-data"


def load(name):
    if name.startswith("synth"):
        from smvp_toolkit_tpu.utils.synth import synth_banded

        coo = synth_banded(1_000_000, nnz_per_row=10, bandwidth=256,
                           seed=0).pad(512)
        r, c, v = coo.to_numpy()
        return r, c, v, coo.shape
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo = read_mtx(os.path.join(SAMPLES, f"{name}.mtx"),
                   expand_symmetry=True)
    r, c, v = coo.to_numpy()
    return r, c, v, coo.shape


def true_sublanes(r, c, ncols):
    """Unpadded sublane count: unique (tile, slice, dup) cells."""
    sl = (r >> 7).astype(np.int64)
    ln = (r & 127).astype(np.int64)
    tl = (c >> 7).astype(np.int64)
    ct_true = max(-(-ncols // 128), 1)
    order = np.lexsort((ln, tl, sl))
    cell = sl[order] * ct_true + tl[order]
    lns = ln[order]
    same = np.zeros(len(r), dtype=bool)
    same[1:] = (cell[1:] == cell[:-1]) & (lns[1:] == lns[:-1])
    idx = np.arange(len(r))
    rs = np.where(~same, idx, 0)
    np.maximum.accumulate(rs, out=rs)
    dup = idx - rs
    # Bit-packed key field widths: dup 16b, slice 24b — assert instead
    # of silently colliding on pathological inputs.
    assert (len(dup) == 0 or int(dup.max()) < (1 << 16)) and (
        len(sl) == 0 or int(sl.max()) < (1 << 24)
    ), "true_sublanes key fields overflow; widen the packing"
    key = (tl[order] << 40) | (sl[order] << 16) | dup
    return len(np.unique(key))


def plan_stats(r, c, v, shape, chunk=2048):
    p = build_sell_plan(r, c, v, shape, chunk=chunk)
    S = p.vals.shape[0]
    return dict(S=int(S), S_true=true_sublanes(r, c, shape[1]),
                occ=p.nnz / (S * 128.0),
                WT=int(p.window_tiles),
                chunks=int(p.vals.shape[0] // p.chunk),
                chunk=int(p.chunk))


def col_sig_perm(r, c, ncols):
    """Columns sorted lexicographically by their row-slice incidence
    list (identical/similar slice sets land in the same tile)."""
    sl = (r >> 7).astype(np.int64)
    order = np.lexsort((sl, c))
    cs, ss = c[order], sl[order]
    # per-column slice list (dedup within column)
    keep = np.ones(len(cs), dtype=bool)
    keep[1:] = (cs[1:] != cs[:-1]) | (ss[1:] != ss[:-1])
    cs, ss = cs[keep], ss[keep]
    sigs = {}
    start = 0
    for i in range(1, len(cs) + 1):
        if i == len(cs) or cs[i] != cs[start]:
            sigs[int(cs[start])] = tuple(ss[start:i].tolist())
            start = i
    # empty columns keep natural order at the end
    cols_with = sorted(sigs, key=lambda col: (sigs[col], col))
    seen = np.zeros(ncols, dtype=bool)
    seen[cols_with] = True
    perm = np.concatenate([np.asarray(cols_with, dtype=np.int64),
                           np.nonzero(~seen)[0]])
    inv = np.empty(ncols, dtype=np.int64)
    inv[perm] = np.arange(ncols)
    return inv  # new_col = inv[old_col]


def col_minrow_perm(r, c, ncols):
    """Columns sorted by (min row-slice, mean row) — banded-ness."""
    sl = (r >> 7).astype(np.int64)
    minsl = np.full(ncols, 1 << 60, dtype=np.int64)
    np.minimum.at(minsl, c, sl)
    summ = np.zeros(ncols)
    cnt = np.zeros(ncols)
    np.add.at(summ, c, r.astype(np.float64))
    np.add.at(cnt, c, 1.0)
    mean = np.where(cnt > 0, summ / np.maximum(cnt, 1), 1e18)
    perm = np.lexsort((mean, minsl))
    inv = np.empty(ncols, dtype=np.int64)
    inv[perm] = np.arange(ncols)
    return inv


def pack_bound(r):
    """Sublane lower bound for this row partition from slice nnz alone:
    each sublane holds <= 128 entries of one slice. NOTE (round 5):
    this omits the per-row degree term — all entries of one row sit at
    one lane, so a slice also needs >= max-row-degree sublanes; see
    experiments/occ_analysis.py for the sharper bound."""
    sl = (r >> 7).astype(np.int64)
    per = np.bincount(sl)
    return int(np.sum(-(-per // 128)))


def main():
    for name in ("memplus", "pwt", "synth-10M"):
        t0 = time.time()
        r, c, v, shape = load(name)
        nnz = len(r)
        nat = plan_stats(r, c, v, shape)
        lb = pack_bound(r)
        rows = [("natural", nat)]
        for tag, mk in (("col-sig", col_sig_perm),
                        ("col-minrow", col_minrow_perm)):
            inv = mk(r, c, shape[1])
            st = plan_stats(r, inv[c], v, shape)
            rows.append((tag, st))
        print(f"\n{name}: nnz={nnz} shape={shape} "
              f"pack-bound S>={lb} (occ<={nnz/(lb*128.0):.3f}) "
              f"[{time.time()-t0:.1f}s]")
        for tag, st in rows:
            print(f"  {tag:11s} S={st['S']:7d} (true {st['S_true']:7d}) "
                  f"occ={st['occ']:.3f} WT={st['WT']:4d} "
                  f"chunk={st['chunk']} chunks={st['chunks']}")


if __name__ == "__main__":
    main()
