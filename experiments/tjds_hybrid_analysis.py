"""Structural attribution for the TJDS-stream hybrid (VERDICT r2 item 4).

The proposed hybrid packs consecutive positions of one jagged diagonal
per chunk so the x read is a CONTIGUOUS slice of permuted x — deleting
the SELL kernel's one-hot x table select. But the one-hot work doesn't
vanish; it moves: y rows within a diagonal block are arbitrary, so the
row reduce's one-hot must cover that block's ROW-SLICE SPAN instead of
SELL's fixed slice window. Static shapes mean both kernels pay their
window's MAXIMUM over chunks.

Both window quantities are properties of the matrix + layout, not of
the chip — so the hybrid-vs-SELL one-hot MAC ratio is computable
exactly, host-side, today:

  SELL  proxy = S_sell · (WT + NSW) · 128        (select + reduce)
  hybrid proxy = S_hyb · (K + NSW_hyb) · 128     (x window + reduce)

where K = contiguous x tiles per hybrid chunk (chunk = 128·K positions
of one diagonal), S_hyb = sublanes after per-chunk (row&127, dup)
packing, and NSW_hyb = the 16-aligned maximum row-slice span over
hybrid chunks. Occupancy (nnz / slots) moves the HBM side the same way.

If hybrid proxy / occupancy are worse on the banded samples the idea
is dead at ANY MXU rate and the ROADMAP item closes with numbers; if
better, it's a build signal for the next hardware window.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from smvp_toolkit_tpu.formats.tjds import tjds_encode
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

LANES = 128


def _coo(name):
    if name == "synth-10M":  # the BASELINE.json headline config
        from smvp_toolkit_tpu.utils.synth import synth_banded

        return synth_banded(1_000_000, nnz_per_row=10, bandwidth=256,
                            seed=0).pad(512)
    if name.startswith("synth:"):  # synth:N:NNZ, same spec as the CLI
        from smvp_toolkit_tpu.utils.synth import synth_banded

        _, n, nnz = name.split(":")
        n = int(n)
        return synth_banded(n, nnz_per_row=max(int(nnz) // n, 1),
                            bandwidth=256, seed=0).pad(512)
    return read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)


def _ceil(x, m):
    return -(-x // m) * m


def hybrid_stats(tj, k):
    """Simulate the hybrid packing: chunks of 128*k positions per diag."""
    nd = int(tj.num_diags)
    start = np.asarray(tj.start_pos)[: nd + 1]
    rows = np.asarray(tj.row_ind)
    block = LANES * k
    s_total = 0
    nsw_max = 0
    spans = []
    for d in range(nd):
        lo, hi = int(start[d]), int(start[d + 1])
        for p0 in range(lo, hi, block):
            r = rows[p0 : min(p0 + block, hi)]
            if r.size == 0:
                continue
            # per-chunk SELL-style packing: lane = row & 127, sublane =
            # collision depth; S_chunk = deepest lane bucket.
            s_chunk = int(np.bincount(r & (LANES - 1),
                                      minlength=LANES).max())
            s_total += s_chunk
            sl = r >> 7
            span = _ceil(int(sl.max()) - int(sl.min()) + 1, 16)
            spans.append(span)
            nsw_max = max(nsw_max, span)
    spans = np.asarray(spans)
    return dict(
        S=s_total,
        NSW=nsw_max,
        nsw_p50=int(np.median(spans)),
        nsw_p95=int(np.percentile(spans, 95)),
        proxy=s_total * (k + nsw_max) * LANES,
        occupancy=tj.nnz / (s_total * LANES),
    )


def main():
    names = sys.argv[1:] or ["curtis54", "memplus", "pwt", "synth-10M"]
    for name in names:
        coo = _coo(name)
        r, c, v = coo.to_numpy()
        tj = tjds_encode(coo)
        plan = build_sell_plan(r, c, v, coo.shape)
        nsw = plan.reduce_window()[1]
        sell_proxy = plan.n_sublanes * (plan.window_tiles + nsw) * LANES
        print(f"\n=== {name} (nnz={coo.nnz}, rows={coo.shape[0]}, "
              f"diags={int(tj.num_diags)}) ===")
        print(f"SELL   : S={plan.n_sublanes:>8} WT={plan.window_tiles:>4} "
              f"NSW={nsw:>5}  proxy={sell_proxy/1e6:10.1f} MMAC  "
              f"occ={coo.nnz/(plan.n_sublanes*LANES):.3f}")
        for k in (1, 2, 4):
            h = hybrid_stats(tj, k)
            print(f"hyb K={k}: S={h['S']:>8} xw={k:>3} NSW={h['NSW']:>5} "
                  f"(p50={h['nsw_p50']}, p95={h['nsw_p95']})  "
                  f"proxy={h['proxy']/1e6:10.1f} MMAC  "
                  f"occ={h['occupancy']:.3f}  "
                  f"ratio={h['proxy']/sell_proxy:6.2f}x")


if __name__ == "__main__":
    main()
