"""Probe: joint row x column co-clustering occupancy gains (host-side).

Occupancy is a pure plan statistic (slot-rate law: throughput ~=
occupancy x 135 Gslot/s at c2048-relsl), so strategy search runs
entirely on the host; a winner is validated by one grid-fused TPU cell.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/cocluster_probe.py [matrix ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from smvp_toolkit_tpu.ops.cocluster import cocluster
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

SAMPLES = "/root/reference/sample-data"


def load(name):
    if name.startswith("synth"):
        from smvp_toolkit_tpu.utils.synth import synth_banded

        n = int(name.split(":")[1]) if ":" in name else 1_000_000
        coo = synth_banded(n, nnz_per_row=10, bandwidth=256, seed=0)
        r, c, v = coo.to_numpy()
        return np.asarray(r, np.int64), np.asarray(c, np.int64), \
            np.asarray(v, np.float32), coo.shape
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo = read_mtx(os.path.join(SAMPLES, f"{name}.mtx"),
                   expand_symmetry=True)
    r, c, v = coo.to_numpy()
    return np.asarray(r, np.int64), np.asarray(c, np.int64), \
        np.asarray(v, np.float32), coo.shape


def run(name, **kw):
    r, c, v, shape = load(name)
    nnz = len(r)
    t0 = time.time()
    res = cocluster(r, c, shape, **kw)
    dt = time.time() - t0
    if res is None:
        print(f"{name}: native lib missing")
        return
    occ_nat = nnz / (res.s_true_natural * 128.0)
    occ_new = res.occupancy(nnz)
    # Validate: the real planner on permuted coordinates must agree.
    t1 = time.time()
    plan = build_sell_plan(
        res.row_map[r], res.col_map[c], v, res.shape_padded, chunk=2048
    )
    dt_plan = time.time() - t1
    s_plan_true = plan.n_sublanes  # padded
    occ_padded = nnz / (plan.n_sublanes * 128.0)
    print(
        f"{name}: nnz={nnz} init={res.init} moves={res.moves} "
        f"[{dt:.1f}s + plan {dt_plan:.1f}s]\n"
        f"  S: natural={res.s_true_natural} -> {res.s_true} "
        f"(occ {occ_nat:.3f} -> {occ_new:.3f}, {occ_new/occ_nat:.2f}x)\n"
        f"  padded plan: S={s_plan_true} occ={occ_padded:.3f} "
        f"WT={plan.window_tiles} NSW={plan.slice_window} "
        f"chunks={plan.n_chunks}"
    )
    return res, plan


if __name__ == "__main__":
    names = sys.argv[1:] or ["memplus", "pwt"]
    for name in names:
        run(name)
