"""ICI/HBM traffic model invariants (parallel/traffic.py)."""

import numpy as np

from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.parallel.traffic import (
    scaling_projection,
    sharded_spmv_traffic,
)

from conftest import random_coo


def _plan(n=1024, m=1024, nnz=8000, seed=0):
    rng = np.random.RandomState(seed)
    r, c, v = random_coo(rng, n, m, nnz)[:3]
    return build_sell_plan(
        r.astype(np.int64), c.astype(np.int64),
        np.asarray(v, np.float32), (n, m), chunk=64,
    ), n, m


def test_single_device_has_no_collective():
    plan, n, m = _plan()
    for scheme in ("rowblock", "stripe", "2d"):
        tm = sharded_spmv_traffic(plan, n, m, 1, scheme)
        assert tm.ici_bytes == 0
        assert tm.collectives == ()


def test_ring_formulas():
    plan, n, m = _plan()
    for d in (2, 4, 8):
        rb = sharded_spmv_traffic(plan, n, m, d, "rowblock")
        st = sharded_spmv_traffic(plan, n, m, d, "stripe")
        assert rb.ici_bytes == int(n * 4 * (d - 1) / d)
        assert st.ici_bytes == 2 * rb.ici_bytes
    # one-shot rowblock SpMV (sharded output stays sharded): free.
    rb1 = sharded_spmv_traffic(plan, n, m, 8, "rowblock",
                               iterative=False)
    assert rb1.ici_bytes == 0


def test_hbm_shrinks_with_devices():
    plan, n, m = _plan()
    prev = None
    for d in (1, 2, 4, 8):
        tm = sharded_spmv_traffic(plan, n, m, d, "rowblock")
        if prev is not None:
            assert tm.hbm_bytes < prev
        prev = tm.hbm_bytes


def test_projection_efficiency_monotone_tail():
    plan, n, m = _plan()
    rows = scaling_projection(plan, n, m, [1, 2, 4, 8, 64, 256],
                              "rowblock")
    assert rows[0]["efficiency"] == 1.0
    # once ICI-bound, efficiency decays monotonically
    effs = [r["efficiency"] for r in rows]
    bounds = [r["bound"] for r in rows]
    for i in range(1, len(rows)):
        if bounds[i - 1] == "ici":
            assert effs[i] <= effs[i - 1] + 1e-9
    # every row carries the fields the driver-side JSON needs
    for r in rows:
        for k in ("devices", "hbm_bytes", "ici_bytes", "iter_us",
                  "efficiency", "bound", "collectives"):
            assert k in r


def test_2d_shards_x_hbm():
    """The 2-D grid's advantage is x-sharding (HBM bytes and x
    capacity scale with dpr) — its replicated-y all-gather matches
    row-block's, so collectives are NOT its win; the local HBM is."""
    plan, n, m = _plan(n=4096, m=4096, nnz=40000)
    rb = sharded_spmv_traffic(plan, n, m, 64, "rowblock")
    d2 = sharded_spmv_traffic(plan, n, m, 64, "2d")
    assert d2.hbm_bytes < rb.hbm_bytes
