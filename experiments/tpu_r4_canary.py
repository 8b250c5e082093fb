"""Round-4 Mosaic canary: compile the FIXED SELL kernel on real TPU.

Covers exactly the round-3 failure dimensions (VERDICT Weak #3):
  1. memplus f32  — 8 chunks, resident x, windowed reduce (the config
     every round-3 session stage died on: (1, chunk) slice_of BlockSpec)
  2. memplus prefetch-x — scalar-prefetch Element window (alignment)
  3. banded 100k  — NSW < NS dynamic-offset y store (multiple_of proof)
  4. curtis54 under shard_map on 1 chip (the second round-3 error)
Each stage is ONE remote compile; results append to the r4 jsonl.

Run serially, backgrounded (CLAUDE.md tunnel discipline).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "tpu_r4_results.jsonl")


def record(rec):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def stage(name, fn):
    t0 = time.time()
    try:
        err = fn()
        rec = {"ts": time.time(), "kind": "canary", "name": name,
               "ok": True, "err": float(err),
               "secs": round(time.time() - t0, 1)}
        print(f"CANARY {name}: OK err={err:.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — record and continue
        rec = {"ts": time.time(), "kind": "canary", "name": name,
               "ok": False, "error": f"{type(e).__name__}: {str(e)[:500]}",
               "secs": round(time.time() - t0, 1)}
        print(f"CANARY {name}: FAILED {type(e).__name__}: {str(e)[:300]} "
              f"({time.time()-t0:.0f}s)", flush=True)
    record(rec)
    return rec["ok"]


def _memplus():
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo = read_mtx("/root/reference/sample-data/memplus.mtx").pad(512)
    r, c, v = coo.to_numpy()
    return coo, r, c, v


def canary_multichunk():
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo, r, c, v = _memplus()
    plan = build_sell_plan(r, c, v, coo.shape)
    assert plan.n_chunks >= 2, "canary must cover the multi-chunk dim"
    op = SellSpMV(plan, interpret=False)
    x = np.random.default_rng(0).standard_normal(coo.shape[1]).astype(
        np.float32)
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v * x.astype(np.float64)[c])
    return np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)


def canary_prefetch():
    import jax.numpy as jnp

    import smvp_toolkit_tpu.ops.spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo, r, c, v = _memplus()
    plan = build_sell_plan(r, c, v, coo.shape)
    op = SellSpMV(plan, interpret=False)
    lim = sp._RESIDENT_X_LIMIT
    sp._RESIDENT_X_LIMIT = -1  # force the scalar-prefetch x window path
    try:
        x = np.random.default_rng(1).standard_normal(coo.shape[1]).astype(
            np.float32)
        y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    finally:
        sp._RESIDENT_X_LIMIT = lim
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v * x.astype(np.float64)[c])
    return np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)


def canary_windowed():
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(100_000, nnz_per_row=8, bandwidth=128,
                       seed=9).pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    sb, nsw = plan.reduce_window()
    assert nsw < plan.n_slices, "window must engage (dynamic y store)"
    op = SellSpMV(plan, interpret=False)
    x = np.random.default_rng(2).standard_normal(coo.shape[1]).astype(
        np.float32)
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v * x.astype(np.float64)[c])
    return np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)


def canary_shardmap():
    import jax.numpy as jnp

    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.parallel import (
        make_mesh, shard_sell, spmv_sell_sharded,
    )

    coo = read_mtx("/root/reference/sample-data/curtis54.mtx").pad(128)
    mesh = make_mesh(1)
    sh = shard_sell(coo, mesh)
    x = np.random.default_rng(3).standard_normal(coo.shape[1]).astype(
        np.float32)
    y = np.asarray(spmv_sell_sharded(sh, jnp.asarray(x), mesh))
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v * x.astype(np.float64)[c])
    return np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)
    ok = stage("multichunk-memplus", canary_multichunk)
    stage("prefetch-x-memplus", canary_prefetch)
    stage("windowed-reduce-banded", canary_windowed)
    stage("shardmap-1chip-curtis54", canary_shardmap)
    print(f"canary total {time.time()-t0:.0f}s primary_ok={ok}",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
