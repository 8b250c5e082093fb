"""Round-5 session 1: co-clustering on hardware + slot-rate chain attack.

Cells (grid-fused protocol, bf16, correctness-gated vs the bf16 f64
oracle; every comparison is an in-session A/B):

* co-clustered plans (ops/cocluster.py) vs natural on synth-10M /
  memplus / pwt — the occupancy gain (0.339->0.435 on synth, plan
  statistic) must convert to Gnnz/s at the slot-rate law's prediction;
* SMVP_SELL_BF16_TAA / SMVP_SELL_SPLIT_CHAIN — the two chain-
  serialization attacks on the ~0.87 us/step VPU gather stage
  (PERFORMANCE.md sessions 18/26);
* the production autotuner's memplus pick (single-chunk + VMEM 100).

Run: cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site nohup \
      python -u experiments/tpu_r5_session1.py > /tmp/tpu_r5_s1.log 2>&1 &
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tpu_r3_session as s3

RESULTS = os.path.join(
    os.path.dirname(__file__), "results", "tpu_r5_results.jsonl"
)
LOCK = "/tmp/smvp_tpu.lock"
QUICK = os.environ.get("SMVP_TPU_QUICK") == "1"

_CC_CACHE = {}


def _record(rec):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _cc(name):
    """Co-cluster a sample matrix once per session (host-side).

    File-cached under /tmp so per-cell subprocess runs (the watchdog
    architecture — a wedged remote compile must not stall the whole
    session) pay the refinement once.
    """
    if name not in _CC_CACHE:
        from smvp_toolkit_tpu.ops.cocluster import CoClusterResult, cocluster

        coo = s3._coo(name)
        cache = f"/tmp/smvp_cc_{name}.npz"
        if os.path.exists(cache):
            d = np.load(cache)
            _CC_CACHE[name] = CoClusterResult(
                row_map=d["row_map"], col_map=d["col_map"],
                shape_padded=tuple(int(x) for x in d["shape_padded"]),
                s_true=int(d["s_true"]),
                s_true_natural=int(d["s_true_natural"]),
                moves=int(d["moves"]), init=str(d["init"]),
            )
            return _CC_CACHE[name]
        r, c, _v = coo.to_numpy()
        t0 = time.time()
        res = cocluster(
            np.asarray(r, np.int64), np.asarray(c, np.int64), coo.shape
        )
        print(f"cocluster {name}: occ {res.occupancy(coo.nnz):.3f} "
              f"(S {res.s_true_natural} -> {res.s_true}) "
              f"[{time.time()-t0:.0f}s]", flush=True)
        np.savez(cache, row_map=res.row_map, col_map=res.col_map,
                 shape_padded=np.asarray(res.shape_padded),
                 s_true=res.s_true, s_true_natural=res.s_true_natural,
                 moves=res.moves, init=res.init)
        _CC_CACHE[name] = res
    return _CC_CACHE[name]


def run_cell5(name, label, *, chunk=2048, cocluster=False, env=None,
              base_n=None, autotune=False, df64=False):
    if df64:
        return _run_cell5_df64(name, label, chunk=chunk, base_n=base_n)
    return _run_cell5_std(name, label, chunk=chunk, cocluster=cocluster,
                          env=env, base_n=base_n, autotune=autotune)


def _run_cell5_df64(name, label, *, chunk, base_n):
    """df64 grid-fused cell: slope fit + 1e-13 oracle gate."""
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.ops.spmv_df64 import SellDf64SpMV
    try:
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        if base_n is None:
            base_n = 1000 if coo.nnz > 1_000_000 else 4000
        if QUICK:
            base_n = 2
        op = SellDf64SpMV.from_coo_f64(
            np.asarray(r, np.int64), np.asarray(c, np.int64),
            np.asarray(v, np.float64), coo.shape, chunk=chunk,
        )
        op.interpret = bool(QUICK) and op.interpret
        rng = np.random.default_rng(0)
        x64 = rng.standard_normal(coo.shape[1])
        xh = jnp.asarray(x64.astype(np.float32))
        xl = jnp.asarray((x64 - x64.astype(np.float32)
                          .astype(np.float64)).astype(np.float32))
        y_ref = np.zeros(coo.shape[0])
        np.add.at(y_ref, r, np.asarray(v, np.float64) * x64[c])
        scale = np.abs(y_ref).max() + 1e-300
        ns_pts = [base_n, 2 * base_n, 4 * base_n]
        ts, errs = [], []
        for n_ in ns_pts:
            f = jax.jit(lambda a, b, _n=n_: op.bench_loop(a, b, _n))
            yh, yl = f(xh, xl)
            y = (np.asarray(yh, np.float64)
                 + np.asarray(yl, np.float64))
            errs.append(float(np.abs(y - y_ref).max() / scale))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                jax.block_until_ready(f(xh, xl))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([ns_pts, np.ones(3)]).T
        (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                 rcond=None)
        us = float(slope)
        gnnz = coo.nnz / us / 1e3 if us > 0 else float("nan")
        rec = {"ts": time.time(), "kind": "grid-fused5", "name": name,
               "label": label, "chunk": int(op.plan.chunk),
               "S": int(op.plan.n_sublanes), "df64": True,
               "ns_pts": ns_pts, "t_us": ts, "avg_us": us,
               "gnnz_s": gnnz, "err": max(errs), "nnz": int(coo.nnz),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        ok = max(errs) < 1e-13
        print(f"{name} {label:22s}: {us:9.3f} us/iter {gnnz:8.2f} "
              f"Gnnz/s err={max(errs):.1e} "
              f"{'OK' if ok else 'ACCURACY FAIL'}", flush=True)
        return gnnz
    except Exception as e:  # noqa: BLE001
        _record({"ts": time.time(), "kind": "grid-fused5", "name": name,
                 "label": label, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} {label} FAILED: {str(e)[:250]}", flush=True)
        return None


def _run_cell5_std(name, label, *, chunk, cocluster, env, base_n,
                   autotune):
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    env = dict(env or {})
    for k, v in env.items():
        os.environ[k] = v
    try:
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        r = np.asarray(r, np.int64)
        c = np.asarray(c, np.int64)
        if base_n is None:
            base_n = 1000 if coo.nnz > 1_000_000 else 4000
        if QUICK:
            base_n = 2

        vmem = None
        res = None
        if cocluster:
            res = _cc(name)
            r2, c2 = res.row_map[r], res.col_map[c]
            if autotune:
                from smvp_toolkit_tpu.ops.autotune import (
                    pick_plan, pick_vmem_mb, production_rates)

                plan, _ = pick_plan(r2, c2, v, res.shape_padded,
                                    bf16=True, rates=production_rates())
                vmem = pick_vmem_mb(plan.chunk)
            else:
                plan = build_sell_plan(r2, c2, v, res.shape_padded,
                                       chunk=chunk)
        elif autotune:
            from smvp_toolkit_tpu.ops.autotune import (
                pick_plan, pick_vmem_mb, production_rates)

            plan, _ = pick_plan(r, c, v, coo.shape, bf16=True,
                                rates=production_rates())
            vmem = pick_vmem_mb(plan.chunk)
        else:
            plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)

        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         value_dtype=jnp.bfloat16, vmem_mb=vmem)

        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        vdt = ml_dtypes.bfloat16
        y_nat = np.zeros(coo.shape[0])
        np.add.at(y_nat, r, v.astype(vdt).astype(np.float64)
                  * xh.astype(vdt)[c].astype(np.float64))
        if cocluster:
            x_in = np.zeros(res.shape_padded[1], dtype=np.float32)
            x_in[res.col_map] = xh
            y_ref = np.zeros(res.shape_padded[0])
            y_ref[res.row_map] = y_nat
        else:
            x_in = xh
            y_ref = y_nat
        scale = np.abs(y_ref).max() + 1e-30
        x = jnp.asarray(x_in)

        ns_pts = [base_n, 2 * base_n, 4 * base_n]
        ts, errs = [], []
        for n in ns_pts:
            f = jax.jit(lambda xx, _n=n: op.bench_loop(xx, _n))
            y = np.asarray(f(x))
            errs.append(float(
                np.abs(y.astype(np.float64) - y_ref).max() / scale))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                np.asarray(f(x))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([ns_pts, np.ones(3)]).T
        (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                 rcond=None)
        us = float(slope)
        gnnz = coo.nnz / us / 1e3 if us > 0 else float("nan")
        pred_mid = slope * ns_pts[1] + intercept
        bend = (ts[1] - pred_mid) / max(ts[1], 1e-9)
        occ = plan.nnz / max(plan.slots(), 1)
        rec = {"ts": time.time(), "kind": "grid-fused5", "name": name,
               "label": label, "chunk": int(plan.chunk),
               "n_chunks": int(plan.n_chunks), "S": int(plan.n_sublanes),
               "WT": int(plan.window_tiles),
               "NSW": int(plan.reduce_window()[1]),
               "occ": round(occ, 4), "cocluster": bool(cocluster),
               "vmem_mb": vmem, "env": env, "ns_pts": ns_pts,
               "t_us": ts, "avg_us": us,
               "intercept_us": float(intercept),
               "bend_frac": float(bend), "gnnz_s": gnnz,
               "err": max(errs), "nnz": int(coo.nnz),
               "device": jax.devices()[0].device_kind}
        _record(rec)
        print(f"{name} {label:22s}: {us:9.3f} us/iter {gnnz:8.2f} Gnnz/s "
              f"occ={occ:.3f} chunk={plan.chunk} WT={plan.window_tiles} "
              f"err={max(errs):.1e} bend={bend:+.3f}", flush=True)
        return gnnz
    except Exception as e:  # noqa: BLE001 — cell isolation
        _record({"ts": time.time(), "kind": "grid-fused5", "name": name,
                 "label": label, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} {label} FAILED: {str(e)[:250]}", flush=True)
        return None
    finally:
        for k in env:
            os.environ.pop(k, None)


CELLS = {
    # 1) the flagship question: does plan occupancy convert?
    "synth-ctl": ("synth-10M", "nat-c2048-ctl", {}),
    "synth-cc": ("synth-10M", "cc-c2048", {"cocluster": True}),
    "synth-cc1024": ("synth-10M", "cc-c1024",
                     {"cocluster": True, "chunk": 1024}),
    # 2) chain attacks (winner coordinates + natural control)
    "synth-cc-taa": ("synth-10M", "cc-taa",
                     {"cocluster": True,
                      "env": {"SMVP_SELL_BF16_TAA": "1"}}),
    "synth-nat-taa": ("synth-10M", "nat-taa",
                      {"env": {"SMVP_SELL_BF16_TAA": "1"}}),
    "synth-cc-split2": ("synth-10M", "cc-split2",
                        {"cocluster": True,
                         "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "synth-nat-split2": ("synth-10M", "nat-split2",
                         {"env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "synth-cc-taa-split2": ("synth-10M", "cc-taa-split2",
                            {"cocluster": True,
                             "env": {"SMVP_SELL_BF16_TAA": "1",
                                     "SMVP_SELL_SPLIT_CHAIN": "2"}}),
    # 3) headline matrix: autotuner pick + cocluster
    "mem-ctl": ("memplus", "nat-c2048-ctl", {}),
    "mem-at": ("memplus", "nat-autotuned", {"autotune": True}),
    "mem-cc-at": ("memplus", "cc-autotuned",
                  {"cocluster": True, "autotune": True}),
    # 4) pwt
    "pwt-ctl": ("pwt", "nat-c2048-ctl", {}),
    "pwt-cc-at": ("pwt", "cc-autotuned",
                  {"cocluster": True, "autotune": True}),
    # 5) df64 rate (the within-~3x-of-bf16 claim; accuracy gated in
    #    run_cell5_df64 against the f64 oracle at 1e-13)
    "mem-df64": ("memplus", "df64", {"df64": True}),
    "synth-df64": ("synth-10M", "df64", {"df64": True}),
    # 6) split-chain follow-ups (split2 won +13% on synth-cc)
    "synth-cc-split4": ("synth-10M", "cc-split4",
                        {"cocluster": True,
                         "env": {"SMVP_SELL_SPLIT_CHAIN": "4"}}),
    "mem-at-split2": ("memplus", "at-split2",
                      {"autotune": True,
                       "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "mem-cc-at-split2": ("memplus", "cc-at-split2",
                         {"cocluster": True, "autotune": True,
                          "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "pwt-cc-at-split2": ("pwt", "cc-at-split2",
                         {"cocluster": True, "autotune": True,
                          "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    # 7) split-chain with lane-tile-aligned sub-chunks (split requires
    #    chunk % (split*128) == 0 — odd single-chunk sizes 500 the
    #    remote compiler)
    "synth-cc-split8": ("synth-10M", "cc-split8",
                        {"cocluster": True,
                         "env": {"SMVP_SELL_SPLIT_CHAIN": "8"}}),
    "mem-cc-c2048-split2": ("memplus", "cc-c2048-split2",
                            {"cocluster": True, "chunk": 2048,
                             "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "mem-cc-c2048-split4": ("memplus", "cc-c2048-split4",
                            {"cocluster": True, "chunk": 2048,
                             "env": {"SMVP_SELL_SPLIT_CHAIN": "4"}}),
    "pwt-cc-c2048-split2": ("pwt", "cc-c2048-split2",
                            {"cocluster": True, "chunk": 2048,
                             "env": {"SMVP_SELL_SPLIT_CHAIN": "2"}}),
    "pwt-cc-c2048-split4": ("pwt", "cc-c2048-split4",
                            {"cocluster": True, "chunk": 2048,
                             "env": {"SMVP_SELL_SPLIT_CHAIN": "4"}}),
    "mem-nat-c2048-split4": ("memplus", "nat-c2048-split4",
                             {"chunk": 2048,
                              "env": {"SMVP_SELL_SPLIT_CHAIN": "4"}}),
    "synth-nat-split4": ("synth-10M", "nat-split4",
                         {"env": {"SMVP_SELL_SPLIT_CHAIN": "4"}}),
    # 8) max-rate exploration (split4 now default via policy)
    "synth-cc-r1": ("synth-10M", "cc-split4-reduce1",
                    {"cocluster": True,
                     "env": {"SMVP_SELL_REDUCE1": "1"}}),
    "dense-ctl": ("synth-10M-dense", "nat-c2048", {}),
    "dense-cc": ("synth-10M-dense", "cc-c2048", {"cocluster": True}),
    # 9) per-sub-chain windows (narrow one-hot MXU work ~1/split)
    "synth-cc-subwin": ("synth-10M", "cc-subwin", {"cocluster": True}),
    "synth-cc-nosubwin": ("synth-10M", "cc-nosubwin",
                          {"cocluster": True,
                           "env": {"SMVP_SELL_SUBWIN": "0"}}),
    "mem-cc-subwin": ("memplus", "cc-c2048-subwin",
                      {"cocluster": True, "chunk": 2048}),
    "pwt-cc-subwin": ("pwt", "cc-c2048-subwin",
                      {"cocluster": True, "chunk": 2048}),
}


def main():
    """Run ONE cell (sys.argv[1]) — the driver loop runs each cell in
    its own subprocess under `timeout` so a wedged remote Mosaic
    compile (observed: the experimental sub-chunk slicing hung the
    compile service indefinitely) costs one cell, not the session:

        for c in $(python tpu_r5_session1.py --list); do
          timeout 900 python -u tpu_r5_session1.py $c || true
        done
    """
    import jax

    if len(sys.argv) > 1 and sys.argv[1] == "--list":
        print(" ".join(CELLS))
        return
    sel = sys.argv[1:] or list(CELLS)
    with open(LOCK, "w") as f:
        f.write(str(os.getpid()))
    try:
        t0 = time.time()
        dev = jax.devices()[0]
        print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
        for key in sel:
            name, label, kw = CELLS[key]
            run_cell5(name, label, **kw)
        print(f"cells {sel} total {time.time()-t0:.0f}s", flush=True)
    finally:
        try:
            os.remove(LOCK)
        except OSError:
            pass


if __name__ == "__main__":
    main()
