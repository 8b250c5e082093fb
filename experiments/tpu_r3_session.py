"""Round-3 TPU measurement session: the full A/B matrix from VERDICT r2
item 2, recording machine-readable results for autotuner calibration.

Same stage matrix as round 2 (which never got hardware): canary ladder
(curtis54 → NOWINDOW → compat), then memplus/pwt/synth-10M A/Bs —
v6 windows vs full reduce, reduce2 vs HIGHEST, bf16 vs f32, int8 vs
int32 lane indices, resident vs prefetch x, chunk sweep.

Every timed stage appends one JSON record to
``experiments/results/tpu_r3_results.jsonl`` with the plan geometry
(S, WT, NSW, NS, n_chunks, traffic bytes) + measured us/iter, so
``ops/autotune.calibrate_rates`` can fit the cost model afterwards and
``pick_plan`` can be checked against the measured best chunk.

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r3_session.py > /tmp/tpu_r3.log 2>&1 &
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.ops import spmv_pallas as sp

REF_MS = {"memplus": 0.387638, "pwt": 0.569281, "curtis54": 0.0009249,
          "synth-10M": None}
# SMVP_SESSION_QUICK=1: tiny surrogate inputs + few iterations, for a
# CPU (interpreter) dry run of the whole session logic — catches script
# bugs BEFORE they can burn a real hardware window.
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"
RESULTS = os.path.join(
    os.path.dirname(__file__), "results",
    "tpu_r3_results_quick.jsonl" if QUICK else "tpu_r3_results.jsonl",
)
_COO_CACHE = {}


def _coo(name):
    if name not in _COO_CACHE:
        if name.startswith("synth"):
            from smvp_toolkit_tpu.utils.synth import synth_banded

            cfg = {
                "synth-10M": dict(n=1_000_000, nnz_per_row=10,
                                  bandwidth=256, seed=0),
                "synth-10M-dense": dict(n=200_000, nnz_per_row=50,
                                        bandwidth=256, seed=7),
                "synth-4M": dict(n=4_000_000, nnz_per_row=6,
                                 bandwidth=192, seed=11),
                "synth-40k": dict(n=40_000, nnz_per_row=6, bandwidth=64,
                                  seed=13),
            }[name]
            if QUICK:  # surrogate scale, same code paths
                cfg["n"] = max(cfg["n"] // 100, 20_000)
            n = cfg.pop("n")
            _COO_CACHE[name] = synth_banded(n, **cfg).pad(512)
        else:
            _COO_CACHE[name] = read_mtx(
                f"/root/reference/sample-data/{name}.mtx"
            ).pad(512)
    return _COO_CACHE[name]


def _record(rec):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def run(name, *, value_dtype=None, precision=None, resident=None,
        time_it=True, iterations=200, label="", lidx32=False, chunk=1024,
        reduce2=False, stream=False, y_block_rows=None):
    t0 = time.time()
    if QUICK:
        iterations = 3
        if stream:
            y_block_rows = 2048  # keep multi-block streaming exercised
    coo = _coo(name)
    r, c, v = coo.to_numpy()
    if stream:
        from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan

        kw = {"y_block_rows": y_block_rows} if y_block_rows else {}
        plan = build_streamed_sell_plan(r, c, v, coo.shape, chunk=chunk,
                                        **kw)
    else:
        plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
    if lidx32:
        os.environ["SMVP_SELL_LIDX32"] = "1"
    try:
        # QUICK dry runs use auto interpret (Pallas interpreter off-TPU).
        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         precision=precision, value_dtype=value_dtype)
    finally:
        os.environ.pop("SMVP_SELL_LIDX32", None)
    if reduce2:
        os.environ["SMVP_SELL_REDUCE2"] = "1"
    if resident is not None:
        # monkey-patch the auto choice for the comparison stage
        lim = sp._RESIDENT_X_LIMIT
        sp._RESIDENT_X_LIMIT = 10**12 if resident else -1
    try:
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        x = jnp.asarray(xh)
        bf16 = value_dtype == jnp.bfloat16
        vdt = np.float32
        if bf16:
            import ml_dtypes

            vdt = ml_dtypes.bfloat16
        y_ref = np.zeros(coo.shape[0])
        np.add.at(
            y_ref, r,
            v.astype(vdt).astype(np.float64)
            * xh.astype(vdt)[c].astype(np.float64),
        )
        scale = np.abs(y_ref).max() + 1e-30
        nsw = plan.reduce_window()[1]
        tag = (f"{name}{label} S={plan.n_sublanes} WT={plan.window_tiles} "
               f"NSW={nsw}/{plan.n_slices}")
        rec = {
            "ts": time.time(), "name": name, "label": label.strip(),
            "chunk": chunk, "bf16": bf16, "reduce2": reduce2,
            "stream_y_blocks": (
                int(plan.y_block_id.max()) + 1 if stream else 0
            ),
            "lidx32": lidx32, "resident": resident,
            "precision": str(precision) if precision else None,
            "env_nowindow": os.environ.get("SMVP_SELL_NOWINDOW") == "1",
            "env_compat": os.environ.get("SMVP_SELL_COMPAT") == "1",
            "nnz": int(coo.nnz), "nrows": int(coo.shape[0]),
            "S": int(plan.n_sublanes), "WT": int(plan.window_tiles),
            "NSW": int(nsw), "NS": int(plan.n_slices),
            "n_chunks": int(plan.n_chunks),
            # lidx width must be passed explicitly: the LIDX32 env var is
            # only set around operator construction above, so the
            # default-resolution here would claim int8 for an int32 run.
            "traffic_bytes": float(plan.traffic_bytes(
                2 if bf16 else 4,
                4 if (lidx32 or chunk % 32) else 1,
                2 if bf16 else 4)),
            "device": jax.devices()[0].device_kind,
        }
        if not time_it:
            # still validate (canary); use a single eager call
            y = np.asarray(op(x)).astype(np.float64)
            err = np.abs(y - y_ref).max() / scale
            rec.update(err=float(err))
            _record(rec)
            print(f"{tag}: err={err:.2e}  "
                  f"(compile+run {time.time()-t0:.0f}s)", flush=True)
            return
        # Timed stages ride validation on the fused loop's accumulator —
        # ONE remote compile per stage (bench.py's trick).
        stats, acc = bench_spmv_fused(
            lambda m, xx: op(xx), coo, x, iterations=iterations,
            repeats=3, return_final=True,
        )
        y = np.asarray(acc).astype(np.float64) / iterations
        err = np.abs(y - y_ref).max() / scale
        nnzs = coo.nnz / (stats.avg_ms * 1e-3)
        ref = REF_MS.get(name)
        vs = f"vs_ref_csr {ref / stats.avg_ms:6.1f}x" if ref else ""
        rec.update(err=float(err), avg_us=float(stats.avg_ms * 1e3),
                   gnnz_s=float(nnzs / 1e9), iterations=iterations)
        _record(rec)
        print(f"{tag}: err={err:.2e}  {stats.avg_ms*1e3:8.2f} us/iter  "
              f"{nnzs/1e9:6.2f} Gnnz/s  {vs} "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
    finally:
        if resident is not None:
            sp._RESIDENT_X_LIMIT = lim
        if reduce2:
            os.environ.pop("SMVP_SELL_REDUCE2", None)


def run_grad(name, *, iterations=100, label=" grad"):
    """Time one fused training-gradient step: gv, gx of 0.5·|A(v)·x|².

    The backward sweeps the nnz three times per iteration (forward y,
    vals-grad kernel, transpose apply for gx), all on the Pallas path —
    this stage measures the trainable-edge story end to end with ONE
    remote compile (fori_loop fusion, bench.py's trick).
    """
    t0 = time.time()
    if QUICK:
        iterations = 3
    coo = _coo(name)
    r, c, v = coo.to_numpy()
    op = sp.SellSpMV.from_coo(coo, interpret=None if QUICK else False)
    f = op.differentiable_edges()
    rng = np.random.default_rng(0)
    xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
    x = jnp.asarray(xh)
    vj = jnp.asarray(v[: coo.nnz].astype(np.float32))
    grad_fn = jax.grad(
        lambda vv, xx: 0.5 * jnp.sum(f(vv, xx) ** 2), argnums=(0, 1)
    )

    @jax.jit
    def fused(vv, xx):
        def body(_, carry):
            agv, agx = carry
            # Never-taken select: makes each iteration data-dependent on
            # the carry so XLA cannot hoist the gradient out of the loop.
            xi = jnp.where(agx[0] > 1e30, xx + 1.0, xx)
            gv, gx = grad_fn(vv, xi)
            return agv + gv, agx + gx

        zero = (jnp.zeros_like(vv), jnp.zeros_like(xx))
        return jax.lax.fori_loop(0, iterations, body, zero)

    agv, agx = jax.block_until_ready(fused(vj, x))  # compile + warmup
    times = []
    for _ in range(3):
        t1 = time.time()
        jax.block_until_ready(fused(vj, x))
        times.append((time.time() - t1) / iterations)
    # Host float64 oracle: g = y, gv = y[r]·x[c], gx = Aᵀ·y.
    rn, cn, vn = r[: coo.nnz], c[: coo.nnz], v[: coo.nnz]
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, rn, vn * xh.astype(np.float64)[cn])
    gv_ref = y_ref[rn] * xh.astype(np.float64)[cn]
    gx_ref = np.zeros(coo.shape[1])
    np.add.at(gx_ref, cn, vn * y_ref[rn])
    egv = np.abs(np.asarray(agv, np.float64) / iterations - gv_ref).max()
    egv /= np.abs(gv_ref).max() + 1e-30
    egx = np.abs(np.asarray(agx, np.float64) / iterations - gx_ref).max()
    egx /= np.abs(gx_ref).max() + 1e-30
    avg = min(times)
    nnzs3 = 3 * coo.nnz / avg  # 3 nnz-sweeps per gradient iteration
    rec = {
        "ts": time.time(), "name": name, "label": label.strip(),
        "kind": "grad", "nnz": int(coo.nnz),
        "err_gv": float(egv), "err_gx": float(egx),
        "avg_us": float(avg * 1e6), "gnnz_s_3pass": float(nnzs3 / 1e9),
        "iterations": iterations,
        "device": jax.devices()[0].device_kind,
    }
    _record(rec)
    print(f"{name}{label}: err_gv={egv:.2e} err_gx={egx:.2e}  "
          f"{avg*1e6:8.2f} us/step  {nnzs3/1e9:6.2f} Gnnz/s(3-pass) "
          f"(compile+run {time.time()-t0:.0f}s)", flush=True)


def run_spmm(name, *, k=8, fused=True, iterations=100, label=" spmm"):
    """Time Y = A·X (k RHS) on the Pallas path with ONE remote compile.

    ``fused=True`` runs the k-wide fused launch (value/index planes read
    once per chunk for all k columns); ``fused=False`` pins the
    vmap-over-columns fallback (SMVP_SELL_SPMM=0). The A/B isolates the
    plane-traffic amortization the fused kernel claims — at SELL
    occupancies the planes dominate HBM traffic, so fused should
    approach k× the per-launch SpMV rate.
    """
    t0 = time.time()
    if QUICK:
        iterations = 3
    coo = _coo(name)
    r, c, v = coo.to_numpy()
    op = sp.SellSpMV.from_coo(coo, interpret=None if QUICK else False)
    rng = np.random.default_rng(0)
    Xh = rng.standard_normal((coo.shape[1], k)).astype(np.float32)
    X = jnp.asarray(Xh)
    prior_spmm = os.environ.get("SMVP_SELL_SPMM")  # restore, don't pop
    if not fused:
        os.environ["SMVP_SELL_SPMM"] = "0"
    try:

        @jax.jit
        def loop(XX):
            def body(_, acc):
                # Never-taken select: keeps each iteration data-dependent
                # on the carry so XLA cannot hoist the SpMM.
                Xi = jnp.where(acc[0, 0] > 1e30, XX + 1.0, XX)
                return acc + op.matmat(Xi)

            zero = jnp.zeros((coo.shape[0], k), jnp.float32)
            return jax.lax.fori_loop(0, iterations, body, zero)

        acc = jax.block_until_ready(loop(X))  # compile + warmup
        times = []
        for _ in range(3):
            t1 = time.time()
            jax.block_until_ready(loop(X))
            times.append((time.time() - t1) / iterations)
        Y = np.asarray(acc, np.float64) / iterations
        rn, cn, vn = r[: coo.nnz], c[: coo.nnz], v[: coo.nnz]
        Y_ref = np.zeros((coo.shape[0], k))
        np.add.at(Y_ref, rn, vn[:, None] * Xh.astype(np.float64)[cn])
        err = np.abs(Y - Y_ref).max() / (np.abs(Y_ref).max() + 1e-30)
        avg = min(times)
        nnzs = k * coo.nnz / avg  # k RHS served per launch
        # Effective mode: matmat silently vmaps under compat/streamed/
        # capped-group conditions — record what actually ran.
        from smvp_toolkit_tpu.ops.spmv_pallas import spmm_launch_group

        fused_eff = (
            fused
            and not op.plan.y_block_slices
            and os.environ.get("SMVP_SELL_COMPAT") != "1"
            and spmm_launch_group(
                op.plan.n_slices, op.plan.n_coltiles,
                jnp.dtype(op.value_dtype).itemsize,
            ) >= 2
        )
        rec = {
            "ts": time.time(), "name": name, "label": label.strip(),
            "kind": "spmm", "k": k, "fused": fused,
            "fused_effective": fused_eff, "nnz": int(coo.nnz),
            "err": float(err), "avg_us": float(avg * 1e6),
            "gnnz_s_krhs": float(nnzs / 1e9), "iterations": iterations,
            "device": jax.devices()[0].device_kind,
        }
        _record(rec)
        print(f"{name}{label}: err={err:.2e}  {avg*1e6:8.2f} us/iter  "
              f"{nnzs/1e9:6.2f} Gnnz/s(x{k}rhs) "
              f"(compile+run {time.time()-t0:.0f}s)", flush=True)
    finally:
        if prior_spmm is None:
            os.environ.pop("SMVP_SELL_SPMM", None)
        else:
            os.environ["SMVP_SELL_SPMM"] = prior_spmm


def main():
    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)
    stages = [
        ("curtis54", dict(time_it=False, label=" canary")),
        # Fused-SpMM compile canary EARLY: a short tunnel window should
        # still Mosaic-validate the k-wide kernel family (one compile).
        ("curtis54", dict(spmm_canary=True)),
        ("memplus", dict(label=" f32")),
        ("memplus", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("pwt", dict(label=" f32")),
        ("pwt", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("memplus", dict(resident=False, label=" f32-prefetchwin")),
        ("memplus", dict(lidx32=True, label=" f32-lidx32")),
        ("memplus", dict(precision=jax.lax.Precision.HIGH,
                         label=" f32-HIGH")),
        # Double-bf16 ladder: 2 single-pass reduce matmuls (lossless for
        # bf16-mode products; ~1e-5 rel for f32 — check err output).
        ("memplus", dict(value_dtype=jnp.bfloat16, reduce2=True,
                         label=" bf16-reduce2")),
        ("memplus", dict(reduce2=True, label=" f32-reduce2")),
        # Chunk sweep: reduce MACs are chunk-invariant but the per-chunk
        # tile window (table MACs) shrinks with the chunk. These rows
        # are the autotuner calibration set.
        ("memplus", dict(chunk=512, label=" f32-c512")),
        ("memplus", dict(chunk=256, label=" f32-c256")),
        ("memplus", dict(chunk=2048, label=" f32-c2048")),
        ("pwt", dict(chunk=512, label=" f32-c512")),
        ("pwt", dict(chunk=256, label=" f32-c256")),
        ("memplus", dict(value_dtype=jnp.bfloat16, chunk=512,
                         label=" bf16-c512")),
        # Last: the 10M-nnz scaling config (big upload through the tunnel;
        # ~150 MB of planes — keep it from blocking the smaller stages).
        ("synth-10M", dict(iterations=50, label=" f32")),
        ("synth-10M", dict(value_dtype=jnp.bfloat16, iterations=50,
                           label=" bf16")),
        ("synth-10M", dict(chunk=512, iterations=50, label=" f32-c512")),
        # v7 streamed y: small-block Mosaic canary first, then the
        # >VMEM-output 4M-row config (ROADMAP flush-behind item) and an
        # A/B of streamed vs resident on the 10M/1M-row config.
        ("synth-40k", dict(time_it=False, stream=True, chunk=256,
                           y_block_rows=2048, label=" stream-canary")),
        ("synth-4M", dict(iterations=50, stream=True,
                          label=" f32-stream")),
        ("synth-10M", dict(iterations=50, stream=True,
                           label=" f32-stream")),
    ]
    for i, (name, kw) in enumerate(stages):
        try:
            if kw.get("spmm_canary"):
                run_spmm(name, k=4, fused=True, iterations=3,
                         label=" spmm-canary")
                continue
            run(name, **kw)
        except Exception as e:
            print(f"{name} {kw.get('label','')} FAILED: {str(e)[:300]}",
                  flush=True)
            if i == 0 and os.environ.get("SMVP_SELL_COMPAT") != "1":
                # Canary rejected by Mosaic: walk the fallback ladder —
                # first disable the v6 dynamic-offset y store
                # (SMVP_SELL_NOWINDOW), then the dense one-hot compat
                # kernel (round-1-proven config) — and retry.
                print("canary failed — trying SMVP_SELL_NOWINDOW=1",
                      flush=True)
                os.environ["SMVP_SELL_NOWINDOW"] = "1"
                try:
                    run(name, **kw)
                    continue  # nowindow works; keep it for the session
                except Exception as e2:
                    print(f"nowindow canary failed: {str(e2)[:300]}",
                          flush=True)
                print("switching to SMVP_SELL_COMPAT=1", flush=True)
                os.environ.pop("SMVP_SELL_NOWINDOW", None)
                os.environ["SMVP_SELL_COMPAT"] = "1"
                try:
                    run(name, **kw)
                except Exception as e2:
                    print(f"compat canary ALSO FAILED: {str(e2)[:300]}",
                          flush=True)

    # Trainable-edge backward throughput (resident-y matrices only —
    # streamed-y operators train on the XLA path by design).
    for gname, gkw in [
        ("memplus", dict(label=" grad-f32")),
        ("synth-10M", dict(iterations=20, label=" grad-f32")),
    ]:
        try:
            run_grad(gname, **gkw)
        except Exception as e:
            print(f"{gname} grad FAILED: {str(e)[:300]}", flush=True)

    # Fused SpMM vs the vmap fallback (k right-hand sides per launch) —
    # the GCN-training hot op; fused should approach k× the SpMV rate.
    for sname, skw in [
        ("memplus", dict(k=8, fused=True, label=" spmm8-fused")),
        ("memplus", dict(k=8, fused=False, label=" spmm8-vmap")),
        ("pwt", dict(k=8, fused=True, label=" spmm8-fused")),
        ("pwt", dict(k=8, fused=False, label=" spmm8-vmap")),
        ("memplus", dict(k=16, fused=True, label=" spmm16-fused")),
    ]:
        try:
            run_spmm(sname, **skw)
        except Exception as e:
            print(f"{sname} spmm FAILED: {str(e)[:300]}", flush=True)

    # Post-session: calibrate the autotuner cost model on the chunk-sweep
    # records and check pick_plan against the measured best.
    try:
        from smvp_toolkit_tpu.ops.autotune import (
            calibrate_rates, check_pick_plan,
        )

        with open(RESULTS) as f:
            records = [json.loads(ln) for ln in f if ln.strip()]
        rates = calibrate_rates(records)
        print(f"calibrated RATES: {rates}", flush=True)
        # QUICK (interpreter) fits are 2-3 orders off real v5e rates —
        # never let a dry run clobber hardware calibration.
        cal_path = os.path.join(
            os.path.dirname(RESULTS),
            "autotune_rates_quick.json" if QUICK else "autotune_rates.json",
        )
        with open(cal_path, "w") as f:
            json.dump(rates, f, indent=1)
        for verdict in check_pick_plan(records, rates):
            print(f"pick_plan check: {verdict}", flush=True)
    except Exception as e:
        print(f"calibration step failed: {str(e)[:300]}", flush=True)
    print(f"session total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
