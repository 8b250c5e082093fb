"""Round-2 stage-2 TPU session: engine-wide measurements beyond raw SpMV.

Run AFTER ``tpu_r2_session.py`` (kernel compile validation + SpMV timing
matrix). These stages measure the *consumers* of the sparse engine and
attribute SELL kernel time to its pipeline stages:

  A. SpMM Y = A·X (XLA gather/segment-sum path) at k = 32 / 128.
  B. SellSpMV.matmat (vmap'd Pallas kernel) at k = 8 for comparison.
  C. GCN training-step rate (SpMM + dense MXU + autodiff, lax.scan).
  D. Solver iteration rates: CG (XLA and Pallas SpMV), BiCGSTAB, GMRES,
     PageRank — each loop runs fully on device (lax.scan), so the rate
     is SpMV cost + vector-op overhead per iteration.
  E. SELL stage attribution on memplus: kernel variants that skip one
     pipeline stage each (table matmul / lane shuffle / row reduce /
     pure plane streaming) isolate where the time goes — this picks the
     next kernel optimization (ROADMAP "Kernel performance backlog").

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r2_stage2.py > /tmp/tpu_r2_s2.log 2>&1 &
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import LANES, build_sell_plan
from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
from smvp_toolkit_tpu.ops.spmv_xla import spmm_csr, spmv_csr
from smvp_toolkit_tpu.utils.synth import synth_banded

_COO = {}


def coo_of(name):
    if name not in _COO:
        if name.startswith("synth"):
            _, n, npr = name.split(":")
            _COO[name] = synth_banded(
                int(n), nnz_per_row=int(npr), bandwidth=64, seed=0
            ).pad(512)
        else:
            _COO[name] = read_mtx(
                f"/root/reference/sample-data/{name}.mtx"
            ).pad(512)
    return _COO[name]


RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "tpu_stage2_results.jsonl",
)


def _record(rec):
    """Persist one stage record (pass or fail) — failure telemetry must
    survive the environment, not just the watch log (VERDICT r3)."""
    import json

    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed(tag, fn, *args, repeats=3, warmup=1, per=1):
    """Wall-time a jitted fn (block_until_ready); prints ms and rate."""
    try:
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter_ns()
            jax.block_until_ready(fn(*args))
            samples.append((time.perf_counter_ns() - t0) / 1e6)
        ms = min(samples) / per
        print(f"{tag}: {ms*1e3:10.2f} us/unit  ({1.0/(ms*1e-3):8.0f} /s)",
              flush=True)
        _record({"ts": time.time(), "kind": "stage2", "tag": tag,
                 "ok": True, "avg_us": ms * 1e3,
                 "device": jax.devices()[0].device_kind})
        return ms
    except Exception as e:  # noqa: BLE001 — stage isolation by design
        print(f"{tag} FAILED: {str(e)[:300]}", flush=True)
        _record({"ts": time.time(), "kind": "stage2", "tag": tag,
                 "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        return None


def fused(fn, x, iterations):
    """Device-loop wrapper: N applications of fn inside one program."""

    @jax.jit
    def run(x):
        out = fn(x)

        def body(i, acc):
            eps = jnp.where(i < 0, acc.reshape(-1)[0], 0.0).astype(x.dtype)
            idx = (0,) * x.ndim
            return acc + fn(x.at[idx].add(eps)).astype(acc.dtype)

        return jax.lax.fori_loop(
            0, iterations, body, jnp.zeros(out.shape, jnp.float32)
        )

    return run


# ---------------------------------------------------------------------------
# E. SELL stage-attribution kernels (experiment-local; mirror the
#    resident-x kernel in ops/spmv_pallas.py with one stage removed each)
# ---------------------------------------------------------------------------


def _attr_kernel(which, ns, nsw, wt, precision):
    """Mirrors the production v6 kernel with one pipeline stage removed."""

    def kern(bases_ref, x_ref, val_ref, lidx_ref, rel_ref, sl_ref, y_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        if which == "stream":
            # Plane streaming only: touch both packed planes, no compute.
            y_ref[:] += (
                val_ref[0:ns, :] + lidx_ref[0:ns, :].astype(jnp.float32)
            )
            return
        x_win = x_ref[pl.ds(pl.multiple_of(bases_ref[0, step], 16), wt), :]
        if which == "no-table":
            table = jnp.broadcast_to(x_win[0:1, :], val_ref.shape)
        else:
            wt_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wt), 1)
            oht = (rel_ref[:] == wt_iota).astype(jnp.float32)
            table = jnp.dot(
                oht, x_win,
                preferred_element_type=jnp.float32, precision=precision,
            )
        if which == "no-shuffle":
            g = table
        else:
            g = jnp.take_along_axis(
                table, lidx_ref[:].astype(jnp.int32), axis=1
            )
        prod = val_ref[:].astype(jnp.float32) * g
        if which == "no-reduce":
            y_ref[:] += prod[0:ns, :]
            return
        # v6 windowed reduce (matches the production kernel).
        sb = pl.multiple_of(bases_ref[1, step], 8)
        rel_s = sl_ref[0] - sb
        nsw_iota = jax.lax.broadcasted_iota(jnp.int32, (nsw, 1), 0)
        seg = (nsw_iota == rel_s).astype(jnp.float32)
        y_ref[pl.ds(sb, nsw), :] += jnp.dot(
            seg, prod,
            preferred_element_type=jnp.float32, precision=precision,
        )

    return kern


def attr_call(op, which):
    """SpMV-shaped callable running the attribution variant ``which``."""
    plan = op.plan
    ns, wt, chunk = plan.n_slices, plan.window_tiles, plan.chunk
    nsw = plan.reduce_window()[1]
    assert ns <= chunk, "attribution slices must fit one chunk"
    ct = plan.n_coltiles

    def f(x):
        x = x.astype(jnp.float32)
        npad = ct * LANES
        if x.shape[0] < npad:
            x = jnp.pad(x, (0, npad - x.shape[0]))
        y = pl.pallas_call(
            _attr_kernel(which, ns, nsw, wt, jax.lax.Precision.HIGHEST),
            grid=(plan.n_chunks,),
            interpret=jax.devices()[0].platform != "tpu",
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, 1), lambda i: (i, 0)),
                # 3-D slice_of layout (see ops/spmv_pallas.py: the 2-D
                # (1, chunk) block is illegal for multi-chunk plans).
                pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((ns, LANES), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
        )(op.bases, x.reshape(ct, LANES), op.vals,
          op.lidx, op.rel_tile,
          op.slice_of.reshape(plan.n_chunks, 1, chunk))
        return y.reshape(-1)[: plan.shape[0]]

    return f


def main():
    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    # SMVP_S2_SMOKE=1: tiny inputs / CPU — validates every stage end-to-
    # end (interpret-mode Pallas) without a TPU; numbers are meaningless.
    smoke = os.environ.get("SMVP_S2_SMOKE") == "1"
    mem_name = "curtis54" if smoke else "memplus"
    synth_name = "synth:5000:10" if smoke else "synth:1000000:10"

    mem = coo_of(mem_name)
    csr_mem = csr_encode(mem)
    n_mem = mem.shape[1]
    rng = np.random.default_rng(0)

    # --- A. SpMM (XLA path) ------------------------------------------------
    for k in (32, 128):
        X = jnp.asarray(
            rng.standard_normal((n_mem, k)).astype(np.float32)
        )
        ms = timed(
            f"spmm_csr memplus k={k} (xla, fused x100)",
            fused(lambda xx: spmm_csr(csr_mem, xx), X, 100),
            X, per=100,
        )
        if ms:
            mac = mem.nnz * k
            print(f"  -> {mac / (ms*1e-3) / 1e9:.2f} Gmac/s "
                  f"(= {mem.nnz/(ms*1e-3)/1e9:.3f} Gnnz/s x k)", flush=True)

    # --- B. Pallas matmat (vmap over columns) ------------------------------
    op_mem = SellSpMV.from_coo(mem)
    X8 = jnp.asarray(rng.standard_normal((n_mem, 8)).astype(np.float32))
    timed(
        "SellSpMV.matmat memplus k=8 (vmap pallas, fused x20)",
        fused(lambda xx: op_mem.matmat(xx), X8, 20),
        X8, per=20,
    )

    # --- E. SELL stage attribution on memplus ------------------------------
    # Runs FIRST among the long stages: it decides the TJDS-hybrid
    # build/reject call (VERDICT round-2 item 4), so it must land even
    # if the watcher's outer timeout cuts the session short.
    x_mem = jnp.asarray(rng.standard_normal(n_mem).astype(np.float32))
    timed("sell full      (fused x200)", fused(op_mem, x_mem, 200),
          x_mem, per=200)
    for which in ("no-reduce", "no-table", "no-shuffle", "stream"):
        try:
            f = attr_call(op_mem, which)
        except AssertionError as e:
            print(f"attr {which} skipped: {e}", flush=True)
            continue
        timed(f"sell {which:10s} (fused x200)", fused(f, x_mem, 200),
              x_mem, per=200)

    # --- C. GCN training step ----------------------------------------------
    try:
        from smvp_toolkit_tpu.models.graph import (
            gcn_init, gcn_norm, gcn_train_step,
        )

        s = gcn_norm(mem)
        params = gcn_init(jax.random.PRNGKey(0), (64, 64, 16))
        h = jnp.asarray(
            rng.standard_normal((mem.shape[0], 64)).astype(np.float32)
        )
        labels = jnp.asarray(
            rng.integers(0, 16, mem.shape[0]).astype(np.int32)
        )
        mask = jnp.ones((mem.shape[0],), jnp.float32)

        @jax.jit
        def train100(params):
            def body(p, _):
                p, loss = gcn_train_step(s, p, h, labels, mask)
                return p, loss

            return jax.lax.scan(body, params, None, length=100)

        timed("gcn_train_step memplus 64->64->16 (x100)", train100,
              params, per=100)
    except Exception as e:  # noqa: BLE001
        print(f"gcn FAILED: {str(e)[:300]}", flush=True)

    # --- D. Solver iteration rates -----------------------------------------
    from smvp_toolkit_tpu.models.solvers import (
        bicgstab, conjugate_gradient, gmres, pagerank,
    )

    b_mem = jnp.ones((mem.shape[0],), jnp.float32)
    timed(
        "CG memplus (xla csr, 200 it)",
        jax.jit(lambda b: conjugate_gradient(csr_mem, b, num_iters=200)[0]),
        b_mem, per=200,
    )
    sp_pal = lambda _m, xx: op_mem(xx)  # noqa: E731
    timed(
        "CG memplus (pallas sell, 200 it)",
        jax.jit(
            lambda b: conjugate_gradient(
                None, b, num_iters=200, spmv=sp_pal
            )[0]
        ),
        b_mem, per=200,
    )
    timed(
        "BiCGSTAB memplus (xla csr, 100 it; 2 SpMV/it)",
        jax.jit(lambda b: bicgstab(csr_mem, b, num_iters=100)[0]),
        b_mem, per=100,
    )
    timed(
        "GMRES(20) memplus (xla csr, 5 restarts = 105 SpMV)",
        jax.jit(
            lambda b: gmres(csr_mem, b, restart=20, num_restarts=5)[0]
        ),
        b_mem, per=105,
    )
    pwt = coo_of("pwt")
    csr_pwt = csr_encode(pwt)
    timed(
        "PageRank pwt (xla csr, 100 it)",
        jax.jit(lambda m: pagerank(m, num_iters=100)),
        csr_pwt, per=100,
    )

    # Larger solver config: 1M-row banded, Pallas operator.
    sb = coo_of(synth_name)
    op_sb = SellSpMV.from_coo(sb)
    b_sb = jnp.ones((sb.shape[0],), jnp.float32)
    timed(
        "CG synth-1M-row (pallas sell, 50 it)",
        jax.jit(
            lambda b: conjugate_gradient(
                None, b, num_iters=50, spmv=lambda _m, xx: op_sb(xx)
            )[0]
        ),
        b_sb, per=50,
    )

    print(f"stage2 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
