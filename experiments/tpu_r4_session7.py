"""Round-4 session 7: how much of the measured time is the HARNESS?

Session-6's fetch-synced attribution left a 2.5x contradiction: the
attr "stream" kernel (planes-only, production frame) measures 708 us at
the flagship config while micro3's structurally identical rung measures
285 us. The remaining structural difference is the TIMING LOOP:
bench_spmv_fused's per-iteration body is

    x' = DUS(x, where(i<0, acc[0], 0))        # anti-hoist, 8 MB traffic
    y  = op(x')                                # pad + cast + reshape + kernel
    acc = acc + y.astype(f32)                  # full-vector carry, ~12 MB

while micro3 carries ONE scalar. This session ladders the wrapper out:

  A  control: standard bench_spmv_fused on the production operator
  B  scalar-carry loop: same DUS anti-hoist, but acc += y[0] only
  C  B with x pre-cast to bf16 (the op's astype becomes a no-op)
  D  bare-kernel loop: x packed to (ct, 128) tiles ONCE outside the
     loop, the pallas launch called directly, scalar carry — the
     kernel's intrinsic rate (micro3-equivalent, real compute)

A-C = benchmark artifact (would mean every reported Gnnz/s understates
the kernel), C-D = the unavoidable per-apply x-prep cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session7.py > /tmp/tpu_r4_s7.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session7.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _record

s3.RESULTS = RESULTS
QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"


def _time_loop(fn, args, iterations, eps_into, name, label, nnz):
    """micro3-style fetch-synced timing of `fn(*args)` in a fori_loop.

    ``eps_into`` names the arg index that receives the anti-hoist
    perturbation (acc * 1e-38 at its [0...] element, exactly 0 at
    runtime on TPU).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, acc):
            a = list(args)
            t = a[eps_into]
            eps = (acc * jnp.float32(1e-38)).astype(t.dtype)
            a[eps_into] = t.at[(0,) * t.ndim].add(eps)
            y = fn(*a)
            return acc + y.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iterations, body, jnp.float32(1))

    np.asarray(loop(args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter_ns()
        np.asarray(loop(args))
        samples.append((time.perf_counter_ns() - t0) / 1e3 / iterations)
    us = min(samples)
    import jax as _j

    _record({"ts": time.time(), "kind": "harness-attr", "name": name,
             "label": label, "avg_us": us,
             "gnnz_s": nnz / us / 1e3, "iterations": iterations,
             "device": _j.devices()[0].device_kind})
    print(f"{name} {label:24s}: {us:9.2f} us/iter  "
          f"{nnz / us / 1e3:7.2f} Gnnz/s", flush=True)
    return us


def run_matrix(name, chunk, iterations, env=None):
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.bench.harness import bench_spmv_fused
    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import LANES, build_sell_plan

    env = env or {}
    for k, v in env.items():
        os.environ[k] = v
    tag = "+".join(sorted(env)) or "plain"
    try:
        if QUICK:
            iterations = 3
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         value_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        x = jnp.asarray(xh)
        nnz = int(coo.nnz)

        # A: the production harness (control).
        stats = bench_spmv_fused(lambda m, xx: op(xx), coo, x,
                                 iterations=iterations, repeats=3)
        _record({"ts": time.time(), "kind": "harness-attr", "name": name,
                 "label": f"A-bench[{tag}]",
                 "avg_us": float(stats.avg_ms * 1e3),
                 "gnnz_s": nnz / (stats.avg_ms * 1e3) / 1e3,
                 "iterations": iterations,
                 "device": jax.devices()[0].device_kind})
        print(f"{name} {'A-bench[' + tag + ']':24s}: "
              f"{stats.avg_ms * 1e3:9.2f} us/iter  "
              f"{nnz / (stats.avg_ms * 1e3) / 1e3:7.2f} Gnnz/s",
              flush=True)

        # B: scalar-carry loop on the full operator apply.
        _time_loop(lambda xx: op(xx), (x,), iterations, 0, name,
                   f"B-scalar[{tag}]", nnz)

        # C: B with x pre-cast to bf16.
        xb = x.astype(jnp.bfloat16)
        _time_loop(lambda xx: op(xx), (xb,), iterations, 0, name,
                   f"C-bf16x[{tag}]", nnz)

        # D: bare launch — x packed once, kernel called directly.
        ncols_pad = plan.n_coltiles * LANES
        xt = jnp.pad(xb, (0, ncols_pad - xb.shape[0])).reshape(
            plan.n_coltiles, LANES
        )

        def bare(xtile):
            return op._apply_tiles(xtile)

        _time_loop(bare, (xt,), iterations, 0, name,
                   f"D-bare[{tag}]", nnz)
    except Exception as e:  # noqa: BLE001 — cell isolation
        _record({"ts": time.time(), "kind": "harness-attr", "name": name,
                 "label": f"FAILED[{tag}]", "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} [{tag}] FAILED: {str(e)[:200]}", flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_matrix("synth-10M", 2048, 50)
    run_matrix("synth-10M", 2048, 50,
               env={"SMVP_SELL_PACK": "1", "SMVP_SELL_SPLIT": "2"})
    run_matrix("memplus", 1024, 200)
    print(f"session7 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
