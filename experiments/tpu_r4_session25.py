"""Round-4 session 25: grid-fused SHARDED rate (1-chip shard_map).

The r4 sharded rates (10.4 Gnnz/s at scale) carried the XLA-loop tax;
bench_loop_sharded runs the per-device iteration loop inside the Mosaic
grid under shard_map. 3-point fits; 1-chip mesh (the only hardware).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session25.py > /tmp/tpu_r4_s25.log 2>&1 &
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


def run_cell(name, chunk, base_n):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from smvp_toolkit_tpu.parallel.sell_dist import (
        bench_loop_sharded,
        shard_sell,
    )

    try:
        if QUICK:
            base_n = 2
        coo = s3._coo(name)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
        sh = shard_sell(coo, mesh, chunk=chunk, value_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        x = jnp.asarray(xh)
        r, c, v = coo.to_numpy()

        import ml_dtypes

        vdt = ml_dtypes.bfloat16
        y_ref = np.zeros(coo.shape[0])
        np.add.at(y_ref, r, v.astype(vdt).astype(np.float64)
                  * xh.astype(vdt)[c].astype(np.float64))
        scale = np.abs(y_ref).max() + 1e-30

        pts, ts, errs = [base_n, 2 * base_n, 4 * base_n], [], []
        for n in pts:
            f = jax.jit(
                lambda xx, _n=n: bench_loop_sharded(sh, xx, mesh, _n)
            )
            y = np.asarray(f(x))
            errs.append(float(np.abs(y.astype(np.float64) - y_ref).max()
                              / scale))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter_ns()
                np.asarray(f(x))
                samples.append((time.perf_counter_ns() - t0) / 1e3)
            ts.append(min(samples))
        A = np.vstack([pts, np.ones(3)]).T
        (slope, intercept), *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                 rcond=None)
        us = float(slope)
        gn = coo.nnz / us / 1e3 if us > 0 else float("nan")
        _record({"ts": time.time(), "kind": "grid-fused-sharded",
                 "name": name, "chunk": chunk, "iters_pts": pts,
                 "t_us": ts, "avg_us": us, "gnnz_s": gn,
                 "err": max(errs), "nnz": int(coo.nnz),
                 "device": jax.devices()[0].device_kind})
        print(f"{name} sharded1 c{chunk}: {us:9.2f} us/iter  {gn:7.2f} "
              f"Gnnz/s  err={max(errs):.1e}", flush=True)
    except Exception as e:  # noqa: BLE001
        _record({"ts": time.time(), "kind": "grid-fused-sharded",
                 "name": name, "ok": False,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(f"{name} sharded FAILED: {str(e)[:200]}", flush=True)


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    run_cell("memplus", 2048, 2000)
    run_cell("synth-10M", 2048, 100)
    print(f"session25 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
