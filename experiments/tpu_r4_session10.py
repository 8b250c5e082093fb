"""Round-4 session 10: the ~145 us/iteration is the LOOP, not the kernel.

Session 9 (within one process, fetch-synced): a fori_loop body with NO
pallas call costs ~147 us/iter through the axon stack; empty pallas
launches at grid 1..448 all land ~140-160 us/iter — per-grid-step cost
is negligible and the memplus "kernel time" (133-199 us across
sessions) is indistinguishable from the bare loop apparatus. If the
apparatus is per-WHILE-ITERATION overhead, `unroll=N` divides it by N.

Cells (all in ONE process so contention variance cancels):
  floor-u{1,4,16,64}     bare loop body at unroll N
  memplus-u{1,16,64}     production SpMV at unroll N
  synth10M-u{1,4,16}     flagship config at unroll N
  synthbig-u4            grid112big (real-size single-stream DMA read)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session10.py > /tmp/tpu_r4_s10.log 2>&1 &
Dry: SMVP_SESSION_QUICK=1 PYTHONPATH= JAX_PLATFORMS=cpu python -u \
      experiments/tpu_r4_session10.py
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


def timed_loop(fn, args, iterations, eps_into, name, label, nnz,
               unroll=1):
    """Fetch-synced fori_loop timing with explicit unroll."""
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

        return jax.lax.fori_loop(0, iterations, body, jnp.float32(1),
                                 unroll=unroll)

    np.asarray(loop(args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter_ns()
        np.asarray(loop(args))
        samples.append((time.perf_counter_ns() - t0) / 1e3 / iterations)
    us = min(samples)
    import jax as _j

    _record({"ts": time.time(), "kind": "unroll", "name": name,
             "label": label, "avg_us": us, "unroll": unroll,
             "gnnz_s": nnz / us / 1e3, "iterations": iterations,
             "device": _j.devices()[0].device_kind})
    print(f"{name} {label:22s}: {us:9.2f} us/iter  "
          f"{nnz / us / 1e3:7.2f} Gnnz/s", flush=True)
    return us


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from smvp_toolkit_tpu.ops import spmv_pallas as sp
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    it = 3 if QUICK else 200
    it_big = 3 if QUICK else 50

    xsmall = jnp.ones((8, 128), jnp.float32)
    for u in (1, 4, 16, 64):
        try:
            timed_loop(lambda xx: xx * 2.0, (xsmall,), it, 0, "floor",
                       f"floor-u{u}", 1, unroll=u)
        except Exception as e:  # noqa: BLE001
            print(f"floor-u{u} FAILED: {str(e)[:200]}", flush=True)

    def prod_op(name, chunk):
        coo = s3._coo(name)
        r, c, v = coo.to_numpy()
        plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
        op = sp.SellSpMV(plan, interpret=None if QUICK else False,
                         value_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal(coo.shape[1]).astype(np.float32)
        )
        return op, x, int(coo.nnz)

    op, x, nnz = prod_op("memplus", 1024)
    for u in (1, 16, 64):
        try:
            timed_loop(lambda xx: op(xx), (x,), it, 0, "memplus",
                       f"spmv-u{u}", nnz, unroll=u)
        except Exception as e:  # noqa: BLE001
            print(f"memplus u{u} FAILED: {str(e)[:200]}", flush=True)

    op2, x2, nnz2 = prod_op("synth-10M", 2048)
    for u in (1, 4, 16):
        try:
            timed_loop(lambda xx: op2(xx), (x2,), it_big, 0, "synth-10M",
                       f"spmv-u{u}", nnz2, unroll=u)
        except Exception as e:  # noqa: BLE001
            print(f"synth-10M u{u} FAILED: {str(e)[:200]}", flush=True)

    # packed+split2 at unroll (the current best flagship config)
    os.environ["SMVP_SELL_PACK"] = "1"
    os.environ["SMVP_SELL_SPLIT"] = "2"
    try:
        op3, x3, nnz3 = prod_op("synth-10M", 2048)
        for u in (1, 4):
            timed_loop(lambda xx: op3(xx), (x3,), it_big, 0, "synth-10M",
                       f"ps2-u{u}", nnz3, unroll=u)
    except Exception as e:  # noqa: BLE001
        print(f"ps2 FAILED: {str(e)[:200]}", flush=True)
    finally:
        os.environ.pop("SMVP_SELL_PACK", None)
        os.environ.pop("SMVP_SELL_SPLIT", None)

    print(f"session10 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
