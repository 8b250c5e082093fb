"""Round-2 stage 1: validate Mosaic lowering of the SELL v3 kernel.

Smallest possible compiled-mode run (curtis54, chunk auto-shrunk) so a
compiler rejection/crash costs one compile, not a session. Prints the
device kind, then correctness vs a float64 host oracle.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.ops import spmv_pallas as sp


def main():
    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} platform={dev.platform} "
          f"({time.time()-t0:.0f}s)", flush=True)

    for name in ("curtis54", "memplus"):
        coo = read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)
        r, c, v = coo.to_numpy()
        plan = build_sell_plan(r, c, v, coo.shape)
        op = sp.SellSpMV(plan, interpret=False)
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(coo.shape[1]).astype(np.float32)
        x = jnp.asarray(xh)
        t1 = time.time()
        y = np.asarray(op(x)).astype(np.float64)
        y_ref = np.zeros(coo.shape[0])
        np.add.at(y_ref, r, v.astype(np.float64) * xh[c].astype(np.float64))
        err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
        print(f"{name}: S={plan.n_sublanes} chunk={plan.chunk} "
              f"WT={plan.window_tiles} NS={plan.n_slices} "
              f"compile+run {time.time()-t1:.0f}s  err={err:.2e}", flush=True)
    print(f"stage1 done {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
