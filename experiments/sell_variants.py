"""Isolate SELL kernel cost components on TPU: precision, output mode, glue."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import LANES, build_sell_plan

K = 200


def fused_time(fn, *args):
    """Time K chained applications inside one jit."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            xt = a[0].at[0, 0].add(jnp.where(i < 0, acc[0, 0], 0.0))
            y = fn(xt, *a[1:])
            return acc + y

        return jax.lax.fori_loop(
            0, K, body, jnp.zeros(fn(a[0], *a[1:]).shape, jnp.float32)
        )

    run(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        r = run(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 3 / K


def make_kernel(precision, accumulate):
    def kernel(x_ref, val_ref, lidx_ref, oht_ref, seg_ref, y_ref):
        step = pl.program_id(0)
        if accumulate:

            @pl.when(step == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)

        table = jnp.dot(oht_ref[:], x_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
        g = jnp.take_along_axis(table, lidx_ref[:], axis=1)
        prod = val_ref[:] * g
        red = jnp.dot(seg_ref[:], prod,
                      preferred_element_type=jnp.float32,
                      precision=precision)
        if accumulate:
            y_ref[:] += red
        else:
            y_ref[:] = red

    return kernel


def build_call(plan, precision, accumulate):
    chunk, ns, ct = plan.chunk, plan.n_slices, plan.n_coltiles
    n_chunks = plan.n_chunks
    kernel = make_kernel(precision, accumulate)
    if accumulate:
        out_shape = jax.ShapeDtypeStruct((ns, LANES), jnp.float32)
        out_specs = pl.BlockSpec((ns, LANES), lambda i: (0, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((n_chunks, ns, LANES), jnp.float32)
        out_specs = pl.BlockSpec((1, ns, LANES), lambda i: (i, 0, 0))
        kernel0 = kernel

        def kernel(x_ref, val_ref, lidx_ref, oht_ref, seg_ref, y_ref):  # noqa
            kernel0(x_ref, val_ref, lidx_ref, oht_ref, seg_ref, y_ref.at[0])

    def call(x_tiles, vals, lidx, oht, seg):
        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((ct, LANES), lambda i: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, LANES), lambda i: (i, 0)),
                pl.BlockSpec((chunk, ct), lambda i: (i, 0)),
                pl.BlockSpec((ns, chunk), lambda i: (0, i)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
        )(x_tiles, vals, lidx, oht, seg)
        if not accumulate:
            out = out.sum(axis=0)
        return out

    return call


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    coo = read_mtx("/root/reference/sample-data/memplus.mtx").pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    print(f"S={plan.n_sublanes} chunks={plan.n_chunks} CT={plan.n_coltiles} "
          f"NS={plan.n_slices}", flush=True)

    vals = jnp.asarray(plan.vals)
    lidx = jnp.asarray(plan.lane_idx)
    oht = jnp.asarray(plan.oht)
    seg = jnp.asarray(plan.seg)
    x_tiles = jnp.ones((plan.n_coltiles, LANES), jnp.float32)

    # Oracle
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, v.astype(np.float64))

    P = jax.lax.Precision
    for label, prec, acc in [
        ("DEFAULT  revisit", P.DEFAULT, True),
        ("HIGH     revisit", P.HIGH, True),
        ("HIGHEST  revisit", P.HIGHEST, True),
        ("HIGH     partial", P.HIGH, False),
        ("HIGHEST  partial", P.HIGHEST, False),
    ]:
        call = build_call(plan, prec, acc)
        y = np.asarray(jax.jit(call)(x_tiles, vals, lidx, oht, seg))
        y_flat = y.reshape(-1)[: coo.shape[0]]
        err = np.abs(y_flat - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
        dt = fused_time(call, x_tiles, vals, lidx, oht, seg)
        print(f"{label}: {dt*1e6:8.1f} us  err={err:.2e}  "
              f"{coo.nnz/dt/1e9:.2f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
