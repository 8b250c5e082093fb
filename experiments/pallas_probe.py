"""Probe which Pallas/Mosaic primitives compile + their speed on this TPU.

Each candidate primitive for the SpMV kernel is compiled and timed in
isolation (chained inside the kernel to amortize dispatch).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 200  # in-kernel repeat to amortize dispatch (~1.1 ms on this link)


def bench(label, build):
    try:
        fn, args = build()
        r = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 3 / K
        print(f"{label:50s} OK  {dt*1e6:9.2f} us/iter", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{label:50s} FAIL {msg}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.RandomState(0)

    # --- 1. take_along_axis lane gather (8,128) --------------------------
    def build_taa():
        table = jnp.asarray(rng.randn(8, 128), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 128, (8, 128)), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            def body(k, acc):
                g = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((8, 128), jnp.float32))

        fn = jax.jit(
            lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)
        )
        return fn, (table, idx)

    bench("take_along_axis (8,128) lane gather", build_taa)

    # --- 1b. bigger take_along_axis (64,128) -----------------------------
    def build_taa_big():
        table = jnp.asarray(rng.randn(64, 128), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 128, (64, 128)), jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            def body(k, acc):
                return acc + jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda t, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            )(t, i)
        )
        return fn, (table, idx)

    bench("take_along_axis (64,128) lane gather", build_taa_big)

    # --- 2. in-kernel cumsum over lanes ----------------------------------
    def build_cumsum():
        xx = jnp.asarray(rng.randn(64, 128), jnp.float32)

        def kernel(x_ref, o_ref):
            def body(k, acc):
                return acc + jnp.cumsum(x_ref[:], axis=1)

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32)
            )(x)
        )
        return fn, (xx,)

    bench("jnp.cumsum axis=1 (64,128)", build_cumsum)

    # --- 2b. cumsum along sublanes ---------------------------------------
    def build_cumsum0():
        xx = jnp.asarray(rng.randn(64, 128), jnp.float32)

        def kernel(x_ref, o_ref):
            def body(k, acc):
                return acc + jnp.cumsum(x_ref[:], axis=0)

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32)
            )(x)
        )
        return fn, (xx,)

    bench("jnp.cumsum axis=0 (64,128)", build_cumsum0)

    # --- 3. one-hot + MXU matmul gather ----------------------------------
    def build_onehot():
        window = jnp.asarray(rng.randn(128, 128), jnp.float32)  # (8 tiles,128)
        idx = jnp.asarray(rng.randint(0, 128, (256, 128)), jnp.int32)

        def kernel(w_ref, i_ref, o_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

            def body(k, acc):
                oh = (i_ref[:, :1] == lanes[:1, :]).astype(jnp.float32)
                # (256,1)==(1,128) -> (256,128) one-hot of first col idx
                g = jnp.dot(oh, w_ref[:], preferred_element_type=jnp.float32)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((256, 128), jnp.float32))

        fn = jax.jit(
            lambda w, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            )(w, i)
        )
        return fn, (window, idx)

    bench("one-hot build + MXU (256x128)@(128,128)", build_onehot)

    # --- 4. dynamic slice with traced start (pl.ds) ----------------------
    def build_dynslice():
        xx = jnp.asarray(rng.randn(4096, 128), jnp.float32)
        ss = jnp.asarray([[8]], jnp.int32)

        def kernel(s_ref, x_ref, o_ref):
            def body(k, acc):
                s = s_ref[0, 0] + k % 7
                blk = x_ref[pl.ds(s * 8, 64), :]
                return acc + blk

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda s, x: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(s, x)
        )
        return fn, (ss, xx)

    bench("dynamic-start slice from VMEM", build_dynslice)

    # --- 5. cross-sublane roll (pltpu.roll) ------------------------------
    def build_roll():
        xx = jnp.asarray(rng.randn(64, 128), jnp.float32)

        def kernel(x_ref, o_ref):
            def body(k, acc):
                return acc + pltpu.roll(x_ref[:], shift=1, axis=1)

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32)
            )(x)
        )
        return fn, (xx,)

    bench("pltpu.roll lanes", build_roll)

    # --- 6. full-width gather idx in [0,1024) via 8x select --------------
    def build_gather1024():
        window = jnp.asarray(rng.randn(8, 128), jnp.float32)  # 1024 values
        idx = jnp.asarray(rng.randint(0, 1024, (32, 128)), jnp.int32)

        def kernel(w_ref, i_ref, o_ref):
            def body(k, acc):
                iv = i_ref[:]
                sub = iv >> 7
                lane = iv & 127
                g = jnp.zeros_like(acc)
                for s in range(8):
                    row = w_ref[s, :]  # (128,)
                    tbl = jnp.broadcast_to(row, (32, 128))
                    gs = jnp.take_along_axis(tbl, lane, axis=1)
                    g = jnp.where(sub == s, gs, g)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((32, 128), jnp.float32))

        fn = jax.jit(
            lambda w, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            )(w, i)
        )
        return fn, (window, idx)

    bench("1024-window gather (8x taa+select)", build_gather1024)

    # --- 7. MXU cumsum via lower-triangular matmul -----------------------
    def build_mxu_cumsum():
        xx = jnp.asarray(rng.randn(64, 128), jnp.float32)

        def kernel(x_ref, o_ref):
            r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            lt = (r <= c).astype(jnp.float32)

            def body(k, acc):
                return acc + jnp.dot(x_ref[:], lt, preferred_element_type=jnp.float32)

            o_ref[:] = jax.lax.fori_loop(0, K, body, jnp.zeros((64, 128), jnp.float32))

        fn = jax.jit(
            lambda x: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32)
            )(x)
        )
        return fn, (xx,)

    bench("MXU cumsum (64,128)@LT(128,128)", build_mxu_cumsum)


if __name__ == "__main__":
    main()
