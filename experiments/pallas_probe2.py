"""Second probe round: the specific ops the SELL SpMV kernel needs."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 100


def bench(label, build, per=None):
    try:
        fn, args = build()
        r = jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 3 / K
        extra = f"  ({dt*1e9/per:.3f} ns/el)" if per else ""
        print(f"{label:52s} OK  {dt*1e6:9.2f} us{extra}", flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{label:52s} FAIL {msg}", flush=True)
        return None


def loop_kernel(body_fn, out_shape):
    def kernel(*refs):
        o_ref = refs[-1]

        def body(k, acc):
            return acc + body_fn(refs[:-1], k)

        o_ref[:] = jax.lax.fori_loop(
            0, K, body, jnp.zeros(o_ref.shape, o_ref.dtype)
        )

    return kernel


def run(label, arrays, body_fn, out_shape, per=None):
    def build():
        kernel = loop_kernel(body_fn, out_shape)
        fn = jax.jit(
            lambda *a: pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
            )(*a)
        )
        return fn, arrays

    return bench(label, build, per=per)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.RandomState(0)

    # P1: taa with wider table than idx (multi-tile lanes)
    t256 = jnp.asarray(rng.randn(8, 256), jnp.float32)
    i128 = jnp.asarray(rng.randint(0, 256, (8, 128)), jnp.int32)
    run("P1a taa table(8,256) idx(8,128)", (t256, i128),
        lambda refs, k: jnp.take_along_axis(refs[0][:], refs[1][:], axis=1),
        (8, 128))

    t512 = jnp.asarray(rng.randn(128, 512), jnp.float32)
    i1k = jnp.asarray(rng.randint(0, 512, (128, 1024)), jnp.int32)
    run("P1b taa table(128,512) idx(128,1024)", (t512, i1k),
        lambda refs, k: jnp.take_along_axis(refs[0][:], refs[1][:], axis=1),
        (128, 1024), per=131072)

    # P2: transposes
    a = jnp.asarray(rng.randn(144, 128), jnp.float32)
    run("P2a transpose (144,128)->(128,144)", (a,),
        lambda refs, k: refs[0][:].T, (128, 144))

    big = jnp.asarray(rng.randn(3104, 128), jnp.float32)
    run("P2b transpose (3104,128)->(128,3104)", (big,),
        lambda refs, k: refs[0][:].T, (128, 3104), per=397312)

    # P3: taa axis=0
    tb = jnp.asarray(rng.randn(128, 128), jnp.float32)
    i0 = jnp.asarray(rng.randint(0, 128, (128, 128)), jnp.int32)
    run("P3 taa axis=0 (128,128)", (tb, i0),
        lambda refs, k: jnp.take_along_axis(refs[0][:], refs[1][:], axis=0),
        (128, 128))

    # P4: one-hot table-build matmul
    oh = jnp.asarray((rng.rand(1600, 144) < 0.01).astype(np.float32))
    xp = jnp.asarray(rng.randn(144, 128), jnp.float32)
    run("P4 MXU (1600,144)@(144,128) f32", (oh, xp),
        lambda refs, k: jnp.dot(refs[0][:], refs[1][:],
                                preferred_element_type=jnp.float32),
        (1600, 128), per=29491200)

    ohb = oh.astype(jnp.bfloat16)
    xpb = xp.astype(jnp.bfloat16)
    run("P4b MXU (1600,144)@(144,128) bf16", (ohb, xpb),
        lambda refs, k: jnp.dot(refs[0][:], refs[1][:],
                                preferred_element_type=jnp.float32),
        (1600, 128), per=29491200)

    # P5: big taa
    tbl = jnp.asarray(rng.randn(1600, 128), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 128, (1600, 128)), jnp.int32)
    run("P5 taa (1600,128)", (tbl, idx),
        lambda refs, k: jnp.take_along_axis(refs[0][:], refs[1][:], axis=1),
        (1600, 128), per=204800)

    # P6: compare+select pass (1600,128)
    wsel = jnp.asarray(rng.randint(0, 8, (1600, 128)), jnp.int32)
    g1 = jnp.asarray(rng.randn(1600, 128), jnp.float32)
    run("P6 cmp+select (1600,128)", (wsel, g1),
        lambda refs, k: jnp.where(refs[0][:] == (k % 8), refs[1][:], 0.0),
        (1600, 128), per=204800)

    # P7: LT scan matmul
    run("P7 MXU (1600,128)@(128,128) f32", (tbl, jnp.asarray(
        rng.randn(128, 128), jnp.float32)),
        lambda refs, k: jnp.dot(refs[0][:], refs[1][:],
                                preferred_element_type=jnp.float32),
        (1600, 128), per=26214400)

    # P8: SEG reduce matmul
    seg = jnp.asarray((rng.rand(144, 3104) < 0.02).astype(np.float32))
    prod = jnp.asarray(rng.randn(3104, 128), jnp.float32)
    run("P8 SEG (144,3104)@(3104,128) f32", (seg, prod),
        lambda refs, k: jnp.dot(refs[0][:], refs[1][:],
                                preferred_element_type=jnp.float32),
        (144, 128), per=57212928)

    segb = seg.astype(jnp.bfloat16)
    prodb = prod.astype(jnp.bfloat16)
    run("P8b SEG bf16", (segb, prodb),
        lambda refs, k: jnp.dot(refs[0][:], refs[1][:],
                                preferred_element_type=jnp.float32),
        (144, 128), per=57212928)

    # P10: dynamic-slice in tight loop (redux, with multiple_of hint)
    xbig = jnp.asarray(rng.randn(1024, 128), jnp.float32)

    def dyn_body(refs, k):
        s = pl.multiple_of(k % 64, 8)
        return refs[0][pl.ds(s * 8, 8), :]

    run("P10 dyn-slice (8,128) from (1024,128)", (xbig,), dyn_body, (8, 128))


if __name__ == "__main__":
    main()
