"""Microbenchmarks of SpMV building blocks on the attached TPU.

Measures each candidate primitive for the CSR/TJDS hot loop so kernel
design follows chip data, not guesses. Run under the default (axon) env.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 17758
NNZ = 126_208  # memplus padded


def timeit(label, fn, iters=50):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:45s} {dt*1e6:10.1f} us   {NNZ/dt/1e9:8.2f} Gnnz/s")
    return dt


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    cols_rand = jnp.asarray(rng.randint(0, N_ROWS, NNZ), dtype=jnp.int32)
    cols_sorted = jnp.sort(cols_rand)
    rows_sorted = jnp.sort(jnp.asarray(rng.randint(0, N_ROWS, NNZ), dtype=jnp.int32))
    vals = jnp.asarray(rng.randn(NNZ), dtype=jnp.float32)
    x = jnp.asarray(rng.randn(N_ROWS), dtype=jnp.float32)
    prods = vals * 1.5
    row_ptr = jnp.asarray(
        np.searchsorted(np.asarray(rows_sorted), np.arange(N_ROWS + 1)),
        dtype=jnp.int32,
    )

    gather_r = jax.jit(lambda x, c: x[c])
    timeit("gather x[cols] random", lambda: gather_r(x, cols_rand))
    timeit("gather x[cols] sorted", lambda: gather_r(x, cols_sorted))

    take = jax.jit(lambda x, c: jnp.take(x, c, mode="clip"))
    timeit("jnp.take clip sorted", lambda: take(x, cols_sorted))

    seg_sorted = jax.jit(
        lambda p, r: jax.ops.segment_sum(
            p, r, num_segments=N_ROWS, indices_are_sorted=True
        )
    )
    timeit("segment_sum sorted", lambda: seg_sorted(prods, rows_sorted))

    seg_unsorted = jax.jit(
        lambda p, r: jax.ops.segment_sum(p, r, num_segments=N_ROWS)
    )
    timeit("segment_sum unsorted", lambda: seg_unsorted(prods, rows_sorted))

    cs = jax.jit(lambda p: jnp.cumsum(p))
    timeit("cumsum(nnz)", lambda: cs(prods))

    def csr_prefix(p, rp):
        pref = jnp.concatenate([jnp.zeros((1,), p.dtype), jnp.cumsum(p)])
        return pref[rp[1:]] - pref[rp[:-1]]

    cp = jax.jit(csr_prefix)
    timeit("cumsum + row_ptr diff", lambda: cp(prods, row_ptr))

    rep = jax.jit(
        lambda x, rp: jnp.repeat(
            x, jnp.diff(rp), total_repeat_length=NNZ
        )
    )
    timeit("jnp.repeat segment-broadcast", lambda: rep(x, row_ptr))

    # 2D-laid-out gather: does a (E/128, 128)-shaped gather vectorize better?
    cols2d = cols_sorted.reshape(-1, 128)
    g2 = jax.jit(lambda x, c: x[c])
    timeit("gather x[cols] 2D layout", lambda: g2(x, cols2d))

    # one-hot chunked matmul gather (MXU brute force), chunk=2048
    CH = 2048

    def onehot_gather(x, cols):
        def body(i, acc):
            idx = jax.lax.dynamic_slice(cols, (i * CH,), (CH,))
            oh = jax.nn.one_hot(idx, N_ROWS, dtype=jnp.bfloat16)
            g = oh @ x.astype(jnp.bfloat16)
            return jax.lax.dynamic_update_slice(acc, g.astype(jnp.float32), (i * CH,))

        return jax.lax.fori_loop(0, NNZ // CH, body, jnp.zeros((NNZ,), jnp.float32))

    og = jax.jit(onehot_gather)
    timeit("one-hot bf16 matmul gather", lambda: og(x, cols_sorted), iters=5)

    # dense matvec for scale reference
    A = jnp.asarray(rng.randn(4096, 4096), dtype=jnp.float32)
    xv = jnp.asarray(rng.randn(4096), dtype=jnp.float32)
    mv = jax.jit(lambda A, v: A @ v)
    t = timeit("dense 4096x4096 matvec (ref)", lambda: mv(A, xv))
    print(f"  -> dense matvec BW: {4096*4096*4/t/1e9:.0f} GB/s")

    # BCOO
    try:
        from jax.experimental import sparse as jsparse

        mat = jsparse.BCOO(
            (vals, jnp.stack([rows_sorted, cols_rand], axis=1)),
            shape=(N_ROWS, N_ROWS),
        )
        bc = jax.jit(lambda m, x: m @ x)
        timeit("BCOO @ x", lambda: bc(mat, x), iters=10)
    except Exception as e:
        print("BCOO failed:", e)


if __name__ == "__main__":
    main()
