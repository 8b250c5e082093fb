"""Separate dispatch overhead from device time: chain K ops inside one jit."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 17758
NNZ = 126_208
K = 50  # chained iterations inside one jit


def timeit(label, fn, per_call=K, iters=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters / per_call
    print(
        f"{label:42s} {dt*1e6:9.1f} us/op  {NNZ/dt/1e9:8.2f} Gnnz/s",
        flush=True,
    )
    return dt


def main():
    rng = np.random.RandomState(0)
    print("device:", jax.devices()[0].device_kind, flush=True)
    cols = jnp.asarray(rng.randint(0, N, NNZ), dtype=jnp.int32)
    rows = jnp.sort(jnp.asarray(rng.randint(0, N, NNZ), dtype=jnp.int32))
    vals = jnp.asarray(rng.randn(NNZ), dtype=jnp.float32)
    x0 = jnp.asarray(rng.randn(N), dtype=jnp.float32)

    # Chained gather: each iteration's x depends on previous result.
    @jax.jit
    def chain_gather(x):
        def body(i, x):
            g = x[cols]  # gather nnz
            # fold back to length N cheaply (slice) to keep shapes
            return x + g[:N] * 1e-9

        return jax.lax.fori_loop(0, K, body, x)

    timeit("gather x[cols] (chained)", lambda: chain_gather(x0))

    @jax.jit
    def chain_segsum(x):
        def body(i, x):
            y = jax.ops.segment_sum(
                vals * x[0], rows, num_segments=N, indices_are_sorted=True
            )
            return x + y * 1e-9

        return jax.lax.fori_loop(0, K, body, x)

    timeit("segment_sum sorted (chained)", lambda: chain_segsum(x0))

    @jax.jit
    def chain_spmv(x):
        def body(i, x):
            y = jax.ops.segment_sum(
                vals * x[cols], rows, num_segments=N, indices_are_sorted=True
            )
            return y * 1e-9 + x

        return jax.lax.fori_loop(0, K, body, x)

    timeit("full CSR spmv (chained)", lambda: chain_spmv(x0))

    @jax.jit
    def chain_cumsum(x):
        def body(i, x):
            p = jnp.cumsum(vals * x[0])
            return x + p[:N] * 1e-9

        return jax.lax.fori_loop(0, K, body, x)

    timeit("cumsum nnz (chained)", lambda: chain_cumsum(x0))

    A = jnp.asarray(rng.randn(4096, 4096), dtype=jnp.float32)
    v0 = jnp.asarray(rng.randn(4096), dtype=jnp.float32)

    @jax.jit
    def chain_mv(v):
        def body(i, v):
            return A @ v * 1e-4

        return jax.lax.fori_loop(0, K, body, v)

    t = timeit("dense 4096x4096 matvec (chained)", lambda: chain_mv(v0))
    print(f"  -> matvec BW: {4096*4096*4/t/1e9:.0f} GB/s", flush=True)

    # Dispatch overhead: trivial op
    @jax.jit
    def nop(x):
        return x + 1.0

    timeit("trivial op (dispatch floor)", lambda: nop(v0), per_call=1, iters=30)


if __name__ == "__main__":
    main()
