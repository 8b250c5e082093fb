"""Fused conjugate-gradient: the ENTIRE fixed-iteration CG solve in one
Pallas launch.

A CG iteration is one SpMV plus five vector ops with two scalar
reductions — launched conventionally, every iteration pays the kernel
launch + XLA glue around it, and on this project's tunneled dev stack
an XLA loop iteration costs ~140 µs regardless of body (PERFORMANCE.md
round-4 sessions 9-10), two orders above the memplus SpMV itself. This
kernel runs the whole solve inside one Mosaic grid:

    grid = (num_iters, n_chunks)

The solver state — r, p, q as (NS, 128) f32 VMEM scratch (scratch
persists across grid steps), x as the revisited output block — never
leaves VMEM; the packed matrix planes re-stream from HBM once per
iteration (their block index changes every step), which is exactly the
memory behaviour of any CG implementation. Per chunk the kernel
accumulates q += A_chunk·p with the standard SELL pipeline (one-hot
table select → lane-shuffle gather → windowed one-hot reduce,
ops/spmv_pallas.py); at each iteration's last chunk it performs the
CG scalar updates in-kernel:

    alpha = (r·r) / max(p·q, 1e-30)       # same guard as
    x += alpha p;  r -= alpha q           # models.solvers.
    beta = (r·r)' / max(r·r, 1e-30)       # conjugate_gradient
    p = r + beta p

Numerically this matches :func:`models.solvers.conjugate_gradient`
(f32 state, same update order and breakdown guards) up to f32
re-association of the reductions.

Replaces the reference's host-loop solver pattern the TPU way: no
per-iteration launch, no host round trips, data resident where it is
used. Requires a square matrix on a resident-y (non-streamed) SELL
plan whose x tiles fit the slice space (always true for square
matrices: CT <= NS).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smvp_toolkit_tpu.ops.mosaic_check import check_pallas_args
from smvp_toolkit_tpu.ops.sell_plan import LANES
from smvp_toolkit_tpu.ops.spmv_pallas import (
    _chain_setting,
    _PACK_REL_DEAD,
    _relsl_chain_store,
    _RELSL_SL_SHIFT,
    _mosaic_kwargs,
    _reduce_store,
    _table_select,
    SellSpMV,
)

__all__ = ["fused_cg"]


def _make_cg_kernel(precision, t_tiles, nsw, wt, bf16_values, reduce2,
                    n_chunks, relsl, split=1):
    def _chunk_spmv(bases_ref, p_ref, val_ref, lidx_ref, rel_or_rs_ref,
                    sl_ref, q_ref, ch):
        xb = pl.multiple_of(bases_ref[0, ch], 16)
        x_win = p_ref[pl.ds(xb, wt), :]
        if bf16_values:
            x_win = x_win.astype(jnp.bfloat16)
        if relsl:
            # Shared chain (production split-chain applies here too).
            _relsl_chain_store(
                q_ref, rel_or_rs_ref[0], x_win, val_ref[:],
                lidx_ref[:].astype(jnp.int32), wt, 1,
                bases_ref[1, ch], t_tiles, min(nsw, t_tiles),
                precision, bf16_values, reduce2, split=split,
            )
            return
        sl_row = sl_ref[0]
        table = _table_select(
            rel_or_rs_ref[:], x_win, wt, precision, bf16_values,
            reduce2,
        )
        g = jnp.take_along_axis(
            table, lidx_ref[:].astype(jnp.int32), axis=1
        )
        prod = val_ref[:].astype(jnp.float32) * g
        _reduce_store(q_ref, prod, sl_row, bases_ref[1, ch], t_tiles,
                      min(nsw, t_tiles), precision, reduce2)

    def _kernel(bases_ref, b_ref, val_ref, lidx_ref, rel_or_rs_ref,
                *rest):
        # relsl mode carries its slice ids inside the rel‖slice plane,
        # so the separate sl operand (and its per-step DMA) is dropped.
        if relsl:
            x_ref, r_ref, p_ref, q_ref = rest
            sl_ref = None
        else:
            sl_ref, x_ref, r_ref, p_ref, q_ref = rest
        it = pl.program_id(0)
        ch = pl.program_id(1)

        @pl.when(jnp.logical_and(it == 0, ch == 0))
        def _init():
            x_ref[:] = jnp.zeros_like(x_ref)
            r_ref[:] = b_ref[:]
            p_ref[:] = b_ref[:]

        @pl.when(ch == 0)
        def _zero_q():
            q_ref[:] = jnp.zeros_like(q_ref)

        _chunk_spmv(bases_ref, p_ref, val_ref, lidx_ref, rel_or_rs_ref,
                    sl_ref, q_ref, ch)

        @pl.when(ch == n_chunks - 1)
        def _cg_update():
            rs = jnp.sum(r_ref[:] * r_ref[:])
            pq = jnp.sum(p_ref[:] * q_ref[:])
            alpha = rs / jnp.maximum(pq, 1e-30)
            x_ref[:] = x_ref[:] + alpha * p_ref[:]
            r_ref[:] = r_ref[:] - alpha * q_ref[:]
            rs2 = jnp.sum(r_ref[:] * r_ref[:])
            beta = rs2 / jnp.maximum(rs, 1e-30)
            p_ref[:] = r_ref[:] + beta * p_ref[:]

    return _kernel


def fused_cg(op: SellSpMV, b: jax.Array, num_iters: int) -> jax.Array:
    """Solve A x = b (A symmetric positive-definite, encoded by ``op``)
    with ``num_iters`` CG steps in ONE Pallas launch. Returns x.

    Fixed iteration count (the grid is static); read convergence off a
    final host-side residual. For tolerance-driven serving loops,
    compose launches of modest ``num_iters`` and test in between.
    """
    plan = op.plan
    n, m = op.shape
    if n != m:
        raise ValueError("fused_cg needs a square (SPD) system")
    if plan.y_block_slices:
        raise ValueError("fused_cg requires a resident-y plan")
    ns, chunk, nch = plan.n_slices, plan.chunk, plan.n_chunks
    ct, wt = plan.n_coltiles, plan.window_tiles
    # The state vectors live in ONE (T, 128) tile space serving both
    # roles: rows [0, NS) are the row/slice space (q, r, x) and rows
    # [0, CT) are the column-tile space the table select windows read
    # (p). Square systems flatten both identically; T covers whichever
    # is more padded. Padding rows stay exactly 0 (b is zero-padded, A
    # has no nnz there), so the dot products are unaffected.
    t_tiles = max(ns, ct)
    # VMEM gate: b + x + r + p + q are five (T, 128) f32 residents next
    # to the double-buffered plane blocks — past ~460k rows they exceed
    # Mosaic's DEFAULT VMEM budget and the compile crashes. Raising the
    # budget un-gates larger systems: SMVP_SELL_VMEM_MB=100 runs the
    # 1M-row solve (20 MB state) at 2.9x the scan-loop CG on v5e
    # (measured, session 22 — the chip's physical VMEM exceeds the
    # default budget). Past that, the scan-loop CG (state in HBM) is
    # the fallback.
    state_bytes = 5 * t_tiles * LANES * 4
    budget = int(os.environ.get("SMVP_SELL_VMEM_MB", "0")) * 2**20
    if state_bytes > max(9 * 2**20, budget - 4 * 2**20):
        raise ValueError(
            f"fused_cg state ({state_bytes/2**20:.0f} MB for "
            f"{n} rows) exceeds the VMEM budget — raise "
            "SMVP_SELL_VMEM_MB (100 runs 1M rows on v5e) or use "
            "models.conjugate_gradient"
        )
    reduce2 = os.environ.get(
        "SMVP_SELL_REDUCE2", "1" if op._bf16 else "0"
    ) == "1"
    if os.environ.get("SMVP_SELL_REDUCE1") == "1":
        reduce2 = "1pass"
    nsw = (
        plan.n_slices
        if os.environ.get("SMVP_SELL_NOWINDOW") == "1"
        else op.nsw
    )
    relsl = (
        os.environ.get("SMVP_SELL_RELSL", "1") == "1"
        and wt <= _PACK_REL_DEAD
    )
    rows_pad = t_tiles * LANES
    b = b.astype(jnp.float32)
    if b.shape[0] < rows_pad:
        b = jnp.pad(b, (0, rows_pad - b.shape[0]))
    b2 = b.reshape(t_tiles, LANES)
    kern = _make_cg_kernel(
        op.precision, t_tiles, nsw, wt, op._bf16, reduce2, nch, relsl,
        split=_chain_setting(chunk, 1)[0],
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
        pl.BlockSpec((t_tiles, LANES), lambda it, ch: (0, 0)),  # b res.
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        (
            pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0))
            if relsl
            else pl.BlockSpec((chunk, 1), lambda it, ch: (ch, 0))
        ),
    ]
    if relsl:
        opnds = (op.bases, b2, op.vals, op.lidx,
                 op._relsl().reshape(nch, 1, chunk))
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0))
        )
        opnds = (op.bases, b2, op.vals, op.lidx, op.rel_tile,
                 op.slice_of.reshape(nch, 1, chunk))
    check_pallas_args(in_specs[1:], opnds[1:], label="cg-fused")
    x = pl.pallas_call(
        kern,
        grid=(num_iters, nch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_tiles, LANES), lambda it, ch: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_tiles, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # r
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # p
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # q
        ],
        interpret=op.interpret,
        **_mosaic_kwargs(),
    )(*opnds)
    return x.reshape(-1)[:n]
