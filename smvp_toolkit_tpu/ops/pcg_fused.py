"""Fused Chebyshev and IC(0)-preconditioned CG: whole solves in ONE
Pallas launch.

Extends the fused-CG idea (ops/cg_fused.py, measured 7.2x the scan-loop
CG on v5e) to the two remaining iteration shapes:

* :func:`fused_chebyshev` — the inner-product-free Krylov method. All
  scalars depend only on the spectrum bounds, so they precompute
  host-side into an SMEM table; each grid iteration is one SpMV plus
  AXPYs on VMEM-resident state.
* :func:`fused_pcg_ic0` — CG preconditioned by IC(0) with fixed-sweep
  truncated-Neumann triangular solves (the TPU-idiomatic substitution
  for sequential back-substitution — models.solvers.ic0_preconditioner).
  One grid iteration streams THREE operators back to back — A, then
  (sweeps-1) passes of strict(L), then (sweeps-1) passes of strict(L)ᵀ
  — from one concatenated plane array; a scalar-prefetched schedule
  table drives the per-chunk plane block, x/slice window bases, and
  phase-boundary actions, and the CG/Neumann scalar updates run
  in-kernel on VMEM-resident state.

Numerics match models.solvers.pcg_precond(ic0_preconditioner(...)) /
models.solvers.chebyshev up to f32 re-association of the reductions.

Replaces the reference's host-loop solver pattern (the capability
class of main-cli.c's timed loops) the TPU way: no per-iteration
launches, no host round trips.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smvp_toolkit_tpu.ops.mosaic_check import check_pallas_args
from smvp_toolkit_tpu.ops.sell_plan import (
    LANES,
    SellPlan,
    build_sell_plan,
    common_window,
)
from smvp_toolkit_tpu.ops.spmv_pallas import (
    _chain_setting,
    _PACK_REL_DEAD,
    _relsl_chain_store,
    _RELSL_SL_SHIFT,
    _mosaic_kwargs,
    SellSpMV,
)

__all__ = ["fused_chebyshev", "fused_pcg_ic0"]


def _relsl_plane(plan: SellPlan) -> np.ndarray:
    """Host-side rel‖slice plane (the shared packing rule)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import relsl_plane_host

    return relsl_plane_host(plan)


def _chunk_spmv_sched(sched_ref, act_ref, val_ref, lidx_ref, rs_ref,
                      q_ref, ch, *, t_tiles, nsw, wt, bf16_values,
                      reduce2, precision, split=1):
    """One schedule-driven SpMV chunk: q += Op_chunk · act.

    ``sched_ref`` rows: 1 = per-chunk x-window base, 2 = per-chunk
    slice-window base (row 0 — the plane block — is consumed by the
    BlockSpec index maps, not here). The chain runs through the shared
    ``_relsl_chain_store`` so the production split-chain (four
    independent sub-chains, +13-27% measured) applies to the fused
    solvers too.
    """
    xb = pl.multiple_of(sched_ref[1, ch], 16)
    x_win = act_ref[pl.ds(xb, wt), :]
    if bf16_values:
        x_win = x_win.astype(jnp.bfloat16)
    _relsl_chain_store(
        q_ref, rs_ref[0], x_win, val_ref[:],
        lidx_ref[:].astype(jnp.int32), wt, 1, sched_ref[2, ch],
        t_tiles, min(nsw, t_tiles), precision, bf16_values, reduce2,
        split=split,
    )


def _mode_flags(op: SellSpMV) -> Tuple[object, object]:
    reduce2 = os.environ.get(
        "SMVP_SELL_REDUCE2", "1" if op._bf16 else "0"
    ) == "1"
    if os.environ.get("SMVP_SELL_REDUCE1") == "1":
        reduce2 = "1pass"
    return reduce2, op.precision


def _state_tiles(plan: SellPlan) -> int:
    return max(plan.n_slices, plan.n_coltiles)


def _vmem_gate(n_state: int, t_tiles: int, label: str,
               vmem_mb: int | None = None):
    state_bytes = n_state * t_tiles * LANES * 4
    budget = max(
        int(os.environ.get("SMVP_SELL_VMEM_MB", "0")),
        int(vmem_mb or 0),
    ) * 2**20
    if state_bytes > max(9 * 2**20, budget - 4 * 2**20):
        raise ValueError(
            f"{label} state ({state_bytes/2**20:.0f} MB) exceeds the "
            "VMEM budget — raise SMVP_SELL_VMEM_MB or use the scan-loop "
            "solver"
        )


def _require_relsl(plan: SellPlan, label: str):
    if plan.y_block_slices:
        raise ValueError(f"{label} requires a resident-y plan")
    if not (os.environ.get("SMVP_SELL_RELSL", "1") == "1"
            and plan.window_tiles <= _PACK_REL_DEAD):
        raise ValueError(f"{label} runs the relsl layout only")


def _pad_vec(v: jax.Array, t_tiles: int) -> jax.Array:
    rows_pad = t_tiles * LANES
    v = v.astype(jnp.float32)
    if v.shape[0] < rows_pad:
        v = jnp.pad(v, (0, rows_pad - v.shape[0]))
    return v.reshape(t_tiles, LANES)


def fused_chebyshev(op: SellSpMV, b: jax.Array, lambda_min: float,
                    lambda_max: float, num_iters: int) -> jax.Array:
    """Chebyshev iteration for SPD A in ONE Pallas launch. Returns x.

    Scalars (the rho recurrence) precompute host-side into an SMEM
    table; per grid iteration: one SpMV (q = A·d), then x += d;
    r -= q; d = a_k d + c_k r. Matches models.solvers.chebyshev's
    recurrence exactly (same update order, f32 state).
    """
    plan = op.plan
    n, m = op.shape
    if n != m:
        raise ValueError("fused_chebyshev needs a square (SPD) system")
    if num_iters <= 0:
        # A zero-trip grid would return uninitialized VMEM; the scan
        # solver returns x0 (zeros) for the same arguments.
        return jnp.zeros((n,), jnp.float32)
    _require_relsl(plan, "fused_chebyshev")
    t_tiles = _state_tiles(plan)
    _vmem_gate(4, t_tiles, "fused_chebyshev", op.vmem_mb)
    reduce2, precision = _mode_flags(op)
    # NOWINDOW widens to the STATE buffer height (t_tiles >= n_slices
    # for square systems whose CT rounds past NS): widening only to
    # n_slices would keep the windowed store with nonzero bases and
    # overrun the (t_tiles, 128) scratch on late chunks.
    nsw = (t_tiles
           if os.environ.get("SMVP_SELL_NOWINDOW") == "1" else op.nsw)
    chunk, nch, wt = plan.chunk, plan.n_chunks, plan.window_tiles
    bf16_values = op._bf16
    split = _chain_setting(chunk, 1)[0]

    # Host-side scalar recurrence (models.solvers.chebyshev).
    theta = (lambda_max + lambda_min) / 2.0
    delta = (lambda_max - lambda_min) / 2.0
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    coeffs = np.empty((2, max(num_iters, 1)), dtype=np.float32)
    for k in range(num_iters):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        coeffs[0, k] = rho_new * rho           # a_k (d coefficient)
        coeffs[1, k] = 2.0 * rho_new / delta   # c_k (r coefficient)
        rho = rho_new
    inv_theta = np.float32(1.0 / theta)

    # Schedule rows: 0 unused (plane blocks are sequential here),
    # 1 = x base, 2 = slice base — the _chunk_spmv_sched layout.
    sb, _ = plan.reduce_window()
    sched = np.stack([
        np.arange(nch, dtype=np.int32),
        plan.tile_base.astype(np.int32),
        sb.astype(np.int32),
    ])
    b2 = _pad_vec(b, t_tiles)

    def _kernel(sched_ref, coef_ref, b_ref, val_ref, lidx_ref, rs_ref,
                x_ref, r_ref, d_ref, q_ref):
        it = pl.program_id(0)
        ch = pl.program_id(1)

        @pl.when(jnp.logical_and(it == 0, ch == 0))
        def _init():
            x_ref[:] = jnp.zeros_like(x_ref)
            r_ref[:] = b_ref[:]
            d_ref[:] = b_ref[:] * inv_theta

        @pl.when(ch == 0)
        def _zero_q():
            q_ref[:] = jnp.zeros_like(q_ref)

        _chunk_spmv_sched(
            sched_ref, d_ref, val_ref, lidx_ref, rs_ref, q_ref, ch,
            t_tiles=t_tiles, nsw=nsw, wt=wt, bf16_values=bf16_values,
            reduce2=reduce2, precision=precision, split=split,
        )

        @pl.when(ch == nch - 1)
        def _update():
            x_ref[:] = x_ref[:] + d_ref[:]
            r_ref[:] = r_ref[:] - q_ref[:]
            a_k = coef_ref[0, it]
            c_k = coef_ref[1, it]
            d_ref[:] = a_k * d_ref[:] + c_k * r_ref[:]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # sched
        pl.BlockSpec(memory_space=pltpu.SMEM),  # coeffs
        pl.BlockSpec((t_tiles, LANES), lambda it, ch: (0, 0)),  # b
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
        pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
    ]
    opnds = (jnp.asarray(sched), jnp.asarray(coeffs), b2, op.vals,
             op.lidx, op._relsl().reshape(nch, 1, chunk))
    check_pallas_args(in_specs[2:], opnds[2:], label="cheb-fused")
    x = pl.pallas_call(
        _kernel,
        grid=(num_iters, nch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_tiles, LANES), lambda it, ch: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_tiles, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # r
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # d
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # q
        ],
        interpret=op.interpret,
        **_mosaic_kwargs(op.vmem_mb),
    )(*opnds)
    return x.reshape(-1)[:n]


# Phase-boundary actions (schedule row 3).
_F_NONE = 0
_F_A_END = 1       # alpha update, start L solve
_F_L_SWEEP = 2     # L Neumann sweep boundary
_F_L_LAST = 3      # last L sweep -> start LT solve
_F_LT_SWEEP = 4    # LT sweep boundary
_F_LT_LAST = 5     # last LT sweep -> beta update, next iteration


def fused_pcg_ic0(op: SellSpMV, factors, b: jax.Array, num_iters: int,
                  sweeps: int = 4) -> jax.Array:
    """IC(0)-preconditioned CG in ONE Pallas launch. Returns x.

    ``factors`` is ops.ilu.ic0's result (strict lower CSR + diag).
    The grid runs ``num_iters + 1`` passes: pass 0 is the setup phase
    (z0 = M⁻¹b, p = z0 — its A chunks run against p = 0 and change
    nothing), each later pass is one full CG iteration. Numerics match
    models.solvers.pcg_precond with ic0_preconditioner(sweeps=...) up
    to f32 re-association of the reductions.
    """
    if sweeps < 2:
        raise ValueError(
            "fused_pcg_ic0 needs sweeps >= 2 (sweeps=1 is plain Jacobi "
            "scaling — use models.solvers.pcg)"
        )
    plan_a = op.plan
    n, m = op.shape
    if n != m:
        raise ValueError("fused_pcg_ic0 needs a square (SPD) system")
    _require_relsl(plan_a, "fused_pcg_ic0")
    reduce2, precision = _mode_flags(op)
    bf16_values = op._bf16
    chunk = plan_a.chunk

    # Factor plans share the A plan's chunk and a common window set.
    from smvp_toolkit_tpu.ops.spmv_pallas import _triplets_from_csr_host

    def _factor_plan(csr):
        r, c, v, _shape = _triplets_from_csr_host(csr)
        return build_sell_plan(
            np.asarray(r, np.int64), np.asarray(c, np.int64), v,
            (n, m), chunk=chunk, allow_small_chunk=False,
        )

    plan_l = _factor_plan(factors.strict)
    plan_lt = _factor_plan(factors.strict_t)
    plans, wt, nsw, bases = common_window(
        [plan_a, plan_l, plan_lt], plan_a.n_slices
    )
    plan_a, plan_l, plan_lt = plans
    if wt > _PACK_REL_DEAD:
        raise ValueError("common window too wide for the relsl layout")
    t_tiles = max(_state_tiles(p) for p in plans)
    _vmem_gate(7, t_tiles, "fused_pcg_ic0", op.vmem_mb)
    split = _chain_setting(chunk, 1)[0]

    # Concatenated planes + the per-chunk schedule.
    vals = np.concatenate([p.vals for p in plans])
    lidx = np.concatenate([p.lane_idx for p in plans])
    rsp = np.concatenate([_relsl_plane(p) for p in plans])
    offs = [0, plans[0].n_chunks, plans[0].n_chunks + plans[1].n_chunks]
    row0, row1, row2, row3 = [], [], [], []

    def _phase(plan_idx, flag_end):
        p = plans[plan_idx]
        sb = bases[plan_idx]
        for k in range(p.n_chunks):
            row0.append(offs[plan_idx] + k)
            row1.append(int(p.tile_base[k]))
            row2.append(int(sb[k]))
            row3.append(flag_end if k == p.n_chunks - 1 else _F_NONE)

    _phase(0, _F_A_END)
    for s in range(sweeps - 1):
        _phase(1, _F_L_LAST if s == sweeps - 2 else _F_L_SWEEP)
    for s in range(sweeps - 1):
        _phase(2, _F_LT_LAST if s == sweeps - 2 else _F_LT_SWEEP)
    tc = len(row0)
    sched = np.stack([
        np.asarray(row0, np.int32), np.asarray(row1, np.int32),
        np.asarray(row2, np.int32), np.asarray(row3, np.int32),
    ])

    b2 = _pad_vec(b, t_tiles)
    invd = np.zeros(t_tiles * LANES, dtype=np.float32)
    dh = np.asarray(factors.diag, dtype=np.float32)
    invd[: len(dh)] = 1.0 / dh
    invd2 = jnp.asarray(invd.reshape(t_tiles, LANES))

    vdt = jnp.bfloat16 if bf16_values else jnp.float32
    lidx_dtype = (jnp.int8 if chunk % 32 == 0
                  and os.environ.get("SMVP_SELL_LIDX32") != "1"
                  else jnp.int32)
    with jax.ensure_compile_time_eval():
        vals_d = jnp.asarray(vals, dtype=vdt)
        lidx_d = jnp.asarray(lidx, dtype=lidx_dtype)
        rs_d = jnp.asarray(rsp).reshape(-1, 1, chunk)

    def _kernel(sched_ref, b_ref, invd_ref, val_ref, lidx_ref, rs_ref,
                x_ref, r_ref, p_ref, q_ref, act_ref, z_ref, rz_ref):
        it = pl.program_id(0)
        ch = pl.program_id(1)

        @pl.when(jnp.logical_and(it == 0, ch == 0))
        def _init():
            x_ref[:] = jnp.zeros_like(x_ref)
            r_ref[:] = b_ref[:]
            p_ref[:] = jnp.zeros_like(p_ref)
            act_ref[:] = jnp.zeros_like(act_ref)
            rz_ref[0, 0] = 1.0

        @pl.when(ch == 0)
        def _zero_q():
            q_ref[:] = jnp.zeros_like(q_ref)

        _chunk_spmv_sched(
            sched_ref, act_ref, val_ref, lidx_ref, rs_ref, q_ref, ch,
            t_tiles=t_tiles, nsw=nsw, wt=wt, bf16_values=bf16_values,
            reduce2=reduce2, precision=precision, split=split,
        )

        flag = sched_ref[3, ch]

        @pl.when(flag == _F_A_END)
        def _a_end():
            rz = rz_ref[0, 0]
            pq = jnp.sum(p_ref[:] * q_ref[:])
            alpha = rz / jnp.maximum(pq, 1e-30)
            # Pass 0: p == 0 -> q == 0 -> alpha*p == 0; x and r keep
            # their init values (pcg_precond's setup phase).
            x_ref[:] = x_ref[:] + alpha * p_ref[:]
            r_ref[:] = r_ref[:] - alpha * q_ref[:]
            act_ref[:] = invd_ref[:] * r_ref[:]
            q_ref[:] = jnp.zeros_like(q_ref)

        @pl.when(flag == _F_L_SWEEP)
        def _l_sweep():
            act_ref[:] = invd_ref[:] * (r_ref[:] - q_ref[:])
            q_ref[:] = jnp.zeros_like(q_ref)

        @pl.when(flag == _F_L_LAST)
        def _l_last():
            z_ref[:] = invd_ref[:] * (r_ref[:] - q_ref[:])
            act_ref[:] = invd_ref[:] * z_ref[:]
            q_ref[:] = jnp.zeros_like(q_ref)

        @pl.when(flag == _F_LT_SWEEP)
        def _lt_sweep():
            act_ref[:] = invd_ref[:] * (z_ref[:] - q_ref[:])
            q_ref[:] = jnp.zeros_like(q_ref)

        @pl.when(flag == _F_LT_LAST)
        def _lt_last():
            w = invd_ref[:] * (z_ref[:] - q_ref[:])
            rz_new = jnp.sum(r_ref[:] * w)
            beta = rz_new / jnp.maximum(rz_ref[0, 0], 1e-30)
            is_first = (it == 0).astype(jnp.float32)
            p_ref[:] = w + (1.0 - is_first) * beta * p_ref[:]
            rz_ref[0, 0] = rz_new
            act_ref[:] = p_ref[:]
            q_ref[:] = jnp.zeros_like(q_ref)

    in_specs = [
        pl.BlockSpec((t_tiles, LANES), lambda it, ch, s: (0, 0)),  # b
        pl.BlockSpec((t_tiles, LANES), lambda it, ch, s: (0, 0)),  # invd
        pl.BlockSpec((chunk, LANES), lambda it, ch, s: (s[0, ch], 0)),
        pl.BlockSpec((chunk, LANES), lambda it, ch, s: (s[0, ch], 0)),
        pl.BlockSpec((1, 1, chunk), lambda it, ch, s: (s[0, ch], 0, 0)),
    ]
    opnds = (b2, invd2, vals_d, lidx_d, rs_d)
    check_pallas_args(in_specs, opnds, label="pcg-ic0-fused")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_iters + 1, tc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_tiles, LANES), lambda it, ch, s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # r
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # p
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # q
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # act
            pltpu.VMEM((t_tiles, LANES), jnp.float32),  # z
            pltpu.SMEM((1, 1), jnp.float32),            # rz
        ],
    )
    x = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, LANES), jnp.float32),
        interpret=op.interpret,
        **_mosaic_kwargs(op.vmem_mb),
    )(jnp.asarray(sched), *opnds)
    return x.reshape(-1)[:n]
