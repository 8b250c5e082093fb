"""Double-float SpMV on the Pallas SELL path: ~1e-14 at kernel speed.

The reference computes SpMV in float64 (main-cli.c:42-47); TPU has no
fast f64, and round 4 left ``--kernel df64`` on the XLA compensated-
scan path. This kernel keeps the SELL structure (one-hot MXU select,
VPU lane gather, one-hot MXU reduce) and reaches double-float accuracy
with MXU-exact arithmetic:

* **Exact f32 selection**: the x table is built from the 3-term bf16
  expansion of each f32 (8+8+8 mantissa bits — exact for normal-range
  values; see the range caveat below), one single-pass bf16 dot per
  term. One-hot rows have a single 1, so each dot SELECTS exactly; the
  3-term recombination is the original f32 bit-for-bit.
* **Error-free products**: v·g via Dekker two_prod (VPU), plus the
  cross terms v_hi·g_lo + v_lo·g_hi for f64-valued operators.
* **Exact MXU accumulation** (the structural trick — fixed-point /
  Ozaki-style): per chunk, products quantize onto power-of-two grids
  derived from the chunk's max |p|: five 8-bit levels for the main
  product and two for the error channel. Each level, rescaled by its
  (power-of-two) grid, is a SMALL INTEGER — exact in bf16 operands and
  exactly accumulated by the single-pass MXU dot in f32 (sums stay
  far below 2^24). Level sums rescale exactly (power-of-two) and
  combine in decreasing order with error-free two_sum; the per-chunk
  double-float partial joins the (y_hi, y_lo) accumulator with a
  compensated add. The only irrecoverable rounding is the final
  residual dot, bounded ~2^-49 of the chunk's product scale.

Range caveat: bf16 shares f32's exponent range, so the expansion and
grid arithmetic stay exact while the per-chunk product scale sits in
[2^-78, 2^111] (the clamp band where the f32 grids stay normal and the
rounding constants finite — measured: exact over 1e6 random values
spanning 2^-30..2^30, NaN-free for zero chunks); per-OPERAND values
past ~2^114 overflow the Dekker splitter (inf/NaN) regardless of the
product scale — stay under that, or use the XLA path. Outside the band
accuracy degrades gracefully toward bf16-tail level.
The XLA path (ops/precision.py) remains the reference for pathological
scales.

Accuracy/cost: ~1e-14 relative to the f64 oracle on the benchmark
matrices (tests), at ~6 extra single-pass bf16 MXU dots + ~40 VPU
ops/slot over the standard 3-stream bf16 layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smvp_toolkit_tpu.ops.mosaic_check import check_pallas_args
from smvp_toolkit_tpu.ops.sell_plan import LANES, SellPlan, build_sell_plan
from smvp_toolkit_tpu.ops.spmv_pallas import (
    _PACK_REL_DEAD,
    _RELSL_SL_SHIFT,
    _mosaic_kwargs,
    _use_interpret,
)

__all__ = ["SellDf64SpMV", "sell_df64_op"]

# 8-bit quantization levels: p gets _P_LEVELS (grids 2^-8 .. 2^-40 of
# the chunk scale — past the f32 mantissa of even the smallest
# contributing products), the error channel gets _E_LEVELS (its
# magnitude starts at ~2^-23 of the scale).
_P_LEVELS = 5
_E_LEVELS = 2
# The error channel starts one bit HIGHER than the aligned shift: pe
# can reach 3 half-ulps of the scale (~1.5*2^-23*pow2 — two_prod error
# plus both cross terms), so an aligned first level's integers reach
# 384 > bf16-exact 256 (review finding, verified); shift 31 caps them
# at 192.
_E_FIRST_SHIFT = 8 * (_P_LEVELS - _E_LEVELS) + 7


def _bf16_terms(x, terms=3):
    """3-term bf16 expansion of f32: x == t1 + t2 + t3 (normal range)."""
    out = []
    r = x
    for _ in range(terms):
        t = r.astype(jnp.bfloat16)
        out.append(t)
        r = r - t.astype(jnp.float32)
    return out


def _table_exact_f32(rel_row, x_win, wt):
    """One-hot select of f32 x values, EXACT: 3 single-pass bf16 dots.

    Same contraction orientation as _table_select_t (ops/spmv_pallas):
    one-hot (wt, chunk) built transposed, x window (wt, 128).
    """
    wt_iota = jax.lax.broadcasted_iota(jnp.int32, (wt, 1), 0)
    ohtT = (wt_iota == rel_row).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    acc = None
    for t in _bf16_terms(x_win):
        d = jax.lax.dot_general(
            ohtT, t, dims, preferred_element_type=jnp.float32
        )
        acc = d if acc is None else acc + d
    return acc


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


_SPLITTER = np.float32(4097.0)  # 2^12 + 1 (Veltkamp, f32)


def _two_prod(a, b):
    p = a * b
    ca = _SPLITTER * a
    ah = ca - (ca - a)
    al = a - ah
    cb = _SPLITTER * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df64_chunk_store(rs, xh_win, xl_win, vh, vl, lidx32, wt, nsw, ns,
                      sb_dyn, yhi_ref, ylo_ref):
    """One df64 chunk: exact gathers, error-free products, quantized
    exact MXU reduce, compensated accumulate into (y_hi, y_lo)."""
    rel_row = jnp.bitwise_and(rs, jnp.int32(_PACK_REL_DEAD))
    sl_row = jax.lax.shift_right_logical(rs, _RELSL_SL_SHIFT)

    g_hi = jnp.take_along_axis(
        _table_exact_f32(rel_row, xh_win, wt), lidx32, axis=1
    )
    g_lo = jnp.take_along_axis(
        _table_exact_f32(rel_row, xl_win, wt), lidx32, axis=1
    )

    p, pe = _two_prod(vh, g_hi)
    pe = pe + vh * g_lo
    if vl is not None:
        pe = pe + vl * g_hi + vl * g_lo

    # Per-chunk power-of-two scale, CLAMPED to the f32-safe band: the
    # unclamped grids overflowed f32 for chunk scales > ~2^112 (the
    # 1.5*2^23 rounding constant went inf -> NaN) and underflowed to
    # zero for all-zero chunks (0/0 NaN). Within the clamp the grids
    # are dynamic TRACED values — deliberately: with literal-constant
    # grids the compiler folds the (r + c) - c grid rounding away
    # (measured: levels collapse, 1.7e-3 error). +1 guard bit keeps
    # every level integer <= 256 even when f32 log2 rounds a hair low
    # near power-of-two maxima. Accuracy contract: full df64 for chunk
    # product scales within [2^-64, 2^100]; outside, the kernel
    # degrades gracefully (the XLA path remains for pathological
    # scales — module docstring).
    # Clamp band: grids stay normal f32 (low end: pow2*2^-48 >= 2^-126)
    # and the rounding constants stay finite (high end:
    # 1.5*2^15*pow2 <= f32max) — full df64 accuracy for chunk product
    # scales within [2^-78, 2^111]; beyond, graceful degradation.
    m_abs = jnp.maximum(jnp.max(jnp.abs(p)), 2.0 ** -78)
    e = jnp.clip(jnp.ceil(jnp.log2(m_abs)) + 1.0, -78.0, 111.0)
    pow2 = jnp.exp2(e)

    # One-hot reduce operand (bf16 exact: 0/1).
    rel_s = sl_row - sb_dyn
    nsw_iota = jax.lax.broadcasted_iota(jnp.int32, (nsw, 1), 0)
    seg16 = (nsw_iota == rel_s).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))

    def exact_level_dots(v, first_shift, n_levels):
        """Quantize v into 8-bit levels; return EXACT rescaled dots.

        Level k sits on grid pow2 * 2^-(first_shift + 8k): the
        rescaled level values are integers in [-256, 256] (exact in
        bf16), their one-hot dot accumulates exactly in f32 (sums
        < 2^24), and the power-of-two rescale is exact.
        """
        outs = []
        r = v
        for k in range(n_levels):
            shift = first_shift + 8 * k
            grid = pow2 * (2.0 ** -shift)
            c = (1.5 * 2.0 ** 23) * grid
            t = (r + c) - c  # round onto the grid
            r = r - t
            q16 = (t / grid).astype(jnp.bfloat16)  # small integer
            d = jax.lax.dot_general(
                seg16, q16, dims, preferred_element_type=jnp.float32
            )
            outs.append(d * grid)
        return outs, r

    p_dots, p_res = exact_level_dots(p, 8, _P_LEVELS)
    e_dots, e_res = exact_level_dots(pe, _E_FIRST_SHIFT, _E_LEVELS)
    tail = p_res + e_res  # ~2^-41 * pow2 per slot
    tail_dot = jax.lax.dot_general(
        seg16, tail.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32,
    )

    # Combine in decreasing magnitude with error-free two_sum
    # (p levels sit at scale shifts 8..40, e levels at 32..40).
    ordered = [p_dots[0], p_dots[1], p_dots[2], p_dots[3], e_dots[0],
               p_dots[4], e_dots[1], tail_dot]
    s, err = _two_sum(ordered[0], ordered[1])
    for nxt in ordered[2:]:
        s2, e2 = _two_sum(s, nxt)
        s, err = s2, err + e2

    sb_ = pl.multiple_of(sb_dyn, 8)
    if nsw >= ns:
        s2, e2 = _two_sum(yhi_ref[:], s)
        yhi_ref[:] = s2
        ylo_ref[:] = ylo_ref[:] + (err + e2)
    else:
        yh = yhi_ref[pl.ds(sb_, nsw), :]
        yl = ylo_ref[pl.ds(sb_, nsw), :]
        s2, e2 = _two_sum(yh, s)
        yhi_ref[pl.ds(sb_, nsw), :] = s2
        ylo_ref[pl.ds(sb_, nsw), :] = yl + (err + e2)


class SellDf64SpMV:
    """Double-float SELL operator: ``y_hi, y_lo = op(x_hi, x_lo)``.

    Built from f64 host values (split into hi/lo f32 planes) or f32
    values (lo plane elided). The plan must be resident-y.
    """

    def __init__(self, plan: SellPlan, vals_lo: Optional[np.ndarray] = None,
                 interpret: bool | None = None, vmem_mb: int | None = None):
        if plan.y_block_slices:
            raise ValueError("df64 kernel requires a resident-y plan")
        if plan.window_tiles > _PACK_REL_DEAD:
            raise ValueError("window too wide for the rel-slice packing")
        self.plan = plan
        self.shape = plan.shape
        self.interpret = _use_interpret() if interpret is None else interpret
        self.vmem_mb = vmem_mb
        with jax.ensure_compile_time_eval():
            self.vals_hi = jnp.asarray(plan.vals, jnp.float32)
            self.vals_lo = (
                jnp.asarray(vals_lo, jnp.float32)
                if vals_lo is not None else None
            )
            import os

            from smvp_toolkit_tpu.ops.spmv_pallas import relsl_plane_host

            self.lidx = jnp.asarray(
                plan.lane_idx,
                jnp.int8
                if plan.chunk % 32 == 0
                and os.environ.get("SMVP_SELL_LIDX32") != "1"
                else jnp.int32,
            )
            self.relsl = jnp.asarray(
                relsl_plane_host(plan)
            ).reshape(plan.n_chunks, 1, plan.chunk)
            sb, self.nsw = plan.reduce_window()
            self.bases = jnp.stack([
                jnp.asarray(plan.tile_base, jnp.int32),
                jnp.asarray(sb, jnp.int32),
            ])

    @staticmethod
    def from_coo_f64(rows, cols, vals64, shape, chunk: int = 2048
                     ) -> "SellDf64SpMV":
        """Build from f64 triplets: hi plane from the f32 rounding, lo
        plane filled through a second deterministic planner pass over
        the same coordinates (slots match bit-for-bit)."""
        vals64 = np.asarray(vals64, np.float64)
        hi = vals64.astype(np.float32)
        lo = (vals64 - hi.astype(np.float64)).astype(np.float32)
        plan = build_sell_plan(
            np.asarray(rows, np.int64), np.asarray(cols, np.int64), hi,
            shape, chunk=chunk,
        )
        if np.any(lo):
            plan_lo = build_sell_plan(
                np.asarray(rows, np.int64), np.asarray(cols, np.int64),
                lo, shape, chunk=chunk,
            )
            assert plan_lo.vals.shape == plan.vals.shape
            return SellDf64SpMV(plan, vals_lo=plan_lo.vals)
        return SellDf64SpMV(plan)

    def _padded_x(self, x_hi, x_lo):
        ct = self.plan.n_coltiles
        ncols_pad = ct * LANES
        x_hi = x_hi.astype(jnp.float32)
        if x_hi.shape[0] < ncols_pad:
            x_hi = jnp.pad(x_hi, (0, ncols_pad - x_hi.shape[0]))
        if x_lo is None:
            x_lo = jnp.zeros_like(x_hi)
        else:
            x_lo = x_lo.astype(jnp.float32)
            if x_lo.shape[0] < ncols_pad:
                x_lo = jnp.pad(x_lo, (0, ncols_pad - x_lo.shape[0]))
        return x_hi.reshape(ct, LANES), x_lo.reshape(ct, LANES)

    def _launch(self, x_hi, x_lo, iterations: Optional[int]):
        plan = self.plan
        n = plan.shape[0]
        ct, wt, nsw = plan.n_coltiles, plan.window_tiles, self.nsw
        ns, chunk, nch = plan.n_slices, plan.chunk, plan.n_chunks
        xh_t, xl_t = self._padded_x(x_hi, x_lo)
        has_vlo = self.vals_lo is not None
        fused = iterations is not None

        def _kernel(bases_ref, xh_ref, xl_ref, vh_ref, vl_ref, lidx_ref,
                    rs_ref, yhi_ref, ylo_ref):
            ch = pl.program_id(1) if fused else pl.program_id(0)

            @pl.when(ch == 0)
            def _init():
                yhi_ref[:] = jnp.zeros_like(yhi_ref)
                ylo_ref[:] = jnp.zeros_like(ylo_ref)

            xb = pl.multiple_of(bases_ref[0, ch], 16)
            _df64_chunk_store(
                rs_ref[0],
                xh_ref[pl.ds(xb, wt), :],
                xl_ref[pl.ds(xb, wt), :],
                vh_ref[:],
                vl_ref[:] if has_vlo else None,
                lidx_ref[:].astype(jnp.int32),
                wt, nsw, ns, bases_ref[1, ch], yhi_ref, ylo_ref,
            )

        def _ix(block):
            if fused:
                return pl.BlockSpec(block[0], lambda it, ch: block[1](ch))
            return pl.BlockSpec(block[0], lambda ch: block[1](ch))

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _ix(((ct, LANES), lambda ch: (0, 0))),
            _ix(((ct, LANES), lambda ch: (0, 0))),
            _ix(((chunk, LANES), lambda ch: (ch, 0))),
            (
                _ix(((chunk, LANES), lambda ch: (ch, 0)))
                if has_vlo
                else _ix(((1, LANES), lambda ch: (0, 0)))
            ),
            _ix(((chunk, LANES), lambda ch: (ch, 0))),
            _ix(((1, 1, chunk), lambda ch: (ch, 0, 0))),
        ]
        vl_arg = (
            self.vals_lo if has_vlo
            else jnp.zeros((1, LANES), jnp.float32)
        )
        opnds = (self.bases, xh_t, xl_t, self.vals_hi, vl_arg,
                 self.lidx, self.relsl)
        check_pallas_args(in_specs[1:], opnds[1:], label="sell-df64")
        grid = (iterations, nch) if fused else (nch,)
        y_hi, y_lo = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                _ix(((ns, LANES), lambda ch: (0, 0))),
                _ix(((ns, LANES), lambda ch: (0, 0))),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
                jax.ShapeDtypeStruct((ns, LANES), jnp.float32),
            ),
            interpret=self.interpret,
            **_mosaic_kwargs(self.vmem_mb),
        )(*opnds)
        return y_hi.reshape(-1)[:n], y_lo.reshape(-1)[:n]

    def __call__(self, x_hi: jax.Array, x_lo: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        return self._launch(x_hi, x_lo, None)

    def bench_loop(self, x_hi: jax.Array, x_lo: Optional[jax.Array],
                   iterations: int) -> Tuple[jax.Array, jax.Array]:
        """Grid-fused timing loop (same protocol as SellSpMV.bench_loop:
        y re-derived each iteration, planes re-streamed)."""
        return self._launch(x_hi, x_lo, iterations)


def sell_df64_op(coo, chunk: int = 2048) -> SellDf64SpMV:
    """df64 SELL operator from a COO matrix (f64 host values honored)."""
    r, c, v = coo.to_numpy()
    return SellDf64SpMV.from_coo_f64(r, c, v, coo.shape, chunk=chunk)
