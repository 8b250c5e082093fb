"""Host-side Mosaic layout-constraint validator (the off-TPU CI guard).

Interpreter-mode Pallas (the only way to run kernels off-TPU) checks
none of Mosaic's static layout rules, so a kernel can pass the whole
CPU suite and still be uncompilable on hardware — which is exactly what
happened in round 3: a (1, chunk) slice_of block over an
(n_chunks, chunk) array passed three rounds of interpreter tests and
failed on the first real multi-chunk compile. These rules are static
facts about shapes and dtypes; this module checks them at TRACE time so
an illegal spec raises in every CPU test run, long before hardware.

Rules encoded (pallas_guide.md "Tiling Constraints" + observed Mosaic
errors from the r3/r4 hardware sessions):

1. A block's last two dims must each be a multiple of the dtype's
   native tile — sublane: 8·(4/itemsize) (f32/i32 8, bf16 16, i8 32);
   lane: 128 — OR equal to the corresponding array dim.
   (r3: "block shape (1, 1024) ... array (8, 1024)".)
2. Element-indexed specs: ALL dims Element or none.
   (r4: "All block dimensions must be Elements or none of them".)
3. Block rank must equal array rank.
4. Dynamic sublane offsets (pl.ds starts, Element index-map offsets)
   must be *provably* aligned to the sublane tile — the kernels carry
   ``pl.multiple_of(..., 16/8)`` proofs, so the planner's concrete base
   arrays must actually be 16-aligned (checked by
   :func:`check_plan_alignment` at operator construction).
   (r3: "cannot statically prove index in dimension 0 is a multiple
   of 8".)
5. ``jax.lax.Precision.HIGH`` is rejected by Mosaic on v5e
   ("Unsupported dot precision: HIGH", r4) — kernels must use DEFAULT
   or HIGHEST (:func:`check_precision`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = [
    "MosaicConstraintError",
    "sublane_tile",
    "check_block",
    "check_pallas_args",
    "check_plan_alignment",
    "check_precision",
]

LANES = 128


class MosaicConstraintError(ValueError):
    """A BlockSpec/plan violates a static Mosaic layout rule."""


def sublane_tile(dtype) -> int:
    """Native sublane tile for a dtype: (32 // itemsize) * 8."""
    itemsize = np.dtype(dtype).itemsize
    return max(8 * (4 // max(itemsize, 1)), 8)


def _dim_size(d) -> Optional[int]:
    """Static size of a block dim (int or pl.Element); None if opaque."""
    if isinstance(d, int):
        return d
    size = getattr(d, "block_size", None)
    return int(size) if size is not None else None


def _is_element(d) -> bool:
    return type(d).__name__ == "Element"


def check_block(
    block_shape: Sequence,
    array_shape: Tuple[int, ...],
    dtype,
    *,
    name: str = "",
) -> None:
    """Raise MosaicConstraintError if a (block, array, dtype) is illegal."""
    where = f" ({name})" if name else ""
    if len(block_shape) != len(array_shape):
        raise MosaicConstraintError(
            f"block rank {len(block_shape)} != array rank "
            f"{len(array_shape)}{where}"
        )
    elements = [_is_element(d) for d in block_shape]
    if any(elements) and not all(elements):
        raise MosaicConstraintError(
            f"mixed Element/block dims {tuple(block_shape)}{where}: Mosaic "
            "requires all dims Element or none"
        )
    if len(block_shape) < 2:
        return  # 1-D blocks: no (sublane, lane) tiling constraint
    st = sublane_tile(dtype)
    for pos, tile in ((-2, st), (-1, LANES)):
        b = _dim_size(block_shape[pos])
        a = int(array_shape[pos])
        if b is None:
            continue
        if b == a or b % tile == 0:
            continue
        raise MosaicConstraintError(
            f"block dim {pos} = {b} over array dim {a}{where}: must be a "
            f"multiple of {tile} ({np.dtype(dtype).name} tile) or equal "
            "to the array dim — Mosaic rejects this block shape on TPU"
        )


def check_pallas_args(in_specs, args, *, label: str = "") -> None:
    """Validate every (BlockSpec, operand) pair of a pallas_call.

    Reads the ACTUAL spec objects about to be passed (no parallel
    re-derivation to drift): specs with no block_shape (whole-array /
    SMEM) are skipped. Run at trace time — one Python pass per compile.
    """
    for i, (spec, a) in enumerate(zip(in_specs, args)):
        bs = getattr(spec, "block_shape", None)
        if bs is None:
            continue
        check_block(bs, a.shape, a.dtype, name=f"{label} args[{i}]")


def check_plan_alignment(plan) -> None:
    """Validate a SellPlan's concrete base arrays against the alignment
    proofs the kernels assert (pl.multiple_of 16 on x windows, 8 on y
    slice offsets) — a planner change that breaks 16-alignment must
    fail HERE, at build time, not as a wrong-result compile on TPU."""
    tb = np.asarray(plan.tile_base)
    if tb.size and int(np.abs(tb % 16).max()) != 0:
        raise MosaicConstraintError(
            "plan.tile_base is not 16-aligned; the kernel's "
            "pl.multiple_of(16) proof would be false"
        )
    sb, nsw = plan.reduce_window()
    sb = np.asarray(sb)
    if sb.size and int(np.abs(sb % 8).max()) != 0:
        raise MosaicConstraintError(
            "plan slice_base is not 8-aligned; the kernel's "
            "pl.multiple_of(8) proof would be false"
        )
    if plan.chunk % 8 != 0:
        raise MosaicConstraintError(
            f"chunk {plan.chunk} is not a multiple of 8 (f32 sublane tile)"
        )
    if nsw % 8 != 0 and nsw != plan.n_slices:
        raise MosaicConstraintError(
            f"slice window {nsw} is not a multiple of 8: the windowed "
            "y store would be an unaligned sublane slice"
        )
    if plan.window_tiles % 8 != 0:
        raise MosaicConstraintError(
            f"window_tiles {plan.window_tiles} is not a multiple of 8: "
            "the x-window sublane slice would be unaligned"
        )


def check_precision(precision) -> None:
    """Mosaic on v5e supports DEFAULT and HIGHEST dot precision only."""
    if precision == jax.lax.Precision.HIGH:
        raise MosaicConstraintError(
            "Precision.HIGH is rejected by Mosaic on TPU v5e "
            "('Unsupported dot precision: HIGH'); use DEFAULT, HIGHEST, "
            "or the reduce2 double-bf16 ladder"
        )
