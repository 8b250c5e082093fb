"""Data-parallel SELL-T1 Pallas SpMV: row-block shards, per-device kernel.

Combines the two performance layers: the SELL-T1 Pallas kernel
(ops/spmv_pallas.py) runs *inside* ``shard_map`` — each device owns a
contiguous block of row slices, builds products for its local sublanes,
and reduces them locally; the global y is the ordered concatenation of
the per-device slices (no collective needed for the sharded result; an
all-gather materializes the replicated vector). x is replicated.

Per-device plans are padded to identical static shapes (max sublane
count across shards) so one compiled kernel serves every device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.ops.sell_plan import (
    LANES,
    build_sell_plan,
    common_window,
)
from smvp_toolkit_tpu.ops.spmv_pallas import (
    _chain_setting,
    _PACK_WT_MAX,
    _RELSL_SL_DEAD,
    _RELSL_SL_SHIFT,
    _sell_spmv_call,
    _use_interpret,
)
from smvp_toolkit_tpu.parallel.mesh import DP_AXIS

__all__ = [
    "ShardedSell", "shard_sell", "shard_sell_transpose",
    "bench_loop_sharded",
    "spmv_sell_sharded", "spmm_sell_sharded", "spmm_sell_sharded_t",
    "differentiable_spmm_sharded",
]


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedSell:
    """Per-device SELL plans stacked on a leading shard dimension."""

    vals: jax.Array  # f32 (n, S, 128)
    lidx: jax.Array  # i32 (n, S, 128)
    rel_tile: jax.Array  # i32 (n, S, 1)
    slice_of: jax.Array  # i32 (n, n_chunks, chunk)
    tile_base: jax.Array  # i32 (n, 2, n_chunks): [tile, slice] bases
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    n_coltiles: int = dataclasses.field(metadata=dict(static=True))
    window_tiles: int = dataclasses.field(metadata=dict(static=True))
    n_slices_local: int = dataclasses.field(metadata=dict(static=True))
    slice_window: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # Merged rel‖slice plane (i32 (n, n_chunks, chunk)) — present when
    # the relsl gates pass at shard time (wt <= 511, NSl < 2^23); the
    # per-device launch then runs the 3-stream kernel (the single-chip
    # default, ops/spmv_pallas.py).
    relsl: jax.Array | None = None

    @property
    def S(self) -> int:
        return int(self.vals.shape[1])

    @property
    def WT(self) -> int:
        return self.window_tiles

    @property
    def NSl(self) -> int:
        return self.n_slices_local

    @property
    def CT(self) -> int:
        return self.n_coltiles


def shard_sell(
    coo: COOMatrix,
    mesh: Mesh,
    *,
    chunk: int = 1024,
    value_dtype=None,
) -> ShardedSell:
    """Split rows into contiguous blocks and build one SELL plan each.

    ``value_dtype=jnp.bfloat16`` enables the bf16 value mode per device
    (see ops/spmv_pallas.py); lane indices compress to int8 when the
    chunk is 32-aligned, matching the single-chip operator.
    """
    n = mesh.devices.size
    nrows, ncols = coo.shape
    rows_blk = _round_up(nrows, n * LANES) // n  # multiple of 128
    r, c, v = coo.to_numpy()
    parts = []
    for k in range(n):
        lo, hi = k * rows_blk, (k + 1) * rows_blk
        sel = (r >= lo) & (r < hi)
        parts.append((r[sel] - lo, c[sel], v[sel]))
    return _stack_shard_plans(
        parts, (rows_blk, ncols), coo.shape, coo.nnz, mesh,
        chunk=chunk, value_dtype=value_dtype, rows_per_shard=rows_blk,
    )


def shard_sell_transpose(
    coo: COOMatrix,
    mesh: Mesh,
    *,
    chunk: int = 1024,
    value_dtype=None,
) -> ShardedSell:
    """Per-device plans of (row-block of A)ᵀ — the backward operator.

    Device k owns rows ``[k·rows_blk, (k+1)·rows_blk)`` of A on the
    forward path; its transpose block A_kᵀ is (ncols, rows_blk), and
    ``Aᵀ·G = Σ_k A_kᵀ·G_k`` — each device multiplies its own y-rows
    slice of the cotangent and a psum assembles the sum. ``shape``
    records Aᵀ (ncols, nrows); ``rows_per_shard`` still describes the
    FORWARD row split (the G_k slice width).
    """
    n = mesh.devices.size
    nrows, ncols = coo.shape
    rows_blk = _round_up(nrows, n * LANES) // n
    r, c, v = coo.to_numpy()
    parts = []
    for k in range(n):
        lo, hi = k * rows_blk, (k + 1) * rows_blk
        sel = (r >= lo) & (r < hi)
        parts.append((c[sel], r[sel] - lo, v[sel]))
    return _stack_shard_plans(
        parts, (ncols, rows_blk), (ncols, nrows), coo.nnz, mesh,
        chunk=chunk, value_dtype=value_dtype, rows_per_shard=rows_blk,
    )


def _stack_shard_plans(
    parts, local_shape, global_shape, nnz, mesh, *, chunk, value_dtype,
    rows_per_shard,
) -> ShardedSell:
    """Plan each shard's triplets and pad to common static shapes.

    One planner pass per shard, then an O(S) rewindow to the common
    maximum so one compiled kernel (and one clamping rule) serves
    every shard (bit-identical to the former probe-then-rebuild
    double pass — tested). Window alignment (tile window + slice
    window + base re-clamp) is the shared common_window rule in
    ops/sell_plan.py, same as the streamed-y stacker.
    """
    n = mesh.devices.size
    plans = [
        build_sell_plan(
            pr, pc, pv, local_shape, chunk=chunk,
            allow_small_chunk=False,
        )
        for pr, pc, pv in parts
    ]
    NSl = max(p.n_slices for p in plans)
    plans, WT, NSW, sub_bases = common_window(plans, NSl)

    S = max(p.n_sublanes for p in plans)
    CT = max(p.n_coltiles for p in plans)
    n_chunks = S // chunk

    def _pad(a, shape):
        out = np.zeros(shape, dtype=a.dtype)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    vals = np.stack([_pad(p.vals, (S, LANES)) for p in plans])
    lidx = np.stack([_pad(p.lane_idx, (S, LANES)) for p in plans])

    def _pad_rel(p):
        out = np.full((S, 1), -1, dtype=np.int32)
        out[: p.rel_tile.shape[0]] = p.rel_tile
        return out

    def _pad_slice(p):
        out = np.full((n_chunks, chunk), -1, dtype=np.int32)
        out[: p.slice_of.shape[0], :] = p.slice_of
        return out

    rel = np.stack([_pad_rel(p) for p in plans])
    slc = np.stack([_pad_slice(p) for p in plans])

    def _bases(p, sb):
        return np.stack(
            [
                _pad(p.tile_base.astype(np.int32), (n_chunks,)),
                _pad(sb, (n_chunks,)),
            ]
        )

    tbase = np.stack([_bases(p, sb) for p, sb in zip(plans, sub_bases)])

    import os as _os

    vdt = (
        jnp.bfloat16
        if value_dtype is not None
        and jnp.dtype(value_dtype) == jnp.dtype(jnp.bfloat16)
        else jnp.float32
    )
    ldt = (
        jnp.int8
        if chunk % 32 == 0 and _os.environ.get("SMVP_SELL_LIDX32") != "1"
        else jnp.int32
    )
    blk = NamedSharding(mesh, P(DP_AXIS))
    relsl = None
    if WT <= _PACK_WT_MAX and NSl < _RELSL_SL_DEAD:
        relu = np.where(rel < 0, 511, rel).astype(np.uint32)
        slu = np.where(slc < 0, _RELSL_SL_DEAD, slc).astype(np.uint32)
        rs = (
            relu.reshape(n, n_chunks, chunk)
            | (slu << _RELSL_SL_SHIFT)
        ).view(np.int32)
        relsl = jax.device_put(jnp.asarray(rs), blk)
    return ShardedSell(
        vals=jax.device_put(jnp.asarray(vals, dtype=vdt), blk),
        lidx=jax.device_put(jnp.asarray(lidx, dtype=ldt), blk),
        rel_tile=jax.device_put(jnp.asarray(rel), blk),
        slice_of=jax.device_put(jnp.asarray(slc), blk),
        tile_base=jax.device_put(jnp.asarray(tbase), blk),
        shape=global_shape,
        nnz=nnz,
        chunk=chunk,
        n_shards=n,
        rows_per_shard=rows_per_shard,
        n_coltiles=CT,
        window_tiles=WT,
        n_slices_local=NSl,
        slice_window=NSW,
        relsl=relsl,
    )


def spmv_sell_sharded(sh: ShardedSell, x: jax.Array, mesh: Mesh) -> jax.Array:
    """y = A·x with each device running the SELL Pallas kernel locally.

    The compat-kernel switch is read here (outside jit) so toggling
    ``SMVP_SELL_COMPAT`` between calls retraces instead of silently
    reusing the first compilation.
    """
    import os as _os

    compat = _os.environ.get("SMVP_SELL_COMPAT") == "1"
    reduce2 = _reduce2_default(sh)
    prefetch = _os.environ.get("SMVP_SELL_PREFETCH") != "0"
    nowindow = _os.environ.get("SMVP_SELL_NOWINDOW") == "1"
    relsl = (
        sh.relsl is not None
        and not compat
        and _os.environ.get("SMVP_SELL_RELSL", "1") == "1"
    )
    return _spmv_sell_sharded(sh, x, mesh, compat, reduce2, prefetch,
                              nowindow, relsl)


@partial(
    jax.jit,
    static_argnames=("mesh", "compat", "reduce2", "prefetch", "nowindow",
                     "relsl"),
)
def _spmv_sell_sharded(
    sh: ShardedSell, x: jax.Array, mesh: Mesh, compat: bool,
    reduce2: bool = False, prefetch: bool = True, nowindow: bool = False,
    relsl: bool = False,
) -> jax.Array:
    ncols_pad = sh.CT * LANES
    x = x.astype(sh.vals.dtype)  # bf16 value mode streams x in bf16 too
    # Same VMEM guard and bf16 precision rule as the single-chip
    # operator (spmv_pallas.SellSpMV): resident x only while it fits,
    # lossless 3-pass reduce for bf16 products.
    from smvp_toolkit_tpu.ops.spmv_pallas import _RESIDENT_X_LIMIT

    resident = sh.CT * LANES * x.dtype.itemsize <= _RESIDENT_X_LIMIT
    # HIGHEST wherever precision is consulted: Mosaic on v5e rejects
    # Precision.HIGH (r4 hardware session); bf16 mode defaults to the
    # reduce2 ladder instead (see _reduce2_default).
    precision = jax.lax.Precision.HIGHEST
    if x.shape[0] < ncols_pad:
        x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
    x_tiles = x.reshape(sh.CT, LANES)
    interpret = _use_interpret()
    n_chunks = sh.S // sh.chunk

    def local(vals, lidx, rel, slc, tbase, rs, xt):
        y = _sell_spmv_call(
            xt,
            vals[0],
            lidx[0],
            rel[0],
            slc[0],
            tbase[0],
            n_chunks=n_chunks,
            chunk=sh.chunk,
            ns=sh.NSl,
            nsw=(
                sh.NSl
                if sh.slice_window <= 0 or nowindow
                else sh.slice_window
            ),
            wt=sh.WT,
            interpret=interpret,
            precision=precision,
            resident=resident,
            onehot_dense=compat,
            reduce2=reduce2,
            prefetch=prefetch,
            relsl_plane=rs[0] if relsl else None,
            split_chain=_chain_setting(sh.chunk, 1)[0],
        )
        return y[None]

    # The relsl operand must exist for shard_map's in_specs even when
    # the 3-stream route is off; a (n, 1, 1, 1) dummy keeps the spec
    # shape-compatible at zero cost (unused operands drop out of HLO).
    rs_arg = (
        sh.relsl
        if relsl
        else jnp.zeros((sh.n_shards, 1, 1), jnp.int32)
    )
    y_blocks = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(),
        ),
        out_specs=P(DP_AXIS),
        # pallas_call's out_shape carries no varying-mesh-axis annotation;
        # the output sharding is fully described by out_specs.
        check_vma=False,
    )(sh.vals, sh.lidx, sh.rel_tile, sh.slice_of, sh.tile_base, rs_arg,
      x_tiles)
    # Drop per-shard slice padding (NSl is rounded up to 8 slices), then
    # concatenate shards in row order and trim global row padding.
    ns_true = sh.rows_per_shard // LANES
    y = y_blocks[:, :ns_true, :].reshape(-1)
    return y[: sh.shape[0]]



def _reduce2_default(sh: ShardedSell) -> bool:
    """Double-bf16 reduce default, mirroring SellSpMV._apply: ON in bf16
    value mode (lossless there, and Mosaic rejects Precision.HIGH on
    v5e so the 3-pass ladder is unavailable), env-gated otherwise."""
    import os as _os

    return _os.environ.get(
        "SMVP_SELL_REDUCE2",
        "1" if sh.vals.dtype == jnp.bfloat16 else "0",
    ) == "1"


def bench_loop_sharded(sh: ShardedSell, x: jax.Array, mesh: Mesh,
                       iterations: int) -> jax.Array:
    """N sequential sharded SpMVs in ONE launch per device.

    The shard_map twin of ``SellSpMV.bench_loop`` (grid-fused benchmark
    protocol, PERFORMANCE.md round-4): every device runs its local
    grid = (N, n_chunks) sweep, y re-zeroed per iteration, planes
    re-streamed per iteration. relsl layout, resident x. Returns the
    final global y.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smvp_toolkit_tpu.ops.spmv_pallas import (
        _make_sell_kernel_bench,
        _mosaic_kwargs,
    )

    if sh.relsl is None:
        raise ValueError("bench_loop_sharded needs the relsl plane")
    ncols_pad = sh.CT * LANES
    x = x.astype(sh.vals.dtype)
    if x.shape[0] < ncols_pad:
        x = jnp.pad(x, (0, ncols_pad - x.shape[0]))
    x_tiles = x.reshape(sh.CT, LANES)
    interpret = _use_interpret()
    n_chunks = sh.S // sh.chunk
    bf16 = sh.vals.dtype == jnp.bfloat16
    reduce2 = _reduce2_default(sh)
    nsw = sh.slice_window if sh.slice_window > 0 else sh.NSl
    kern = _make_sell_kernel_bench(
        jax.lax.Precision.HIGHEST, sh.NSl, nsw, sh.WT, bf16, reduce2,
        relsl=True,
    )
    chunk, ct, nsl = sh.chunk, sh.CT, sh.NSl

    def local(vals, lidx, tbase, rs, xt):
        y = pl.pallas_call(
            kern,
            grid=(iterations, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ct, LANES), lambda it, ch: (0, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((chunk, LANES), lambda it, ch: (ch, 0)),
                pl.BlockSpec((1, 1, chunk), lambda it, ch: (ch, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nsl, LANES), lambda it, ch: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((nsl, LANES), jnp.float32),
            interpret=interpret,
            **_mosaic_kwargs(),
        )(tbase[0], xt, vals[0], lidx[0],
          rs[0].reshape(n_chunks, 1, chunk))
        return y[None]

    y_blocks = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P()),
        out_specs=P(DP_AXIS),
        check_vma=False,
    )(sh.vals, sh.lidx, sh.tile_base, sh.relsl, x_tiles)
    ns_true = sh.rows_per_shard // LANES
    y = y_blocks[:, :ns_true, :].reshape(-1)
    return y[: sh.shape[0]]


def _spmm_group(NSl: int, CT: int, itemsize: int) -> int:
    """Per-launch column group — delegates to the shared VMEM policy in
    ops/spmv_pallas (one definition for matmat, the sharded paths and
    traffic accounting)."""
    from smvp_toolkit_tpu.ops.spmv_pallas import spmm_launch_group

    return spmm_launch_group(NSl, CT, itemsize)


def spmm_sell_sharded(sh: ShardedSell, X: jax.Array, mesh: Mesh) -> jax.Array:
    """Y = A·X (k RHS) — the fused SELL SpMM under ``shard_map``.

    Mirrors ``SellSpMV.matmat``: every device runs one k-wide launch
    over its row block, reading its value/index planes ONCE for all k
    columns (the distributed GCN-training hot op). X is replicated;
    columns group into launches sized by the single-chip VMEM policy
    (default 8, ``SMVP_SELL_SPMM_GROUP``; see :func:`_spmm_group`).
    Compat mode and ``SMVP_SELL_SPMM=0`` fall back to per-column
    ``spmv_sell_sharded``.
    """
    import os as _os

    k = int(X.shape[1])
    compat = _os.environ.get("SMVP_SELL_COMPAT") == "1"
    if k == 1:
        return spmv_sell_sharded(sh, X[:, 0], mesh)[:, None]
    if compat or _os.environ.get("SMVP_SELL_SPMM") == "0":
        cols = [spmv_sell_sharded(sh, X[:, j], mesh) for j in range(k)]
        return jnp.stack(cols, axis=1)
    reduce2 = _reduce2_default(sh)
    prefetch = _os.environ.get("SMVP_SELL_PREFETCH") != "0"
    nowindow = _os.environ.get("SMVP_SELL_NOWINDOW") == "1"
    group = _spmm_group(sh.NSl, sh.CT, jnp.dtype(sh.vals.dtype).itemsize)
    outs = [
        _spmm_sell_sharded(sh, X[:, g0:g0 + group], mesh, reduce2,
                           prefetch, nowindow)
        for g0 in range(0, k, group)
    ]
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@partial(
    jax.jit,
    static_argnames=("mesh", "reduce2", "prefetch", "nowindow"),
)
def _spmm_sell_sharded(
    sh: ShardedSell, X: jax.Array, mesh: Mesh, reduce2: bool,
    prefetch: bool, nowindow: bool,
) -> jax.Array:
    from smvp_toolkit_tpu.ops.spmv_pallas import (
        _RESIDENT_X_LIMIT,
        pack_columns,
        unpack_columns,
    )

    kg = X.shape[1]
    ncols_pad = sh.CT * LANES
    X = X.astype(sh.vals.dtype)
    resident = sh.CT * LANES * X.dtype.itemsize * kg <= _RESIDENT_X_LIMIT
    # HIGHEST wherever precision is consulted: Mosaic on v5e rejects
    # Precision.HIGH (r4 hardware session); bf16 mode defaults to the
    # reduce2 ladder instead (see _reduce2_default).
    precision = jax.lax.Precision.HIGHEST
    if X.shape[0] < ncols_pad:
        X = jnp.pad(X, ((0, ncols_pad - X.shape[0]), (0, 0)))
    x_tiles = pack_columns(X, sh.CT, kg)
    interpret = _use_interpret()
    n_chunks = sh.S // sh.chunk

    def local(vals, lidx, rel, slc, tbase, xt):
        y = _sell_spmv_call(
            xt,
            vals[0],
            lidx[0],
            rel[0],
            slc[0],
            tbase[0],
            n_chunks=n_chunks,
            chunk=sh.chunk,
            ns=sh.NSl,
            nsw=(
                sh.NSl
                if sh.slice_window <= 0 or nowindow
                else sh.slice_window
            ),
            wt=sh.WT,
            interpret=interpret,
            precision=precision,
            resident=resident,
            onehot_dense=False,
            reduce2=reduce2,
            prefetch=prefetch,
            k=kg,
        )
        return y[None]  # (1, NSl, kg*LANES)

    y_blocks = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(),
        ),
        out_specs=P(DP_AXIS),
        check_vma=False,
    )(sh.vals, sh.lidx, sh.rel_tile, sh.slice_of, sh.tile_base, x_tiles)
    # Per shard: drop slice padding, unpack lanes back to (rows, kg),
    # then concatenate shards in row order and trim global row padding.
    ns_true = sh.rows_per_shard // LANES
    y = unpack_columns(
        y_blocks[:, :ns_true, :].reshape(sh.n_shards * ns_true, kg * LANES),
        sh.n_shards * ns_true,
        kg,
    )
    return y[: sh.shape[0]]


def spmm_sell_sharded_t(sh_t: ShardedSell, G: jax.Array,
                        mesh: Mesh) -> jax.Array:
    """Z = Aᵀ·G from per-device transpose plans (shard_sell_transpose).

    The cotangent G arrives replicated with the forward output's row
    layout; device k multiplies its OWN forward-rows slice — one fused
    k-wide launch of A_kᵀ·G_k — and a psum over the shard axis
    assembles ``Σ_k A_kᵀ·G_k = Aᵀ·G``. Returns the replicated
    (ncols, k) result. Together with ``spmm_sell_sharded`` this is the
    VJP pair for distributed training on the Pallas path.

    The escape hatches stay SYMMETRIC with the forward: compat mode and
    ``SMVP_SELL_SPMM=0`` run per-column launches (compat on the dense
    one-hot kernel), so a toolchain workaround applied to the forward
    is never silently dropped from the backward.
    """
    import os as _os

    k = int(G.shape[1])
    compat = _os.environ.get("SMVP_SELL_COMPAT") == "1"
    reduce2 = _reduce2_default(sh_t)
    prefetch = _os.environ.get("SMVP_SELL_PREFETCH") != "0"
    nowindow = _os.environ.get("SMVP_SELL_NOWINDOW") == "1"
    if compat or _os.environ.get("SMVP_SELL_SPMM") == "0":
        group = 1  # per-column; compat rides the dense one-hot kernel
    else:
        group = _spmm_group(
            sh_t.NSl, sh_t.CT, jnp.dtype(sh_t.vals.dtype).itemsize
        )
    outs = [
        _spmm_sell_sharded_t(sh_t, G[:, g0:g0 + group], mesh, reduce2,
                             prefetch, nowindow, compat)
        for g0 in range(0, k, group)
    ]
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@partial(
    jax.jit,
    static_argnames=("mesh", "reduce2", "prefetch", "nowindow", "compat"),
)
def _spmm_sell_sharded_t(
    sh_t: ShardedSell, G: jax.Array, mesh: Mesh, reduce2: bool,
    prefetch: bool, nowindow: bool, compat: bool = False,
) -> jax.Array:
    from smvp_toolkit_tpu.ops.spmv_pallas import (
        _RESIDENT_X_LIMIT,
        pack_columns,
        unpack_columns,
    )

    kg = G.shape[1]
    rows_blk = sh_t.rows_per_shard  # forward row split = G slice width
    ncols_pad = sh_t.CT * LANES  # transpose x side covers rows_blk
    G = G.astype(sh_t.vals.dtype)
    rows_full = sh_t.n_shards * rows_blk
    if G.shape[0] < rows_full:
        G = jnp.pad(G, ((0, rows_full - G.shape[0]), (0, 0)))
    resident = sh_t.CT * LANES * G.dtype.itemsize * kg <= _RESIDENT_X_LIMIT
    precision = jax.lax.Precision.HIGHEST  # HIGH unsupported on v5e
    interpret = _use_interpret()
    n_chunks = sh_t.S // sh_t.chunk

    def local(vals, lidx, rel, slc, tbase, g_full):
        idx = jax.lax.axis_index(DP_AXIS)
        gk = jax.lax.dynamic_slice(
            g_full, (idx * rows_blk, jnp.zeros((), jnp.int32)),
            (rows_blk, kg),
        )
        if gk.shape[0] < ncols_pad:
            gk = jnp.pad(gk, ((0, ncols_pad - gk.shape[0]), (0, 0)))
        x_tiles = pack_columns(gk, sh_t.CT, kg)
        y = _sell_spmv_call(
            x_tiles,
            vals[0],
            lidx[0],
            rel[0],
            slc[0],
            tbase[0],
            n_chunks=n_chunks,
            chunk=sh_t.chunk,
            ns=sh_t.NSl,
            nsw=(
                sh_t.NSl
                if sh_t.slice_window <= 0 or nowindow
                else sh_t.slice_window
            ),
            wt=sh_t.WT,
            interpret=interpret,
            precision=precision,
            resident=resident,
            onehot_dense=compat,
            reduce2=reduce2,
            prefetch=prefetch,
            k=kg,
        )  # (NSl, kg*LANES) — partial sum for this shard's rows of A
        return jax.lax.psum(y, DP_AXIS)

    y = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(DP_AXIS),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )(sh_t.vals, sh_t.lidx, sh_t.rel_tile, sh_t.slice_of, sh_t.tile_base, G)
    return unpack_columns(y, sh_t.NSl, kg)[: sh_t.shape[0]]


def differentiable_spmm_sharded(sh: ShardedSell, sh_t: ShardedSell,
                                mesh: Mesh):
    """A jax-differentiable ``f(X) = A·X`` on the sharded Pallas path.

    The Pallas kernel carries no AD rules, so the linear-map cotangent
    ``Aᵀ·G`` is supplied explicitly via the transpose-shard operator
    (``shard_sell_transpose`` + psum). Drops into the ``spmm=`` seam of
    :func:`smvp_toolkit_tpu.models.graph.gcn_train_step` as
    ``spmm=lambda m, X: f(X)`` — the distributed GCN training step then
    aggregates on the fused SELL kernel in BOTH directions.
    """

    @jax.custom_vjp
    def f(X):
        return spmm_sell_sharded(sh, X, mesh)

    def fwd(X):
        return spmm_sell_sharded(sh, X, mesh), None

    def bwd(_, G):
        return (spmm_sell_sharded_t(sh_t, G, mesh),)

    f.defvjp(fwd, bwd)
    return f
