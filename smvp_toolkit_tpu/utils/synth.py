"""Synthetic sparse-matrix generators (benchmark + test inputs).

BASELINE.json's multi-host config names a "synthetic 10M-nnz matrix";
these generators produce reproducible banded / uniform / power-law
patterns at any scale without shipping large files.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from smvp_toolkit_tpu.formats.coo import COOMatrix

__all__ = ["synth_banded", "synth_uniform", "synth_powerlaw"]


def synth_banded(
    n: int, nnz_per_row: int = 9, bandwidth: int = 64, seed: int = 0,
    dtype=None,
) -> COOMatrix:
    """Banded SPD-ish pattern: entries within ±bandwidth of the diagonal."""
    rng = np.random.RandomState(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    offs = rng.randint(-bandwidth, bandwidth + 1, size=len(rows))
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.randn(len(rows))
    return _dedup(rows, cols, vals, (n, n), dtype)


def synth_uniform(
    nrows: int, ncols: int, nnz: int, seed: int = 0, dtype=None
) -> COOMatrix:
    """Uniformly scattered pattern (worst-case locality)."""
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, nrows, size=nnz).astype(np.int64)
    cols = rng.randint(0, ncols, size=nnz).astype(np.int64)
    vals = rng.randn(nnz)
    return _dedup(rows, cols, vals, (nrows, ncols), dtype)


def synth_powerlaw(
    n: int, nnz: int, alpha: float = 1.5, seed: int = 0, dtype=None
) -> COOMatrix:
    """Power-law column popularity (hub columns, e.g. circuit/web graphs)."""
    rng = np.random.RandomState(seed)
    popularity = (np.arange(1, n + 1, dtype=np.float64)) ** (-alpha)
    popularity /= popularity.sum()
    rows = rng.randint(0, n, size=nnz).astype(np.int64)
    cols = rng.choice(n, size=nnz, p=popularity).astype(np.int64)
    vals = rng.randn(nnz)
    return _dedup(rows, cols, vals, (n, n), dtype)


def _dedup(rows, cols, vals, shape: Tuple[int, int], dtype) -> COOMatrix:
    """Drop duplicate (row, col) pairs (keep first) and sort row-major."""
    key = rows * shape[1] + cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    keep = np.ones(len(key_s), dtype=bool)
    keep[1:] = key_s[1:] != key_s[:-1]
    sel = order[keep]
    return COOMatrix.from_numpy(
        rows[sel].astype(np.int32),
        cols[sel].astype(np.int32),
        vals[sel],
        shape=shape,
        dtype=dtype,
    )


def parse_synth_spec(spec: str):
    """Parse ``synth:N:NNZ`` into a banded COO matrix.

    Shared by the CLI and the distributed launch runner so the spec
    grammar and its error behavior stay in one place. Raises ValueError
    with a user-readable message on a malformed spec.
    """
    parts = spec.split(":")
    if len(parts) != 3 or parts[0] != "synth":
        raise ValueError(f"bad synth spec (want synth:N:NNZ): {spec!r}")
    try:
        n, nnz = int(parts[1]), int(parts[2])
    except ValueError:
        raise ValueError(
            f"bad synth spec (want synth:N:NNZ): {spec!r}"
        ) from None
    if n < 1 or nnz < 0:
        raise ValueError(f"bad synth spec (non-positive sizes): {spec!r}")
    return synth_banded(n, nnz_per_row=max(nnz // n, 1))
