"""Debug dumps of encoded formats.

Parity with the reference's printf harness: ``smvp_csr_debug``
(main-cli.c:1166-1191, enabled by ``SMVP_CSR_DEBUG`` main-cli.c:10) and
the TJDS phase dumps behind ``SMVP_TJDS_DEBUG`` (main-cli.c:747-992).
Here: one function per format, enabled by the ``SMVP_DEBUG`` env var or
the CLI ``--debug`` flag, writing to any stream.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import CSRMatrix
from smvp_toolkit_tpu.formats.tjds import TJDSMatrix

__all__ = ["debug_enabled", "dump_coo", "dump_csr", "dump_tjds"]


def debug_enabled() -> bool:
    return os.environ.get("SMVP_DEBUG", "0") not in ("", "0", "false")


def _fmt(arr, limit=32) -> str:
    a = np.asarray(arr).reshape(-1)
    if len(a) <= limit:
        return np.array2string(a, max_line_width=100)
    head = np.array2string(a[: limit // 2], max_line_width=100)
    tail = np.array2string(a[-limit // 2 :], max_line_width=100)
    return f"{head} ... {tail} (len={len(a)})"


def dump_coo(coo: COOMatrix, file=None) -> None:
    file = file or sys.stderr
    print(f"[DEBUG]\tCOO {coo.shape} nnz={coo.nnz} (padded {coo.nnz_padded})",
          file=file)
    print(f"[DEBUG]\trows:  {_fmt(coo.rows[:coo.nnz])}", file=file)
    print(f"[DEBUG]\tcols:  {_fmt(coo.cols[:coo.nnz])}", file=file)
    print(f"[DEBUG]\tvals:  {_fmt(coo.vals[:coo.nnz])}", file=file)


def dump_csr(csr: CSRMatrix, file=None) -> None:
    """CSR dump: row_ptr / col_ind / val (smvp_csr_debug parity)."""
    file = file or sys.stderr
    print(f"[DEBUG]\tCSR {csr.shape} nnz={csr.nnz}", file=file)
    print(f"[DEBUG]\trow_ptr: {_fmt(csr.row_ptr)}", file=file)
    print(f"[DEBUG]\tcol_ind: {_fmt(csr.col_ind[:csr.nnz])}", file=file)
    print(f"[DEBUG]\tval:     {_fmt(csr.vals[:csr.nnz])}", file=file)


def dump_tjds(tjds: TJDSMatrix, file=None) -> None:
    """TJDS dump: packed arrays + per-diagonal segments (phase-dump parity)."""
    file = file or sys.stderr
    nd = int(tjds.num_diags)
    sp = np.asarray(tjds.start_pos)
    print(f"[DEBUG]\tTJDS {tjds.shape} nnz={tjds.nnz} diags={nd}", file=file)
    print(f"[DEBUG]\tperm:      {_fmt(tjds.perm)}", file=file)
    print(f"[DEBUG]\tstart_pos: {_fmt(sp[: nd + 1])}", file=file)
    print(f"[DEBUG]\trow_ind:   {_fmt(tjds.row_ind[:tjds.nnz])}", file=file)
    print(f"[DEBUG]\tval:       {_fmt(tjds.vals[:tjds.nnz])}", file=file)
    for d in range(min(nd, 8)):
        lo, hi = int(sp[d]), int(sp[d + 1])
        print(f"[DEBUG]\t  diag {d}: entries [{lo},{hi}) len={hi - lo}",
              file=file)
    if nd > 8:
        print(f"[DEBUG]\t  ... {nd - 8} more diagonals", file=file)
