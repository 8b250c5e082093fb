"""Roofline accounting: bytes moved per SpMV and HBM speed-of-light.

The north-star metric is fraction of per-chip HBM roofline
(BASELINE.json: SpMV ≥ 80% of HBM speed-of-light). SpMV is memory-bound
(≈0.1 FLOP/byte), so the roofline is bytes/iter ÷ HBM bandwidth.

Byte accounting follows BASELINE.md footnote 1 (~20 B/nnz for f64 CSR):
here parameterized by dtype — per nnz one value + one int32 index + one
x-gather; row_ptr/start_pos and the y write are amortized terms.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = [
    "hbm_bandwidth_gbs",
    "spmv_bytes_csr",
    "spmv_bytes_tjds",
    "roofline_fraction",
]

# Published per-chip HBM bandwidth (GB/s). Conservative public numbers.
# device_kind strings use both marketing names ("v5e") and internal
# forms ("TPU v5 lite"), so each generation needs both aliases.
_HBM_GBS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "v6 lite": 1640.0,
    "cpu": 50.0,  # nominal DRAM figure for CPU-simulated runs
}


def hbm_bandwidth_gbs(device=None) -> float:
    """Best-effort HBM speed-of-light for the attached device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM_GBS.items():
        if key in kind:
            return bw
    if device.platform == "cpu":
        return _HBM_GBS["cpu"]
    return _HBM_GBS["v5e"]


def _isz() -> int:
    return 4  # int32 indices throughout


def spmv_bytes_csr(nnz: int, nrows: int, value_bytes: int = 4) -> float:
    """Bytes touched per CSR SpMV iteration.

    val + col_ind + x-gather per nnz; row_ptr read + y write per row.
    """
    return nnz * (value_bytes + _isz() + value_bytes) + nrows * (
        _isz() + value_bytes
    )


def spmv_bytes_tjds(nnz: int, nrows: int, ndiags: int, value_bytes: int = 4) -> float:
    """Bytes touched per TJDS SpMV iteration.

    val + row_ind + x-stream per nnz; start_pos per diagonal; y write per
    row (the x permutation is a one-time encode cost, not per-iteration).
    """
    return (
        nnz * (value_bytes + _isz() + value_bytes)
        + (ndiags + 1) * _isz()
        + nrows * value_bytes
    )


def spmv_bytes_cisr(
    num_groups: int, slot_count: int, nrows: int, value_bytes: int = 4
) -> float:
    """Bytes touched per CISR-schedule SpMV iteration.

    Every beat×slot cell is read (val + col + row_of + x-gather),
    including the zero padding of idle channels — that traffic is the
    cost of the interleaved layout; y write per row. ``row_of`` is the
    kernel's reduction key (spmv_cisr.CisrSpMV streams it alongside the
    values), the analog of CSR's row_ptr read.
    """
    cells = num_groups * slot_count
    return (
        cells * (value_bytes + 2 * _isz() + value_bytes)
        + nrows * value_bytes
    )


def roofline_fraction(gbs: float, device=None) -> float:
    return gbs / hbm_bandwidth_gbs(device)
