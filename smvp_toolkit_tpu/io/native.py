"""ctypes binding to the C++ MatrixMarket fast-path parser.

The reference's data loader is the C mmio library (mmio/mmio.c) driven by a
per-line ``fscanf`` loop (main-cli.c:1426-1441). Our native equivalent is a
C++ shared library (``smvp_toolkit_tpu/native/mtxio.cpp``) that memory-maps
the file and tokenizes with a branch-light scanner, returning packed numpy
arrays — typically ~10x faster than the Python tokenizer on multi-MB files.

The Python parser (``smvp_toolkit_tpu.io.mtx``) remains the reference
implementation and the fallback when the shared library has not been built
(``make -C smvp_toolkit_tpu/native``).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from smvp_toolkit_tpu.io.mtx import MMTypeCode, MTXError, MTXPrematureEOF

__all__ = ["NativeUnavailable", "read_mtx_raw_native", "native_available"]


class NativeUnavailable(Exception):
    """The native parser library is not built or failed to load."""


_LIB_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_CANDIDATES = [
    os.path.join(_HERE, "..", "native", "libmtxio.so"),
    os.path.join(_HERE, "..", "native", "build", "libmtxio.so"),
]

# Error codes shared with mtxio.cpp (mirroring mmio.h:76-83 codes).
_OK = 0
_ERR_OPEN = 1
_ERR_NO_HEADER = 2
_ERR_PREMATURE_EOF = 3
_ERR_UNSUPPORTED = 4
_ERR_BAD_DATA = 5

_FIELD_REAL = 0
_FIELD_INTEGER = 1
_FIELD_PATTERN = 2
_FIELD_COMPLEX = 3
_FIELDS = ("real", "integer", "pattern", "complex")

_SYM_GENERAL = 0
_SYM_SYMMETRIC = 1
_SYM_SKEW = 2
_SYM_HERMITIAN = 3
_SYMS = ("general", "symmetric", "skew-symmetric", "hermitian")


def _load() -> ctypes.CDLL:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_FAILED:
            raise NativeUnavailable("libmtxio.so previously failed to load")
        for cand in _CANDIDATES:
            path = os.path.abspath(cand)
            if os.path.exists(path):
                try:
                    lib = ctypes.CDLL(path)
                except OSError as e:  # pragma: no cover
                    _LIB_FAILED = True
                    raise NativeUnavailable(str(e))
                lib.mtx_read_header.restype = ctypes.c_int
                lib.mtx_read_header.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_longlong),  # rows
                    ctypes.POINTER(ctypes.c_longlong),  # cols
                    ctypes.POINTER(ctypes.c_longlong),  # nnz
                    ctypes.POINTER(ctypes.c_int),  # field
                    ctypes.POINTER(ctypes.c_int),  # symmetry
                ]
                lib.mtx_read_coo.restype = ctypes.c_int
                lib.mtx_read_coo.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_longlong,  # nnz
                    ctypes.c_int,  # field
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ]
                _LIB = lib
                return lib
        _LIB_FAILED = True
        raise NativeUnavailable("libmtxio.so not found; run make -C native")


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def read_mtx_raw_native(path: str):
    """Native-parser equivalent of :func:`smvp_toolkit_tpu.io.mtx.read_mtx_raw`.

    Only handles coordinate real/integer/pattern files (the hot cases); raises
    :class:`NativeUnavailable` otherwise so callers fall back to Python.
    """
    lib = _load()
    rows = ctypes.c_longlong()
    cols = ctypes.c_longlong()
    nnz = ctypes.c_longlong()
    field = ctypes.c_int()
    sym = ctypes.c_int()
    rc = lib.mtx_read_header(
        path.encode(),
        ctypes.byref(rows),
        ctypes.byref(cols),
        ctypes.byref(nnz),
        ctypes.byref(field),
        ctypes.byref(sym),
    )
    if rc == _ERR_UNSUPPORTED:
        # Array format / complex field: punt to the Python parser.
        raise NativeUnavailable("format not handled by native parser")
    if rc == _ERR_OPEN:
        raise MTXError(f"could not open {path!r}")
    if rc == _ERR_NO_HEADER:
        from smvp_toolkit_tpu.io.mtx import MTXNoHeader

        raise MTXNoHeader(f"{path!r}: missing %%MatrixMarket banner")
    if rc == _ERR_PREMATURE_EOF:
        raise MTXPrematureEOF(f"{path!r}: truncated header")
    if rc != _OK:
        raise MTXError(f"{path!r}: native parser error {rc}")

    n = int(nnz.value)
    r = np.empty(n, dtype=np.int32)
    c = np.empty(n, dtype=np.int32)
    v = np.empty(n, dtype=np.float64)
    rc = lib.mtx_read_coo(path.encode(), n, field.value, r, c, v)
    if rc == _ERR_PREMATURE_EOF:
        raise MTXPrematureEOF(f"{path!r}: fewer than {n} entries")
    if rc == _ERR_BAD_DATA:
        raise MTXError(f"{path!r}: malformed coordinate data")
    if rc != _OK:
        raise MTXError(f"{path!r}: native parser error {rc}")

    typecode = MMTypeCode(
        "matrix", "coordinate", _FIELDS[field.value], _SYMS[sym.value]
    )
    nr, nc = int(rows.value), int(cols.value)
    if n and (
        r.min() < 0 or int(r.max()) >= nr or c.min() < 0 or int(c.max()) >= nc
    ):
        raise MTXError("coordinate index out of declared bounds")
    return typecode, nr, nc, r, c, v
