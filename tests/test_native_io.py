"""Native C++ parser tests: bit-identical to the Python parser, error paths.

Skipped when libmtxio.so has not been built (make -C smvp_toolkit_tpu/native).
"""

import os

import numpy as np
import pytest

from smvp_toolkit_tpu.io import native
from smvp_toolkit_tpu.io.mtx import MTXPrematureEOF, read_mtx_raw

from conftest import SAMPLE_DIR, SAMPLES_ALL

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="libmtxio.so not built"
)


@pytest.mark.parametrize("name", SAMPLES_ALL)
def test_native_matches_python(name):
    path = os.path.join(SAMPLE_DIR, name)
    tc_n, m_n, n_n, r_n, c_n, v_n = native.read_mtx_raw_native(path)
    tc_p, m_p, n_p, r_p, c_p, v_p = read_mtx_raw(path)
    assert str(tc_n) == str(tc_p)
    assert (m_n, n_n) == (m_p, n_p)
    np.testing.assert_array_equal(r_n, r_p)
    np.testing.assert_array_equal(c_n, c_p)
    # Bit-identical doubles (both use strtod-compatible parsing).
    np.testing.assert_array_equal(v_n.view(np.uint64), v_p.view(np.uint64))


def test_native_empty_file():
    with pytest.raises(MTXPrematureEOF):
        native.read_mtx_raw_native(os.path.join(SAMPLE_DIR, "badfile.mtx"))


def test_native_truncated(tmp_path):
    p = tmp_path / "trunc.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n3 3 5\n1 1 2.0\n")
    with pytest.raises(MTXPrematureEOF):
        native.read_mtx_raw_native(str(p))


def test_native_unsupported_falls_back(tmp_path):
    p = tmp_path / "arr.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")
    with pytest.raises(native.NativeUnavailable):
        native.read_mtx_raw_native(str(p))
    # read_mtx with use_native=True must silently fall back.
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo = read_mtx(str(p), use_native=True)
    assert coo.nnz == 4


def test_read_mtx_uses_native(tmp_path):
    from smvp_toolkit_tpu.io.mtx import read_mtx

    coo_n = read_mtx(os.path.join(SAMPLE_DIR, "curtis54.mtx"), use_native=True)
    coo_p = read_mtx(os.path.join(SAMPLE_DIR, "curtis54.mtx"), use_native=False)
    np.testing.assert_array_equal(
        np.asarray(coo_n.rows), np.asarray(coo_p.rows)
    )
    np.testing.assert_array_equal(
        np.asarray(coo_n.vals), np.asarray(coo_p.vals)
    )
