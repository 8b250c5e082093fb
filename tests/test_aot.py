"""AOT export/serve tests (utils/aot.py, jax.export round trips)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from smvp_toolkit_tpu.formats.coo import COOMatrix
from smvp_toolkit_tpu.formats.csr import csr_encode
from smvp_toolkit_tpu.formats.tjds import tjds_encode
from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.utils.aot import (
    export_program,
    export_spmv,
    import_program,
    load_program,
    save_program,
)

from conftest import SAMPLE_DIR


def _coo():
    return read_mtx(os.path.join(SAMPLE_DIR, "curtis54.mtx")).pad(128)


def test_export_spmv_csr_round_trip():
    coo = _coo()
    csr = csr_encode(coo)
    blob = export_spmv(csr)
    call = import_program(blob)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(coo.shape[1]), jnp.float32)
    y = np.asarray(call(x))
    y_ref = coo.to_dense() @ np.asarray(x, np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_export_spmv_tjds_round_trip():
    coo = _coo()
    tj = tjds_encode(coo)
    blob = export_spmv(tj)
    x = jnp.ones((coo.shape[1],), jnp.float32)
    y = np.asarray(import_program(blob)(x))
    np.testing.assert_allclose(
        y, coo.to_dense().sum(axis=1), rtol=1e-4, atol=1e-5
    )


def test_export_solver_program(tmp_path):
    """A whole CG solve exports as one program (solver loop included)."""
    from smvp_toolkit_tpu.models import conjugate_gradient

    rng = np.random.RandomState(1)
    n = 24
    a = np.zeros((n, n))
    for _ in range(3 * n):
        i, j = rng.randint(0, n, 2)
        w = rng.rand()
        a[i, j] += w
        a[j, i] += w
    a += np.diag(np.abs(a).sum(axis=1) + 1.0)
    r, c = np.nonzero(a)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), a[r, c], shape=(n, n),
        pad_to=64,
    )
    csr = csr_encode(coo)

    path = str(tmp_path / "cg.jaxexport")
    save_program(
        path,
        lambda b: conjugate_gradient(csr, b, num_iters=60)[0],
        jnp.zeros((n,), jnp.float32),
    )
    call = load_program(path)
    b = jnp.asarray(rng.randn(n), jnp.float32)
    x = np.asarray(call(b))
    np.testing.assert_allclose(
        x, np.linalg.solve(a, np.asarray(b, np.float64)),
        rtol=1e-3, atol=1e-4,
    )


def test_shape_mismatch_rejected():
    coo = _coo()
    blob = export_spmv(csr_encode(coo))
    call = import_program(blob)
    with pytest.raises(Exception):
        call(jnp.ones((coo.shape[1] + 1,), jnp.float32))


def test_serving_process_needs_only_jax(tmp_path):
    """The artifact runs in a process that never imports the framework."""
    coo = _coo()
    blob = export_spmv(csr_encode(coo))
    path = tmp_path / "spmv.jaxexport"
    path.write_bytes(blob)
    y_here = np.asarray(
        import_program(blob)(jnp.ones((coo.shape[1],), jnp.float32))
    )
    script = (
        "import sys, numpy as np\n"
        "import jax, jax.numpy as jnp\n"
        "from jax import export\n"
        f"blob = open({str(path)!r}, 'rb').read()\n"
        "call = export.deserialize(blob).call\n"
        f"y = np.asarray(call(jnp.ones(({coo.shape[1]},), jnp.float32)))\n"
        "np.save(sys.argv[1], y)\n"
    )
    out = tmp_path / "y.npy"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    subprocess.run(
        [sys.executable, "-c", script, str(out)],
        check=True,
        env=env,
        timeout=120,
    )
    np.testing.assert_allclose(np.load(out), y_here, rtol=1e-6, atol=1e-7)


def test_cli_export_aot_flag(tmp_path):
    """--export-aot writes a servable artifact per encoded format."""
    from smvp_toolkit_tpu.cli import main as cli_main

    prefix = str(tmp_path / "prog")
    rc = cli_main(
        [
            "-c", "-t", "-n", "1", "--no-report",
            "--export-aot", prefix,
            os.path.join(SAMPLE_DIR, "curtis54.mtx"),
        ]
    )
    assert rc == 0
    coo = _coo()
    x = jnp.ones((coo.shape[1],), jnp.float32)
    y_ref = coo.to_dense().sum(axis=1)
    for fmt in ("csr", "tjds"):
        y = np.asarray(load_program(f"{prefix}_{fmt}.jaxexport")(x))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_cli_export_aot_requires_alg():
    from smvp_toolkit_tpu.cli import main as cli_main

    rc = cli_main(
        ["-g", "--export-aot", "/tmp/x",
         os.path.join(SAMPLE_DIR, "curtis54.mtx")]
    )
    assert rc == 2


def test_export_spmv_complex_signature():
    """Complex matrices bake a complex input signature (servable)."""
    import io as _io

    from smvp_toolkit_tpu.io.mtx import read_mtx as _read

    text = (
        "%%MatrixMarket matrix coordinate complex general\n"
        "2 2 2\n1 1 1.0 2.0\n2 2 3.0 -1.0\n"
    )
    coo = _read(_io.StringIO(text)).pad(8)
    blob = export_spmv(csr_encode(coo))
    call = import_program(blob)
    x = jnp.asarray([1 + 1j, 2 - 1j], jnp.complex64)
    y = np.asarray(call(x))
    np.testing.assert_allclose(
        y, coo.to_dense(dtype=np.complex128) @ np.asarray(x),
        rtol=1e-5, atol=1e-6,
    )


def test_export_preconditioned_solver_program(tmp_path):
    """The FULL preconditioned solve — IC(0) trisolve sweeps inside
    pcg_precond — exports as one framework-free program (factors baked
    in as constants), with on-device tol early stop included."""
    from smvp_toolkit_tpu.models import ic0_preconditioner, pcg_precond
    from smvp_toolkit_tpu.ops.ilu import ic0

    nx = 6
    n = nx * nx
    a = np.zeros((n, n))
    for i in range(nx):
        for j in range(nx):
            k = i * nx + j
            a[k, k] = 4.0
            if i > 0:
                a[k, k - nx] = a[k - nx, k] = -1.0
            if j > 0:
                a[k, k - 1] = a[k - 1, k] = -1.0
    r, c = np.nonzero(a)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32), a[r, c], shape=(n, n),
        pad_to=64,
    )
    csr = csr_encode(coo)
    m = ic0_preconditioner(ic0(csr), sweeps=4)

    path = str(tmp_path / "pcg_ic0.jaxexport")
    save_program(
        path,
        lambda b: pcg_precond(csr, b, m, num_iters=40, tol=1e-6)[0],
        jnp.zeros((n,), jnp.float32),
    )
    call = load_program(path)
    rng = np.random.RandomState(2)
    b = jnp.asarray(rng.randn(n), jnp.float32)
    x = np.asarray(call(b))
    np.testing.assert_allclose(
        x, np.linalg.solve(a, np.asarray(b, np.float64)),
        rtol=1e-3, atol=1e-4,
    )


def test_export_amg_solver_program(tmp_path):
    """The AMG V-cycle-preconditioned solve — multilevel operators and
    the dense coarse inverse baked in as constants — exports as one
    framework-free program with on-device tol early stop."""
    from smvp_toolkit_tpu.models import amg_preconditioner, pcg_precond

    from conftest import poisson2d

    a = poisson2d(12)
    n = a.shape[0]
    r, c = np.nonzero(a)
    coo = COOMatrix.from_numpy(
        r.astype(np.int32), c.astype(np.int32),
        a[r, c].astype(np.float32), shape=(n, n), pad_to=64,
    )
    csr = csr_encode(coo)
    m = amg_preconditioner(csr, coarse_size=32)

    path = str(tmp_path / "pcg_amg.jaxexport")
    save_program(
        path,
        lambda b: pcg_precond(csr, b, m, num_iters=30, tol=1e-6)[0],
        jnp.zeros((n,), jnp.float32),
    )
    call = load_program(path)
    rng = np.random.RandomState(3)
    b = jnp.asarray(rng.randn(n), jnp.float32)
    x = np.asarray(call(b))
    np.testing.assert_allclose(
        x, np.linalg.solve(a, np.asarray(b, np.float64)),
        rtol=1e-3, atol=1e-4,
    )


def test_export_gcn_inference_program(tmp_path):
    """GCN inference exports as one framework-free program: normalized
    adjacency, trained weights and the SpMM aggregation all baked in;
    only the feature block crosses the boundary."""
    import jax

    from smvp_toolkit_tpu.models.graph import gcn_forward, gcn_init, gcn_norm

    rng = np.random.RandomState(5)
    n = 60
    r = rng.randint(0, n, 240).astype(np.int32)
    c = rng.randint(0, n, 240).astype(np.int32)
    coo = COOMatrix.from_numpy(
        r, c, np.ones(240, np.float32), shape=(n, n), pad_to=64,
    )
    s = gcn_norm(coo)
    params = gcn_init(jax.random.PRNGKey(0), [4, 8, 3])

    path = str(tmp_path / "gcn.jaxexport")
    save_program(
        path,
        lambda h: gcn_forward(s, params, h),
        jnp.zeros((n, 4), jnp.float32),
    )
    call = load_program(path)
    h = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(call(h)), np.asarray(gcn_forward(s, params, h)),
        rtol=1e-5, atol=1e-6,
    )
