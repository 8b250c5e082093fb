"""Test harness configuration.

Tests run on CPU with 8 virtual devices
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4 implications).

This environment may inject a remote-TPU ("axon") JAX plugin via
``PYTHONPATH`` sitecustomize and set ``JAX_PLATFORMS=axon``; for CPU unit
tests we override the platform *in-process* before the first backend use
(``jax.config.update`` — works even though jaxtyping's pytest plugin has
already imported jax, because backends initialize lazily). Set
``SMVP_TESTS_TPU=1`` to run the suite against the default backend instead.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

if os.environ.get("SMVP_TESTS_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

SAMPLE_DIR = "/root/reference/sample-data"


def pytest_sessionstart(session):
    """Build the native fast-path libraries before collecting tests.

    A fresh checkout has no ``native/*.so``; round 4 shipped with 30+
    native tests silently skipping because nothing ran ``make``. Build
    here (a few seconds, once) and FAIL LOUDLY if anything is still
    missing — skip-on-missing now only covers deliberately disabled
    builds (``SMVP_NO_NATIVE_BUILD=1``).
    """
    from smvp_toolkit_tpu.native import ensure_native

    missing, out = ensure_native()
    if missing and os.environ.get("SMVP_NO_NATIVE_BUILD") != "1":
        raise pytest.UsageError(
            "native libraries missing after build attempt: "
            f"{', '.join(missing)}\n{out[-2000:]}"
        )

SAMPLES_SMALL = ["ibm32.mtx", "curtis54.mtx", "pdp08-pg4.mtx"]
SAMPLES_LARGE = ["memplus.mtx", "pwt.mtx"]
SAMPLES_ALL = SAMPLES_SMALL + SAMPLES_LARGE


@pytest.fixture(scope="session")
def sample_dir() -> str:
    return SAMPLE_DIR


def random_coo(
    rng: np.random.RandomState,
    nrows: int,
    ncols: int,
    nnz: int,
    *,
    allow_duplicates: bool = False,
    empty_rows: bool = True,
):
    """Random sparsity pattern for property tests (incl. empty rows/cols)."""
    if allow_duplicates:
        r = rng.randint(0, nrows, size=nnz)
        c = rng.randint(0, ncols, size=nnz)
    else:
        flat = rng.choice(nrows * ncols, size=min(nnz, nrows * ncols), replace=False)
        r, c = np.divmod(flat, ncols)
    if not empty_rows and nrows <= len(r):
        # Force each row to appear at least once.
        r[: nrows] = np.arange(nrows)
    v = rng.randn(len(r))
    return r.astype(np.int32), c.astype(np.int32), v


def poisson2d(nx: int) -> "np.ndarray":
    """Dense 5-point 2-D Dirichlet Laplacian (SPD, cond ~ nx²) — the
    shared SPD fixture for preconditioner/eigensolver tests."""
    import scipy.sparse as sp

    eye = sp.eye(nx)
    t = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (nx, nx))
    return np.asarray((sp.kron(eye, t) + sp.kron(t, eye)).todense())
