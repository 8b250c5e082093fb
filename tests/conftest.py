"""Test harness configuration.

Tests run on CPU with 8 virtual devices
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4 implications).

This environment may inject a remote-TPU ("axon") JAX plugin via
``PYTHONPATH`` sitecustomize that routes *every* XLA compile through a
network tunnel (~95 s session setup — measured). For a CPU-only unit-test
run that is pure overhead, so before JAX initializes we re-exec the
interpreter once with the plugin path stripped and CPU platform forced.
Set ``SMVP_TESTS_NO_REEXEC=1`` to disable (e.g. to run tests against the
real backend).
"""

from __future__ import annotations

import os
import sys

_AXON_SITE = "/root/.axon_site"


def _needs_reexec() -> bool:
    if os.environ.get("SMVP_TESTS_REEXECED") == "1":
        return False
    if os.environ.get("SMVP_TESTS_NO_REEXEC") == "1":
        return False
    if "jax" in sys.modules:  # too late to change platforms safely
        return False
    paths = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    return any(os.path.normpath(p) == _AXON_SITE for p in paths if p)


if _needs_reexec():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.normpath(p) != _AXON_SITE
    )
    env["SMVP_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

# Direct path (no axon plugin on PYTHONPATH, or re-exec disabled): still
# force CPU + 8 virtual devices before JAX initializes.
if "jax" not in sys.modules:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SAMPLE_DIR = "/root/reference/sample-data"

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
