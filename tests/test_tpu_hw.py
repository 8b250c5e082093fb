"""Hardware-gated compiled-mode tests (SMVP_TESTS_TPU=1 on a real TPU).

The CPU suite exercises the Pallas kernels in interpreter mode only;
these tests Mosaic-compile them. Run serially against the real chip:

    SMVP_TESTS_TPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_tpu_hw.py -q

Each test is also covered (with timing) by experiments/tpu_r2_session.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SMVP_TESTS_TPU") != "1",
    reason="hardware-gated (set SMVP_TESTS_TPU=1 on a TPU host)",
)


@pytest.fixture(scope="module")
def tpu_device():
    import jax

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        pytest.skip(f"no TPU attached (platform={dev.platform})")
    return dev


def _op(name, **kw):
    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo = read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    return coo, (r, c, v), SellSpMV(plan, interpret=False, **kw)


def _check(coo, trip, op, x, vdt=np.float32, tol=1e-5):
    import jax.numpy as jnp

    r, c, v = trip
    y = np.asarray(op(jnp.asarray(x))).astype(np.float64)
    y_ref = np.zeros(coo.shape[0])
    np.add.at(
        y_ref, r,
        np.asarray(v).astype(vdt).astype(np.float64)
        * x.astype(vdt)[c].astype(np.float64),
    )
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < tol


def test_compiled_f32_curtis54(tpu_device):
    coo, trip, op = _op("curtis54")
    x = np.random.default_rng(0).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, trip, op, x)


def test_compiled_f32_memplus(tpu_device):
    coo, trip, op = _op("memplus")
    x = np.random.default_rng(1).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, trip, op, x)


def test_compiled_bf16_memplus(tpu_device):
    import jax.numpy as jnp
    import ml_dtypes

    coo, trip, op = _op("memplus", value_dtype=jnp.bfloat16)
    x = np.random.default_rng(2).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, trip, op, x, vdt=ml_dtypes.bfloat16, tol=1e-6)


def test_compiled_reduce2_bf16_memplus(tpu_device, monkeypatch):
    """Double-bf16 2-pass reduce must stay lossless on the real MXU."""
    import jax.numpy as jnp
    import ml_dtypes

    coo, trip, op = _op("memplus", value_dtype=jnp.bfloat16)
    x = np.random.default_rng(3).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    monkeypatch.setenv("SMVP_SELL_REDUCE2", "1")
    _check(coo, trip, op, x, vdt=ml_dtypes.bfloat16, tol=1e-6)


def test_compiled_reduce2_f32_memplus(tpu_device, monkeypatch):
    """f32 + 2-pass ladder: ~16 mantissa bits per product (~1e-4 rel)."""
    coo, trip, op = _op("memplus")
    x = np.random.default_rng(4).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    monkeypatch.setenv("SMVP_SELL_REDUCE2", "1")
    _check(coo, trip, op, x, tol=5e-4)


def test_compiled_spmm_xla_memplus(tpu_device):
    import jax.numpy as jnp

    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.spmv_xla import spmm_csr

    coo = read_mtx("/root/reference/sample-data/memplus.mtx").pad(512)
    csr = csr_encode(coo)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((coo.shape[1], 16)).astype(np.float32)
    Y = np.asarray(spmm_csr(csr, jnp.asarray(X))).astype(np.float64)
    r, c, v = coo.to_numpy()
    Y_ref = np.zeros((coo.shape[0], 16))
    np.add.at(Y_ref, r, v[:, None].astype(np.float64) * X[c].astype(np.float64))
    scale = np.abs(Y_ref).max() + 1e-30
    assert np.abs(Y - Y_ref).max() / scale < 1e-5


def test_compiled_prefetch_windows_memplus(tpu_device, monkeypatch):
    """Scalar-prefetch x windows (the >VMEM-x path) compile and match."""
    import smvp_toolkit_tpu.ops.spmv_pallas as spp

    coo, trip, op = _op("memplus")
    x = np.random.default_rng(6).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    monkeypatch.setattr(spp, "_RESIDENT_X_LIMIT", -1)
    _check(coo, trip, op, x)


def test_compiled_windowed_reduce_banded(tpu_device):
    """v6 slice-windowed reduce (NSW < NS) compiles and stays exact."""
    from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(100_000, nnz_per_row=8, bandwidth=128,
                       seed=9).pad(512)
    r, c, v = coo.to_numpy()
    plan = build_sell_plan(r, c, v, coo.shape)
    sb, nsw = plan.reduce_window()
    assert nsw < plan.n_slices  # window engaged
    op = SellSpMV(plan, interpret=False)
    x = np.random.default_rng(10).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, (r, c, v), op, x)


def test_compiled_streamed_y_4m_rows(tpu_device):
    """v7 flush-behind: a 4M-row synth runs with y streamed block-by-
    block (prefetch-driven output index map) and matches the oracle."""
    from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(4_000_000, nnz_per_row=6, bandwidth=192,
                       seed=11).pad(512)
    r, c, v = coo.to_numpy()
    plan = build_streamed_sell_plan(r, c, v, coo.shape)
    assert plan.y_block_slices > 0
    assert plan.y_block_id.max() >= 60  # many blocks actually stream
    op = SellSpMV(plan, interpret=False)
    x = np.random.default_rng(12).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, (r, c, v), op, x)


def test_compiled_streamed_y_small_blocks(tpu_device):
    """Streamed-y with the minimum block size — cheap Mosaic canary for
    the data-dependent output index map before the 4M-row config."""
    from smvp_toolkit_tpu.ops.sell_plan import build_streamed_sell_plan
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV
    from smvp_toolkit_tpu.utils.synth import synth_banded

    coo = synth_banded(10_000, nnz_per_row=6, bandwidth=64, seed=13)
    r, c, v = coo.to_numpy()
    plan = build_streamed_sell_plan(r, c, v, coo.shape, chunk=256,
                                    y_block_rows=2048)
    assert plan.y_block_id.max() >= 3
    op = SellSpMV(plan, interpret=False)
    x = np.random.default_rng(14).standard_normal(coo.shape[1]).astype(
        np.float32
    )
    _check(coo, (r, c, v), op, x)


def test_compiled_vals_grad_memplus(tpu_device):
    """The packed-values backward kernel (transposed one-hot select via
    dot_general contracting dim 0) Mosaic-compiles and matches the
    dense cotangent g[row]*x[col] on live slots."""
    import jax.numpy as jnp

    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo = read_mtx("/root/reference/sample-data/memplus.mtx").pad(512)
    r, c, v = coo.to_numpy()
    op = SellSpMV.from_coo(coo, interpret=False)
    rng = np.random.default_rng(15)
    x = rng.standard_normal(coo.shape[1]).astype(np.float32)
    g = rng.standard_normal(coo.shape[0]).astype(np.float32)
    gp = np.asarray(op.vjp_vals(jnp.asarray(x), jnp.asarray(g)))
    got = gp.reshape(-1)[op.slot_map()]
    gv_ref = (
        g.astype(np.float64)[r[: coo.nnz]]
        * x.astype(np.float64)[c[: coo.nnz]]
    )
    scale = np.abs(gv_ref).max() + 1e-9
    assert np.abs(got - gv_ref).max() / scale < 1e-5


def test_compiled_differentiable_edges_curtis54(tpu_device):
    """End-to-end trainable-edge VJP (forward + d/dv + d/dx kernels, all
    Pallas) compiles on hardware; cheap canary-sized sample."""
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.ops.spmv_pallas import SellSpMV

    coo = read_mtx("/root/reference/sample-data/curtis54.mtx").pad(128)
    r, c, v = coo.to_numpy()
    op = SellSpMV.from_coo(coo, interpret=False)
    f = op.differentiable_edges()
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.standard_normal(coo.shape[1]).astype(np.float32))
    vj = jnp.asarray(v[: coo.nnz].astype(np.float32))
    gv, gx = jax.jit(jax.grad(
        lambda vv, xx: jnp.sum(f(vv, xx) ** 2), argnums=(0, 1)
    ))(vj, x)
    a = np.zeros(coo.shape, dtype=np.float64)
    np.add.at(a, (r[: coo.nnz], c[: coo.nnz]), v[: coo.nnz])
    g_out = 2 * (a @ np.asarray(x, np.float64))
    gv_ref = g_out[r[: coo.nnz]] * np.asarray(x, np.float64)[c[: coo.nnz]]
    gx_ref = a.T @ g_out
    assert np.abs(np.asarray(gv) - gv_ref).max() / (
        np.abs(gv_ref).max() + 1e-9
    ) < 1e-5
    assert np.abs(np.asarray(gx) - gx_ref).max() / (
        np.abs(gx_ref).max() + 1e-9
    ) < 1e-5


def test_compiled_ic0_precondition_apply(tpu_device):
    """Compiled-mode SELL trisolves inside the IC(0) preconditioner.

    The apply is a jitted composition of four SELL launches (2 sweeps x
    2 factors) plus VPU multiplies — Mosaic-compiles it end-to-end and
    checks against the host f64 trisolve chain.
    """
    import jax
    import jax.numpy as jnp

    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models import ic0_preconditioner
    from smvp_toolkit_tpu.ops.ilu import ic0
    from smvp_toolkit_tpu.ops.spmv_pallas import sell_op_csr

    nx = 16
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
        pad_to=512,
    )
    csr = csr_encode(coo)
    f = ic0(csr)
    sweeps = 2
    apply_m = jax.jit(
        ic0_preconditioner(f, sweeps=sweeps, op_builder=sell_op_csr)
    )
    rng = np.random.RandomState(0)
    rr = rng.randn(n).astype(np.float32)
    z = np.asarray(apply_m(jnp.asarray(rr))).astype(np.float64)

    # Host f64 reference of the truncated-Neumann chain.
    low = np.zeros((n, n))
    rp_h = np.asarray(f.strict.row_ptr)
    ci_h = np.asarray(f.strict.col_ind)
    v_h = np.asarray(f.strict.vals, np.float64)
    for i in range(n):
        for t in range(rp_h[i], rp_h[i + 1]):
            low[i, ci_h[t]] = v_h[t]
    d = np.asarray(f.diag, np.float64)

    def neumann(nmat, dd, rhs):
        zz = rhs / dd
        for _ in range(sweeps - 1):
            zz = (rhs - nmat @ zz) / dd
        return zz

    ref = neumann(low.T, d, neumann(low, d, rr.astype(np.float64)))
    assert np.abs(z - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-4


def test_compiled_fused_spmm_memplus(tpu_device):
    """The fused SpMM launch (k*128-lane select/gather/reduce) Mosaic-
    compiles and matches the per-column reference for a k above and
    below the group size."""
    import jax.numpy as jnp

    coo, trip, op = _op("memplus")
    rng = np.random.default_rng(7)
    r, c, v = trip
    for k in (6, 12):  # one launch; and groups of 8 + 4
        X = rng.standard_normal((coo.shape[1], k)).astype(np.float32)
        Y = np.asarray(op.matmat(jnp.asarray(X))).astype(np.float64)
        Y_ref = np.zeros((coo.shape[0], k))
        np.add.at(
            Y_ref, r, np.asarray(v)[:, None].astype(np.float64)
            * X[c].astype(np.float64),
        )
        scale = np.abs(Y_ref).max() + 1e-30
        assert np.abs(Y - Y_ref).max() / scale < 1e-5


def test_compiled_spmm_vals_grad_memplus(tpu_device):
    """The k-wide vals-grad kernel (SpMM edge cotangent) compiles and
    matches the sum of per-column SpMV cotangents."""
    import jax.numpy as jnp

    coo, trip, op = _op("memplus")
    rng = np.random.default_rng(8)
    k = 4
    X = jnp.asarray(
        rng.standard_normal((coo.shape[1], k)).astype(np.float32)
    )
    G = jnp.asarray(
        rng.standard_normal((coo.shape[0], k)).astype(np.float32)
    )
    got = np.asarray(op.vjp_vals_mat(X, G), np.float64)
    want = np.zeros_like(got)
    for j in range(k):
        want += np.asarray(op.vjp_vals(X[:, j], G[:, j]), np.float64)
    scale = np.abs(want).max() + 1e-30
    assert np.abs(got - want).max() / scale < 1e-5


def test_compiled_amg_vcycle_poisson(tpu_device):
    """The AMG V-cycle (SELL level operators + dense coarse inverse)
    Mosaic-compiles as one program and preconditions CG to a
    grid-independent count."""
    import jax.numpy as jnp

    from smvp_toolkit_tpu.formats.coo import COOMatrix
    from smvp_toolkit_tpu.formats.csr import csr_encode
    from smvp_toolkit_tpu.models import amg_preconditioner, pcg_precond
    from smvp_toolkit_tpu.ops.spmv_pallas import sell_op_csr

    import scipy.sparse as sp

    nx = 64
    n = nx * nx
    eye = sp.eye(nx)
    t = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (nx, nx))
    a = (sp.kron(eye, t) + sp.kron(t, eye)).tocoo()
    coo = COOMatrix.from_numpy(
        a.row.astype(np.int32), a.col.astype(np.int32),
        a.data.astype(np.float32), shape=(n, n), pad_to=128,
    )
    csr = csr_encode(coo)
    m = amg_preconditioner(csr, op_builder=sell_op_csr)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x, res = pcg_precond(csr, b, m, num_iters=30, tol=1e-6)
    rn = np.asarray(res)
    tgt = 1e-6 * np.linalg.norm(np.asarray(b))
    hit = np.nonzero(rn <= tgt)[0]
    assert hit.size and int(hit[0]) + 1 <= 15
    dense = np.asarray(a.todense())
    relres = np.linalg.norm(
        dense @ np.asarray(x, np.float64) - np.asarray(b)
    ) / np.linalg.norm(np.asarray(b))
    assert relres < 1e-5


def test_compiled_sell_under_shard_map_1chip(tpu_device):
    """The SELL kernel (SpMV and fused SpMM) under shard_map on a
    1-device mesh: validates the shard_map+Mosaic lowering interplay
    that plain pallas_call tests cannot."""
    import jax.numpy as jnp

    from smvp_toolkit_tpu.io.mtx import read_mtx
    from smvp_toolkit_tpu.parallel import (
        make_mesh,
        shard_sell,
        spmm_sell_sharded,
        spmv_sell_sharded,
    )

    coo = read_mtx("/root/reference/sample-data/curtis54.mtx").pad(128)
    mesh = make_mesh(1)
    sh = shard_sell(coo, mesh)
    rng = np.random.default_rng(10)
    x = rng.standard_normal(coo.shape[1]).astype(np.float32)
    y = np.asarray(spmv_sell_sharded(sh, jnp.asarray(x), mesh))
    r, c, v = coo.to_numpy()
    y_ref = np.zeros(coo.shape[0])
    np.add.at(y_ref, r, np.asarray(v, np.float64) * x[c])
    scale = np.abs(y_ref).max() + 1e-30
    assert np.abs(y - y_ref).max() / scale < 1e-5

    X = rng.standard_normal((coo.shape[1], 4)).astype(np.float32)
    Y = np.asarray(spmm_sell_sharded(sh, jnp.asarray(X), mesh))
    Y_ref = np.zeros((coo.shape[0], 4))
    np.add.at(Y_ref, r, np.asarray(v, np.float64)[:, None] * X[c])
    scale = np.abs(Y_ref).max() + 1e-30
    assert np.abs(Y - Y_ref).max() / scale < 1e-5
