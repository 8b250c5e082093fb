"""True multi-process distributed tests (SURVEY.md §4 multi-process plan).

Spawns two real OS processes that form a jax.distributed process group
over localhost (CPU backend, one device each) and run the
``parallel.launch`` benchmark runner on a reference matrix. This
exercises the ``jax.distributed.initialize`` bootstrap in
``parallel/mesh.py`` — which single-process virtual-device tests cannot
reach — plus cross-process sharding, the in-shard-map ordered all_gather,
and replicated-output addressability.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

from conftest import SAMPLE_DIR

CURTIS = os.path.join(SAMPLE_DIR, "curtis54.mtx")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_group(alg: str, nproc: int = 2, timeout: int = 180):
    port = _free_port()
    env = dict(os.environ)
    # Plain CPU backend, one local device per process; strip any remote
    # plugin and the virtual-device flag the in-process suite uses.
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = []
    for pid in range(nproc):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "smvp_toolkit_tpu.parallel.launch",
                    CURTIS,
                    "--alg",
                    alg,
                    "-n",
                    "2",
                    "--coordinator",
                    f"127.0.0.1:{port}",
                    "--num-processes",
                    str(nproc),
                    "--process-id",
                    str(pid),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    return outs


@pytest.mark.parametrize("alg", ["csr", "tjds"])
def test_two_process_group(alg):
    outs = _spawn_group(alg)
    checksums = []
    for rc, out in outs:
        assert rc == 0, f"launch runner failed:\n{out}"
        m = re.search(r"y checksum \[process (\d+)\]: ([-\d.eE+]+)", out)
        assert m, f"no checksum in output:\n{out}"
        checksums.append(float(m.group(2)))
    # Replicated y must agree bit-for-bit across the process group, and
    # curtis54 is a pattern matrix with x = ones: sum(y) == nnz.
    assert checksums[0] == checksums[1]
    assert checksums[0] == pytest.approx(291.0)
    # The group really had 2 processes x 1 device.
    assert any("2 process(es), 2 device(s)" in out for _, out in outs)
