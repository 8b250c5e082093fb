"""Every example script runs end to end — demos are the user-facing
onboarding surface and must not rot as the engine evolves."""

import glob
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMOS = sorted(glob.glob(os.path.join(_REPO, "examples", "*.py")))


@pytest.mark.parametrize(
    "demo", _DEMOS, ids=[os.path.basename(d) for d in _DEMOS]
)
def test_example_runs(demo):
    env = dict(os.environ, PYTHONPATH=_REPO, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, demo], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(demo)} failed:\n{proc.stderr[-2000:]}"
    )
    assert proc.stdout.strip(), "demo produced no output"
