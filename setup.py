"""Build hook: compile the native fast-path libraries at install time.

``pip install -e .`` (or a wheel build) runs ``make -C
smvp_toolkit_tpu/native`` so a fresh checkout gets the C++ fast paths
(planner, encoders, SpMV, IO, ILU, AMG) without a manual step. The
libraries are optional at runtime — every caller falls back to
numpy/XLA — so a missing compiler degrades gracefully with a warning
instead of failing the install (``SMVP_NO_NATIVE_BUILD=1`` skips the
attempt entirely).
"""

import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        sys.path.insert(0, ".")
        from smvp_toolkit_tpu.native import ensure_native

        missing, out = ensure_native(verbose=True)
        if missing:
            print(
                "WARNING: native libraries not built "
                f"({', '.join(missing)}); runtime falls back to "
                "numpy/XLA paths",
                file=sys.stderr,
            )
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
