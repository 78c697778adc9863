"""Numpy-style pytest runner (reference ``pyamg/_tools/_tester.py:24``).

Usage::

    import pyamg_tpu
    pyamg_tpu.test()            # run the repo test suite
    pyamg_tpu.test('-k spmv')   # extra pytest args
"""

from __future__ import annotations

import os
import sys


class PytestTester:
    """Callable that invokes pytest on the repository ``tests/`` dir."""

    def __init__(self, module_name):
        self.module_name = module_name

    def __call__(self, extra_argv=None, verbose=False):
        import pytest

        pkg_dir = os.path.dirname(
            os.path.abspath(sys.modules[self.module_name].__file__))
        tests_dir = os.path.join(os.path.dirname(pkg_dir), "tests")
        args = ["-q"] if not verbose else ["-v"]
        if isinstance(extra_argv, str):
            args += extra_argv.split()
        elif extra_argv:
            args += list(extra_argv)
        args.append(tests_dir)
        return pytest.main(args) == 0
