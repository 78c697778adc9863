"""Developer tools (reference ``pyamg/_tools``)."""

from pyamg_tpu._tools._tester import PytestTester

__all__ = ["PytestTester"]
