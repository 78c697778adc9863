"""Runnable-docstring discipline (reference runs a dedicated docstrings
CI, ``.github/workflows/docstrings.yml``): execute the ``Examples``
blocks of key public entry points as doctests."""

import doctest

import pytest

MODULES = [
    "pyamg_tpu.gallery.laplacian",
    "pyamg_tpu.krylov.methods",
    "pyamg_tpu.aggregation.aggregation",
    "pyamg_tpu.classical.classical",
    "pyamg_tpu.aggregation.rootnode",
    "pyamg_tpu.blackbox",
]


@pytest.mark.parametrize("modname", MODULES)
def test_module_doctests(modname):
    import importlib
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, optionflags=doctest.ELLIPSIS
                              | doctest.NORMALIZE_WHITESPACE)
    assert results.attempted > 0, f"no doctests found in {modname}"
    assert results.failed == 0
