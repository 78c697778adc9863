"""Classical (Ruge-Stuben) AMG and AIR (reference ``pyamg/classical``)."""

from pyamg_tpu.classical.classical import ruge_stuben_solver
from pyamg_tpu.classical import split
from pyamg_tpu.classical.interpolate import (
    direct_interpolation, classical_interpolation,
    injection_interpolation, one_point_interpolation, local_air)


def __getattr__(name):
    if name == "air_solver":
        from pyamg_tpu.classical.air import air_solver
        return air_solver
    if name == "CR":
        from pyamg_tpu.classical.cr import CR
        return CR
    if name == "binormalize":
        from pyamg_tpu.classical.cr import binormalize
        return binormalize
    raise AttributeError(name)


__all__ = [
    "ruge_stuben_solver", "split", "direct_interpolation",
    "classical_interpolation", "injection_interpolation",
    "one_point_interpolation", "local_air", "air_solver", "CR",
    "binormalize",
]
