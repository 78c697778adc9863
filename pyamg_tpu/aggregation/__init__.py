"""Aggregation-based AMG (reference ``pyamg/aggregation``)."""

from pyamg_tpu.aggregation.aggregation import smoothed_aggregation_solver
from pyamg_tpu.aggregation.aggregate import (
    standard_aggregation, naive_aggregation, pairwise_aggregation,
    lloyd_aggregation, balanced_lloyd_aggregation, metis_aggregation)
from pyamg_tpu.aggregation.tentative import fit_candidates
from pyamg_tpu.aggregation.smooth import (
    jacobi_prolongation_smoother, richardson_prolongation_smoother)


def __getattr__(name):
    if name == "rootnode_solver":
        from pyamg_tpu.aggregation.rootnode import rootnode_solver
        return rootnode_solver
    if name == "adaptive_sa_solver":
        from pyamg_tpu.aggregation.adaptive import adaptive_sa_solver
        return adaptive_sa_solver
    if name == "pairwise_solver":
        from pyamg_tpu.aggregation.pairwise import pairwise_solver
        return pairwise_solver
    if name == "energy_prolongation_smoother":
        from pyamg_tpu.aggregation.energy import energy_prolongation_smoother
        return energy_prolongation_smoother
    raise AttributeError(name)


__all__ = [
    "smoothed_aggregation_solver", "standard_aggregation",
    "naive_aggregation", "pairwise_aggregation", "lloyd_aggregation",
    "balanced_lloyd_aggregation", "metis_aggregation", "fit_candidates",
    "jacobi_prolongation_smoother", "richardson_prolongation_smoother",
]
