"""Visualization emission tests (reference ``pyamg/vis/tests/test_vtu.py``
idiom: write files, check well-formed VTK XML)."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pyamg_tpu.gallery import regular_triangle_mesh, poisson
from pyamg_tpu.vis import write_vtu, write_basic_mesh, vis_splitting
from pyamg_tpu.vis.vis_coarse import vis_aggregate_groups


def _parse(path):
    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == "VTKFile"
    return root


def test_write_vtu_tri_mesh(tmp_path):
    V, E2V = regular_triangle_mesh(4, 4)
    f = tmp_path / "mesh.vtu"
    write_vtu(np.asarray(V), {5: np.asarray(E2V)}, fname=str(f))
    root = _parse(f)
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == V.shape[0]
    assert int(piece.get("NumberOfCells")) == E2V.shape[0]


def test_write_basic_mesh_with_data(tmp_path):
    V, E2V = regular_triangle_mesh(3, 3)
    pdata = np.arange(V.shape[0], dtype=float)[:, None]
    f = tmp_path / "basic.vtu"
    write_basic_mesh(np.asarray(V), np.asarray(E2V), mesh_type="tri",
                     pdata=pdata, fname=str(f))
    root = _parse(f)
    assert root.find(".//PointData") is not None


def test_vis_splitting(tmp_path):
    V = np.array([[x, y] for y in range(4) for x in range(4)], dtype=float)
    splitting = np.zeros(16, dtype=int)
    splitting[::2] = 1
    f = tmp_path / "split.vtu"
    vis_splitting(V, splitting, fname=str(f))
    # one file per (here: single) splitting column
    files = [p for p in os.listdir(tmp_path) if p.endswith(".vtu")]
    assert files


def test_vis_aggregate_groups(tmp_path):
    from pyamg_tpu.aggregation.aggregate import standard_aggregation
    V, E2V = regular_triangle_mesh(5, 5)
    A = poisson((25,))      # any operator with 25 rows
    AggOp, _ = standard_aggregation(A)
    f = tmp_path / "aggs.vtu"
    vis_aggregate_groups(np.asarray(V), np.asarray(E2V), AggOp, "tri",
                         fname=str(f))
    assert f.exists()
    _parse(f)
