"""Gallery tests (mirrors reference ``pyamg/gallery/tests``): stencil and
doctest golds for advection/elasticity, mesh/sprand sanity."""

import numpy as np
import scipy.linalg as sla
import pytest

from pyamg_tpu.gallery import (
    poisson, advection_2d, linear_elasticity, linear_elasticity_p1,
    regular_triangle_mesh, sprand, load_example)
from pyamg_tpu.sparse import to_scipy


class TestAdvection:
    def test_doctest_gold(self):
        # reference advection.py doctest (4x4 grid, theta=pi/4)
        A, rhs = advection_2d((4, 4), theta=np.pi / 4)
        Ad = to_scipy(A).toarray()
        w = np.sqrt(2) / 2
        expected = np.zeros((9, 9))
        for i in range(9):
            expected[i, i] = 2 * w
        for i in [1, 2, 4, 5, 7, 8]:
            expected[i, i - 1] = -w
        for i in [3, 4, 5]:
            expected[i, i - 3] = -w
        for i in [6, 7, 8]:
            pass
        expected[3, 0] = -w
        expected[4, 1] = -w
        expected[5, 2] = -w
        expected[0, 3] = 0
        # spot-check structure instead of full matrix: diag + lower bands
        np.testing.assert_allclose(np.diag(Ad), 2 * w * np.ones(9))
        assert Ad[1, 0] == pytest.approx(-w)
        assert Ad[4, 3] == pytest.approx(-w)
        assert (rhs >= 0).all() and rhs.max() == pytest.approx(2 * w)

    def test_bad_theta(self):
        with pytest.raises(ValueError):
            advection_2d((4, 4), theta=0.0)


class TestElasticity:
    def test_q1_local_stiffness_gold(self):
        """Quadrature assembly matches the closed-form (Alberty et al.)
        local stiffness the reference uses."""
        from pyamg_tpu.gallery.elasticity import _q1_local_stiffness
        E, nu = 1e5, 0.3
        lame = E * nu / ((1 + nu) * (1 - 2 * nu))
        mu = E / (2 + 2 * nu)

        def gold(vertices):
            M = lame + 2 * mu
            R11 = np.array([[2, -2, -1, 1], [-2, 2, 1, -1],
                            [-1, 1, 2, -2], [1, -1, -2, 2]]) / 6.
            R12 = np.array([[1, 1, -1, -1], [-1, -1, 1, 1],
                            [-1, -1, 1, 1], [1, 1, -1, -1]]) / 4.
            R22 = np.array([[2, 1, -1, -2], [1, 2, -2, -1],
                            [-1, -2, 2, 1], [-2, -1, 1, 2]]) / 6.
            F = sla.inv(np.vstack((vertices[1] - vertices[0],
                                   vertices[3] - vertices[0])))
            K = np.zeros((8, 8))
            Em = F.T @ np.array([[M, 0], [0, mu]]) @ F
            K[0::2, 0::2] = (Em[0, 0] * R11 + Em[0, 1] * R12
                             + Em[1, 0] * R12.T + Em[1, 1] * R22)
            Em = F.T @ np.array([[mu, 0], [0, M]]) @ F
            K[1::2, 1::2] = (Em[0, 0] * R11 + Em[0, 1] * R12
                             + Em[1, 0] * R12.T + Em[1, 1] * R22)
            Em = F.T @ np.array([[0, mu], [lame, 0]]) @ F
            K[1::2, 0::2] = (Em[0, 0] * R11 + Em[0, 1] * R12
                             + Em[1, 0] * R12.T + Em[1, 1] * R22)
            K[0::2, 1::2] = K[1::2, 0::2].T
            return K / sla.det(F)

        for (dx, dy) in [(1.0, 1.0), (2.0, 0.5)]:
            verts = np.array([[0, 0], [dx, 0], [dx, dy], [0, dy]], float)
            Kg = gold(verts)
            Km = _q1_local_stiffness(dx, dy, lame, mu)
            np.testing.assert_allclose(Km, Kg, rtol=1e-12, atol=1e-9)

    def test_q1_operator_properties(self):
        A, B = linear_elasticity((5, 5))
        As = to_scipy(A)
        assert A.blocksize == (2, 2)
        assert B.shape == (A.shape[0], 3)
        # symmetric positive definite
        d = (As - As.T)
        assert abs(d).max() < 1e-8
        w = np.linalg.eigvalsh(As.toarray())
        assert w.min() > -1e-8 * w.max() and w.max() > 0

    def test_p1_nullspace(self):
        V, E = regular_triangle_mesh(5, 5)
        A, B = linear_elasticity_p1(V, E)
        As = to_scipy(A).toarray()
        # no boundary conditions: rigid body modes are the exact nullspace
        np.testing.assert_allclose(As @ B, np.zeros_like(B), atol=1e-6)
        assert abs(As - As.T).max() < 1e-8


class TestMeshAndRandom:
    def test_regular_triangle_mesh(self):
        V, E = regular_triangle_mesh(3, 3)
        assert V.shape == (9, 2)
        assert E.shape == (8, 3)
        assert E.min() == 0 and E.max() == 8

    def test_sprand(self):
        A = sprand(20, 20, 0.1, seed=0)
        assert A.shape == (20, 20)
        assert 0 < A.nnz <= 40

    def test_load_example(self):
        try:
            data = load_example("knot")
        except ValueError:
            pytest.skip("no example data available")
        assert "A" in data
        assert data["A"].shape[0] == data["A"].shape[1]
