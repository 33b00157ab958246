"""Unit tests for the FEM core: quadrature, meshes, dof maps, assembly."""

import math

import numpy as np
import pytest

from pdebench_tpu.fem import assemble, mesh as meshmod, refelem, sampling, spaces


class TestQuadrature:
    @pytest.mark.parametrize("qd", [1, 2, 3, 4, 6, 8])
    def test_triangle_monomial_exactness(self, qd):
        pts, w = refelem.quadrature("triangle", qd)
        for a in range(qd + 1):
            for b in range(qd + 1 - a):
                exact = (
                    math.factorial(a)
                    * math.factorial(b)
                    / math.factorial(a + b + 2)
                )
                approx = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b)
                assert abs(approx - exact) < 1e-12

    @pytest.mark.parametrize("qd", [2, 4, 6])
    def test_tet_monomial_exactness(self, qd):
        pts, w = refelem.quadrature("tetrahedron", qd)
        for a in range(qd + 1):
            for b in range(qd + 1 - a):
                for c in range(qd + 1 - a - b):
                    exact = (
                        math.factorial(a)
                        * math.factorial(b)
                        * math.factorial(c)
                        / math.factorial(a + b + c + 3)
                    )
                    approx = np.sum(
                        w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c
                    )
                    assert abs(approx - exact) < 1e-12

    def test_quad_rule(self):
        pts, w = refelem.quadrature("quadrilateral", 4)
        assert abs(np.sum(w) - 1.0) < 1e-14
        assert abs(np.sum(w * pts[:, 0] ** 4) - 0.2) < 1e-14


class TestBasis:
    @pytest.mark.parametrize(
        "ct,p",
        [
            ("triangle", 1), ("triangle", 2), ("triangle", 3), ("triangle", 4),
            ("tetrahedron", 1), ("tetrahedron", 2),
            ("quadrilateral", 1), ("quadrilateral", 2),
        ],
    )
    def test_nodal_and_partition_of_unity(self, ct, p):
        layout = refelem.lagrange_layout(ct, p)
        phi, dphi = refelem.tabulate(ct, p, layout.points)
        assert np.allclose(phi, np.eye(layout.n_nodes), atol=1e-10)
        rng = np.random.default_rng(0)
        pts = rng.random((7, refelem.cell_dim(ct))) * 0.3
        phi, dphi = refelem.tabulate(ct, p, pts)
        assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-12)
        assert np.allclose(dphi.sum(axis=1), 0.0, atol=1e-10)


class TestMesh:
    def test_unit_square_counts(self):
        m = meshmod.unit_square_mesh(4)
        assert m.n_vertices == 25
        assert m.n_cells == 32
        assert abs(m.cell_volumes().sum() - 1.0) < 1e-14

    def test_unit_cube_counts(self):
        m = meshmod.unit_cube_mesh(3)
        assert m.n_vertices == 64
        assert m.n_cells == 6 * 27
        assert abs(m.cell_volumes().sum() - 1.0) < 1e-13

    def test_boundary_vertices_square(self):
        m = meshmod.unit_square_mesh(4)
        bv = m.boundary_vertices()
        assert len(bv) == 16
        on_bdy = np.any(
            (np.abs(m.coords[bv]) < 1e-14) | (np.abs(m.coords[bv] - 1) < 1e-14),
            axis=1,
        )
        assert on_bdy.all()


class TestSpaces:
    @pytest.mark.parametrize("p,exp", [(1, 25), (2, 81), (3, 169)])
    def test_p_dof_counts_square(self, p, exp):
        # structured n=4 square: (pn+1)^2 dofs for Pp
        m = meshmod.unit_square_mesh(4)
        V = spaces.FunctionSpace(m, p)
        assert V.n_scalar_dofs == exp

    def test_p2_cube_dof_count(self):
        m = meshmod.unit_cube_mesh(2)
        V = spaces.FunctionSpace(m, 2)
        assert V.n_scalar_dofs == 125  # (2n+1)^3

    def test_dof_coords_interpolation(self):
        # nodal interpolation of a P2 polynomial must be exact
        m = meshmod.unit_square_mesh(3)
        V = spaces.FunctionSpace(m, 2)
        f = lambda x: 2 * x[:, 0] ** 2 - x[:, 0] * x[:, 1] + 3 * x[:, 1]
        u = f(V.dof_coords)
        pts = np.random.default_rng(1).random((50, 2))
        loc = sampling.locate_points(m, pts)
        assert loc.found.all()
        vals = sampling.eval_function(V, u, loc)
        assert np.allclose(vals, f(pts), atol=1e-12)

    def test_boundary_dofs_sides(self):
        m = meshmod.unit_square_mesh(4)
        V = spaces.FunctionSpace(m, 2)
        all_b = V.boundary_dofs_on("all")
        assert len(all_b) == 4 * (2 * 4)  # 32 boundary nodes for P2, n=4
        x0 = V.boundary_dofs_on("x0")
        assert np.allclose(V.dof_coords[x0, 0], 0.0)
        assert len(x0) == 9

    def test_periodic_identification(self):
        m = meshmod.rectangle_mesh(4, 4, (0, 1, 0, 1))
        m.periodic = (0.0, 1.0, 0.0, 1.0)
        V = spaces.FunctionSpace(m, 1)
        assert V.n_scalar_dofs == 16  # 4x4 torus

    def test_vector_space_blocked(self):
        m = meshmod.unit_square_mesh(2)
        V = spaces.vector_space(m, 1)
        assert V.ndof == 2 * V.n_scalar_dofs
        assert V.dofmap.shape == (m.n_cells, 6)


class TestAssembly:
    def test_stiffness_vs_dense_reference(self):
        """P1 stiffness on one reference triangle has a known closed form."""
        m = meshmod.Mesh(
            "triangle",
            np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
            np.array([[0, 1, 2]], dtype=np.int32),
        )
        cb = assemble.cell_batch(m, 1)
        K = np.asarray(assemble.local_stiffness(cb))[0]
        K_exact = 0.5 * np.array(
            [[2.0, -1.0, -1.0], [-1.0, 1.0, 0.0], [-1.0, 0.0, 1.0]]
        )
        assert np.allclose(K, K_exact, atol=1e-13)

    def test_mass_matrix_total(self):
        m = meshmod.unit_square_mesh(5)
        cb = assemble.cell_batch(m, 2)
        V = spaces.FunctionSpace(m, 2)
        M = assemble.local_mass(cb)
        ones = np.ones(V.ndof)
        op = assemble.LocalOperator(M, V.dofmap_scalar, V.ndof)
        total = float(np.sum(np.asarray(op(ones))))
        assert abs(total - 1.0) < 1e-12  # integral of 1 over unit square

    def test_operator_matches_scipy(self):
        m = meshmod.unit_square_mesh(4)
        V = spaces.FunctionSpace(m, 1)
        cb = assemble.cell_batch(m, 1)
        K = assemble.local_stiffness(cb)
        op = assemble.LocalOperator(K, V.dofmap_scalar, V.ndof)
        A = op.to_scipy()
        rng = np.random.default_rng(2)
        v = rng.random(V.ndof)
        assert np.allclose(np.asarray(op(v)), A @ v, atol=1e-12)

    def test_quadrilateral_stiffness(self):
        m = meshmod.unit_square_mesh(4, cell_type="quadrilateral")
        V = spaces.FunctionSpace(m, 1)
        cb = assemble.cell_batch(m, 1)
        K = assemble.local_stiffness(cb)
        op = assemble.LocalOperator(K, V.dofmap_scalar, V.ndof)
        # stiffness applied to a linear function = 0 in interior rows
        u = V.dof_coords[:, 0] + 2 * V.dof_coords[:, 1]
        y = np.asarray(op(u))
        interior = np.setdiff1d(
            np.arange(V.ndof), V.boundary_scalar_dofs
        )
        assert np.allclose(y[interior], 0.0, atol=1e-12)


class TestSampling:
    def test_grid_conventions_2d(self):
        m = meshmod.unit_square_mesh(8)
        V = spaces.FunctionSpace(m, 1)
        u = V.dof_coords[:, 0]  # u(x, y) = x
        grid = {"bbox": [0, 1, 0, 1], "nx": 5, "ny": 3}
        out = sampling.sample_on_grid(V, u, grid)
        assert out.shape == (3, 5)
        # result[j, i] = u(x_i, y_j) = x_i
        assert np.allclose(out[0], np.linspace(0, 1, 5), atol=1e-12)
        assert np.allclose(out[:, 2], 0.5, atol=1e-12)

    def test_out_of_domain_nan(self):
        m = meshmod.unit_square_mesh(4)
        V = spaces.FunctionSpace(m, 1)
        u = np.ones(V.ndof)
        grid = {"bbox": [-1, 2, -1, 2], "nx": 7, "ny": 7}
        out = sampling.sample_on_grid(V, u, grid)
        assert np.isnan(out[0, 0])
        assert np.isfinite(out[3, 3])

    def test_3d_grid_shape(self):
        m = meshmod.unit_cube_mesh(4)
        V = spaces.FunctionSpace(m, 1)
        u = V.dof_coords[:, 2]  # u = z
        grid = {"bbox": [0, 1, 0, 1, 0, 1], "nx": 4, "ny": 5, "nz": 6}
        out = sampling.sample_on_grid(V, u, grid)
        assert out.shape == (6, 5, 4)
        assert np.allclose(out[:, 0, 0], np.linspace(0, 1, 6), atol=1e-12)


class TestHostSideAssembly:
    """Setup-path assembly must stay on the HOST (numpy): on the axon
    remote-TPU platform every eager device op is a round trip, and the
    round-2 wave regression (11.6s -> 1.84s after the fix) came from
    eager jnp geometry/assembly in setup. Traced operands must still
    promote to jnp so in-scan per-step assembly (burgers, Newton) keeps
    working."""

    def test_cell_batch_is_numpy(self):
        m = meshmod.unit_square_mesh(8)
        cb = assemble.cell_batch(m, 2)
        for name in ("phi", "dphi", "d2phi", "qw", "qpts", "invJ", "detJ"):
            assert isinstance(
                getattr(cb, name), np.ndarray
            ), f"cb.{name} left the host"
        assert isinstance(cb.wdetJ, np.ndarray)
        assert isinstance(cb.grad_phys(), np.ndarray)
        assert isinstance(cb.laplace_phys(), np.ndarray)

    def test_local_kernels_host_for_host_operands(self):
        m = meshmod.unit_square_mesh(6)
        cb = assemble.cell_batch(m, 1)
        K = assemble.local_stiffness(cb)
        M = assemble.local_mass(cb)
        assert isinstance(K, np.ndarray) and isinstance(M, np.ndarray)
        # row sums of the stiffness local batch vanish (constants are
        # in the kernel) — sanity that the numpy path assembles the
        # same weak form
        assert np.abs(K.sum(axis=2)).max() < 1e-12

    def test_local_kernels_promote_for_traced_operands(self):
        import jax
        import jax.numpy as jnp

        m = meshmod.unit_square_mesh(6)
        cb = assemble.cell_batch(m, 1)
        beta = np.ones(cb.qpts.shape[:2] + (2,))
        C_np = assemble.local_advection(cb, beta)
        assert isinstance(C_np, np.ndarray)

        def f(b):
            return assemble.local_advection(cb, b)

        C_tr = jax.jit(f)(jnp.asarray(beta))
        assert isinstance(C_tr, jax.Array)
        np.testing.assert_allclose(
            np.asarray(C_tr), C_np, rtol=1e-12, atol=1e-15
        )


class TestConstrainedLU:
    def test_matches_solve_direct_constrained(self):
        import scipy.sparse as sps

        from pdebench_tpu.solvers import direct as dm

        rng = np.random.default_rng(3)
        n = 60
        A = sps.random(n, n, density=0.15, random_state=7).tocsr()
        A = A + A.T + sps.eye(n) * (n / 2)
        mask = np.zeros(n, bool)
        mask[rng.choice(n, 12, replace=False)] = True
        g = rng.standard_normal(n)
        b = rng.standard_normal(n)

        x_ref = dm.solve_direct_constrained(A, b, mask, g)
        flu = dm.ConstrainedLU(A, mask)
        x = flu.solve(b, g)
        np.testing.assert_allclose(x, x_ref, rtol=1e-12, atol=1e-12)
        # repeated back-substitutions: same factorization, new rhs
        b2 = rng.standard_normal(n)
        x2 = flu.solve(b2, g)
        x2_ref = dm.solve_direct_constrained(A, b2, mask, g)
        np.testing.assert_allclose(x2, x2_ref, rtol=1e-12, atol=1e-12)

    def test_unmasked(self):
        import scipy.sparse as sps

        from pdebench_tpu.solvers import direct as dm

        rng = np.random.default_rng(5)
        n = 40
        A = sps.random(n, n, density=0.2, random_state=9).tocsr()
        A = A + A.T + sps.eye(n) * n
        b = rng.standard_normal(n)
        flu = dm.ConstrainedLU(A)
        np.testing.assert_allclose(
            flu.solve(b), dm.solve_direct_constrained(A, b),
            rtol=1e-12, atol=1e-12,
        )


class TestAffineFastPath:
    """The affine-host GEMM assembly (assemble.affine_host) must match
    the generic einsum path to reassociation precision — the fast path
    is the production setup route for every simplex mesh (135x on 3-D
    P2 stiffness, round-5 microbench)."""

    @staticmethod
    def _einsum_cb(cb):
        # jax-typed geometry disables the affine-host fast path, forcing
        # the original einsum formulation on identical data
        import dataclasses
        import jax.numpy as jnp

        return dataclasses.replace(
            cb,
            invJ=jnp.asarray(cb.invJ),
            detJ=jnp.asarray(cb.detJ),
        )

    @pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 2)])
    def test_stiffness_and_advection_match(self, dim, deg):
        m = (
            meshmod.unit_square_mesh(6)
            if dim == 2
            else meshmod.unit_cube_mesh(3)
        )
        cb = assemble.cell_batch(m, deg)
        cbj = self._einsum_cb(cb)
        assert cb.affine_host() is not None
        assert cbj.affine_host() is None
        rng = np.random.default_rng(7)
        coef = rng.random((cb.n_cells, len(np.asarray(cb.qw))))
        beta = rng.standard_normal(
            (cb.n_cells, len(np.asarray(cb.qw)), dim)
        )
        tau = rng.random(cb.n_cells)
        for a, b in [
            (assemble.local_stiffness(cb), assemble.local_stiffness(cbj)),
            (
                assemble.local_stiffness(cb, coef),
                assemble.local_stiffness(cbj, coef),
            ),
            (
                assemble.local_advection(cb, beta),
                assemble.local_advection(cbj, beta),
            ),
            (
                assemble.local_supg(cb, beta, tau, 0.3),
                assemble.local_supg(cbj, beta, tau, 0.3),
            ),
        ]:
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-300)
            assert np.abs(a - b).max() / scale < 1e-12

    @pytest.mark.parametrize("dim", [2, 3])
    def test_vector_kernels_match(self, dim):
        m = (
            meshmod.unit_square_mesh(5)
            if dim == 2
            else meshmod.unit_cube_mesh(3)
        )
        cb = assemble.cell_batch(m, 2)
        cbj = self._einsum_cb(cb)
        rng = np.random.default_rng(3)
        nq = len(np.asarray(cb.qw))
        # (c, nq) field constant across q — exercises the _cellwise
        # collapse (the kernel contract is scalars or (c, nq) fields)
        mu_c = np.repeat(
            (rng.random(cb.n_cells) + 0.5)[:, None], nq, axis=1
        )
        psi = rng.standard_normal((nq, 3))
        pairs = [
            (
                assemble.local_elasticity(cb, 1.3, 0.7),
                assemble.local_elasticity(cbj, 1.3, 0.7),
            ),
            (  # per-cell coefficient arrays
                assemble.local_elasticity(cb, mu_c, 2.0 * mu_c),
                assemble.local_elasticity(cbj, mu_c, 2.0 * mu_c),
            ),
            (
                assemble.local_divergence(cb, psi),
                assemble.local_divergence(cbj, psi),
            ),
        ]
        for a, b in pairs:
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-300)
            assert np.abs(a - b).max() / scale < 1e-12
