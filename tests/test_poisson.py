"""End-to-end Poisson oracle tests: MMS accuracy, convergence order,
variable coefficients, 3-D, quads, and solver-option paths."""

import numpy as np
import pytest

from pdebench_tpu.oracle import OracleSolver
from pdebench_tpu.oracle.types import compute_rel_L2_grid


def poisson_case(
    resolution=32,
    degree=1,
    cell_type="triangle",
    domain="unit_square",
    kappa=None,
    ksp="cg",
    pc="jacobi",
):
    u = "sin(pi*x)*sin(pi*y)"
    f = "2.0*pi**2*sin(pi*x)*sin(pi*y)"
    grid = {"bbox": [0, 1, 0, 1], "nx": 50, "ny": 50}
    if domain == "unit_cube":
        u = "sin(pi*x)*sin(pi*y)*sin(pi*z)"
        f = "3.0*pi**2*sin(pi*x)*sin(pi*y)*sin(pi*z)"
        grid = {"bbox": [0, 1, 0, 1, 0, 1], "nx": 16, "ny": 16, "nz": 16}
    cfg = {
        "pde": {
            "type": "poisson",
            "coefficients": {"kappa": kappa or {"type": "constant", "value": 1.0}},
            "source_term": f,
            "manufactured_solution": {"u": u},
        },
        "domain": {"type": domain},
        "mesh": {"resolution": resolution, "cell_type": cell_type},
        "fem": {"family": "Lagrange", "degree": degree},
        "bc": {"dirichlet": {"on": "all", "value": u}},
        "output": {"format": "npz", "field": "scalar", "grid": grid},
        "oracle_solver": {"ksp_type": ksp, "pc_type": pc, "rtol": 1e-10},
    }
    return cfg


class TestPoisson:
    def test_mms_p1(self):
        res = OracleSolver().solve(poisson_case(resolution=32, degree=1))
        assert res.reference.shape == (50, 50)
        assert np.isfinite(res.reference).all()
        assert res.baseline_error < 5e-3
        assert res.num_dofs == 33 * 33

    def test_mms_p2_more_accurate(self):
        res = OracleSolver().solve(poisson_case(resolution=24, degree=2))
        assert res.baseline_error < 1e-4

    def test_convergence_order_p1(self):
        errs = [
            OracleSolver().solve(poisson_case(resolution=n)).baseline_error
            for n in (8, 16, 32)
        ]
        rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
        assert all(r > 1.7 for r in rates), (errs, rates)

    def test_variable_kappa(self):
        # u = sin(pi x) sin(pi y), kappa = 1 + 0.5 x y;
        # f = -div(kappa grad u) derived symbolically by the solver
        import sympy as sp

        from pdebench_tpu.fem import symbolic

        u = "sin(pi*x)*sin(pi*y)"
        kappa = "1 + 0.5*x*y"
        f = str(symbolic.poisson_source(u, kappa, 2))
        cfg = poisson_case(resolution=32)
        cfg["pde"]["coefficients"]["kappa"] = {"type": "expr", "expr": kappa}
        cfg["pde"]["source_term"] = f
        res = OracleSolver().solve(cfg)
        assert res.baseline_error < 5e-3

    def test_3d_p1(self):
        res = OracleSolver().solve(
            poisson_case(resolution=12, domain="unit_cube")
        )
        assert res.reference.shape == (16, 16, 16)
        assert res.baseline_error < 4e-2  # O(h^2) at h=1/12

    def test_quadrilateral_cells(self):
        res = OracleSolver().solve(
            poisson_case(resolution=32, cell_type="quadrilateral")
        )
        assert res.baseline_error < 5e-3

    def test_direct_solver_path(self):
        # structured preonly/lu reroutes through the stencil-GMG IR at
        # direct-class tolerance (the Stokes preonly/lu policy extended
        # to scalar lattices — helmholtz_3d_k6_high's 185k host LU was
        # ~30 min of fill on the 1-core host); residual must be in the
        # direct-solve class and the literal LU stays reachable by env
        res = OracleSolver().solve(
            poisson_case(resolution=16, ksp="preonly", pc="lu")
        )
        assert res.solver_info["direct_rerouted"] == "stencil-ir"
        assert res.solver_info["residual"] < 1e-9
        assert res.baseline_error < 2e-2

    def test_direct_solver_path_forced(self, monkeypatch):
        monkeypatch.setenv("PDEBENCH_TPU_STRUCTURED_LU", "direct")
        res = OracleSolver().solve(
            poisson_case(resolution=16, ksp="preonly", pc="lu")
        )
        assert res.solver_info["method"] == "lu"
        assert res.baseline_error < 2e-2

    def test_reference_config_fallback(self):
        # non-MMS case: error vs a finer re-solve
        cfg = poisson_case(resolution=16)
        del cfg["pde"]["manufactured_solution"]
        cfg["pde"]["source_term"] = "1.0"
        cfg["bc"]["dirichlet"]["value"] = "0.0"
        cfg["reference_config"] = {
            "mesh": {"resolution": 32, "cell_type": "triangle"},
            "fem": {"family": "Lagrange", "degree": 2},
        }
        res = OracleSolver().solve(cfg)
        assert 0 < res.baseline_error < 3e-2

    def test_iterative_info(self):
        res = OracleSolver().solve(poisson_case(resolution=16))
        assert res.solver_info["method"] == "cg"
        assert res.solver_info["iterations"] > 4
        assert res.baseline_time > 0
