"""MMS convergence-order tests: the discretization must converge at the
theoretical rate (SURVEY 4: the reference lacked these; they are the
core of this framework's test pyramid)."""

import numpy as np
import pytest

from pdebench_tpu.oracle import OracleSolver

S = OracleSolver()


def _poisson(res, degree):
    return {
        "pde": {
            "type": "poisson",
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"},
        },
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": res, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": degree},
        "bc": {"dirichlet": {"on": "all", "value": "0"}},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 40, "ny": 40}},
        "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-11},
    }


@pytest.mark.parametrize("degree,expected_rate", [(1, 2.0), (2, 3.0)])
def test_poisson_convergence_rate(degree, expected_rate):
    errs = []
    for res in (8, 16, 32):
        errs.append(S.solve(_poisson(res, degree)).baseline_error)
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    # grid-sampled L2 rate: allow 0.4 of slack on the asymptotic order
    assert min(rates) > expected_rate - 0.4, (errs, rates)


def test_elasticity_convergence_rate():
    errs = []
    for res in (8, 16, 32):
        cfg = {
            "pde": {
                "type": "linear_elasticity",
                "pde_params": {"E": 1.0, "nu": 0.3},
                "manufactured_solution": {
                    "u": ["sin(pi*x)*sin(pi*y)", "sin(pi*x)*cos(pi*y)"]
                },
            },
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": res, "cell_type": "triangle"},
            "fem": {"family": "Lagrange", "degree": 1},
            "bc": {"dirichlet": {"on": "all", "value": ["0", "0"]}},
            "output": {
                "field": "displacement_magnitude",
                "grid": {"bbox": [0, 1, 0, 1], "nx": 40, "ny": 40},
            },
            "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi",
                              "rtol": 1e-11},
        }
        errs.append(S.solve(cfg).baseline_error)
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 1.6, (errs, rates)


def test_heat_spatial_convergence():
    """Fix dt tiny; error should drop ~4x per mesh refinement (P1)."""
    errs = []
    for res in (8, 16, 32):
        cfg = {
            "pde": {
                "type": "heat",
                "time": {"t0": 0.0, "t_end": 0.01, "dt": 0.00125},
                "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
            },
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": res, "cell_type": "triangle"},
            "fem": {"family": "Lagrange", "degree": 1},
            "bc": {"dirichlet": {"on": "all", "value": "0"}},
            "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 40, "ny": 40}},
            "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi",
                              "rtol": 1e-11},
        }
        errs.append(S.solve(cfg).baseline_error)
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(rates) > 1.5, (errs, rates)


def test_stokes_velocity_convergence():
    errs = []
    for res in (8, 16):
        cfg = {
            "pde": {
                "type": "stokes",
                "pde_params": {"nu": 1.0},
                "manufactured_solution": {
                    "u": ["pi*cos(pi*y)*sin(pi*x)", "-pi*cos(pi*x)*sin(pi*y)"],
                    "p": "cos(pi*x)*cos(pi*y)",
                },
            },
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": res, "cell_type": "triangle"},
            "fem": {"degree_u": 2, "degree_p": 1},
            "bc": {"dirichlet": {"on": "all", "value": ["0", "0"]}},
            "output": {
                "field": "velocity_magnitude",
                "grid": {"bbox": [0, 1, 0, 1], "nx": 40, "ny": 40},
            },
            "oracle_solver": {"ksp_type": "preonly", "pc_type": "lu",
                              "rtol": 1e-10, "pressure_fixing": "point"},
        }
        errs.append(S.solve(cfg).baseline_error)
    # P2 velocity: ~8x per refinement
    assert errs[1] < 0.25 * errs[0], errs
