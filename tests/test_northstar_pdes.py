"""Tests for the north-star nonlinear configs beyond the reference's 12
PDE types: hyperelasticity (autodiff Newton-Krylov) and Cahn-Hilliard
(coupled phase-field)."""

import numpy as np

from pdebench_tpu.oracle import OracleSolver

S = OracleSolver()


def test_hyperelasticity_small_strain_matches_linear():
    """With a tiny body force, neo-Hookean reduces to linear elasticity."""
    scale = 1e-3
    common = {
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 12, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": 1},
        "bc": {"dirichlet": {"on": "all", "value": ["0", "0"]}},
        "output": {
            "format": "npz",
            "field": "displacement_magnitude",
            "grid": {"bbox": [0, 1, 0, 1], "nx": 24, "ny": 24},
        },
        "oracle_solver": {"rtol": 1e-10, "atol": 1e-13, "max_it": 30},
    }
    hyper = dict(common)
    hyper["pde"] = {
        "type": "hyperelasticity",
        "pde_params": {"E": 10.0, "nu": 0.3},
        "body_force": [f"{scale}*sin(pi*x)*sin(pi*y)", "0"],
    }
    linear = dict(common)
    linear["pde"] = {
        "type": "linear_elasticity",
        "pde_params": {"E": 10.0, "nu": 0.3},
        "source_term": [f"{scale}*sin(pi*x)*sin(pi*y)", "0"],
    }
    rh = S.solve(hyper)
    rl = S.solve(linear)
    assert rh.solver_info["method"].startswith("newton")
    m = np.isfinite(rh.reference) & np.isfinite(rl.reference)
    num = np.linalg.norm(rh.reference[m] - rl.reference[m])
    den = np.linalg.norm(rl.reference[m])
    assert num / den < 2e-2, num / den  # finite-strain correction is O(eps)


def test_hyperelasticity_stretch_converges():
    """Large imposed stretch: Newton must converge to a finite state."""
    cfg = {
        "pde": {
            "type": "hyperelasticity",
            "pde_params": {"E": 1.0, "nu": 0.3},
            "body_force": ["0", "0"],
        },
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 10, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": 1},
        "bc": {
            "dirichlet": [
                {"on": "x0", "value": ["0", "0"]},
                {"on": "x1", "value": ["0.2", "0"]},
            ]
        },
        "output": {
            "field": "displacement_magnitude",
            "grid": {"bbox": [0, 1, 0, 1], "nx": 20, "ny": 20},
        },
        "oracle_solver": {"rtol": 1e-9, "max_it": 40},
    }
    r = S.solve(cfg)
    assert np.isfinite(r.reference).all()
    assert r.solver_info["residual"] < 1e-6
    # displacement magnitude peaks at the pulled face
    assert abs(np.nanmax(r.reference) - 0.2) < 0.02


def test_cahn_hilliard_mass_conservation():
    cfg = {
        "pde": {
            "type": "cahn_hilliard",
            "pde_params": {"lambda": 1e-2, "M": 1.0},
            "time": {"t0": 0.0, "t_end": 5e-5, "dt": 5e-6},
            "initial_condition": "random",
            "seed": 3,
        },
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 16, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": 1},
        "bc": {},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 24, "ny": 24}},
        "oracle_solver": {"rtol": 1e-8},
    }
    r = S.solve(cfg)
    assert np.isfinite(r.reference).all()
    # zero-flux BCs conserve the mean concentration (~0.63 +- noise)
    assert abs(np.nanmean(r.reference) - 0.63) < 0.02
    # bounded (CH has no maximum principle; mild overshoot is physical)
    assert np.nanmin(r.reference) > -0.5 and np.nanmax(r.reference) < 1.5
    assert r.solver_info["residual"] < 1e-8
