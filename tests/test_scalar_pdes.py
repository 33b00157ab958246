"""MMS regression tests for the scalar PDE oracles at small resolutions.

Each test checks the solver reproduces its manufactured solution to the
discretization-error level expected at the given mesh/degree/dt, the
same acceptance logic the benchmark gate uses (rel-L2 vs analytic grid).
"""

import numpy as np
import pytest

from pdebench_tpu.oracle import OracleSolver


def _grid(n=32):
    return {"bbox": [0, 1, 0, 1], "nx": n, "ny": n}


def _case(pde, mesh_res=24, degree=1, bc_value="0.0", solver=None, **extra):
    cfg = {
        "pde": pde,
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": mesh_res, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": degree},
        "bc": {"dirichlet": {"on": "all", "value": bc_value}},
        "output": {"format": "npz", "field": "scalar", "grid": _grid()},
        "oracle_solver": solver
        or {"ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-10, "atol": 1e-12},
    }
    cfg.update(extra)
    return cfg


S = OracleSolver()


def test_heat_mms():
    cfg = _case(
        {
            "type": "heat",
            "coefficients": {"kappa": {"type": "constant", "value": 1.0}},
            "time": {"t0": 0.0, "t_end": 0.1, "dt": 0.01},
            "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
        }
    )
    r = S.solve(cfg)
    assert r.baseline_error < 5e-3
    assert r.reference.shape == (32, 32)
    assert np.isfinite(r.reference).all()


def test_heat_convergence_in_dt():
    errs = []
    for dt in (0.02, 0.01):
        cfg = _case(
            {
                "type": "heat",
                "time": {"t0": 0.0, "t_end": 0.2, "dt": dt},
                "manufactured_solution": {"u": "exp(-2*t)*sin(pi*x)*sin(pi*y)"},
            },
            mesh_res=48,
            degree=2,
        )
        errs.append(S.solve(cfg).baseline_error)
    # backward Euler is O(dt): halving dt should cut the error ~2x
    assert errs[1] < 0.7 * errs[0]


def test_wave_mms():
    cfg = _case(
        {
            "type": "wave",
            "pde_params": {"c": 1.0},
            "time": {"t0": 0.0, "t_end": 0.2, "dt": 0.005},
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)*cos(2*t)"},
        },
        mesh_res=24,
        degree=2,
    )
    r = S.solve(cfg)
    assert r.baseline_error < 5e-3


def test_helmholtz_mms():
    cfg = _case(
        {
            "type": "helmholtz",
            "pde_params": {"k": 5.0},
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"},
        },
        mesh_res=32,
        solver={"ksp_type": "gmres", "pc_type": "jacobi", "rtol": 1e-10},
    )
    r = S.solve(cfg)
    assert r.baseline_error < 1e-2


def test_convection_diffusion_supg():
    cfg = _case(
        {
            "type": "convection_diffusion",
            "pde_params": {
                "epsilon": 0.01,
                "beta": [10.0, 10.0],
                "stabilization": "supg",
            },
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"},
        },
        mesh_res=40,
        solver={
            "ksp_type": "gmres",
            "pc_type": "jacobi",
            "rtol": 1e-10,
            "stabilization": "supg",
            "upwind_parameter": 1.0,
        },
    )
    r = S.solve(cfg)
    assert r.baseline_error < 5e-3
    assert r.solver_info["stabilization"] == "supg"


def test_convection_diffusion_transient():
    cfg = _case(
        {
            "type": "convection_diffusion",
            "pde_params": {"epsilon": 0.1, "beta": [1.0, 0.5]},
            "time": {"t0": 0.0, "t_end": 0.1, "dt": 0.02},
            "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
        },
        mesh_res=24,
    )
    r = S.solve(cfg)
    assert r.baseline_error < 1e-2


@pytest.mark.parametrize(
    "reaction",
    [
        {"type": "linear", "alpha": 2.0},
        {"type": "cubic", "alpha": 1.0, "beta": 5.0},
        {"type": "allen_cahn", "lambda": 2.0},
        {"type": "logistic", "rho": 3.0},
    ],
)
def test_reaction_diffusion(reaction):
    cfg = _case(
        {
            "type": "reaction_diffusion",
            "pde_params": {"epsilon": 0.1, "reaction": reaction},
            "time": {"t0": 0.0, "t_end": 0.1, "dt": 0.02},
            "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
        },
        mesh_res=20,
    )
    r = S.solve(cfg)
    assert r.baseline_error < 2e-2


def test_burgers_semi_implicit():
    cfg = _case(
        {
            "type": "burgers",
            "pde_params": {"nu": 0.01},
            "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
        },
        mesh_res=24,
        degree=2,
        solver={"ksp_type": "gmres", "pc_type": "jacobi", "rtol": 1e-8},
    )
    r = S.solve(cfg)
    assert r.baseline_error < 2e-2


def test_complex_domain_poisson():
    cfg = {
        "pde": {
            "type": "poisson",
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"},
        },
        "domain": {
            "type": "l_shape",
            "geometry_params": {
                "vertices": [[0, 0], [1, 0], [1, 0.5], [0.5, 0.5], [0.5, 1], [0, 1]]
            },
        },
        "mesh": {"resolution": 32, "cell_type": "triangle"},
        "fem": {"family": "Lagrange", "degree": 1},
        "bc": {"dirichlet": {"on": "all", "value": "sin(pi*x)*sin(pi*y)"}},
        "output": {"format": "npz", "field": "scalar", "grid": _grid(40)},
        "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi", "rtol": 1e-10},
    }
    r = OracleSolver().solve(cfg)
    assert r.baseline_error < 5e-3
    # grid covers the full bbox -> cutout quadrant must be NaN-masked
    nanfrac = float(np.isnan(r.reference).mean())
    assert 0.15 < nanfrac < 0.35
