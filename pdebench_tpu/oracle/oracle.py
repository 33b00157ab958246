"""Oracle dispatcher: case pde type -> TPU-native solver.

Parity: pdebench/oracle/oracle.py:27-98 (OracleSolver.solve dispatch over
12 PDE types and three backend libraries). This rebuild has one primary
backend — the JAX FEM core ("jax", default) — plus an out-of-process C++
backend ("cpp") mirroring the reference's deal.II binary contract.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Optional

from .types import OracleResult

_SOLVERS = {
    "poisson": ("poisson", "PoissonSolver"),
    "heat": ("heat", "HeatSolver"),
    "wave": ("wave", "WaveSolver"),
    "helmholtz": ("helmholtz", "HelmholtzSolver"),
    "convection_diffusion": ("convection_diffusion", "ConvectionDiffusionSolver"),
    "reaction_diffusion": ("reaction_diffusion", "ReactionDiffusionSolver"),
    "burgers": ("burgers", "BurgersSolver"),
    "linear_elasticity": ("linear_elasticity", "LinearElasticitySolver"),
    "biharmonic": ("biharmonic", "BiharmonicSolver"),
    "stokes": ("stokes", "StokesSolver"),
    "navier_stokes": ("navier_stokes", "NavierStokesSolver"),
    "darcy": ("darcy", "DarcySolver"),
    # north-star nonlinear configs beyond the reference's 12 types
    "hyperelasticity": ("hyperelasticity", "HyperelasticitySolver"),
    "cahn_hilliard": ("cahn_hilliard", "CahnHilliardSolver"),
}


class OracleSolver:
    """Ground-truth solver front-end.

    `solver_library` is accepted for interface parity with the reference
    driver; "jax" (default), "dolfinx"/"firedrake" aliases, and "cpp"
    (native out-of-process backend) are recognized.
    """

    def solve(
        self,
        oracle_config: Dict[str, Any],
        solver_library: str = "jax",
        use_docker: bool = False,  # interface parity; no containers needed
        docker_image: Optional[str] = None,
    ) -> OracleResult:
        del use_docker, docker_image
        lib = (solver_library or "jax").lower()
        if lib == "cpp":
            from .cpp_backend import solve_via_cpp

            return solve_via_cpp(oracle_config)

        pde_type = oracle_config["pde"]["type"]
        if pde_type not in _SOLVERS:
            raise ValueError(f"unsupported pde type: {pde_type}")
        mod_name, cls_name = _SOLVERS[pde_type]
        mod = importlib.import_module(f".{mod_name}", package=__package__)
        solver = getattr(mod, cls_name)()
        return solver.solve(oracle_config)
