"""Darcy oracle: -div(kappa grad p) = f (elliptic pressure formulation).

Parity (reference: pdebench/oracle/darcy.py:128-370): the reference
supports an elliptic pressure formulation and a mixed RT_k x DG_l
formulation; the benchmark datasets contain no darcy cases (v2 has none,
SURVEY 2.3) and the mixed form is never exercised by the harness. Here
the elliptic formulation is implemented on the same pipeline as Poisson
(with the positive-kappa check of darcy.py:63-70); the H(div) mixed
form is planned behind the same interface.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..fem import symbolic
from ..fem.assemble import LocalOperator, local_stiffness
from ..solvers.dispatch import solve_linear
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid


class DarcySolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        formulation = str(pde.get("formulation", "elliptic")).lower()
        if formulation not in ("elliptic", "pressure"):
            raise NotImplementedError(
                f"darcy formulation '{formulation}' (mixed RT x DG) is not "
                "yet implemented; no benchmark case exercises it"
            )
        mms_u = pde.get("manufactured_solution", {}).get(
            "p", pde.get("manufactured_solution", {}).get("u")
        )
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
            pde = config["pde"]
            # baseline-error machinery reads manufactured_solution.u
            pde.setdefault("manufactured_solution", {})["u"] = mms_u
        ctx = scalar.setup_scalar(config)
        dim = ctx.dim
        kspec = pde.get("coefficients", {}).get("kappa") or {}
        kappa = base.coefficient_fn(kspec or None, dim)

        # positive-permeability check (reference: darcy.py:63-70)
        kq_probe = np.asarray(kappa(ctx.qpts()))
        if not np.all(kq_probe > 0):
            raise ValueError("darcy permeability must be strictly positive")

        if mms_u is not None:
            kexpr = kspec.get("expr", kspec.get("value", 1.0)) if kspec else 1.0
            src = symbolic.poisson_source(mms_u, kexpr, dim)
        else:
            src = pde.get("source_term", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim)
        opts = base.solver_opts(config)
        opts["_lattice32"] = scalar.maybe_lattice32(
            ctx, local_stiffness(ctx.cb, kappa(ctx.qpts()))
        )

        def run():
            kq = kappa(ctx.qpts())
            K = local_stiffness(ctx.cb, kq)
            op = LocalOperator(K, ctx.space.dofmap_scalar, ctx.space.ndof)
            b = ctx.load_vector(f_fn(ctx.qpts()))
            x, info = solve_linear(op, b, ctx.mask, ctx.g, opts)
            grid = ctx.sample(x)
            return grid, info

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid)
            if err is None and "reference_config" in config:
                ref = self.solve(
                    scalar.merge_reference_config(config),
                    _compute_baseline=False,
                )
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "darcy",
            "formulation": "elliptic",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": ctx.space.degree,
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=ctx.space.ndof,
        )
