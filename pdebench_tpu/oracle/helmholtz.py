"""Helmholtz oracle: -Lap(u) - k^2 u = f (indefinite), Dirichlet BCs.

TPU pipeline: A = K - k^2 M assembled as cell-local batches, solved with
jitted GMRES (the system is symmetric indefinite; the reference uses
GMRES+ILU or direct — oracle/helmholtz.py:107-116). MMS derives
f = -Lap(u_exact) - k^2 u_exact.

Parity: pdebench/oracle/helmholtz.py:47-195 (HelmholtzSolver).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
import sympy as sp

from ..fem import symbolic
from ..fem.assemble import LocalOperator, local_mass, local_stiffness
from ..solvers.dispatch import solve_linear
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid


class HelmholtzSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms_u = pde.get("manufactured_solution", {}).get("u")
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
        k = float(pde.get("pde_params", {}).get("k", 1.0))
        k2 = k * k
        ctx = scalar.setup_scalar(config)
        dim = ctx.dim

        if mms_u is not None:
            u_sym = symbolic.parse(mms_u)
            src = sp.simplify(-symbolic.laplacian(u_sym, dim) - k2 * u_sym)
        else:
            src = pde.get("source_term", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim)
        opts = base.solver_opts(config)

        # robustness override (role parity with the reference's own
        # Helmholtz overrides, dealii_oracle/oracle.py:503-529):
        # shifted-GMG/AMG iteration counts blow up with k — measured
        # 19-68 s vs 1-2 s direct at k>=18 — and a k=20/res 200 solve
        # reproducibly faults the TPU runtime. Host LU is both faster
        # and safe at dataset sizes (<=300^2 P1/P2).
        high_k_direct = dim == 2 and k >= 16.0
        if high_k_direct:
            opts = dict(opts, ksp_type="preonly", pc_type="lu")

        # one-time solver options (holds the jit/preconditioner cache —
        # must be shared by the cold and warm timed passes)
        run_opts = dict(opts)
        if not high_k_direct:
            run_opts["_lattice32"] = scalar.maybe_lattice32(
                ctx, local_stiffness(ctx.cb) - k2 * local_mass(ctx.cb)
            )
        if not high_k_direct and ctx.space.ndof >= 8000:
            # precondition the indefinite operator with AMG built on
            # the SHIFTED Laplacian K + k^2 M (standard shifted-
            # Laplacian trick; AMG on K - k^2 M itself diverges)
            shift_op = LocalOperator(
                local_stiffness(ctx.cb) + k2 * local_mass(ctx.cb),
                ctx.space.dofmap_scalar,
                ctx.space.ndof,
            )
            run_opts["_amg_matrix"] = shift_op.to_scipy()

        def build():
            A = local_stiffness(ctx.cb) - k2 * local_mass(ctx.cb)
            op = LocalOperator(A, ctx.space.dofmap_scalar, ctx.space.ndof)
            b = ctx.load_vector(f_fn(ctx.qpts()))
            return op, b

        op, b = base.charge_setup(ctx, build)

        def run():
            x, info = solve_linear(
                op, b, ctx.mask, ctx.g, run_opts, symmetric=False
            )
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
            "pde": "helmholtz",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": ctx.space.degree,
            "wavenumber": k,
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
