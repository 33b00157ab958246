"""Cahn-Hilliard oracle: 4th-order phase-field, mixed (c, mu) P1-P1.

North-star config (BASELINE.json). Split form with double-well
f(c) = 100 c^2 (1-c)^2:

    dc/dt = div(M grad(mu))
    mu    = f'(c) - lambda Lap(c)

Backward Euler in time, Newton on the stacked unknown (c, mu) per step,
natural (zero-flux) boundary conditions — mass int(c) is conserved
exactly by the discretization. The whole time loop (Newton + inner
GMRES) runs as one jitted lax.scan like the other transient oracles.

Config schema:
  pde: {type: "cahn_hilliard", pde_params: {lambda, M, well_scale},
        time: {t0, t_end, dt}, initial_condition: expr | "random"}
  output.field: concentration c on the grid
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import symbolic
from ..fem.assemble import local_mass, local_stiffness
from ..solvers.dispatch import _apply_local, solve_constrained
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid


class CahnHilliardSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        params = pde.get("pde_params", {})
        lam = float(params.get("lambda", 1e-2))
        mob = float(params.get("M", 1.0))
        well = float(params.get("well_scale", 100.0))
        t0, t_end, dt, num_steps = base.time_params(
            pde, default_t_end=5e-5, default_dt=5e-6
        )

        ctx = scalar.setup_scalar(config)
        space, cb = ctx.space, ctx.cb
        ndof = space.ndof
        dofmap = jnp.asarray(space.dofmap_scalar)
        phi = cb.phi

        ic = pde.get("initial_condition", "random")
        if isinstance(ic, str) and ic.strip().lower() == "random":
            rng = np.random.default_rng(int(pde.get("seed", 0)))
            c0 = 0.63 + 0.02 * (rng.random(ndof) - 0.5)
        else:
            c0 = base.interpolate_nodal(space, ic)

        # f'(c) = well * 2 c (1-c)(1-2c); f''(c) for the Newton Jacobian
        def fprime(c):
            return well * 2.0 * c * (1.0 - c) * (1.0 - 2.0 * c)

        def fsecond(c):
            return well * 2.0 * (1.0 - 6.0 * c + 6.0 * c * c)

        opts = base.solver_opts(config)
        rtol = float(opts.get("rtol", 1e-8))
        atol = float(opts.get("atol", 1e-10))
        max_newton = int(opts.get("max_it", 20))
        inv_dt = 1.0 / dt
        no_mask = jnp.zeros(2 * ndof, dtype=bool)
        zero_g = jnp.zeros(2 * ndof)
        ts = t0 + dt * jnp.arange(1, num_steps + 1)

        def c_at_q(c):
            return jnp.einsum("qi,ci->cq", phi, c[dofmap])

        @jax.jit
        def run_scan(M, K, c0_arr):
            def apply_M(v):
                return _apply_local(M, dofmap, ndof, v)

            def apply_K(v):
                return _apply_local(K, dofmap, ndof, v)

            def residual(c, mu, c_n):
                r1 = inv_dt * apply_M(c - c_n) + mob * apply_K(mu)
                fp_q = fprime(c_at_q(c))
                from ..fem.assemble import local_load, scatter_add

                b_fp = scatter_add(local_load(cb, fp_q), dofmap, ndof)
                r2 = apply_M(mu) - b_fp - lam * apply_K(c)
                return jnp.concatenate([r1, r2])

            def step(c_n, t_next):
                c, mu = c_n, jnp.zeros(ndof)

                def newton_body(state):
                    c, mu, k, rn, rn0 = state
                    # Jacobian blocks: [[M/dt, mob K], [-f'' M_w - lam K, M]]
                    fpp_q = fsecond(c_at_q(c))
                    Mw = local_mass(cb, fpp_q)
                    J_local = jnp.concatenate(
                        [
                            jnp.concatenate([inv_dt * M, mob * K], axis=2),
                            jnp.concatenate(
                                [-(Mw + lam * K), M], axis=2
                            ),
                        ],
                        axis=1,
                    )  # (c, 2nl, 2nl)
                    # stacked dofmap: c dofs then mu dofs (offset ndof)
                    dm2 = jnp.concatenate([dofmap, dofmap + ndof], axis=1)
                    r = residual(c, mu, c_n)
                    d, it, res, conv = solve_constrained(
                        J_local, dm2, -r, no_mask, zero_g, 2 * ndof,
                        "gmres", 1e-6, atol, 4000,
                    )
                    c2, mu2 = c + d[:ndof], mu + d[ndof:]
                    rn_new = jnp.linalg.norm(residual(c2, mu2, c_n))
                    return (c2, mu2, k + 1, rn_new, rn0)

                r0 = jnp.linalg.norm(residual(c, mu, c_n))

                def newton_cond(state):
                    c, mu, k, rn, rn0 = state
                    return jnp.logical_and(
                        k < max_newton,
                        rn > jnp.maximum(rtol * rn0, atol),
                    )

                c, mu, k, rn, _ = jax.lax.while_loop(
                    newton_cond, newton_body, (c, mu, 0, r0, r0)
                )
                return c, (k, rn)

            return jax.lax.scan(step, c0_arr, ts)

        def run():
            K = local_stiffness(cb)
            M = local_mass(cb)
            c, (ks, rns) = run_scan(M, K, jnp.asarray(c0))
            grid = ctx.sample(np.asarray(c))
            return grid, {
                "newton_iterations": int(np.asarray(ks).sum()),
                "residual": float(np.asarray(rns)[-1]),
            }

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 0.0
        if _compute_baseline:
            t_final = t0 + num_steps * dt
            err = scalar.mms_baseline_error(config, fem_grid, t_end=t_final)
            if err is None and "reference_config" in config:
                ref = self.solve(
                    scalar.merge_reference_config(config),
                    _compute_baseline=False,
                )
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "cahn_hilliard",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "lambda": lam,
            "mobility": mob,
            "num_steps": num_steps,
            "dt": dt,
            "ksp_type": "gmres",
            "pc_type": "jacobi",
            "rtol": rtol,
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=2 * ndof,
        )
