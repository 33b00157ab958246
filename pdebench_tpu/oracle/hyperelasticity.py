"""Hyperelasticity oracle: compressible neo-Hookean finite strain.

North-star config (BASELINE.json: "Navier-Stokes, hyperelasticity,
Cahn-Hilliard (Newton-Krylov nonlinear)"). This solver is built the way
only a differentiable-programming FEM core can be: the TOTAL ENERGY

    Pi(u) = sum_q w |J| psi(F(q)) - int f . u
    psi   = mu/2 (tr(F^T F) - d) - mu ln(det F) + lam/2 ln(det F)^2

is written once as a jitted function of the displacement vector; the
residual is `jax.grad(Pi)` and Newton directions come from CG on
Hessian-vector products (`jvp` of the gradient) — matrix-free, no
hand-derived tangent stiffness, everything on device.

Config schema (no reference counterpart — new capability):
  pde: {type: "hyperelasticity", pde_params: {E, nu} | {mu, lambda},
        body_force: [fx, fy]}
  bc.dirichlet: displacement segments (side-selector DSL)
  output.field: displacement_magnitude
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import symbolic
from ..fem.assemble import bc_mask_values
from . import base, scalar
from .linear_elasticity import lame_from_params
from .types import OracleResult, compute_rel_L2_grid


class HyperelasticitySolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        lam, mu = lame_from_params(pde.get("pde_params", {}))
        ctx = scalar.setup_scalar(config, ncomp=-1)
        dim = ctx.dim
        space, cb = ctx.space, ctx.cb

        body = pde.get("body_force", pde.get("source_term", [0.0] * dim))
        if not isinstance(body, (list, tuple)):
            body = [body] * dim
        f_fns = [symbolic.lambdify_spatial(b, dim) for b in body]

        opts = base.solver_opts(config)
        newton_rtol = float(opts.get("rtol", 1e-10))
        newton_atol = float(opts.get("atol", 1e-12))
        max_newton = int(opts.get("max_it", 50))

        dofmap = jnp.asarray(space.dofmap_scalar)
        nl = space.dofmap_scalar.shape[1]
        gphys = cb.grad_phys()  # (c, q, i, d)
        wdetJ = cb.wdetJ
        qpts = ctx.qpts()
        f_q = jnp.stack([f(qpts) for f in f_fns], axis=-1)  # (c, q, d)
        phi = cb.phi
        mask, g = ctx.mask, ctx.g
        ndof = space.ndof
        eye = jnp.eye(dim)

        def energy(u_flat):
            ue = u_flat.reshape(-1, dim)[dofmap]  # (c, nl, d)
            gradu = jnp.einsum("cqid,cia->cqad", gphys, ue)
            F = eye[None, None] + gradu  # (c, q, d, d)
            C_tr = jnp.einsum("cqad,cqad->cq", F, F)
            detF = (
                F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
                if dim == 2
                else jnp.linalg.det(F)
            )
            detF = jnp.maximum(detF, 1e-8)  # guard for line-search trials
            lnJ = jnp.log(detF)
            psi = (
                0.5 * mu * (C_tr - dim)
                - mu * lnJ
                + 0.5 * lam * lnJ * lnJ
            )
            u_q = jnp.einsum("qi,cia->cqa", phi, ue)
            work = jnp.einsum("cqa,cqa->cq", f_q, u_q)
            return jnp.sum(wdetJ * (psi - work))

        grad_e = jax.grad(energy)

        def residual(u):
            return jnp.where(mask, 0.0, grad_e(u))

        def hvp(u, v):
            return jnp.where(
                mask, v, jax.jvp(grad_e, (u,), (jnp.where(mask, 0.0, v),))[1]
            )

        def newton_cg(u0):
            def cg_solve(u, r):
                # matrix-free CG on the HVP (Gauss-Newton region SPD)
                x = jnp.zeros_like(r)
                p = r
                res = r
                rz = jnp.vdot(res, res)

                def body(i, st):
                    x, res, p, rz = st
                    Ap = hvp(u, p)
                    denom = jnp.vdot(p, Ap)
                    alpha = rz / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
                    x = x + alpha * p
                    res = res - alpha * Ap
                    rz_new = jnp.vdot(res, res)
                    beta = rz_new / jnp.where(rz > 0, rz, 1.0)
                    return (x, res, p * beta + res, rz_new)

                x, *_ = jax.lax.fori_loop(0, 200, body, (x, res, p, rz))
                return x

            def cond(st):
                u, k, rn, rn0 = st
                return jnp.logical_and(
                    k < max_newton,
                    rn > jnp.maximum(newton_rtol * rn0, newton_atol),
                )

            def body(st):
                u, k, rn, rn0 = st
                r = residual(u)
                d = cg_solve(u, -r)

                # backtracking line search on the energy
                e0 = energy(u)

                def ls_body(i, carry):
                    t, done = carry
                    trial = energy(u + t * d)
                    ok = trial < e0
                    t_next = jnp.where(ok | done, t, t * 0.5)
                    return (t_next, done | ok)

                t, _ = jax.lax.fori_loop(
                    0, 25, ls_body, (jnp.asarray(1.0), jnp.asarray(False))
                )
                u_new = u + t * d
                rn_new = jnp.linalg.norm(residual(u_new))
                return (u_new, k + 1, rn_new, rn0)

            r0 = jnp.linalg.norm(residual(u0))
            u, k, rn, _ = jax.lax.while_loop(
                cond, body, (u0, 0, r0, r0)
            )
            return u, k, rn

        jit_newton = jax.jit(newton_cg)

        def run():
            u0 = jnp.where(mask, g, 0.0)
            u, iters, rn = jit_newton(u0)
            grid = ctx.sample(np.asarray(u))
            return grid, {
                "method": "newton-cg(autodiff)",
                "iterations": int(iters),
                "residual": float(rn),
            }

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 0.0
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
            "pde": "hyperelasticity",
            "model": "neo_hookean_compressible",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "lame_lambda": lam,
            "lame_mu": mu,
            "ksp_type": "cg",
            "pc_type": "none",
            "rtol": newton_rtol,
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=ndof,
        )
