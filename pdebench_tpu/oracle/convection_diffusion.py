"""Convection-diffusion oracle: -eps Lap(u) + beta.grad(u) = f, with
optional residual-based SUPG stabilization; steady and backward-Euler
transient variants.

Scheme parity (reference: pdebench/oracle/convection_diffusion.py:32-386):
  steady:  a = eps grad u . grad v + (beta . grad u) v
  SUPG:    + tau (beta . grad v)(beta . grad u - eps Lap u),
           tau = alpha * h_cell / (2 |beta| + 1e-12), h = cell diameter;
           rhs gains tau (beta . grad v) f
  transient (backward Euler): a = u v + dt * (steady + SUPG);
           L = (u_prev + dt f(t_{n+1})) v + dt tau (beta.grad v) f
           num_steps = ceil((t_end - t0)/dt)   (reference :190)
  MMS: f = [u_t] - eps Lap(u_exact) + beta . grad(u_exact); BC = u_exact.

The Laplacian in the SUPG term uses exact physical basis hessians
(affine cells), nonzero only for degree >= 2 — matching UFL's
div(grad(u)) on P2.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

from ..fem import symbolic
from ..fem.assemble import (
    LocalOperator,
    local_advection,
    local_load,
    local_mass,
    local_stiffness,
    local_supg,
    local_supg_load,
    scatter_add,
)
import os

from ..solvers.dispatch import (
    _apply_local,
    krylov_method,
    solve_constrained,
    solve_constrained_ir,
    solve_linear,
)
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid

_MIXED = os.environ.get("PDEBENCH_TPU_MIXED_PRECISION", "1") == "1"


def _beta_fns(params: Dict[str, Any], dim: int):
    beta = params.get("beta", [0.0] * dim)
    return [symbolic.lambdify_spatial(b, dim) for b in beta], beta


class ConvectionDiffusionSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms_u = pde.get("manufactured_solution", {}).get("u")
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
            pde = config["pde"]
        transient = bool(pde.get("time"))

        ctx = scalar.setup_scalar(
            config, t0=float(pde.get("time", {}).get("t0", 0.0)) if transient else None
        )
        dim = ctx.dim
        params = pde.get("pde_params", {})
        epsilon = float(params.get("epsilon", 1.0))
        beta_fns, beta_exprs = _beta_fns(params, dim)
        opts = base.solver_opts(config)
        stab = opts.get("stabilization", params.get("stabilization"))
        alpha = float(opts.get("upwind_parameter", 1.0))

        # source: MMS-derived or literal
        if mms_u is not None:
            u_sym = symbolic.parse(mms_u)
            conv = sum(
                symbolic.parse(b) * sp.diff(u_sym, v)
                for b, v in zip(beta_exprs, [symbolic.X, symbolic.Y, symbolic.Z])
            )
            src = -epsilon * symbolic.laplacian(u_sym, dim) + conv
            if transient:
                src = sp.diff(u_sym, symbolic.T) + src
        else:
            src = pde.get("source_term", 0.0)

        cb, space = ctx.cb, ctx.space
        qpts = ctx.qpts()
        # HOST operands: the weak-form kernels dispatch np.einsum for
        # numpy inputs — a device beta_q would turn the whole (SUPG)
        # assembly into dozens of EAGER device einsums, each a remote
        # round trip on axon (measured ~19 s/case, round-3 probe)
        beta_q = np.stack(
            [np.asarray(f(np.asarray(qpts))) for f in beta_fns], axis=-1
        )  # (c, nq, d)

        if stab == "supg":
            h_c = np.asarray(ctx.mesh.cell_diameters())
            bnorm = np.linalg.norm(beta_q, axis=-1).mean(axis=1)  # (c,)
            tau_c = alpha * h_c / (2.0 * bnorm + 1e-12)
        else:
            tau_c = None

        def assemble_A():
            A = epsilon * local_stiffness(cb) + local_advection(cb, beta_q)
            if tau_c is not None:
                A = A + local_supg(cb, beta_q, tau_c, epsilon)
            return A

        def load(f_q):
            b = local_load(cb, f_q)
            if tau_c is not None:
                b = b + local_supg_load(cb, beta_q, tau_c, f_q)
            return scatter_add(
                b, jnp.asarray(space.dofmap_scalar), space.ndof
            )

        if not transient:
            f_fn = symbolic.lambdify_spatial(src, dim)
            from ..solvers.dispatch import _amg_min_dofs

            opts["_lattice32"] = scalar.maybe_lattice32(ctx, assemble_A())
            # threshold matches dispatch's platform-aware AMG gate: if
            # the solve CAN take AMG, the surrogate MUST exist (SA-AMG
            # built on the raw nonsymmetric SUPG operator can yield a
            # divergent V-cycle — the round-2 pathology)
            if opts["_lattice32"] is None and space.ndof >= _amg_min_dofs():
                # Unstructured steady route: SA-AMG built on the full
                # nonsymmetric advection/SUPG operator can yield a
                # divergent V-cycle (measured: convdiff_annulus_diag_supg
                # ground ~90 min/pass through a stagnating IR + f64 GMRES
                # retry before the LU fallback). Precondition with the
                # SPD symmetric part instead: eps K plus the streamline-
                # diffusion term tau (beta.grad v)(beta.grad u), which is
                # symmetric PSD (operator parity: reference
                # pdebench/oracle/convection_diffusion.py:239-243).
                def _spd_surrogate():
                    A_spd = epsilon * local_stiffness(cb)
                    if tau_c is not None:
                        A_spd = A_spd + local_supg(cb, beta_q, tau_c, 0.0)
                    return LocalOperator(
                        np.asarray(A_spd), space.dofmap_scalar, space.ndof
                    ).to_scipy()

                opts["_amg_matrix"] = base.charge_setup(ctx, _spd_surrogate)

            def build():
                A = assemble_A()
                op = LocalOperator(A, space.dofmap_scalar, space.ndof)
                return op, load(f_fn(qpts))

            op, b = base.charge_setup(ctx, build)

            def run():
                x, info = solve_linear(
                    op, b, ctx.mask, ctx.g, opts, symmetric=False
                )
                grid = ctx.sample(x)
                return grid, info

            t_final = None
        else:
            t0 = float(pde["time"].get("t0", 0.0))
            t_end = float(pde["time"]["t_end"])
            dt = float(pde["time"].get("dt", 0.01))
            num_steps = max(int((t_end - t0) / dt + 0.999999), 1)
            t_final = t0 + num_steps * dt
            f_fn = symbolic.lambdify_spatial(src, dim, with_time=True)
            ic = mms_u if mms_u is not None else pde.get("initial_condition", 0.0)
            u0 = base.interpolate_nodal(space, ic, t=t0)
            _, g_fn = base.dirichlet_traceable(space, config.get("bc", {}))
            method = krylov_method(opts, symmetric=False)
            rtol, atol = float(opts["rtol"]), float(opts.get("atol", 1e-12))
            maxiter = int(opts.get("max_it", 25000))
            dofmap = jnp.asarray(space.dofmap_scalar)
            ndof, mask = space.ndof, ctx.mask
            ts = t0 + dt * jnp.arange(1, num_steps + 1)

            lattice32 = None
            if _MIXED:
                # the transient system matrix M + dt A is constant:
                # stencil + GMG apply (GMG hierarchy built on the
                # SPD-dominant constrained matrix works as a left
                # preconditioner for the nonsymmetric inner GMRES)
                A_sys_pre = local_mass(cb) + dt * assemble_A()
                lattice32 = scalar.attach_gmg(
                    scalar.maybe_lattice32(ctx, A_sys_pre),
                    A_sys_pre,
                    space,
                    np.asarray(mask),
                )

            apply_M = None
            if lattice32 is not None:
                appl = scalar.stencil_appliers64(
                    lattice32, space.dofmap_scalar, local_mass(cb)
                )
                apply_M = appl[0] if appl else None

            @jax.jit
            def run_scan(A_sys, M, u0_arr):
                A32 = A_sys.astype(jnp.float32) if _MIXED else None
                M_ap = apply_M or (
                    lambda v: _apply_local(M, dofmap, ndof, v)
                )

                # per-step load vectors and Dirichlet values hoisted
                # OUT of the scan: one batched scatter each replaces
                # num_steps in-scan scatters (TPU scatters serialize)
                B_all = jax.vmap(lambda t: load(f_fn(qpts, t)))(ts)
                G_all = jax.vmap(g_fn)(ts)

                def step(u_n, xs):
                    _t_next, b_ext, g = xs
                    b = M_ap(u_n) + dt * b_ext
                    if _MIXED:
                        x, it, res, conv = solve_constrained_ir(
                            A_sys, A32, dofmap, b, mask, g, ndof, rtol, atol,
                            inner_iters=(
                                20
                                if getattr(lattice32, "gmg", None)
                                is not None
                                else 60
                            ),
                            inner="gmres",
                            lattice32=lattice32,
                        )
                    else:
                        x, it, res, conv = solve_constrained(
                            A_sys, dofmap, b, mask, g, ndof, method, rtol,
                            atol, maxiter,
                        )
                    return x, (it, res)

                return jax.lax.scan(step, u0_arr, (ts, B_all, G_all))

            def run():
                A_sys = local_mass(cb) + dt * assemble_A()
                u, (its, ress) = run_scan(A_sys, local_mass(cb), jnp.asarray(u0))
                grid = ctx.sample(np.asarray(u))
                return grid, {
                    "iterations": int(np.asarray(its).sum()),
                    "residual": float(np.asarray(ress)[-1]),
                    "num_steps": num_steps,
                }

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid, t_end=t_final)
            if err is None and "reference_config" in config:
                ref = self.solve(
                    scalar.merge_reference_config(
                        config,
                        refine_dt=dt * 0.5 if transient else None,
                    ),
                    _compute_baseline=False,
                )
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "convection_diffusion",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "epsilon": epsilon,
            "stabilization": stab or "none",
            "upwind_parameter": alpha,
            "ksp_type": opts["ksp_type"],
            "pc_type": opts["pc_type"],
            "rtol": float(opts["rtol"]),
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=space.ndof,
        )
