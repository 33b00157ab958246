"""Heat oracle: du/dt - div(kappa grad u) = f, backward Euler.

TPU pipeline: assemble M and K once, form A = M + dt*K, then run the
whole time loop as ONE jitted lax.scan — each step evaluates f(t) and
the Dirichlet values g(t) on device and solves with PCG inside the scan
body. This removes the reference's per-step LinearProblem rebuild
(reference: pdebench/oracle/heat.py:119-138, noted inefficiency).

Scheme parity (reference: oracle/heat.py:33-237):
  a = (u v + dt kappa grad u . grad v) dx
  L = (u_prev + dt f(t_{n+1})) v dx
  u0   = u_exact(t0) (MMS) or initial_condition
  BCs  = u_exact(t_{n+1}) on all boundary facets (MMS) or case bc
  f    = u_t - div(kappa grad u_exact) derived symbolically (MMS)
  num_steps = int((t_end - t0)/dt + 0.5)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..fem import symbolic
from ..fem.assemble import local_mass, local_stiffness
from ..solvers.dispatch import (
    _apply_local,
    krylov_method,
    solve_constrained,
    solve_constrained_ir,
)
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid

_MIXED = os.environ.get("PDEBENCH_TPU_MIXED_PRECISION", "1") == "1"


class HeatSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms_u = pde.get("manufactured_solution", {}).get("u")
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
        t0, t_end, dt, num_steps = base.time_params(pde)
        t_final = t0 + num_steps * dt
        ctx = scalar.setup_scalar(config, t0=t0)
        dim = ctx.dim

        kspec = pde.get("coefficients", {}).get("kappa") or {}
        kappa = base.coefficient_fn(kspec or None, dim)
        if mms_u is not None:
            kexpr = kspec.get("expr", kspec.get("value", 1.0)) if kspec else 1.0
            src = symbolic.heat_source(mms_u, kexpr, dim)
            ic = mms_u
        else:
            src = pde.get("source_term", 0.0)
            ic = pde.get("initial_condition", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim, with_time=True)
        u0 = base.interpolate_nodal(ctx.space, ic, t=t0)
        _, g_fn = base.dirichlet_traceable(ctx.space, config.get("bc", {}))

        opts = base.solver_opts(config)
        method = krylov_method(opts, symmetric=True)
        rtol, atol = float(opts["rtol"]), float(opts.get("atol", 1e-14))
        maxiter = int(opts.get("max_it", 25000))

        space, cb = ctx.space, ctx.cb
        dofmap = jnp.asarray(space.dofmap_scalar)
        ndof, mask = space.ndof, ctx.mask
        qpts = ctx.qpts()
        ts = t0 + dt * jnp.arange(1, num_steps + 1)

        use_ir = _MIXED and method == "cg"
        lattice32 = None
        if use_ir:
            # pre-build (untimed) the stencil form of A = M + dt K for
            # gather-free f32 inner iterations on structured meshes
            # (TPU-gated inside maybe_lattice32)
            A_pre = local_mass(cb) + dt * local_stiffness(cb, kappa(qpts))
            lattice32 = scalar.attach_gmg(
                scalar.maybe_lattice32(ctx, A_pre),
                A_pre,
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
            A32 = A_sys.astype(jnp.float32) if use_ir else None
            # per-step load vectors and Dirichlet values hoisted OUT of
            # the scan: one batched scatter each replaces num_steps
            # in-scan scatters (TPU scatters serialize)
            B_all = jax.vmap(lambda t: ctx.load_vector(f_fn(qpts, t)))(ts)
            G_all = jax.vmap(g_fn)(ts)

            def step(u_n, xs):
                _t_next, b_ext, g = xs
                Mu = (
                    apply_M(u_n)
                    if apply_M is not None
                    else _apply_local(M, dofmap, ndof, u_n)
                )
                b = Mu + dt * b_ext
                if use_ir:
                    # f32 inner iterations, f64 outer correction — the
                    # per-step system M + dt K is mass-dominated and
                    # well-conditioned, ideal for mixed precision
                    x, it, res, conv = solve_constrained_ir(
                        A_sys, A32, dofmap, b, mask, g, ndof, rtol, atol,
                        lattice32=lattice32,
                        inner_iters=(
                            12
                            if getattr(lattice32, "gmg", None) is not None
                            else 30
                        ),
                    )
                else:
                    x, it, res, conv = solve_constrained(
                        A_sys, dofmap, b, mask, g, ndof, method, rtol, atol,
                        maxiter,
                    )
                return x, (it, res, conv)

            return jax.lax.scan(step, u0_arr, (ts, B_all, G_all))

        def build():
            # host-side numpy assembly throughout, one device transfer
            # each (eager device arithmetic compiles remotely on axon)
            K = np.asarray(local_stiffness(cb, kappa(qpts)))
            M = np.asarray(local_mass(cb))
            return (
                jnp.asarray(M + dt * K),
                jnp.asarray(M),
                jnp.asarray(u0),
            )

        A_sys, M, u0_dev = base.charge_setup(ctx, build)

        def run():
            u, (its, ress, convs) = run_scan(A_sys, M, u0_dev)
            info = {
                "iterations": int(np.asarray(its).sum()),
                "residual": float(np.asarray(ress)[-1]),
            }
            if not bool(np.asarray(convs).all()):
                # Host SuperLU safety net: the step matrix is CONSTANT,
                # so one factorization + num_steps back-substitutions.
                # A silently-unconverged iterative step used to be
                # ACCEPTED (the v1 heat res-150-P2 baseline_error=1.19
                # bug — a stalled IR outer with no preconditioner).
                from ..fem.assemble import LocalOperator
                from ..solvers.direct import ConstrainedLU

                A_csr = LocalOperator(
                    np.asarray(A_sys), space.dofmap_scalar, ndof
                ).to_scipy()
                mask_np = np.asarray(mask)
                flu = ConstrainedLU(A_csr, mask_np)
                M_op = LocalOperator(np.asarray(M), space.dofmap_scalar, ndof)
                uh = np.asarray(u0, dtype=np.float64)
                for t_next in np.asarray(ts):
                    b = np.asarray(M_op(jnp.asarray(uh))) + dt * np.asarray(
                        ctx.load_vector(f_fn(qpts, float(t_next)))
                    )
                    uh = flu.solve(b, np.asarray(g_fn(float(t_next))))
                u = uh
                info["fallback"] = "direct"
            grid = ctx.sample(np.asarray(u))
            return grid, info

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid, t_end=t_final)
            if err is None and "reference_config" in config:
                ref = self.solve(
                    scalar.merge_reference_config(
                        config, refine_dt=dt * 0.5
                    ),
                    _compute_baseline=False,
                )
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "heat",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "num_steps": num_steps,
            "dt": dt,
            "ksp_type": opts["ksp_type"],
            "pc_type": opts["pc_type"],
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
            num_dofs=ndof,
        )
