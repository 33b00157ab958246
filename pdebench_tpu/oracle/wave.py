"""Wave oracle: d2u/dt2 - c^2 Lap(u) = f, Newmark theta-scheme (theta=1/4).

Scheme parity (reference: pdebench/oracle/wave.py:34-127):
  u^0    = u_exact(t0) (MMS) or initial_condition
  u^{-1} = u^0 - dt * v0,  v0 = d/dt u_exact(t0) (MMS) or initial_velocity
  A      = M/dt^2 + theta c^2 K                         (constant)
  b_n    = M (2u^n - u^{n-1})/dt^2 - (1-2 theta) c^2 K u^n
           - theta c^2 K u^{n-1} + M f(t_n)             (source at t_n)
  BCs    = u_exact(t_{n+1})
  f      = u_tt - c^2 Lap(u_exact) derived symbolically (MMS)

The loop runs as one jitted lax.scan carrying (u^n, u^{n-1}).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

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

THETA = 0.25
_MIXED = os.environ.get("PDEBENCH_TPU_MIXED_PRECISION", "1") == "1"


class WaveSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms_u = pde.get("manufactured_solution", {}).get("u")
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
        c = float(pde.get("pde_params", {}).get("c", 1.0))
        c2 = c * c
        t0, t_end, dt, num_steps = base.time_params(pde)
        t_final = t0 + num_steps * dt
        ctx = scalar.setup_scalar(config, t0=t0)
        dim = ctx.dim

        if mms_u is not None:
            u_sym = symbolic.parse(mms_u)
            src = sp.simplify(
                sp.diff(u_sym, symbolic.T, 2) - c2 * symbolic.laplacian(u_sym, dim)
            )
            ic = mms_u
            v0_expr = sp.diff(u_sym, symbolic.T)
        else:
            src = pde.get("source_term", 0.0)
            ic = pde.get("initial_condition", 0.0)
            v0_expr = pde.get("initial_velocity", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim, with_time=True)
        u0 = base.interpolate_nodal(ctx.space, ic, t=t0)
        v0 = base.interpolate_nodal(ctx.space, v0_expr, t=t0)
        um1 = u0 - dt * v0
        _, g_fn = base.dirichlet_traceable(ctx.space, config.get("bc", {}))

        opts = base.solver_opts(config)
        method = krylov_method(opts, symmetric=True)
        rtol, atol = float(opts["rtol"]), float(opts.get("atol", 1e-14))
        maxiter = int(opts.get("max_it", 25000))

        space, cb = ctx.space, ctx.cb
        dofmap = jnp.asarray(space.dofmap_scalar)
        ndof, mask = space.ndof, ctx.mask
        qpts = ctx.qpts()
        inv_dt2 = 1.0 / (dt * dt)
        t_ns = t0 + dt * jnp.arange(num_steps)  # source times t_n

        use_ir = _MIXED and method == "cg"
        M32_amg = None
        lattice32 = None
        import jax as _jax

        # The reference_config re-solve (called with _compute_baseline=
        # False) is UNTIMED — only its sampled grid is used. On
        # unstructured meshes that re-solve is a res-160/P3/dt-half
        # monster whose jitted AMG-in-scan program takes 15 min – 2 h+
        # to compile on XLA-CPU (>2 GB HLO proto observed); the host
        # ConstrainedLU loop solves it directly in ~1-2 min at better
        # accuracy, so route it there and skip the jit path entirely.
        from ..solvers.stencil import detect_lattice

        _no_lattice = detect_lattice(space.dof_coords) is None
        ref_direct = not _compute_baseline and _no_lattice

        if use_ir and not ref_direct:
            # structured (incl. masked rectilinear) meshes: gather-free
            # stencil + GMG on the constant step matrix
            A_pre = inv_dt2 * local_mass(cb) + THETA * c2 * local_stiffness(cb)
            lattice32 = scalar.attach_gmg(
                scalar.maybe_lattice32(ctx, A_pre),
                A_pre,
                space,
                np.asarray(mask),
            )
        # On the CPU host, MAIN solves whose operator does NOT reduce
        # to a paddable stencil (unstructured meshes AND periodic
        # wrap-around lattices, stencil.py:653) route direct as well:
        # the step matrix is constant, so one SuperLU factorization +
        # num_steps back-solves beats the in-scan AMG/jacobi-CG in
        # wall time AND avoids the 15-50+ min XLA-CPU scan compiles
        # (heat.py's direct fallback promoted to the primary route;
        # pc_type hypre maps to "AMG or direct fallback" in our
        # dispatch policy). TPU keeps the jitted scan.
        if (
            lattice32 is None
            and ndof <= 80000
            and _jax.devices()[0].platform not in ("tpu", "axon")
        ):
            ref_direct = True

        if (
            use_ir
            and not ref_direct
            and lattice32 is None
            and ndof >= 20000
            # the COO V-cycle is gather-bound on TPU where plain jacobi
            # bursts win; on CPU the AMG iteration count dominates
            and _jax.devices()[0].platform not in ("tpu", "axon")
        ):
            # unstructured meshes: pre-build (untimed) an f32 AMG
            # V-cycle on the constant step matrix for the scan's inner
            # iterations
            try:
                from ..fem.assemble import LocalOperator
                from ..solvers.amg import setup_amg_masked_pair

                A_pre = inv_dt2 * local_mass(cb) + THETA * c2 * local_stiffness(cb)
                _, M32_amg = setup_amg_masked_pair(
                    LocalOperator(
                        np.asarray(A_pre), space.dofmap_scalar, ndof
                    ).to_scipy(),
                    np.asarray(mask),
                )
            except Exception:
                M32_amg = None

        apply_M = apply_K = None
        if lattice32 is not None:
            appl = scalar.stencil_appliers64(
                lattice32, space.dofmap_scalar,
                local_mass(cb), local_stiffness(cb),
            )
            if appl:
                apply_M, apply_K = appl

        @jax.jit
        def run_scan(A_sys, M, K, u0_arr, um1_arr):
            A32 = A_sys.astype(jnp.float32) if use_ir else None
            M_ap = apply_M or (lambda v: _apply_local(M, dofmap, ndof, v))
            K_ap = apply_K or (lambda v: _apply_local(K, dofmap, ndof, v))
            # per-step load vectors and Dirichlet values hoisted OUT of
            # the scan: one batched scatter each replaces num_steps
            # in-scan scatters (TPU scatters serialize)
            B_all = jax.vmap(lambda t: ctx.load_vector(f_fn(qpts, t)))(t_ns)
            G_all = jax.vmap(lambda t: g_fn(t + dt))(t_ns)

            def step(carry, xs):
                _t_n, b_ext, g = xs
                u_n, u_nm1 = carry
                b = (
                    inv_dt2 * M_ap(2.0 * u_n - u_nm1)
                    - (1.0 - 2.0 * THETA) * c2 * K_ap(u_n)
                    - THETA * c2 * K_ap(u_nm1)
                    + b_ext
                )
                if use_ir:
                    x, it, res, conv = solve_constrained_ir(
                        A_sys, A32, dofmap, b, mask, g, ndof, rtol, atol,
                        M32_custom=M32_amg,
                        lattice32=lattice32,
                        inner_iters=(
                            12
                            if (
                                M32_amg is not None
                                or getattr(lattice32, "gmg", None)
                                is not None
                            )
                            else 30
                        ),
                    )
                else:
                    x, it, res, conv = solve_constrained(
                        A_sys, dofmap, b, mask, g, ndof, method, rtol, atol,
                        maxiter,
                    )
                return (x, u_n), (it, res, conv)

            (u, _), aux = jax.lax.scan(
                step, (u0_arr, um1_arr), (t_ns, B_all, G_all)
            )
            return u, aux

        def direct_loop(A_sys, M, K):
            # host SuperLU Newmark loop on the constant step matrix:
            # one factorization + num_steps back-solves; used both as
            # the non-convergence safety net (see heat.py) and as the
            # whole solver for untimed unstructured reference re-solves
            from ..fem.assemble import LocalOperator
            from ..solvers.direct import ConstrainedLU

            A_csr = LocalOperator(
                np.asarray(A_sys), space.dofmap_scalar, ndof
            ).to_scipy()
            mask_np = np.asarray(mask)
            flu = ConstrainedLU(A_csr, mask_np)
            M_op = LocalOperator(np.asarray(M), space.dofmap_scalar, ndof)
            K_op = LocalOperator(np.asarray(K), space.dofmap_scalar, ndof)
            uh = np.asarray(u0, dtype=np.float64)
            uhm1 = np.asarray(um1, dtype=np.float64)
            for t_n in np.asarray(t_ns):
                b = (
                    inv_dt2 * np.asarray(M_op(jnp.asarray(2.0 * uh - uhm1)))
                    - (1.0 - 2.0 * THETA) * c2 * np.asarray(K_op(jnp.asarray(uh)))
                    - THETA * c2 * np.asarray(K_op(jnp.asarray(uhm1)))
                    + np.asarray(ctx.load_vector(f_fn(qpts, float(t_n))))
                )
                x = flu.solve(b, np.asarray(g_fn(float(t_n) + dt)))
                uhm1, uh = uh, x
            return uh

        def build():
            K = np.asarray(local_stiffness(cb))
            M = np.asarray(local_mass(cb))
            A_sys = inv_dt2 * M + THETA * c2 * K
            if ref_direct:  # host path: keep numpy operands
                return A_sys, M, K, u0, um1
            return (
                jnp.asarray(A_sys), jnp.asarray(M), jnp.asarray(K),
                jnp.asarray(u0), jnp.asarray(um1),
            )

        A_sys, M, K, u0_d, um1_d = base.charge_setup(ctx, build)

        def run():
            if ref_direct:
                u = direct_loop(A_sys, M, K)
                return ctx.sample(np.asarray(u)), {"fallback": "direct"}
            u, (its, ress, convs) = run_scan(A_sys, M, K, u0_d, um1_d)
            info = {
                "iterations": int(np.asarray(its).sum()),
                "residual": float(np.asarray(ress)[-1]),
            }
            if not bool(np.asarray(convs).all()):
                # silently-unconverged steps must not be accepted as
                # the oracle reference
                u = direct_loop(A_sys, M, K)
                info["fallback"] = "direct"
            grid = ctx.sample(np.asarray(u))
            return grid, info

        if ref_direct:
            # untimed path: single pass, no warm repeats
            import time as _time

            _t0 = _time.perf_counter()
            fem_grid, info = run()
            t_warm = t_cold = _time.perf_counter() - _t0
        else:
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
            "pde": "wave",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "num_steps": num_steps,
            "dt": dt,
            "theta": THETA,
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
