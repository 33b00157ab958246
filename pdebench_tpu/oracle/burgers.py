"""Burgers oracle: du/dt + u (u_x + u_y) - nu Lap(u) = f, semi-implicit.

Scheme parity (reference: pdebench/oracle/burger.py:28-181):
  convection lagged: a = (u/dt) v + u_n (u_x + u_y) v + nu grad u . grad v
  L = (u_n/dt) v + f(t_{n+1}) v
  MMS: f = u_t + u (u_x + u_y) - nu Lap(u); u0 = u_exact(t0)
  defaults t_final = pde.t_final or 0.1, dt = pde.dt or 0.01
  linear solve per step: GMRES + Jacobi (reference :123-127 uses
  gmres+jacobi at rtol 1e-8 regardless of case options)

The matrix changes every step (lagged convection), so the scan body
re-assembles the advection block — a cell-batched einsum — and solves
with jitted GMRES. Periodic cases identify opposite-boundary dofs in the
function space (spaces._apply_periodic) and carry no Dirichlet rows.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

import os

from ..fem import symbolic
from ..fem.assemble import local_advection, local_mass, local_stiffness
from ..solvers.dispatch import (
    _apply_local,
    solve_constrained,
    solve_constrained_ir,
)
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid

_MIXED = os.environ.get("PDEBENCH_TPU_MIXED_PRECISION", "1") == "1"


class BurgersSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms_u = pde.get("manufactured_solution", {}).get("u")
        periodic = "periodic" in config.get("bc", {})
        if mms_u is not None and not periodic:
            config = scalar.override_bc_with_mms(config, mms_u)
            pde = config["pde"]
        nu = float(pde.get("pde_params", {}).get("nu", 0.01))
        t0, t_end, dt, num_steps = base.time_params(
            pde, default_t_end=0.1, default_dt=0.01
        )
        t_final = t0 + num_steps * dt

        ctx = scalar.setup_scalar(config, t0=t0)
        dim = ctx.dim

        if mms_u is not None:
            u_sym = symbolic.parse(mms_u)
            sv = [symbolic.X, symbolic.Y, symbolic.Z][:dim]
            conv = u_sym * sum(sp.diff(u_sym, v) for v in sv)
            src = sp.diff(u_sym, symbolic.T) + conv - nu * symbolic.laplacian(
                u_sym, dim
            )
            ic = mms_u
        else:
            src = pde.get("source_term", 0.0)
            ic = pde.get("initial_condition", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim, with_time=True)
        u0 = base.interpolate_nodal(ctx.space, ic, t=t0)
        _, g_fn = base.dirichlet_traceable(ctx.space, config.get("bc", {}))

        # reference hard-codes gmres+jacobi rtol 1e-8 (burger.py:123-127)
        rtol, atol, maxiter = 1e-8, 1e-10, 25000

        space, cb = ctx.space, ctx.cb
        dofmap = jnp.asarray(space.dofmap_scalar)
        ndof, mask = space.ndof, ctx.mask
        qpts = ctx.qpts()
        phi = cb.phi
        ts = t0 + dt * jnp.arange(1, num_steps + 1)
        inv_dt = 1.0 / dt

        # structured meshes: the per-step matrix (lagged convection)
        # shares the constant part's adjacency, so the inner Krylov can
        # stay a gather-free stencil with freshly-scattered weights each
        # step, preconditioned by the constant part's GMG hierarchy
        lattice32, wmap = None, None
        if _MIXED:
            A_const = (
                inv_dt * local_mass(cb) + nu * local_stiffness(cb)
            )
            lattice32 = scalar.attach_gmg(
                scalar.maybe_lattice32(ctx, A_const),
                A_const,
                space,
                np.asarray(mask),
            )
            if lattice32 is not None:
                from ..solvers.stencil import lattice_weight_map

                if getattr(lattice32, "gmg", None) is not None:
                    wmap = lattice_weight_map(
                        lattice32.lattice, space.dofmap_scalar
                    )
                if wmap is None:
                    lattice32 = None
        apply_M = None
        if lattice32 is not None:
            appl = scalar.stencil_appliers64(
                lattice32, space.dofmap_scalar, local_mass(cb)
            )
            apply_M = appl[0] if appl else None

        # Scatter-free per-step weights: the lagged convection matrix is
        # LINEAR in u_n, so the scattered stencil weights are a fixed
        # bilinear map W(u) = W_const + sum_taps P * shift(u) — built
        # host-side once; the scan body does shifted FMAs instead of the
        # in-jit scatter (the round-2 measured per-step cost). Exact
        # incl. boundary cells; gated to sizes where the host T tensor
        # (c, nl^3) is reasonable (2-D dataset lattices).
        bwm, W_const32 = None, None
        _conv_on = os.environ.get("PDEBENCH_TPU_BURGERS_CONV", "1") == "1"
        if _conv_on and lattice32 is not None and wmap is not None:
            gph = np.asarray(cb.grad_phys())
            c_n, _nq, nl_n, _d = gph.shape
            if c_n * nl_n**3 <= 3e7:
                g_sum = gph.sum(-1)  # (c, nq, nl): all-ones beta direction
                T_adv = np.einsum(
                    "cq,qi,qk,cqj->cijk",
                    np.asarray(cb.wdetJ),
                    np.asarray(phi),
                    np.asarray(phi),
                    g_sum,
                    optimize=True,
                )
                from ..solvers.stencil import BilinearLatticeWeightMap

                bwm = BilinearLatticeWeightMap(
                    wmap, lattice32.lattice, space.dofmap_scalar, T_adv
                )
                W_const32 = jnp.asarray(
                    wmap.weights_np(np.asarray(A_const)), dtype=jnp.float32
                )

        @jax.jit
        def run_scan(M, K, u0_arr, P_parts, W_c32):
            # rebuild the dense bilinear plane stack in-trace from the
            # small compressed parts (tile + boundary bands): shipping
            # the dense ~50 MB stack through the axon tunnel cost ~1.5 s
            # (tiled mode never materializes the dense stack at all —
            # the per-step build multiplies taps by the VMEM-resident
            # phase tile; PLAN_r3 #2. OPT-IN after the round-3 quiet
            # TPU A/B measured the scan segment LOSING 8%: 0.764 s vs
            # 0.705 s dense on burgers_square_v1 — the blockwise
            # (ny/r, r, nx/r, r) reshape relayout costs more than the
            # dense-P reads it saves; weights are bit-identical.)
            _tiled = os.environ.get("PDEBENCH_TPU_WBUILD", "dense") == "tiled"
            P_adv = (
                None
                if (bwm is None or _tiled)
                else bwm.P_dense(P_parts)
            )

            def _step_weights(u_lat32):
                if _tiled:
                    return bwm.weights_w_parts(P_parts, u_lat32)
                return bwm.weights_w(P_adv, u_lat32)
            # per-step load vectors and Dirichlet values hoisted OUT of
            # the scan: one batched scatter each replaces num_steps
            # in-scan scatters (TPU scatters serialize — the round-2
            # measured per-step cost class)
            B_all = jax.vmap(lambda t: ctx.load_vector(f_fn(qpts, t)))(ts)
            G_all = jax.vmap(g_fn)(ts)

            def step(u_n, xs):
                t_next, b_ext, g = xs
                # cell-local per-step matrix: DEAD in the stencil +
                # bilinear-weights path (raw64/A32/M all come from the
                # step weights there), so skip building it — its M/K
                # inputs then need no device transfer at all
                if _need_A:
                    # lagged convection coefficient at quadrature
                    # points: beta = u_n * (1, ..., 1)
                    un_q = jnp.einsum("qi,ci->cq", phi, u_n[dofmap])
                    beta_q = jnp.repeat(un_q[..., None], dim, axis=-1)
                    A = inv_dt * M + local_advection(cb, beta_q) + nu * K
                else:
                    A = None
                Mu = (
                    apply_M(u_n)
                    if apply_M is not None
                    else _apply_local(M, dofmap, ndof, u_n)
                )
                b = inv_dt * Mu + b_ext
                if _MIXED:
                    # matrix changes per step (lagged convection): cast
                    # the fresh batch and run FGMRES-IR
                    A32 = A.astype(jnp.float32) if A is not None else None
                    if bwm is not None:
                        u_lat32 = lattice32.embedding.embed(
                            u_n.astype(jnp.float32), 0
                        ).reshape(lattice32.shape)
                        sw = (
                            wmap,
                            W_c32 + _step_weights(u_lat32),
                        )
                    else:
                        sw = (
                            (wmap, wmap.weights(A32))
                            if lattice32 is not None
                            else None
                        )
                    x, it, res, conv = solve_constrained_ir(
                        A, A32, dofmap, b, mask, g, ndof,
                        rtol, atol,
                        inner_iters=20 if lattice32 is not None else 60,
                        inner="gmres",
                        lattice32=lattice32,
                        step_weights=sw,
                    )
                else:
                    x, it, res, conv = solve_constrained(
                        A, dofmap, b, mask, g, ndof, "gmres", rtol, atol,
                        maxiter,
                    )
                return x, (it, res)

            return jax.lax.scan(step, u0_arr, (ts, B_all, G_all))

        # The cell-local per-step matrix is needed only off the
        # stencil+bilinear fast path (or for the exact cell outer);
        # when dead, don't even ship its M/K inputs to the device
        # (2 x ~10 MB f64 over the axon tunnel).
        _need_A = (
            (not _MIXED)
            or bwm is None
            or os.environ.get("PDEBENCH_TPU_STEP_OUTER", "stencil")
            == "cell"
        )

        # hoist per-case constants OUT of the timed run(): bwm.P alone
        # is a pairs x n_lat f32 plane stack (~50 MB at res 128) whose
        # np->jnp conversion re-crossed the host->device tunnel on every
        # warm pass, and the local mass/stiffness host einsums re-ran
        # per pass (round-3 micro-split: scan 0.66 s vs reported 2.6 s).
        # Their one-time cost is still charged — to t_setup.
        def build():
            if _need_A or apply_M is None:
                K_loc = jnp.asarray(local_stiffness(cb))
                M_loc = jnp.asarray(local_mass(cb))
            else:
                K_loc = M_loc = None
            P_dev = bwm.P_parts if bwm is not None else None
            return K_loc, M_loc, P_dev, jnp.asarray(u0)

        K_loc, M_loc, P_dev, u0_dev = base.charge_setup(ctx, build)

        def run():
            u, (its, ress) = run_scan(
                M_loc, K_loc, u0_dev, P_dev, W_const32,
            )
            grid = ctx.sample(np.asarray(u))
            return grid, {
                "iterations": int(np.asarray(its).sum()),
                "residual": float(np.asarray(ress)[-1]),
            }

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
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
            "pde": "burgers",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": space.degree,
            "nu": nu,
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
            num_dofs=ndof,
        )
