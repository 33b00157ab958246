"""Stokes oracle: steady incompressible Stokes, Taylor-Hood P2-P1.

  -nu Lap(u) + grad(p) = f,  div(u) = 0
  a((u,p),(v,q)) = nu grad u : grad v - p div v - q div u

Parity (reference: pdebench/oracle/stokes.py:130-391): Taylor-Hood
spaces from fem.degree_u/degree_p; velocity Dirichlet segments via the
side-selector DSL; pressure pinned at the dof nearest the origin
(:233-251); MMS source f = -nu Lap(u_exact) + grad(p_exact); the output
field is velocity magnitude. Solver routes: preonly/lu -> host SuperLU
(UMFPACK/MUMPS role), minres -> device MINRES with the block-diagonal
diag(A) (+) nu Mp^-1 preconditioner.
"""

from __future__ import annotations

from typing import Any, Dict, List

import os

import jax.numpy as jnp
import numpy as np
import sympy as sp

from ..fem import symbolic
from ..fem.assemble import (
    constrained_diag,
    constrained_operator,
    constrained_rhs,
    local_divergence,
    local_vector_laplacian,
    local_vector_load,
    scatter_add,
)
from ..solvers import direct as directmod
from ..solvers.krylov import minres
from . import base, mixed, scalar
from .types import OracleResult, compute_rel_L2_grid


def stokes_source(u_exprs: List, p_expr, nu: float, dim: int) -> List[sp.Expr]:
    """f = -nu Lap(u_exact) + grad(p_exact) componentwise."""
    sv = [symbolic.X, symbolic.Y, symbolic.Z][:dim]
    u = [symbolic.parse(e) for e in u_exprs]
    p = symbolic.parse(p_expr if p_expr is not None else 0)
    return [
        sp.simplify(-nu * symbolic.laplacian(u[a], dim) + sp.diff(p, sv[a]))
        for a in range(dim)
    ]


class StokesSolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        mms = pde.get("manufactured_solution", {})
        mms_u = mms.get("u")
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, list(mms_u))
            pde = config["pde"]
        nu = float(pde.get("pde_params", {}).get("nu", 1.0))

        ctx = mixed.setup_taylor_hood(config)
        dim = ctx.dim

        if mms_u is not None:
            src = stokes_source(mms_u, mms.get("p"), nu, dim)
        else:
            src = pde.get("source_term", [0.0] * dim)
            if not isinstance(src, (list, tuple)):
                src = [src] * dim
        f_fns = [symbolic.lambdify_spatial(s, dim) for s in src]
        opts = base.solver_opts(config)
        ksp = str(opts.get("ksp_type", "minres")).lower()
        pc = str(opts.get("pc_type", "jacobi")).lower()
        use_direct = ksp == "preonly" or pc in ("lu", "cholesky", "mumps")
        rtol = float(opts.get("rtol", 1e-10))
        atol = float(opts.get("atol", 1e-12))

        V, Q, cb = ctx.V, ctx.Q, ctx.cb
        dofmap_u = jnp.asarray(V.dofmap)
        dofmap_p = jnp.asarray(Q.dofmap_scalar)

        # one-time (untimed) solver construction: preconditioner setup +
        # a jitted MINRES so the warm timed pass hits the jit cache.
        # Forced-direct configs (preonly/lu — the reference's robustness
        # override, dealii_oracle/oracle.py:503-513) still take the
        # MINRES path when the structured stencil-GMG preconditioner
        # attaches: it reaches the same rtol 3x faster than a host
        # factorization, and the LU fallback below catches
        # non-convergence; unstructured direct cases go straight to LU.
        jitted_minres = None
        M = None
        parts = None
        try:
            # structured meshes: gather-free stencil-GMG on the
            # velocity block (one scalar hierarchy per component)
            parts = mixed.saddle_gmg_precond_parts(
                V, nu, cb, ctx.psi, dofmap_p, Q.ndof, ctx.mask
            )
        except Exception:
            parts = None
        if parts is not None:
            _inv_p = parts.inv_p
            _mask_full = parts.mask_full

            def M(r):  # block-diagonal, SPD — for MINRES
                zu = parts.Mv(r[: V.ndof])
                out = jnp.concatenate(
                    [zu, _inv_p.astype(r.dtype) * r[V.ndof :]]
                )
                return jnp.where(_mask_full, r, out)
        if M is None and not use_direct:
            A_pre = local_vector_laplacian(cb, nu)
            precond = (
                mixed.saddle_amg_precond
                if ctx.N >= 20000
                else mixed.saddle_diag_precond
            )
            M = precond(
                A_pre, cb, ctx.psi, dofmap_u, dofmap_p,
                V.ndof, Q.ndof, nu, ctx.mask,
            )
        if M is not None:

            import jax as _jax

            # structured meshes: the whole saddle matvec is a nested-
            # lattice stencil (solvers.saddle_stencil) — gather-free
            # for BOTH the f32 Lanczos recurrence and the f64 true-
            # residual restarts (~20x the cell-based apply on TPU).
            # Constant operator: weights built host-side once (numpy —
            # eager device scatters compile remotely on axon).
            sst = None
            WA64 = WA32 = None
            try:
                from ..solvers.saddle_stencil import build_saddle_stencil

                sst = build_saddle_stencil(
                    V, Q, np.asarray(local_divergence(cb, ctx.psi))
                )
                if sst is not None:
                    WA_np = sst.wmapA.weights_np(
                        np.asarray(local_vector_laplacian(cb, nu))
                    )
                    WA64 = jnp.asarray(WA_np)
                    WA32 = jnp.asarray(WA_np, dtype=jnp.float32)
            except Exception:
                sst = None

            # lattice-layout MINRES (default on structured meshes):
            # Krylov vectors stay [u_lat; p_lat] end to end — the
            # per-iteration dof<->lattice gathers of the flat layout
            # are the measured per-iteration cost (BASELINE.md r3 #11:
            # saddle apply 914 -> 632 us, M 905 -> 412 us on TPU).
            # One rhs embed + one solution extract per solve.
            # PDEBENCH_TPU_SADDLE_LAT=0 restores the flat-dof layout.
            lsv = None
            if (
                sst is not None
                and parts is not None
                and parts.Mv_grid is not None
                and os.environ.get(
                    "PDEBENCH_TPU_SADDLE_LAT",
                    # TPU default; flat on CPU where gathers are cheap
                    # and the padded lattice vectors cost more
                    # (measured: stokes_basic CPU 3.56 flat / 3.91 lat)
                    "1"
                    if _jax.devices()[0].platform in ("tpu", "axon")
                    else "0",
                ) == "1"
            ):
                from ..solvers.saddle_stencil import LatticeSaddleVectors

                lsv = LatticeSaddleVectors(sst, np.asarray(ctx.mask))
                _invp_plane = lsv.embed_plane_p(np.asarray(parts.inv_p))
                M_lat = lsv.block_diag_M(parts.Mv_grid, _invp_plane)

            @_jax.jit
            def jitted_minres(A_loc, G_loc, b, mask, g):
                if lsv is not None:
                    A = constrained_operator(
                        lsv.apply_w(WA64), lsv.mask_lat
                    )
                    A32 = constrained_operator(
                        lsv.apply_w(WA32), lsv.mask_lat
                    )
                    b_lat = lsv.embed(b)
                    g_lat = lsv.embed(g)
                    rhs = constrained_rhs(
                        lsv.apply_w(WA64), b_lat, lsv.mask_lat, g_lat
                    )
                    x0 = jnp.where(lsv.mask_lat, g_lat, 0.0)
                    x_lat, kinfo = minres(
                        A, rhs, x0=x0, M=M_lat, rtol=rtol, atol=atol,
                        maxiter=5000, A32=A32,
                    )
                    return lsv.extract(x_lat), kinfo
                if sst is not None:
                    apply_raw = sst.saddle_apply_w(WA64)
                    apply32 = sst.saddle_apply_w(WA32)
                else:
                    apply_raw = mixed.saddle_apply(
                        A_loc, G_loc, dofmap_u, dofmap_p, V.ndof, Q.ndof
                    )
                    # f32 saddle twin: the Lanczos recurrence runs
                    # MINRES-IR at native f32 speed (v5e emulates f64);
                    # true-residual restarts recover rtol 1e-10
                    apply32 = mixed.saddle_apply(
                        A_loc.astype(jnp.float32),
                        G_loc.astype(jnp.float32),
                        dofmap_u, dofmap_p, V.ndof, Q.ndof,
                    )
                A = constrained_operator(apply_raw, mask)
                A32 = constrained_operator(apply32, mask)
                rhs = constrained_rhs(apply_raw, b, mask, g)
                x0 = jnp.where(mask, g, 0.0)
                # capped: a saddle MINRES that hasn't converged by 5000
                # preconditioned iterations won't; the host LU fallback
                # is faster than grinding to 30k
                return minres(
                    A, rhs, x0=x0, M=M, rtol=rtol, atol=atol,
                    maxiter=5000, A32=A32,
                )

            # OPT-IN A/B (PDEBENCH_TPU_STOKES_FGMRES=1): FGMRES-IR with
            # the block lower-TRIANGULAR Schur preconditioner (the NS
            # Newton route, navier_stokes.py) instead of MINRES + the
            # block-diagonal M. GMRES does not need symmetry, and the
            # triangular form clusters the preconditioned spectrum.
            if (
                sst is not None
                and parts is not None
                and os.environ.get("PDEBENCH_TPU_STOKES_FGMRES", "0")
                == "1"
            ):
                from ..fem.assemble import (
                    constrained_operator as _con_op,
                    constrained_rhs as _con_rhs,
                )
                from ..solvers.krylov import refined_solve

                _inv_p32 = parts.inv_p.astype(jnp.float32)

                def _M32_tri(r32):
                    ru, rp = r32[: V.ndof], r32[V.ndof :]
                    zu = parts.Mv(ru)
                    u_lat = sst.blat.embed(zu, 0.0).reshape(
                        sst.fine + (sst.d,)
                    )
                    gt = sst.applyGT(sst.WGT32, u_lat).reshape(-1)[
                        sst._pinv
                    ]
                    zp = -_inv_p32 * (rp - gt)
                    out = jnp.concatenate([zu, zp])
                    return jnp.where(_mask_full, r32, out)

                @_jax.jit
                def jitted_minres(A_loc, G_loc, b, mask, g):
                    apply_raw = sst.saddle_apply_w(WA64)
                    apply32 = sst.saddle_apply_w(WA32)
                    A64c = _con_op(apply_raw, mask)
                    A32c = _con_op(apply32, mask)
                    rhs = _con_rhs(apply_raw, b, mask, g)
                    x, info = refined_solve(
                        A64c, A32c, rhs, M32=_M32_tri,
                        rtol=rtol, atol=atol,
                        inner_iters=40, max_outer=40, inner="gmres",
                    )
                    return x, info

        def build():
            A_loc = jnp.asarray(local_vector_laplacian(cb, nu))
            G_loc = jnp.asarray(local_divergence(cb, ctx.psi))
            # host f_q: keeps local_vector_load an np.einsum (a device
            # f_q would make it an eager remote op on axon)
            f_q = np.stack(
                [np.asarray(f(np.asarray(ctx.qpts()))) for f in f_fns],
                axis=-1,
            )
            b_u = scatter_add(local_vector_load(cb, f_q), dofmap_u, V.ndof)
            return A_loc, G_loc, jnp.concatenate([b_u, jnp.zeros(Q.ndof)])

        A_loc, G_loc, b = base.charge_setup(ctx, build)

        def run():
            info: Dict[str, Any] = {"ksp_type": ksp, "pc_type": pc, "rtol": rtol}
            if jitted_minres is not None:
                x, kinfo = jitted_minres(A_loc, G_loc, b, ctx.mask, ctx.g)
                if bool(kinfo.converged):
                    info.update(
                        method="minres",
                        iterations=int(kinfo.iterations),
                        residual=float(kinfo.residual),
                        saddle_layout="lattice" if lsv is not None else "flat",
                    )
                    grid = ctx.sample_velocity_magnitude(np.asarray(x))
                    return grid, info
                info["iterative_failed"] = {
                    "iterations": int(kinfo.iterations),
                    "residual": float(kinfo.residual),
                }
            K = mixed.saddle_to_scipy(
                A_loc, G_loc, V.dofmap, Q.dofmap_scalar, V.ndof, Q.ndof
            )
            x = directmod.solve_direct_constrained(
                K, np.asarray(b), np.asarray(ctx.mask), np.asarray(ctx.g)
            )
            info.update(method="lu", iterations=1)
            grid = ctx.sample_velocity_magnitude(x)
            return grid, info

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid)
            if err is None and "reference_config" in config:
                ref_cfg = scalar.merge_reference_config(config)
                # robustness cap mirroring the reference's own Stokes
                # override (dealii_oracle/oracle.py:410-423: reference
                # re-solves forced direct and capped at resolution 128
                # ONLY when the reference solver is not already a direct
                # preonly/lu config): unbounded P3-P2 iterative saddle
                # re-solves at res 240 are pathological for any backend
                ref_solver = ref_cfg.get("oracle_solver", {})
                already_direct = ref_solver.get(
                    "ksp_type"
                ) == "preonly" or ref_solver.get("pc_type") in ("lu", "mumps")
                if not already_direct:
                    mres = int(ref_cfg.get("mesh", {}).get("resolution", 128))
                    ref_cfg.setdefault("mesh", {})["resolution"] = min(
                        mres, 128
                    )
                    fem_cfg = ref_cfg.setdefault("fem", {})
                    fem_cfg["degree_u"] = min(
                        int(fem_cfg.get("degree_u", 2)), 2
                    )
                    fem_cfg["degree_p"] = min(
                        int(fem_cfg.get("degree_p", 1)), 1
                    )
                ref = self.solve(ref_cfg, _compute_baseline=False)
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "stokes",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": ctx.V.degree,
            "degree_p": ctx.Q.degree,
            "viscosity": nu,
            "pressure_fixing": "point",
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=ctx.N,
        )
