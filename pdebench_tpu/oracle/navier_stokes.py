"""Navier-Stokes oracle: steady incompressible NS, Taylor-Hood, Newton
with backtracking line search and nu-continuation.

  F((u,p);(v,q)) = ((grad u) u, v) + nu (grad u, grad v) - (p, div v)
                   - (q, div u) - (f, v)

Parity (reference: pdebench/oracle/navier_stokes.py:188-367):
  - init modes: 'stokes' (Stokes solve warm start), 'zero', 'exact'
    (interpolate u_exact), 'continuation' (geometric nu ladder
    nu_start * (nu/nu_start)^(k/n) for k=1..n, Stokes init at nu_start,
    Newton at each rung with rtol 1e-8/atol 1e-10)
  - final Newton at the case's rtol/atol/max_it with 'bt' line search
  - the Newton linear systems are solved DIRECT (pc_type lu default,
    reference uses PETSc LU/MUMPS) — here host SuperLU on the assembled
    saddle Jacobian, with residual/Jacobian blocks computed as batched
    einsums on device
  - MMS: f = (grad u)u - nu Lap(u) + grad(p) derived symbolically;
    divergence-free check on the manufactured velocity (:143-146)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
import sympy as sp

from ..fem import symbolic
from ..fem.assemble import (
    local_divergence,
    local_vector_laplacian,
    local_vector_load,
    scatter_add,
)
from ..solvers import direct as directmod
from ..solvers.krylov import minres
from . import base, mixed, scalar
from .types import OracleResult, compute_rel_L2_grid


def ns_source(u_exprs: List, p_expr, nu: float, dim: int) -> List[sp.Expr]:
    """f = (grad u)u - nu Lap(u) + grad(p), componentwise sympy."""
    sv = [symbolic.X, symbolic.Y, symbolic.Z][:dim]
    u = [symbolic.parse(e) for e in u_exprs]
    p = symbolic.parse(p_expr if p_expr is not None else 0)
    out = []
    for a in range(dim):
        conv = sum(u[b] * sp.diff(u[a], sv[b]) for b in range(dim))
        out.append(
            sp.simplify(conv - nu * symbolic.laplacian(u[a], dim) + sp.diff(p, sv[a]))
        )
    return out


class NavierStokesSolver:
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
        V, Q, cb = ctx.V, ctx.Q, ctx.cb
        dofmap_u = jnp.asarray(V.dofmap)
        dofmap_p = jnp.asarray(Q.dofmap_scalar)
        nlu_s = V.dofmap_scalar.shape[1]  # scalar nodes per cell

        if mms_u is not None:
            src = ns_source(mms_u, mms.get("p"), nu, dim)
            # divergence-free sanity (reference :143-146)
            sv = [symbolic.X, symbolic.Y, symbolic.Z][:dim]
            div_u = sp.simplify(
                sum(sp.diff(symbolic.parse(e), v) for e, v in zip(mms_u, sv))
            )
            if div_u != 0 and sp.simplify(div_u) != 0:
                raise ValueError(f"manufactured velocity not divergence-free: {div_u}")
        else:
            src = pde.get("source_term", [0.0] * dim)
            if not isinstance(src, (list, tuple)):
                src = [src] * dim
        f_fns = [symbolic.lambdify_spatial(s, dim) for s in src]

        opts = base.solver_opts(config)
        init_mode = str(opts.get("init", "stokes")).lower()
        snes_rtol = float(opts.get("rtol", 1e-10))
        snes_atol = float(opts.get("atol", 1e-12))
        snes_max_it = int(opts.get("max_it", 50))

        mask_np = np.asarray(ctx.mask)
        g_np = np.asarray(ctx.g)
        phi = cb.phi
        gphys = cb.grad_phys()
        w_q = cb.wdetJ

        A1_loc = local_vector_laplacian(cb, 1.0)  # scale by nu per rung
        G_loc = local_divergence(cb, ctx.psi)
        # host f_q: keeps local_vector_load an np.einsum (device f_q
        # would dispatch eager remote einsums on axon)
        f_q = np.stack(
            [np.asarray(f(np.asarray(ctx.qpts()))) for f in f_fns],
            axis=-1,
        )
        b_u = scatter_add(local_vector_load(cb, f_q), dofmap_u, V.ndof)
        b = jnp.concatenate([b_u, jnp.zeros(Q.ndof)])
        mask_j, g_j = ctx.mask, ctx.g

        # Device iterative machinery on structured lattices (TPU/axon
        # default; each piece falls back gracefully off-lattice):
        #   parts — the stencil-GMG saddle preconditioner pieces
        #           (per-component velocity V-cycle + pressure Schur
        #           diagonal, mixed.saddle_gmg_precond_parts)
        #   sst   — the gather-free Taylor-Hood saddle stencil
        # From these the solve builds (a) the block-diagonal SPD M for
        # the MINRES Stokes-init fallback, and (b) a block lower-
        # TRIANGULAR M for the Newton FGMRES-IR path (zp includes the
        # -inv_p (r_p - G^T zu) Schur update; GMRES does not need
        # symmetry and the triangular form clusters the preconditioned
        # spectrum near 1). Host SuperLU remains the fallback whenever
        # the device solves are unavailable or unconverged.
        # CPU default stays host-LU: the 1-core host SuperLU beats the
        # f32 Krylov there and the jitted programs pay the XLA-CPU
        # constant-folding compile stall (round-2 A/B).
        # Device whole-Newton is OPT-IN everywhere after the round-3
        # same-window TPU A/B: 5.3-5.5 s (1920 fixed-length FGMRES-IR
        # iterations; the Stokes-only velocity V-cycle gains ~0.1
        # digit/restart on the CONVECTED Jacobian) vs 3.62 s for the
        # device MINRES init + 2 host SuperLU Newton solves on the same
        # contended box (~2.4 s idle). inner=80 measured 3.74 s — still
        # behind. The named fix is a convection-aware M (true-Jacobian
        # smoothing over the Stokes coarse hierarchy), not more
        # restarts.
        _init_env = os.environ.get("PDEBENCH_TPU_NS_DEVICE_INIT", "")
        _dev_env = os.environ.get("PDEBENCH_TPU_NS_DEVICE_NEWTON", "")
        _on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        use_dev_init = _init_env != "0" and (_on_tpu or _init_env == "1")
        use_dev_newton = _dev_env == "1"
        # opt-in A/B (PLAN_r4 #3b): keep host LU for the FIRST Newton
        # step (Jacobian at the Stokes init is factored once) but solve
        # LATER steps on device at a loose Eisenstat-Walker eta — the
        # Jacobian near the solution is far better conditioned than at
        # zero, so one eta~1e-2 FGMRES-IR may replace host LU #2
        use_dev_step2 = (
            os.environ.get("PDEBENCH_TPU_NS_DEVICE_STEP2", "0") == "1"
        )

        parts = None
        sst = None
        if use_dev_init or use_dev_newton or use_dev_step2:
            try:
                parts = mixed.saddle_gmg_precond_parts(
                    V, nu, cb, ctx.psi, dofmap_p, Q.ndof, ctx.mask,
                    q_space=Q,
                )
            except Exception:
                parts = None
            try:
                from ..solvers.saddle_stencil import build_saddle_stencil

                sst = build_saddle_stencil(V, Q, np.asarray(G_loc))
            except Exception:
                sst = None

        M_init = None
        M32_newton = None
        if parts is not None:
            inv_p64 = parts.inv_p
            inv_p32 = parts.inv_p.astype(jnp.float32)
            mask_full = parts.mask_full
            # Chebyshev pressure-mass Schur (SPD in the D inner
            # product, MINRES-safe), PDEBENCH_TPU_NS_SCHUR=mass. OPT-IN:
            # the round-3 CPU A/B on navier_stokes_basic measured no win
            # (old M 720/720 its diag/mass; hier M 800 -> 1360) — the
            # lumped diagonal is apparently as good a Schur for these
            # operators, so the extra 3 stencil applies stay off by
            # default pending a case where the mass solve matters.
            _schur_mass = (
                os.environ.get("PDEBENCH_TPU_NS_SCHUR", "diag") == "mass"
                and parts.Mp_solve is not None
            )

            def _schur32(rp):
                if _schur_mass:
                    return parts.Mp_solve(rp)
                return inv_p32 * rp

            def _schur64(rp):
                if _schur_mass:
                    return parts.Mp_solve(rp)
                return inv_p64.astype(rp.dtype) * rp

            def M_init(r):  # block-diagonal, SPD — for MINRES
                zu = parts.Mv(r[: V.ndof])
                out = jnp.concatenate([zu, _schur64(r[V.ndof :])])
                return jnp.where(mask_full, r, out)

            _tri_env = os.environ.get("PDEBENCH_TPU_NS_TRI_M", "1")
            if sst is not None and _tri_env == "1":

                def M32_newton(r32):  # block lower-triangular — FGMRES
                    ru, rp = r32[: V.ndof], r32[V.ndof :]
                    zu = parts.Mv(ru)
                    u_lat = sst.blat.embed(zu, 0.0).reshape(
                        sst.fine + (sst.d,)
                    )
                    gt = sst.applyGT(sst.WGT32, u_lat).reshape(-1)[
                        sst._pinv
                    ]
                    zp = -_schur32(rp - gt)
                    out = jnp.concatenate([zu, zp])
                    return jnp.where(mask_full, r32, out)

            else:

                def M32_newton(r32):  # block-diagonal (no G^T stencil)
                    zu = parts.Mv(r32[: V.ndof])
                    out = jnp.concatenate(
                        [zu, _schur32(r32[V.ndof :])]
                    )
                    return jnp.where(mask_full, r32, out)

        # MINRES-IR Stokes init (round-2 path): kept as the fallback
        # init when the Newton FGMRES path is off or fails — the init
        # operator [[nu A, G], [G^T, 0]] is the symmetric Stokes saddle
        # (stokes.py:139-166) and warm-start accuracy (rtol 1e-6) is all
        # Newton needs.
        stokes_init_minres = None
        WA1_np = None
        if use_dev_init and M_init is not None and sst is not None:
            from ..fem.assemble import (
                constrained_operator as _con_op,
                constrained_rhs as _con_rhs,
            )

            # host-side weights for the UNIT-viscosity A-block; each
            # nu rung is a numpy scale (weights as jit ARGUMENTS —
            # closure constants trigger XLA constant-folding stalls)
            WA1_np = sst.wmapA.weights_np(np.asarray(A1_loc))

            # warm-start accuracy only: the first Newton LU step
            # corrects any algebraic init error, and the Stokes/NS
            # model gap is O(Re) >> the init tolerance anyway
            _init_rtol = float(
                os.environ.get("PDEBENCH_TPU_NS_INIT_RTOL", "1e-6")
            )

            # lattice-layout Krylov vectors (measured round 3: the
            # per-iteration dof<->lattice gathers dominate the saddle
            # per-it cost — BASELINE.md #11); flat layout restored by
            # PDEBENCH_TPU_SADDLE_LAT=0 or when the polynomial mass
            # Schur (a dof-vector callable) is active
            _lsv_init = None
            if (
                parts.Mv_grid is not None
                and not _schur_mass
                and os.environ.get(
                    "PDEBENCH_TPU_SADDLE_LAT",
                    "1" if _on_tpu else "0",
                )
                == "1"
            ):
                from ..solvers.saddle_stencil import (
                    LatticeSaddleVectors,
                )

                _lsv_init = LatticeSaddleVectors(
                    sst, np.asarray(ctx.mask)
                )
                _invp_plane = _lsv_init.embed_plane_p(
                    np.asarray(parts.inv_p)
                )
                _M_init_lat = _lsv_init.block_diag_M(
                    parts.Mv_grid, _invp_plane
                )

            @jax.jit
            def stokes_init_minres(WA64, rtol_):
                # rtol as a traced ARGUMENT: one compiled program
                # serves every tolerance (a closure constant would
                # recompile remotely per value — minutes on axon)
                if _lsv_init is not None:
                    A = _con_op(
                        _lsv_init.apply_w(WA64), _lsv_init.mask_lat
                    )
                    A32 = _con_op(
                        _lsv_init.apply_w(WA64.astype(jnp.float32)),
                        _lsv_init.mask_lat,
                    )
                    b_lat = _lsv_init.embed(b)
                    g_lat = _lsv_init.embed(g_j)
                    rhs = _con_rhs(
                        _lsv_init.apply_w(WA64), b_lat,
                        _lsv_init.mask_lat, g_lat,
                    )
                    x0 = jnp.where(_lsv_init.mask_lat, g_lat, 0.0)
                    x_lat, kinfo = minres(
                        A, rhs, x0=x0, M=_M_init_lat, rtol=rtol_,
                        atol=1e-12, maxiter=2000, A32=A32,
                    )
                    return _lsv_init.extract(x_lat), kinfo
                apply64 = sst.saddle_apply_w(WA64)
                apply32 = sst.saddle_apply_w(WA64.astype(jnp.float32))
                A = _con_op(apply64, mask_j)
                A32 = _con_op(apply32, mask_j)
                rhs = _con_rhs(apply64, b, mask_j, g_j)
                x0 = jnp.where(mask_j, g_j, 0.0)
                return minres(
                    A, rhs, x0=x0, M=M_init, rtol=rtol_,
                    atol=1e-12, maxiter=2000, A32=A32,
                )

        def velocity_fields(x):
            """(u_q, gradu_q) at quadrature points from the mixed vector."""
            u = x[: V.ndof]
            ue = u[dofmap_u].reshape(-1, nlu_s, dim)  # (c, nl, a)
            u_qp = jnp.einsum("qi,cia->cqa", phi, ue)
            gradu_qp = jnp.einsum("cqid,cia->cqad", gphys, ue)
            return u_qp, gradu_qp

        def residual_nu(x, nu_v):
            u_qp, gradu_qp = velocity_fields(x)
            conv_q = jnp.einsum("cqab,cqb->cqa", gradu_qp, u_qp)
            r_conv = local_vector_load(cb, conv_q)  # (c, nlu*d)
            base_apply = mixed.saddle_apply(
                nu_v * A1_loc, G_loc, dofmap_u, dofmap_p, V.ndof, Q.ndof
            )
            r = base_apply(x)
            r = r.at[: V.ndof].add(
                scatter_add(r_conv, dofmap_u, V.ndof)
            )
            r = r - b
            return jnp.where(mask_j, 0.0, r)

        def jacobian_u_block_nu(x, nu_v):
            u_qp, gradu_qp = velocity_fields(x)
            # N1[(ia)(jb)] = int phi_i phi_j du_a/dx_b
            N1 = jnp.einsum("qi,qj,cqab,cq->ciajb", phi, phi, gradu_qp, w_q)
            # N2[(ia)(jb)] = delta_ab int phi_i (u . grad phi_j)
            ug = jnp.einsum("cqjd,cqd->cqj", gphys, u_qp)
            N2s = jnp.einsum("qi,cqj,cq->cij", phi, ug, w_q)
            eye = jnp.eye(dim)
            N = N1 + jnp.einsum("cij,ab->ciajb", N2s, eye)
            c = N.shape[0]
            return nu_v * A1_loc + N.reshape(c, nlu_s * dim, nlu_s * dim)

        def residual(x):
            return residual_nu(x, nu_cur[0])

        def jacobian_u_block(x):
            return jacobian_u_block_nu(x, nu_cur[0])

        nu_cur = [nu]  # mutable closure cell for the continuation rung
        _phase_t = {"lin": 0.0, "init": 0.0}  # phase wall-clock (diagnostics)

        # Device path for the Newton linear systems: FGMRES-IR on the
        # saddle Jacobian with the block lower-triangular Stokes
        # preconditioner, f32 inner Arnoldi at native v5e speed.
        # Round-2 history: with a FIXED rtol 1e-8 per linear solve and
        # the block-DIAGONAL M, the whole-Newton device path measured
        # 6.1 s vs 2.4 s for 2 host SuperLU solves (idle box) and was
        # demoted to opt-in. Round 3 changes the solves themselves
        # rather than fusing kernels: (a) Eisenstat-Walker forcing —
        # each Newton step solves only as deep as the nonlinear
        # residual warrants (eta_0 = 0.1, eta_k ~ 0.9 (rn_k/rn_{k-1})^2,
        # oversolve-guarded by the outer tolerance), (b) the triangular
        # M above, (c) Newton starts from the BC-lifted ZERO state, so
        # its first step — Jacobian at u=0 IS the Stokes operator —
        # replaces the separate rtol 1e-6 MINRES init (356 Krylov its
        # on navier_stokes_basic) with one eta=0.1 solve; the outer
        # tolerance is re-anchored at the post-first-step residual to
        # keep the reference's 'stokes'-init SNES semantics (reference:
        # pdebench/oracle/navier_stokes.py:220-246,321-353).
        device_lin = None
        newton_device = None
        # sst (and with it the TRIANGULAR M) is required: the measured
        # block-diagonal-M FGMRES stalls on the convected Jacobian
        # (CPU+TPU A/B, res 48), and the cell-based saddle apply is
        # ~20x off the stencil — without the lattice the host LU wins.
        if (
            (use_dev_newton or use_dev_step2)
            and parts is not None
            and sst is not None
        ):
            from ..fem.assemble import (
                constrained_operator as _con_op,
            )
            from ..solvers.krylov import refined_solve

            G32 = G_loc.astype(jnp.float32)
            mask_j = ctx.mask

            # restart length matters on the convected saddle: GMRES(20)
            # loses the subspace at every restart; 40 keeps the f32
            # Arnoldi block at ~6 MB for dataset sizes
            _ns_inner = int(
                os.environ.get("PDEBENCH_TPU_NS_INNER_ITERS", "40")
            )
            # Convection-aware M modes (PDEBENCH_TPU_NS_CONV_M):
            #   "hier" — rebuild the WHOLE block-GMG hierarchy from the
            #     convected per-step Jacobian inside the jit (traced
            #     Galerkin coarsening, solvers/gmg_dyn.py): the V-cycle
            #     then contracts on the TRUE operator at every scale,
            #     not just the fine level.
            #   "1" — fine-level damped block-Jacobi smoothing around
            #     the Stokes V-cycle (the round-3 initial fix; gains
            #     ~0.1 digit/restart only).
            #   "0" — plain Stokes V-cycle M.
            _conv_mode = os.environ.get("PDEBENCH_TPU_NS_CONV_M", "1")
            _conv_m = _conv_mode == "1"
            _hier_spec = None
            if _conv_mode == "hier":
                from ..solvers.gmg_dyn import build_dyn_block_spec
                from ..solvers.stencil import constrain_stencil_weights

                # node mask on the velocity lattice (absent masked-
                # lattice sites count as constrained)
                _node_mask = (
                    np.asarray(ctx.mask)[: V.ndof].reshape(-1, dim).any(
                        axis=1
                    )
                )
                _mask_lat = sst.lat_u.embed_np(_node_mask, True).reshape(
                    sst.fine
                )
                # probe omegas on the constrained STOKES block weights
                # (same adjacency; diffusion sets the Jacobi spectrum)
                _W_probe = constrain_stencil_weights(
                    nu * sst.wmapA.weights_np(np.asarray(A1_loc)),
                    sst.wmapA.offsets,
                    _mask_lat,
                    d=dim,
                )
                _hier_spec = build_dyn_block_spec(
                    sst.wmapA.offsets, sst.fine, dim, probe_W=_W_probe
                )
                if _hier_spec is None:
                    _conv_m = True  # fall back to the fine smoother
                else:
                    _keep_node32 = jnp.asarray(
                        1.0 - _mask_lat.astype(np.float32)
                    )
                    _eye32 = jnp.eye(dim, dtype=jnp.float32)
                    _hier_cycles = int(
                        os.environ.get("PDEBENCH_TPU_NS_HIER_VCYCLES", "1")
                    )
                    # one Pallas launch per M application instead of
                    # ~dozens of XLA ops per level (the saddle FGMRES
                    # is latency-bound on the remote-TPU platform)
                    _hier_fused = None
                    if _on_tpu and os.environ.get(
                        "PDEBENCH_TPU_NS_HIER_FUSED", "1"
                    ) == "1":
                        try:
                            from ..solvers.gmg_fused import (
                                build_fused_dyn_block_vcycle,
                            )

                            _hier_fused = build_fused_dyn_block_vcycle(
                                _hier_spec, n_cycles=_hier_cycles
                            )
                        except Exception:
                            _hier_fused = None
            _dim0 = len(sst.fine)
            _k0 = sst.wmapA.offsets.index((0,) * _dim0)
            # per-(site, component) free mask on the velocity lattice
            _keep_np = 1.0 - sst.blat.embed_np(
                np.asarray(ctx.mask)[: V.ndof].astype(np.float32), 1.0
            ).reshape(sst.fine + (dim,))
            _keep = jnp.asarray(_keep_np)
            _om = float(os.environ.get("PDEBENCH_TPU_NS_CONV_OMEGA", "0.8"))

            def _make_conv_M(WA32):
                D = WA32[_k0]  # fine + (d, d)
                if dim == 2:
                    det = (
                        D[..., 0, 0] * D[..., 1, 1]
                        - D[..., 0, 1] * D[..., 1, 0]
                    )
                    ok = jnp.abs(det) > 1e-30
                    ds = jnp.where(ok, det, 1.0)
                    Dinv = jnp.stack(
                        [
                            jnp.stack(
                                [D[..., 1, 1] / ds, -D[..., 0, 1] / ds],
                                axis=-1,
                            ),
                            jnp.stack(
                                [-D[..., 1, 0] / ds, D[..., 0, 0] / ds],
                                axis=-1,
                            ),
                        ],
                        axis=-2,
                    )
                    eye = jnp.broadcast_to(
                        jnp.eye(2, dtype=WA32.dtype), Dinv.shape
                    )
                    Dinv = jnp.where(ok[..., None, None], Dinv, eye)
                else:  # diagonal-only inverse off 2-D
                    dg = jnp.diagonal(D, axis1=-2, axis2=-1)
                    safe = jnp.where(jnp.abs(dg) > 1e-30, dg, 1.0)
                    Dinv = (
                        jnp.eye(dim, dtype=WA32.dtype) / safe[..., None]
                    )

                def _dinv(r):
                    return _om * jnp.einsum("...ab,...b->...a", Dinv, r)

                def _smooth(x, r_lat):
                    res = (
                        r_lat - sst.wmapA.apply_grid(WA32, x)
                    ) * _keep
                    return x + _dinv(res)

                def M32c(r32):
                    ru, rp = r32[: V.ndof], r32[V.ndof :]
                    r_lat = (
                        sst.blat.embed(ru, 0.0).reshape(
                            sst.fine + (dim,)
                        )
                        * _keep
                    )
                    x = _dinv(r_lat)  # pre-smooth from zero
                    r1 = (
                        r_lat - sst.wmapA.apply_grid(WA32, x)
                    ) * _keep
                    zc = parts.Mv(sst.blat.extract(r1.reshape(-1)))
                    x = x + sst.blat.embed(zc, 0.0).reshape(
                        sst.fine + (dim,)
                    )
                    x = _smooth(x, r_lat)  # post-smooth
                    zu = sst.blat.extract(x.reshape(-1))
                    gt = sst.applyGT(sst.WGT32, x).reshape(-1)[
                        sst._pinv
                    ]
                    zp = -_schur32(rp - gt)
                    out = jnp.concatenate([zu, zp])
                    return jnp.where(parts.mask_full, r32, out)

                return M32c

            def _make_hier_M(WA32):
                """Block lower-triangular saddle M whose velocity solve
                is a V-cycle on the hierarchy Galerkin-coarsened from
                the CONVECTED per-step Jacobian (traced, gmg_dyn)."""
                from ..solvers.gmg_dyn import (
                    constrain_block_weights_traced,
                )

                WA32c = constrain_block_weights_traced(
                    WA32, sst.wmapA.offsets, _keep_node32, _eye32
                )
                lv = _hier_spec.build_levels(WA32c)
                sp0 = _hier_spec.levels[0]

                def M32c(r32):
                    ru, rp = r32[: V.ndof], r32[V.ndof :]
                    r_lat = (
                        sst.blat.embed(ru, 0.0).reshape(
                            sst.fine + (dim,)
                        )
                        * _keep_node32[..., None]
                    )
                    if _hier_fused is not None:
                        x = _hier_fused(
                            r_lat.reshape(-1), lv
                        ).reshape(sst.fine + (dim,))
                    else:
                        x = _hier_spec.vcycle(lv, r_lat)
                        for _ in range(_hier_cycles - 1):
                            res = r_lat - _apply_hier(lv[0][0], sp0, x)
                            x = x + _hier_spec.vcycle(lv, res)
                    zu = sst.blat.extract(x.reshape(-1))
                    gt = sst.applyGT(sst.WGT32, x).reshape(-1)[
                        sst._pinv
                    ]
                    zp = -_schur32(rp - gt)
                    out = jnp.concatenate([zu, zp])
                    return jnp.where(parts.mask_full, r32, out)

                return M32c

            def _apply_hier(W0, sp0, x):
                from ..solvers.gmg_dyn import _apply_block_w

                return _apply_block_w(
                    W0, sp0.offsets, sp0.pad, sp0.shape, x
                )

            def _lin_solve(Ju, rhs, eta):
                """Traceable saddle solve (FGMRES-IR, f32 inner) to a
                (possibly traced) relative tolerance eta."""
                M32_use = M32_newton
                if sst is not None:
                    WA64 = sst.wmapA.weights(Ju)
                    WA32 = WA64.astype(jnp.float32)
                    apply64 = sst.saddle_apply_w(WA64)
                    apply32 = sst.saddle_apply_w(WA32)
                    if _hier_spec is not None:
                        M32_use = _make_hier_M(WA32)
                    elif _conv_m:
                        M32_use = _make_conv_M(WA32)
                else:
                    apply64 = mixed.saddle_apply(
                        Ju, G_loc, dofmap_u, dofmap_p, V.ndof, Q.ndof
                    )
                    apply32 = mixed.saddle_apply(
                        Ju.astype(jnp.float32), G32,
                        dofmap_u, dofmap_p, V.ndof, Q.ndof,
                    )
                A64 = _con_op(apply64, mask_j)
                A32 = _con_op(apply32, mask_j)
                d, info = refined_solve(
                    A64, A32, rhs, M32=M32_use,
                    rtol=eta, atol=1e-12,
                    inner_iters=_ns_inner, max_outer=20, inner="gmres",
                )
                return d, info.converged, info.iterations

            device_lin = jax.jit(_lin_solve)

            # Whole-Newton single jit: jacobian, FGMRES-IR solve,
            # backtracking line search, and convergence control all
            # run as ONE device program (lax.while_loop) — on the
            # remote-TPU platform the host-driven loop pays a
            # network round trip per eager op, so fusing the whole
            # Newton solve is the difference between O(1) and
            # O(iterations x ops) transfers per case. Reference
            # semantics preserved: SNES newtonls with 'bt' line
            # search (pdebench/oracle/navier_stokes.py:321-353).
            @jax.jit
            def _newton_device_impl(
                x0, nu_v, rtol, atol, max_it, update_tol
            ):
                x = jnp.where(mask_j, g_j, x0)
                r = residual_nu(x, nu_v)
                rn0 = jnp.linalg.norm(r)
                tol0 = jnp.maximum(rtol * rn0, atol)

                def cond(st):
                    _x, _r, rn, _rp, _ep, tol, it, _nl, _ki, lin_ok = st
                    return (
                        (it < max_it)
                        & (rn > tol)
                        & (rn <= 1e4 * rn0)
                        & jnp.isfinite(rn)
                        & lin_ok
                    )

                def body(st):
                    (
                        x, r, rn, rn_prev, eta_prev, tol,
                        it, nlin, kry_its, lin_ok,
                    ) = st
                    # Eisenstat-Walker (choice 2) forcing with the
                    # standard safeguard; never solve deeper than the
                    # outer tolerance requires. The 1e-4 FLOOR is
                    # load-bearing: restarted f32 GMRES on the convected
                    # Jacobian cannot reliably deliver more than a few
                    # digits per solve at dataset sizes, and inexact
                    # Newton at eta=1e-4 still contracts ~1e-4 per step
                    # — more (cheap) Newton steps beat one stalled deep
                    # solve. (Measured: without the floor, the step-2
                    # eta collapses to ~1e-7 because step 1 starts from
                    # zero, and the solve stalls -> host-LU fallback.)
                    eta = 0.9 * (rn / rn_prev) ** 2
                    eta_safe = 0.9 * eta_prev * eta_prev
                    eta = jnp.where(
                        eta_safe > 0.1, jnp.maximum(eta, eta_safe), eta
                    )
                    eta = jnp.clip(eta, 1e-4, 0.1)
                    eta = jnp.maximum(
                        eta, jnp.minimum(0.1, 0.5 * tol / rn)
                    )
                    Ju = jacobian_u_block_nu(x, nu_v)
                    delta, conv, its = _lin_solve(Ju, -r, eta)
                    # backtracking 'bt': try t = 1, 1/2, ... 1/512;
                    # one final untested halving if all fail (same
                    # schedule as the host loop)
                    t1 = jnp.asarray(1.0, x.dtype)
                    rnn1 = jnp.linalg.norm(
                        residual_nu(x + t1 * delta, nu_v)
                    )

                    def ls_cond(c):
                        t, rnn, k = c
                        return (k < 9) & (
                            rnn > (1.0 - 1e-4 * t) * rn
                        )

                    def ls_body(c):
                        t, rnn, k = c
                        t2 = t * 0.5
                        rnn2 = jnp.linalg.norm(
                            residual_nu(x + t2 * delta, nu_v)
                        )
                        return t2, rnn2, k + 1

                    t, rnn, _ = jax.lax.while_loop(
                        ls_cond, ls_body, (t1, rnn1, 0)
                    )
                    t = jnp.where(
                        rnn > (1.0 - 1e-4 * t) * rn, t * 0.5, t
                    )
                    x_new = x + t * delta
                    r_new = residual_nu(x_new, nu_v)
                    rn_new = jnp.linalg.norm(r_new)
                    # from-zero start: after the first step (x1 ~ the
                    # Stokes solution) re-anchor the tolerance at
                    # ||F(x1)||, reproducing the reference's
                    # Stokes-init SNES rtol semantics
                    tol_new = jnp.where(
                        update_tol & (it == 0),
                        jnp.minimum(
                            tol, jnp.maximum(rtol * rn_new, atol)
                        ),
                        tol,
                    )
                    return (
                        x_new, r_new, rn_new, rn, eta, tol_new,
                        it + 1, nlin + 1, kry_its + its,
                        lin_ok & conv,
                    )

                x, _r, rn, _rp, _ep, tol, _it, nlin, kry_its, lin_ok = (
                    jax.lax.while_loop(
                        cond, body,
                        (x, r, rn0, rn0, jnp.asarray(0.1, x.dtype),
                         tol0, jnp.asarray(0), jnp.asarray(0),
                         jnp.asarray(0), jnp.asarray(True)),
                    )
                )
                return x, rn, nlin, kry_its, lin_ok, rn <= tol

            if use_dev_newton:
                newton_device = _newton_device_impl

        def newton(x0, rtol, atol, max_it, update_tol=False):
            import time as _time

            if newton_device is not None:
                t_l0 = _time.perf_counter()
                x_d, rn_d, nlin_d, kry_d, lin_ok, conv = newton_device(
                    jnp.asarray(x0), nu_cur[0], rtol, atol, max_it,
                    update_tol,
                )
                _phase_t["lin"] += _time.perf_counter() - t_l0
                _phase_t["kry_its"] = _phase_t.get("kry_its", 0) + int(
                    kry_d
                )
                if bool(lin_ok):
                    # accept the device trajectory (converged, max_it,
                    # or divergence-guard exit — same outcomes the host
                    # loop returns); fall through only when the device
                    # LINEAR solver failed mid-trajectory
                    return (
                        np.asarray(x_d),
                        float(rn_d),
                        int(nlin_d),
                        bool(conv),
                    )

            x = np.array(x0)  # writable copy (device inits are read-only)
            x[mask_np] = g_np[mask_np]
            total_lin = 0
            r = np.asarray(residual(jnp.asarray(x)))
            rn0 = np.linalg.norm(r)
            tol = max(rtol * rn0, atol)
            rn = rn0
            for it in range(max_it):
                if rn <= tol or rn > 1e4 * rn0 or not np.isfinite(rn):
                    break  # converged, or diverging — stop burning LUs
                Ju = jacobian_u_block(jnp.asarray(x))
                delta = None
                flu = None
                t_l0 = _time.perf_counter()
                if device_lin is not None and not (
                    use_dev_step2 and it == 0
                ):
                    # step2 mode: loose Eisenstat-Walker forcing — the
                    # outer loop verifies rn <= tol after the step
                    eta_lin = (
                        max(min(1e-2, 0.1 * rn / rn0), 1e-8)
                        if use_dev_step2
                        else 1e-8
                    )
                    d_dev, conv, its_dev = device_lin(
                        Ju, jnp.asarray(-r), eta_lin
                    )
                    _phase_t["kry_its"] = _phase_t.get(
                        "kry_its", 0
                    ) + int(its_dev)
                    if bool(conv):
                        delta = np.asarray(d_dev)
                if delta is None:
                    K = mixed.saddle_to_scipy(
                        Ju, G_loc, V.dofmap, Q.dofmap_scalar, V.ndof, Q.ndof
                    )
                    flu = directmod.ConstrainedLU(K, mask_np)
                    delta = flu.solve(-r)
                total_lin += 1
                _phase_t["lin"] += _time.perf_counter() - t_l0
                # backtracking line search ('bt')
                t = 1.0
                for _ in range(10):
                    xn = x + t * delta
                    rn_new = np.linalg.norm(
                        np.asarray(residual(jnp.asarray(xn)))
                    )
                    if rn_new <= (1.0 - 1e-4 * t) * rn:
                        break
                    t *= 0.5
                x = x + t * delta
                r = np.asarray(residual(jnp.asarray(x)))
                rn = np.linalg.norm(r)
                # frozen-Jacobian (Shamanskii) steps: reuse the
                # factorization while a back-substitution still buys a
                # >=25% residual decrease — it is ~50x cheaper than a
                # fresh CSR build + factor on this host. Accepted steps
                # converge linearly near the root; the first
                # non-improving step falls back to a fresh Jacobian.
                while flu is not None and rn > tol and np.isfinite(rn):
                    t_f0 = _time.perf_counter()
                    d2 = flu.solve(-r)
                    _phase_t["lin"] += _time.perf_counter() - t_f0
                    t2, accepted = 1.0, False
                    for _ in range(6):
                        xn = x + t2 * d2
                        rv = np.asarray(residual(jnp.asarray(xn)))
                        rn_new = np.linalg.norm(rv)
                        if rn_new <= 0.75 * rn:
                            x, r, rn = xn, rv, rn_new
                            accepted = True
                            break
                        t2 *= 0.5
                    if not accepted:
                        break
            return x, rn, total_lin, bool(rn <= tol)

        def stokes_init(nu_init):
            import time as _time

            _t0 = _time.perf_counter()
            try:
                return _stokes_init_impl(nu_init)
            finally:
                _phase_t["init"] += _time.perf_counter() - _t0

        def _stokes_init_impl(nu_init):
            if device_lin is not None and use_dev_newton:
                # same constrained saddle solve, on device: rhs carries
                # the BC lift (constrained_rhs semantics), so the result
                # is the Stokes SOLUTION, not an increment. Warm-start
                # accuracy only (rtol 1e-3): the Stokes/NS model gap is
                # O(Re), far above the algebraic error.
                from ..fem.assemble import constrained_rhs as _con_rhs

                Ju0 = nu_init * A1_loc
                apply64 = mixed.saddle_apply(
                    Ju0, G_loc, dofmap_u, dofmap_p, V.ndof, Q.ndof
                )
                rhs = _con_rhs(apply64, b, mask_j, g_j)
                x_dev, conv, its0 = device_lin(Ju0, rhs, 1e-3)
                _phase_t["kry_its"] = _phase_t.get("kry_its", 0) + int(
                    its0
                )
                if bool(conv):
                    return np.asarray(x_dev)
            if stokes_init_minres is not None:
                x_dev, kinfo = stokes_init_minres(
                    jnp.asarray(nu_init * WA1_np),
                    jnp.asarray(_init_rtol),
                )
                _phase_t["kry_its"] = _phase_t.get("kry_its", 0) + int(
                    kinfo.iterations
                )
                if bool(kinfo.converged):
                    return np.asarray(x_dev)
            K = mixed.saddle_to_scipy(
                np.asarray(nu_init * A1_loc),
                G_loc,
                V.dofmap,
                Q.dofmap_scalar,
                V.ndof,
                Q.ndof,
            )
            return directmod.solve_direct_constrained(
                K, np.asarray(b), mask_np, g_np
            )

        def run():
            lin_solves = 0
            from_zero = False
            if init_mode == "zero":
                x = np.where(mask_np, g_np, 0.0)
            elif init_mode == "exact":
                if mms_u is None:
                    raise ValueError("init='exact' requires a manufactured solution")
                u_init = base.interpolate_nodal(V, list(mms_u))
                x = np.concatenate([u_init, np.zeros(Q.ndof)])
            elif init_mode == "continuation":
                # try full-strength Newton first — moderate-Re cases
                # converge directly, skipping the whole ladder; the
                # divergence guard in newton() bounds the cost of a
                # failed attempt. With the device Newton, start from
                # BC-lifted zero (its first step IS the Stokes init);
                # otherwise from the classic Stokes init.
                if newton_device is not None:
                    x = np.where(mask_np, g_np, 0.0)
                    max_try = min(9, snes_max_it + 1)
                    from_zero = True
                else:
                    x = stokes_init(nu)
                    lin_solves += 1
                    max_try = min(8, snes_max_it)
                nu_cur[0] = nu
                x_try, rn, nlin, conv = newton(
                    x, snes_rtol, snes_atol, max_try,
                    update_tol=from_zero,
                )
                lin_solves += nlin
                if conv:
                    grid = ctx.sample_velocity_magnitude(x_try)
                    return grid, {
                        "method": "newton",
                        "iterations": lin_solves,
                        "residual": float(rn),
                        "init_mode": init_mode,
                        "t_lin": round(_phase_t["lin"], 4),
                        "t_init": round(_phase_t["init"], 4),
                        "kry_its": int(_phase_t.get("kry_its", 0)),
                        "device_newton": device_lin is not None,
                    }
                # fall back to the geometric nu-ladder; intermediate
                # rungs only need warm-start accuracy (the final Newton
                # below still converges to snes_rtol)
                from_zero = False
                nu_start = float(opts.get("continuation_nu_start", 1.0))
                n_steps = int(opts.get("continuation_steps", 8))
                x = stokes_init(nu_start)
                lin_solves += 1
                for k in range(1, n_steps + 1):
                    nu_cur[0] = nu_start * (nu / nu_start) ** (k / n_steps)
                    x, _, nlin, _ = newton(
                        x, 1e-3, 1e-10, int(opts.get("max_it", 50))
                    )
                    lin_solves += nlin
            else:  # 'stokes' default
                if newton_device is not None:
                    x = np.where(mask_np, g_np, 0.0)
                    from_zero = True
                else:
                    x = stokes_init(nu)
                    lin_solves += 1

            nu_cur[0] = nu
            x, rn, nlin, _ = newton(
                x, snes_rtol, snes_atol,
                snes_max_it + (1 if from_zero else 0),
                update_tol=from_zero,
            )
            lin_solves += nlin
            grid = ctx.sample_velocity_magnitude(x)
            return grid, {
                "method": "newton",
                "iterations": lin_solves,
                "residual": float(rn),
                "init_mode": init_mode,
                "t_lin": round(_phase_t["lin"], 4),
                "t_init": round(_phase_t["init"], 4),
                "kry_its": int(_phase_t.get("kry_its", 0)),
                "device_newton": device_lin is not None,
            }

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid)
            if err is None and "reference_config" in config:
                ref_cfg = scalar.merge_reference_config(config)
                # robustness cap on the reference re-solve, mirroring the
                # reference's own NS override (dealii_oracle/oracle.py:425-439:
                # reference capped at resolution 96, P2-P1) — direct solves on
                # higher-degree Taylor-Hood blow memory/time without improving
                # the baseline comparison
                mres = int(ref_cfg.get("mesh", {}).get("resolution", 96))
                ref_cfg.setdefault("mesh", {})["resolution"] = min(mres, 96)
                fem_cfg = ref_cfg.setdefault("fem", {})
                fem_cfg["degree_u"] = min(int(fem_cfg.get("degree_u", 2)), 2)
                fem_cfg["degree_p"] = min(int(fem_cfg.get("degree_p", 1)), 1)
                ref = self.solve(ref_cfg, _compute_baseline=False)
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "navier_stokes",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": V.degree,
            "degree_p": Q.degree,
            "viscosity": nu,
            "snes_rtol": snes_rtol,
            "snes_max_it": snes_max_it,
            "ksp_type": "preonly",
            "pc_type": "lu",
            "rtol": snes_rtol,
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
