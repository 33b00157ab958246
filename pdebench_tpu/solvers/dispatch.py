"""Linear-solve dispatch: per-case ksp/pc options -> device Krylov or host LU.

Maps the reference's PETSc solver configs (oracle_solver.ksp_type /
pc_type / rtol / atol per case; reference: oracle/poisson.py:91-97,
oracle/oracle.py dispatch) onto the TPU-native stack:

  cg / minres (SPD)    -> jitted PCG + Jacobi on device
  gmres / bicgstab     -> jitted GMRES(m) + Jacobi on device
  preonly / lu / mumps -> host scipy SuperLU (reference used UMFPACK/MUMPS)

Any unconverged iterative solve falls back to the host direct path, so
every case completes (the robustness-override role of
dealii_oracle/oracle.py:503-529).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assemble import (
    LocalOperator,
    constrained_diag,
    constrained_operator,
    constrained_rhs,
    scatter_add,
)
from . import direct as directmod
from .krylov import bicgstab, cg, gmres, jacobi_preconditioner


def _apply_local(A_local, dofmap, ndof, v):
    ve = jnp.einsum("cij,cj->ci", A_local, v[dofmap])
    return scatter_add(ve, dofmap, ndof)


def solve_constrained(
    A_local,
    dofmap,
    b,
    mask,
    g,
    ndof: int,
    method: str,
    rtol: float,
    atol: float,
    maxiter: int,
    restart: int = 60,
):
    """Traceable constrained Krylov solve on cell-local matrices.

    Safe to call inside jit/scan bodies (e.g. per-timestep solves in a
    lax.scan time loop, or per-Newton-iteration solves). Returns
    (x, iterations, residual, converged).
    """
    raw = lambda v: _apply_local(A_local, dofmap, ndof, v)
    A = constrained_operator(raw, mask)
    rhs = constrained_rhs(raw, b, mask, g)
    diag = jnp.einsum("cii->ci", A_local)
    diag = scatter_add(diag, dofmap, ndof)
    M = jacobi_preconditioner(constrained_diag(diag, mask))
    x0 = jnp.where(mask, g, 0.0)
    if method == "cg":
        x, info = cg(A, rhs, x0=x0, M=M, rtol=rtol, atol=atol, maxiter=maxiter)
    elif method == "bicgstab":
        x, info = bicgstab(
            A, rhs, x0=x0, M=M, rtol=rtol, atol=atol, maxiter=maxiter
        )
    else:
        x, info = gmres(
            A,
            rhs,
            x0=x0,
            M=M,
            rtol=rtol,
            atol=atol,
            maxiter=maxiter,
            restart=restart,
        )
    return x, info.iterations, info.residual, info.converged


_iterative = jax.jit(
    solve_constrained,
    static_argnames=("ndof", "method", "rtol", "atol", "maxiter", "restart"),
)


def solve_constrained_ir(
    A_local,
    A32_local,
    dofmap,
    b,
    mask,
    g,
    ndof: int,
    rtol: float,
    atol: float,
    inner_iters: int = 30,
    max_outer: int = 60,
    lattice32=None,
    inner: str = "cg",
    M32_custom=None,
    step_weights=None,
):
    """Traceable mixed-precision constrained solve (SPD systems).

    The f32 twin of the local-matrix batch is passed in so transient
    scans can cast once outside the lax.scan and run every step's inner
    iterations at native f32 speed (krylov.refined_solve). With
    `lattice32` (a solvers.stencil.LatticeOperator in f32), the inner
    iterations run the gather-free stencil apply in lattice ordering —
    the dof<->lattice permutation happens once per outer round only.
    `step_weights=(LatticeWeightMap, W32)` overrides the stencil weights
    with freshly-scattered per-step values (time-varying operators in
    scans: lagged Burgers convection, Newton Jacobians) while keeping
    `lattice32`'s constant-part GMG as the preconditioner.
    Callers needing a guaranteed answer should check `converged` and
    re-solve in f64.
    """
    from .krylov import jacobi_preconditioner, refined_solve

    raw64 = lambda v: _apply_local(A_local, dofmap, ndof, v)
    if (
        lattice32 is not None
        and step_weights is not None
        and os.environ.get("PDEBENCH_TPU_STEP_OUTER", "stencil") == "stencil"
    ):
        # per-step systems: the f64 outer applies the freshly scattered
        # f32 step weights CAST to f64 — one vectorized cast per step
        # replaces either an f64 scatter (measured slower than the cell
        # apply) or the ~20x-slower cell-based gather apply. The cast
        # weights carry f32 assembly rounding (~1e-7 relative operator
        # perturbation), far below the time-discretization error of
        # every per-step system (lagged convection, Newton Jacobians);
        # the refinement outer converges to the perturbed operator's
        # solution. PDEBENCH_TPU_STEP_OUTER=cell restores the cell
        # apply for A/B.
        _swm, _sW32 = step_weights
        _emb_s, _inv_s = lattice32.embedding, lattice32.inv_j
        _gs_s = lattice32.grid_shape
        # A_local is None on the bilinear fast path (the cell batch is
        # dead there and its inputs never shipped); the outer dtype is
        # the rhs dtype
        _outer_dt = A_local.dtype if A_local is not None else b.dtype
        _W64s = _sW32.astype(_outer_dt)

        def raw64(v, _swm=_swm, _W64s=_W64s):
            v_lat = _emb_s.embed(v, 0.0).reshape(_gs_s)
            y = _swm.apply_grid(_W64s, v_lat)
            return y.reshape(-1)[_inv_s]

    elif lattice32 is not None and step_weights is None:
        # gather-free f64 outer residual: the cell-based gather/scatter
        # apply is ~20x slower than the f64 stencil on TPU (constant
        # operators retain an exact W_f64).
        W64 = getattr(lattice32, "W_f64", None)
        if W64 is not None:
            _emb, _inv = lattice32.embedding, lattice32.inv_j
            _gs = lattice32.grid_shape

            def raw64(v, W64=W64):
                v_lat = _emb.embed(v, 0.0).reshape(_gs)
                y = lattice32.apply_grid_w(W64, v_lat)
                return y.reshape(-1)[_inv]

    A64 = constrained_operator(raw64, mask)
    rhs = constrained_rhs(raw64, b, mask, g)
    x0 = jnp.where(mask, g, 0.0)

    if lattice32 is not None:
        emb = lattice32.embedding
        inv = lattice32.inv_j
        # absent sites of masked lattices are treated as constrained
        mask_lat = emb.embed(mask, True)
        gshape = lattice32.grid_shape
        gmg = getattr(lattice32, "gmg", None)
        inner_custom = None
        if gmg is not None:
            # stencil-GMG V-cycle: entirely shifted multiply-adds
            vcyc = gmg.precond()

            def M32(r_lat):
                return vcyc(r_lat.reshape(gshape)).reshape(-1)

            # on TPU, the whole GMG-PCG inner solve runs as ONE fused
            # Pallas kernel with every level VMEM-resident (~8x the XLA
            # op-by-op inner at benchmark sizes); scope-gated inside the
            # builder, silent fallback to the standard path. For gmres
            # inners (nonsymmetric systems) the CG kernel doesn't apply,
            # but the preconditioner V-cycle chain does: a fused LINEAR
            # 2-V-cycle Richardson replaces the launch-bound XLA V-cycle
            # inside the Arnoldi iteration.
            # PDEBENCH_TPU_FUSED: "1"/"all"/"cg" (default) the measured
            # winners — fused CG/block-CG inners, plus a fused 2-V-cycle
            # Richardson M for surrogate hierarchies; "arnoldi"
            # additionally enables the fused whole-Arnoldi kernels
            # (measured losers on the dataset cases, kept for
            # experiments); "0"/"none" disables fused kernels entirely
            # (pure XLA path).
            _fused_mode = os.environ.get("PDEBENCH_TPU_FUSED", "1").lower()
            try:
                import jax as _jax

                gmg_kind = type(gmg).__name__
                if _fused_mode not in ("0", "none") and _jax.devices()[
                    0
                ].platform in (
                    "tpu", "axon",
                ) and gmg_kind in ("LatticeGMG", "BlockLatticeGMG"):
                    from .gmg_fused import (
                        build_fused_block_inner_cg,
                        build_fused_inner_cg,
                        build_fused_inner_gmres,
                        build_fused_richardson,
                    )

                    if step_weights is not None:
                        # time-varying operator: the whole Arnoldi cycle
                        # still fuses — the freshly scattered weights go
                        # in as a kernel INPUT (constrained once per
                        # step), the constant-part hierarchy stays the
                        # preconditioner
                        if (
                            inner == "gmres"
                            and gmg_kind == "LatticeGMG"
                            and _fused_mode == "arnoldi"
                        ):
                            # opt-in only: TPU A/B on burgers_square_v1
                            # measured the fused per-step Arnoldi at
                            # 2.36s vs 2.25s for the XLA Arnoldi with
                            # the same stencil-cast f64 outer — no win
                            # to justify the kernel in the default path
                            from .stencil import constrain_step_weights

                            _wm, _W32s = step_weights
                            # bigger budget: the per-step weights ride
                            # along as an input (P2 fine stencils are
                            # ~8 MB at res 128); v5e has 128 MB VMEM
                            fg = build_fused_inner_gmres(
                                gmg, inner_iters,
                                step_offsets=_wm.offsets,
                                vmem_budget=40_000_000,
                            )
                            if fg is not None:
                                keep2 = (
                                    1.0
                                    - mask_lat.astype(jnp.float32)
                                ).reshape(gshape)
                                _W32c = constrain_step_weights(
                                    _W32s, _wm.offsets, keep2
                                )
                                inner_custom = (
                                    lambda r, _f=fg, _w=_W32c: _f(r, _w)
                                )
                    elif inner == "cg":
                        builder = (
                            build_fused_inner_cg
                            if gmg_kind == "LatticeGMG"
                            else build_fused_block_inner_cg
                        )
                        inner_custom = builder(gmg, inner_iters)
                    elif gmg_kind == "LatticeGMG" and (
                        _fused_mode == "arnoldi"
                        or (
                            getattr(gmg, "surrogate", False)
                            and ndof >= 20000
                        )
                    ):
                        # STEADY fused Arnoldi. TPU A/B: it LOSES to
                        # the plain XLA Arnoldi on own-operator
                        # hierarchies (convdiff_high_pe 63.5s vs 1.09s
                        # — f32 MGS orthogonality loss degrades the
                        # subspace on high-Pe SUPG operators) and on
                        # SMALL surrogate cases (helmholtz_basic_k5
                        # 14.6k dofs: ~0.54s vs 0.43s), but WINS
                        # ~10-15% on LARGE surrogate (shifted-
                        # laplacian) systems: helmholtz k12/k20/k25 at
                        # 26-49k dofs measured 0.92/2.00/2.39s fused vs
                        # 1.00/2.35/2.73s with Richardson M. Default =
                        # large-surrogate only; PDEBENCH_TPU_FUSED=
                        # arnoldi forces it everywhere for experiments.
                        if getattr(gmg, "surrogate", False):
                            # the V-cycle hierarchy was built from a
                            # SURROGATE operator (helmholtz's shifted
                            # laplacian via _amg_matrix): level-0 is
                            # only valid as the preconditioner, so the
                            # TRUE constrained weights ride in as a
                            # kernel INPUT (step_offsets path).
                            from .stencil import constrain_step_weights

                            fg = build_fused_inner_gmres(
                                gmg, inner_iters,
                                step_offsets=lattice32.offsets,
                            )
                            if fg is not None:
                                # runs at trace time (this whole solve
                                # is jitted): constrain with traced jnp
                                # ops, like the per-step (burgers/
                                # Newton) path
                                keep2 = (
                                    1.0 - mask_lat.astype(jnp.float32)
                                ).reshape(gshape)
                                W32c = constrain_step_weights(
                                    lattice32.W.astype(jnp.float32),
                                    lattice32.offsets,
                                    keep2,
                                )
                                inner_custom = (
                                    lambda r, _f=fg, _w=W32c: _f(r, _w)
                                )
                        else:
                            # hierarchy level-0 IS the constrained
                            # operator: the baked kernel needs no
                            # weights input
                            inner_custom = build_fused_inner_gmres(
                                gmg, inner_iters
                            )
                    if (
                        inner == "gmres"
                        and inner_custom is None
                        and gmg_kind == "LatticeGMG"
                        and step_weights is not None
                        and os.environ.get("PDEBENCH_TPU_STEP_RICH", "0")
                        == "1"
                    ):
                        # OPT-IN (A/B): per-step systems precondition
                        # with the CONSTANT part's hierarchy, whose
                        # level-0 is SPD and mass-dominated (inv_dt M +
                        # diffusion) — the undamped 2-V-cycle Richardson
                        # chain is contractive there even though the
                        # step operator itself is nonsymmetric, and one
                        # fused kernel replaces the launch-bound XLA
                        # V-cycle inside every Arnoldi iteration.
                        fr = build_fused_richardson(gmg, 2)
                        if fr is not None:
                            M32 = fr
                    if (
                        inner == "gmres"
                        and inner_custom is None
                        and gmg_kind == "LatticeGMG"
                        and getattr(gmg, "surrogate", False)
                    ):
                        # XLA Arnoldi, fused 2-V-cycle Richardson
                        # preconditioner — measured best for SURROGATE
                        # hierarchies (helmholtz shifted laplacian:
                        # 0.57s/2.33s vs 0.66s/2.95s with the XLA
                        # V-cycle M). For own-operator hierarchies
                        # (convdiff SUPG) the same chain LOSES (2.72s
                        # vs 1.09s): the undamped 2-cycle Richardson is
                        # not contractive on strongly nonsymmetric
                        # operators, so those keep the XLA V-cycle M.
                        fr = build_fused_richardson(gmg, 2)
                        if fr is not None:
                            M32 = fr
            except Exception:
                inner_custom = None

        else:
            diag_lat = emb.embed(
                scatter_add(jnp.einsum("cii->ci", A32_local), dofmap, ndof),
                1.0,
            )
            M32 = jacobi_preconditioner(
                jnp.where(mask_lat, 1.0, diag_lat).astype(jnp.float32)
            )

        if step_weights is not None:
            wmap, W32_step = step_weights

            def A32(v_lat):
                vz = jnp.where(mask_lat, 0.0, v_lat)
                y = wmap.apply_grid(
                    W32_step, vz.reshape(gshape)
                ).reshape(-1)
                return jnp.where(mask_lat, v_lat, y)

        else:

            def A32(v_lat):
                vz = jnp.where(mask_lat, 0.0, v_lat)
                y = lattice32.apply_grid(vz.reshape(gshape)).reshape(-1)
                return jnp.where(mask_lat, v_lat, y)

        x, info = refined_solve(
            A64, A32, rhs, x0=x0, M32=M32, rtol=rtol, atol=atol,
            inner_iters=inner_iters, max_outer=max_outer,
            inner_fwd=lambda r: emb.embed(r, 0.0),
            inner_bwd=lambda z: z[inv],
            inner=inner,
            inner_custom=inner_custom,
        )
        return x, info.iterations, info.residual, info.converged

    raw32 = lambda v: _apply_local(A32_local, dofmap, ndof, v)
    A32 = constrained_operator(raw32, mask)
    if M32_custom is not None:
        # e.g. an f32 AMG V-cycle built once outside a time-stepping scan
        M32 = M32_custom
    else:
        diag = scatter_add(
            jnp.einsum("cii->ci", A32_local), dofmap, ndof
        )
        M32 = jacobi_preconditioner(
            constrained_diag(diag, mask).astype(jnp.float32)
        )
    x, info = refined_solve(
        A64,
        A32,
        rhs,
        x0=x0,
        M32=M32,
        rtol=rtol,
        atol=atol,
        inner_iters=inner_iters,
        max_outer=max_outer,
        inner=inner,
    )
    return x, info.iterations, info.residual, info.converged


_DIRECT_KSP = ("preonly",)
_DIRECT_PC = ("lu", "cholesky", "mumps")


def krylov_method(opts: Dict[str, Any], symmetric: bool = True) -> str:
    """Map a case's PETSc-style ksp_type onto our device Krylov methods."""
    ksp = str(opts.get("ksp_type", "cg")).lower()
    if ksp in ("cg", "minres") and symmetric:
        return "cg"
    if ksp == "bicgstab":
        return "bicgstab"
    return "gmres"


# preconditioner names that map to the device AMG (the reference's
# hypre/ilu roles); below _amg_min_dofs() Jacobi wins on setup cost
_AMG_PC = ("hypre", "boomeramg", "gamg", "amg", "ml", "ilu", "sor")
_AMG_MIN_DOFS = 20000


def _amg_min_dofs() -> int:
    """Platform-aware AMG size gate.

    On the host CPU, plain-Jacobi Krylov beats AMG below ~20k dofs on
    setup cost. On the (remote) TPU the economics flip well below
    that: Jacobi-CG burns O(10^3) latency-bound device iterations
    (poisson_periodic_trig, 16k dofs: 1.9 s warm in the r5 sweep)
    where ~20 AMG-V-cycle iterations finish in O(0.1 s) and the host
    AMG build lands in the excluded cold pass. Override with
    PDEBENCH_TPU_AMG_MIN."""
    env = os.environ.get("PDEBENCH_TPU_AMG_MIN")
    if env:
        return int(env)
    return 10000 if _device_platform() in ("tpu", "axon") else _AMG_MIN_DOFS


def _device_platform() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def _build_preconditioner(op, mask, pc: str, opts: Dict[str, Any]):
    """(M64, M32, name). AMG for hypre/ilu-class pc on large systems,
    else Jacobi; the f32 twin feeds mixed-precision refinement."""
    from .amg import setup_amg_masked_pair
    from .krylov import jacobi_preconditioner
    from ..fem.assemble import constrained_diag

    if pc in _AMG_PC and (
        op.ndof >= _amg_min_dofs()
        or opts.get("_amg_matrix") is not None
        or opts.get("_amg_B") is not None
    ):
        try:
            # operator override: e.g. Helmholtz preconditions with the
            # shifted Laplacian K + k^2 M rather than the indefinite A
            A_pc = opts.get("_amg_matrix")
            if A_pc is None:
                A_pc = op.to_scipy()
            M64, M32 = setup_amg_masked_pair(
                A_pc,
                np.asarray(mask),
                B=opts.get("_amg_B"),
                block_size=int(opts.get("_amg_block", 1)),
            )
            return M64, M32, "amg"
        except Exception:
            pass
    diag = constrained_diag(op.diagonal(), mask)
    return (
        jacobi_preconditioner(diag),
        jacobi_preconditioner(diag.astype(jnp.float32)),
        "jacobi",
    )


def _solve_halo_sharded(
    lat32, b, mask, g, rtol: float, atol: float, maxiter: int
):
    """Stripe-sharded constrained CG on the case's lattice operator.

    Builds a 1-D device mesh over every visible device, partitions the
    lattice's leading axis, and runs Jacobi-PCG with ppermute halo
    exchange (parallel/halo.py). The f64 stencil weights are the same
    W_f64 the single-device refinement outer applies, so the sharded
    matvec matches the dense stencil apply bit-for-bit; only the dot-
    product reduction order differs (partial sums + one psum).
    """
    from jax.sharding import Mesh

    from ..parallel.halo import HaloStencilOperator, halo_pcg

    mesh = Mesh(np.array(jax.devices()), ("stripe",))
    hop = HaloStencilOperator.from_lattice_operator(lat32, mesh)
    emb = lat32.embedding
    gs = lat32.grid_shape
    b_g = emb.embed(jnp.asarray(b), 0.0).reshape(gs)
    g_g = emb.embed(jnp.asarray(g), 0.0).reshape(gs)
    mask_g = emb.embed(jnp.asarray(mask, dtype=bool), True).reshape(gs)
    x_g, kinfo = halo_pcg(
        hop, b_g, mask_g, g_g, rtol=rtol, atol=atol, maxiter=maxiter
    )
    x = x_g.reshape(-1)[lat32.inv_j]
    return np.asarray(x), {
        "converged": bool(kinfo.converged),
        "method": "cg",
        "pc_used": f"jacobi+halo-sharded[{mesh.shape['stripe']}]",
        "iterations": int(kinfo.iterations),
        "residual": float(kinfo.residual),
    }


def solve_linear(
    op: LocalOperator,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    g: jnp.ndarray,
    opts: Dict[str, Any],
    symmetric: bool = True,
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """Solve (constrained) op x = b per case solver options."""
    ksp = str(opts.get("ksp_type", "cg")).lower()
    pc = str(opts.get("pc_type", "jacobi")).lower()
    rtol = float(opts.get("rtol", 1e-10))
    atol = float(opts.get("atol", 1e-14))
    maxiter = int(opts.get("max_it", opts.get("maxiter", 25000)))

    use_direct = (
        ksp in _DIRECT_KSP
        or pc in _DIRECT_PC
        # bench.py's CPU-proxy baseline: force the host direct path
        or os.environ.get("PDEBENCH_TPU_FORCE_DIRECT") == "1"
    )
    info: Dict[str, Any] = {"ksp_type": ksp, "pc_type": pc, "rtol": rtol}

    # gather-free stencil fast path: structured-lattice SPD systems run
    # f32 stencil inner iterations with f64 refinement (solvers set
    # opts['_lattice32'] when the dof set forms a full lattice)
    lat32 = opts.get("_lattice32")

    # Structured preonly/lu reroute (the Stokes preonly/lu -> MINRES-IR
    # + stencil-GMG policy extended to scalar lattices): an honored
    # host SuperLU at 3-D P2 sizes scales ~dofs^2 in fill (185k dofs
    # ~ 30 min on the 1-core host — helmholtz_3d_k6_high, VERDICT r4
    # missing #3) while the stencil-GMG IR reaches the same 1e-10 rtol
    # in seconds. Falls back to the host LU if the IR doesn't converge.
    # PDEBENCH_TPU_FORCE_DIRECT (the frozen CPU-proxy protocol) and
    # PDEBENCH_TPU_STRUCTURED_LU=direct keep the literal direct solve.
    rerouted_direct = False
    if (
        use_direct
        and lat32 is not None
        and os.environ.get("PDEBENCH_TPU_FORCE_DIRECT") != "1"
        and os.environ.get("PDEBENCH_TPU_STRUCTURED_LU", "ir") == "ir"
    ):
        use_direct = False
        rerouted_direct = True
        info["direct_rerouted"] = "stencil-ir"

    # multi-chip stripe-sharded route (PDEBENCH_TPU_HALO=1): the same
    # structured-lattice system solved with dofs PARTITIONED across all
    # visible devices — ppermute halo exchange per matvec, O(surface)
    # ICI traffic (parallel/halo.py). The production entry point for
    # pod-scale meshes; validated on the 8-virtual-CPU mesh against the
    # single-device stencil path (tests/test_parallel.py). Reference
    # role: MPI domain decomposition under DOLFINx meshes
    # (pdebench/oracle/common.py:52,352-365).
    if (
        not use_direct
        and lat32 is not None
        and symmetric
        and os.environ.get("PDEBENCH_TPU_HALO", "0") == "1"
        and len(jax.devices()) > 1
    ):
        try:
            x, hinfo = _solve_halo_sharded(
                lat32, b, mask, g, rtol, atol, maxiter
            )
        except Exception as e:  # lattice too small for the mesh, etc.
            info["halo_failed"] = f"{type(e).__name__}: {e}"
        else:
            if hinfo.pop("converged"):
                info.update(hinfo)
                return x, info
            info["halo_failed"] = hinfo
    if (
        not use_direct
        and lat32 is not None
        and os.environ.get("PDEBENCH_TPU_MIXED_PRECISION", "1") == "1"
    ):
        # SPD systems run CG regardless of the case's requested ksp (the
        # reference's gmres+hypre elasticity configs are SPD)
        inner = "cg" if symmetric else "gmres"
        cache = opts.setdefault("_jit_cache", {})
        key = ("stencil_ir", inner, op.ndof)
        if key not in cache:
            dofmap_c = op.dofmap
            # attach a stencil-GMG V-cycle (scalar or block): the whole
            # preconditioner is shifted multiply-adds. Indefinite
            # systems use the SPD surrogate in opts['_amg_matrix']
            # (Helmholtz's shifted Laplacian); other systems coarsen
            # their own operator directly from the stencil weights —
            # Galerkin probing is sign-agnostic and FGMRES tolerates an
            # imperfect V-cycle
            if (
                len(lat32.shape) in (2, 3)
                and op.ndof >= 5000  # setup cost beats jacobi only at size
                and getattr(lat32, "gmg", None) is None
            ):
                try:
                    from .gmg import attach_lattice_gmg

                    attach_lattice_gmg(
                        lat32,
                        np.asarray(mask),
                        A_override=opts.get("_amg_matrix"),
                    )
                except Exception:
                    lat32.gmg = None
            has_gmg = getattr(lat32, "gmg", None) is not None
            # with GMG the inner converges in ~15 its; jacobi needs long
            # bursts to keep the (slow-on-TPU) f64 residuals rare
            if inner == "cg":
                n_inner = 25 if has_gmg else 100
            else:
                n_inner = 30 if has_gmg else 60

            def _solve_stencil(A_local, A32_local, b_in, mask_in, g_in):
                return solve_constrained_ir(
                    A_local, A32_local, dofmap_c, b_in, mask_in, g_in,
                    op.ndof, rtol, atol, inner_iters=n_inner, max_outer=40,
                    lattice32=lat32, inner=inner,
                )

            cache[key] = jax.jit(_solve_stencil)
        x, iters, res, conv = cache[key](
            op.A, op.A.astype(jnp.float32), b, mask, g
        )
        if bool(conv):
            info.update(
                method=inner,
                pc_used=(
                    "gmg+stencil-ir32"
                    if getattr(lat32, "gmg", None) is not None
                    else "jacobi+stencil-ir32"
                ),
                iterations=int(iters),
                residual=float(res),
            )
            return np.asarray(x), info
        # fall through to the generic paths below

    if rerouted_direct:
        # preonly/lu semantics: a non-converged stencil IR goes straight
        # to the host LU, not through the generic iterative paths
        use_direct = True

    # CPU-host mains: unstructured NONSYMMETRIC steady systems route
    # direct — one SuperLU factorization beats 1-core AMG-FGMRES in
    # wall time at dataset sizes (the oracle/wave.py CPU policy;
    # measured pathology: convdiff_annulus_diag_supg spent 5462 s in a
    # stagnating f32 IR + 25k-iteration f64 GMRES retry before reaching
    # the same LU fallback). TPU/axon keeps the device iterative path.
    if (
        not use_direct
        and not symmetric
        and lat32 is None
        and op.ndof <= 80000
        and _device_platform() not in ("tpu", "axon")
    ):
        use_direct = True
        info["cpu_main_direct"] = True

    # TPU small-unstructured mains: below ~40k dofs the host SuperLU
    # factorization (0.1-0.5 s) beats every device-iterative option —
    # remote dispatch latency + gather-bound AMG V-cycles put the TPU
    # AMG path at 0.8-2.8 s warm exec at 15-35k dofs (round-5 honest
    # re-measure, BASELINE.md #29), exactly the reference CPU oracle's
    # own small-case behavior (forced-direct precedent:
    # reference pdebench/oracle/dealii_oracle/oracle.py:503-513).
    # solve_linear is only called from STEADY solvers (poisson/CD/
    # helmholtz/elasticity/darcy/biharmonic), so this never routes a
    # per-step transient solve to the host. Structured lattices
    # (lat32) keep the stencil path — it wins at every size.
    if (
        not use_direct
        and lat32 is None
        and op.ndof
        < int(os.environ.get("PDEBENCH_TPU_HOST_DIRECT_MAX", "40000"))
        and _device_platform() in ("tpu", "axon")
    ):
        use_direct = True
        info["tpu_small_direct"] = True

    # nonsymmetric systems benefit from AMG + FGMRES-IR well below the
    # SPD threshold (indefinite Helmholtz needs the shifted-Laplacian
    # preconditioner; plain Jacobi stalls)
    small_cut = _amg_min_dofs() if symmetric else 8000
    if not use_direct and op.ndof < small_cut and opts.get("_amg_B") is None:
        # block systems with a near-nullspace (elasticity) skip this
        # plain-Jacobi branch at ANY size — near-incompressible
        # conditioning makes unpreconditioned CG burn 10^4+ iterations
        # (73 s at 7k dofs on TPU, round-5 sweep); they take the AMG
        # path below instead
        # small systems: Jacobi through the globally shape-cached jit —
        # no AMG setup, no per-case compile
        x, iters, res, conv = _iterative(
            op.A, op.dofmap, b, mask, g,
            ndof=op.ndof, method=krylov_method(opts, symmetric),
            rtol=rtol, atol=atol, maxiter=maxiter,
        )
        if bool(conv):
            info.update(
                method=krylov_method(opts, symmetric),
                pc_used="jacobi",
                iterations=int(iters),
                residual=float(res),
            )
            return np.asarray(x), info
        info["iterative_failed"] = {
            "iterations": int(iters),
            "residual": float(res),
        }
        use_direct = True

    if not use_direct:
        method = krylov_method(opts, symmetric)
        from .krylov import bicgstab as _bicg
        from .krylov import cg as _cg
        from .krylov import gmres as _gmres

        # Per-solve jit cache: lax.while_loop recompiles on every EAGER
        # call, so the warm pass of timed_run would re-pay compilation.
        # The oracle's timing contract (warm compute, compile excluded)
        # needs the second identical call to hit the jit cache. Keyed by
        # method/shape/constraint-set so e.g. biharmonic's two different
        # BC masks don't collide.
        cache = opts.setdefault("_jit_cache", {})
        mask_np = np.asarray(mask)
        key = (
            method,
            op.ndof,
            int(mask_np.sum()),
            int(mask_np.argmax()),
        )
        mixed = method in ("cg", "gmres") and os.environ.get(
            "PDEBENCH_TPU_MIXED_PRECISION", "1"
        ) == "1"
        inner_kind = "cg" if (method == "cg" and symmetric) else "gmres"
        if key not in cache:
            M, M32, pc_used = _build_preconditioner(op, mask, pc, opts)
            kry = {"cg": _cg, "bicgstab": _bicg, "gmres": _gmres}[method]
            dofmap_c = op.dofmap

            def _solve(A_local, b_in, mask_in, g_in):
                raw = lambda v: _apply_local(A_local, dofmap_c, op.ndof, v)
                A = constrained_operator(raw, mask_in)
                rhs = constrained_rhs(raw, b_in, mask_in, g_in)
                x0 = jnp.where(mask_in, g_in, 0.0)
                if mixed:
                    # f32 inner Krylov + f64 outer refinement — v5e
                    # emulates f64, so the inner iterations run at
                    # native f32 speed (see krylov.refined_solve);
                    # nonsymmetric systems run FGMRES-IR
                    from .krylov import refined_solve

                    A32_local = A_local.astype(jnp.float32)
                    raw32 = lambda v: _apply_local(
                        A32_local, dofmap_c, op.ndof, v
                    )
                    A32 = constrained_operator(raw32, mask_in)
                    return refined_solve(
                        A, A32, rhs, x0=x0, M32=M32, rtol=rtol, atol=atol,
                        inner=inner_kind,
                        inner_iters=30 if inner_kind == "cg" else 60,
                    )
                return kry(
                    A, rhs, x0=x0, M=M, rtol=rtol, atol=atol, maxiter=maxiter
                )

            def _solve_f64(A_local, b_in, mask_in, g_in):
                raw = lambda v: _apply_local(A_local, dofmap_c, op.ndof, v)
                A = constrained_operator(raw, mask_in)
                rhs = constrained_rhs(raw, b_in, mask_in, g_in)
                x0 = jnp.where(mask_in, g_in, 0.0)
                # the retry exists to clear the f32 precision floor, a
                # few-digit gap; cap it so a non-converging system falls
                # through to the LU path in minutes, not hours
                return kry(
                    A, rhs, x0=x0, M=M, rtol=rtol, atol=atol,
                    maxiter=min(maxiter, 3000),
                )

            cache[key] = (jax.jit(_solve), jax.jit(_solve_f64), pc_used)
        solver, solver_f64, pc_used = cache[key]
        info["pc_used"] = pc_used + ("+ir32" if mixed else "")
        x, kinfo = solver(op.A, b, mask, g)
        if mixed and not bool(kinfo.converged):
            # Precision floor or hard conditioning: full f64 retry —
            # but only when the f32 pass actually made progress. A
            # stagnated IR at O(|b|) residual means the preconditioned
            # operator is bad (e.g. divergent AMG V-cycle on a strongly
            # nonsymmetric matrix) and the f64 retry would grind its
            # whole budget before the LU fallback saves the case.
            b_norm = float(np.linalg.norm(np.asarray(b)))
            if float(kinfo.residual) < 1e-3 * max(b_norm, 1e-300):
                x, kinfo = solver_f64(op.A, b, mask, g)
                info["pc_used"] = pc_used + "+f64retry"
            else:
                info["pc_used"] = pc_used + "+stagnated"
        if bool(kinfo.converged):
            info.update(
                method=method,
                iterations=int(kinfo.iterations),
                residual=float(kinfo.residual),
            )
            return np.asarray(x), info
        info["iterative_failed"] = {
            "method": method,
            "iterations": int(kinfo.iterations),
            "residual": float(kinfo.residual),
        }

    # host sparse-direct path (or fallback)
    x = directmod.solve_direct_constrained(
        op.to_scipy(), np.asarray(b), np.asarray(mask), np.asarray(g)
    )
    info.update(method="lu", iterations=1)
    return x, info
