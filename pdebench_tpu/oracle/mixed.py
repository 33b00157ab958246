"""Shared Taylor-Hood (mixed velocity/pressure) machinery for Stokes and
Navier-Stokes oracles.

Layout: the mixed unknown is one flat vector x = [u_blocked ; p], with
velocity dofs interleaved (node-major, component-minor) followed by
pressure dofs. The coupled operator is applied matrix-free from
cell-local blocks (A velocity block, G coupling):

    r_u = A u + G p        r_p = G^T u

Dirichlet velocity rows and one pinned pressure dof are eliminated
symmetrically (constrained_operator). The device iterative path is
MINRES with the canonical block-diagonal preconditioner
diag(A)^-1 (+) nu * lumped(M_p)^-1 — the Schur complement of Stokes is
spectrally equivalent to (1/nu) M_p. The direct path assembles a global
CSR on host and factorizes with SuperLU (the reference's UMFPACK/MUMPS
role, oracle/stokes.py:253, dealii robustness overrides).

Reference: pdebench/oracle/stokes.py (Taylor-Hood spaces :186-199, weak
form :201-207, pressure point-fixing :233-251).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import refelem, sampling, symbolic
from ..fem.assemble import (
    CellBatch,
    cell_batch,
    local_divergence,
    local_mass,
    local_vector_laplacian,
    scatter_add,
)
from ..fem.mesh import Mesh
from ..fem.spaces import FunctionSpace
from . import base


@dataclass
class TaylorHoodContext:
    config: Dict[str, Any]
    mesh: Mesh
    V: FunctionSpace  # velocity (vector, degree_u)
    Q: FunctionSpace  # pressure (scalar, degree_p)
    cb: CellBatch  # tabulated at degree_u quadrature
    psi: jnp.ndarray  # (nq, nlp) pressure basis at the same points
    grid: Dict[str, Any]
    loc: sampling.PointLocation
    mask: jnp.ndarray  # (N,) combined Dirichlet + pressure-pin mask
    g: jnp.ndarray  # (N,) constrained values
    pin_dof: int
    t_setup: float

    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def nu_dofs(self) -> int:
        return self.V.ndof

    @property
    def N(self) -> int:
        return self.V.ndof + self.Q.ndof

    def qpts(self) -> jnp.ndarray:
        return self.cb.qpts

    def sample_velocity_magnitude(self, x: np.ndarray) -> np.ndarray:
        u = np.asarray(x)[: self.V.ndof]
        return sampling.sample_on_grid(self.V, u, self.grid, loc=self.loc)


def setup_taylor_hood(
    config: Dict[str, Any], pin_pressure: bool = True
) -> TaylorHoodContext:
    t_start = time.perf_counter()
    fem_cfg = config.get("fem", {})
    deg_u = int(fem_cfg.get("degree_u", 2))
    deg_p = int(fem_cfg.get("degree_p", 1))
    grid = config["output"]["grid"]

    def _build_geom():
        mesh_ = base.build_mesh(config["domain"], config.get("mesh", {}))
        V_ = FunctionSpace(mesh_, deg_u, ncomp=mesh_.dim)
        Q_ = FunctionSpace(mesh_, deg_p)
        tables = refelem.element_tables(mesh_.cell_type, deg_u, 2 * deg_u + 2)
        psi_, _ = refelem.tabulate(mesh_.cell_type, deg_p, tables.qpoints)
        pts, _ = sampling.grid_points(grid)
        loc_ = sampling.locate_points(mesh_, pts)
        return mesh_, V_, Q_, psi_, loc_

    mesh, V, Q, psi, loc = base.memo_geometry(
        [
            "th-geom", config["domain"], config.get("mesh", {}),
            deg_u, deg_p, grid,
        ],
        _build_geom,
    )

    # velocity Dirichlet
    bc_dofs, bc_values, _ = base.dirichlet_dofs_values(V, config.get("bc", {}))
    N = V.ndof + Q.ndof
    mask = np.zeros(N, dtype=bool)
    g = np.zeros(N)
    mask[bc_dofs] = True
    g[bc_dofs] = bc_values

    # pressure point-fixing at the dof nearest the origin
    # (reference: oracle/stokes.py:233-251)
    pin = -1
    if pin_pressure:
        pin = int(np.argmin(np.linalg.norm(Q.dof_coords, axis=1)))
        mask[V.ndof + pin] = True
        g[V.ndof + pin] = 0.0

    t_host = time.perf_counter() - t_start
    # warm-timed geometry factors (see scalar.setup_scalar rationale)
    import jax as _jax

    def _build_cb():
        cb_ = cell_batch(mesh, deg_u)
        _jax.block_until_ready(cb_.detJ)
        return cb_

    cb_key = ["th-cb", config["domain"], config.get("mesh", {}), deg_u]
    if not base.geom_cache_has(cb_key):
        _build_cb()  # cold pass — uncharged
    t_cb = time.perf_counter()
    cb = base.memo_geometry(cb_key, _build_cb)
    t_setup = t_host + (time.perf_counter() - t_cb)

    return TaylorHoodContext(
        config=config,
        mesh=mesh,
        V=V,
        Q=Q,
        cb=cb,
        psi=jnp.asarray(psi),
        grid=grid,
        loc=loc,
        mask=jnp.asarray(mask),
        g=jnp.asarray(g),
        pin_dof=pin,
        t_setup=t_setup,
    )


def saddle_apply(
    A_loc: jnp.ndarray,
    G_loc: jnp.ndarray,
    dofmap_u: jnp.ndarray,
    dofmap_p: jnp.ndarray,
    nu_dofs: int,
    np_dofs: int,
) -> Callable:
    """Matrix-free [[A, G], [G^T, 0]] on the stacked vector."""

    def apply(x):
        u, p = x[:nu_dofs], x[nu_dofs:]
        ue = u[dofmap_u]  # (c, nlu)
        pe = p[dofmap_p]  # (c, nlp)
        ru_loc = jnp.einsum("cij,cj->ci", A_loc, ue) + jnp.einsum(
            "cij,cj->ci", G_loc, pe
        )
        rp_loc = jnp.einsum("cij,ci->cj", G_loc, ue)
        ru = scatter_add(ru_loc, dofmap_u, nu_dofs)
        rp = scatter_add(rp_loc, dofmap_p, np_dofs)
        return jnp.concatenate([ru, rp])

    return apply


def saddle_diag_precond(
    A_loc: jnp.ndarray,
    cb: CellBatch,
    psi: jnp.ndarray,
    dofmap_u: jnp.ndarray,
    dofmap_p: jnp.ndarray,
    nu_dofs: int,
    np_dofs: int,
    nu_visc: float,
    mask: jnp.ndarray,
) -> Callable:
    """Block-diagonal SPD preconditioner diag(A)^-1 (+) nu * Mp_lumped^-1."""
    dA = scatter_add(jnp.einsum("cii->ci", A_loc), dofmap_u, nu_dofs)
    # pressure mass at pressure quadrature
    Mp = jnp.einsum("qi,qj,cq->cij", psi, psi, cb.wdetJ)
    dMp = scatter_add(jnp.einsum("cii->ci", Mp), dofmap_p, np_dofs)
    diag = jnp.concatenate([dA, dMp / max(nu_visc, 1e-300)])
    diag = jnp.where(mask, 1.0, diag)
    safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
    inv = 1.0 / safe
    return lambda r: inv * r


def saddle_amg_precond(
    A_loc: jnp.ndarray,
    cb: CellBatch,
    psi: jnp.ndarray,
    dofmap_u: jnp.ndarray,
    dofmap_p: jnp.ndarray,
    nu_dofs: int,
    np_dofs: int,
    nu_visc: float,
    mask: jnp.ndarray,
) -> Callable:
    """Block preconditioner AMG(A) (+) nu * lumped(Mp)^-1 for MINRES.

    The velocity block gets one SA-AMG V-cycle (SPD, so MINRES stays
    valid); the pressure Schur complement is approximated by the scaled
    lumped pressure mass as in saddle_diag_precond. Falls back to the
    diagonal preconditioner if the hierarchy can't be built.
    """
    from ..fem.assemble import LocalOperator
    from ..solvers.amg import setup_amg_masked

    mask_np = np.asarray(mask)
    mask_u = mask_np[:nu_dofs]
    op_u = LocalOperator(A_loc, np.asarray(dofmap_u), nu_dofs)
    try:
        amg_u = setup_amg_masked(op_u.to_scipy(), mask_u)
    except Exception:
        return saddle_diag_precond(
            A_loc, cb, psi, dofmap_u, dofmap_p, nu_dofs, np_dofs,
            nu_visc, mask,
        )
    Mp = jnp.einsum("qi,qj,cq->cij", psi, psi, cb.wdetJ)
    dMp = scatter_add(jnp.einsum("cii->ci", Mp), dofmap_p, np_dofs)
    dMp = dMp / max(nu_visc, 1e-300)
    mask_p = jnp.asarray(mask_np[nu_dofs:])
    dMp = jnp.where(mask_p, 1.0, dMp)
    inv_p = 1.0 / jnp.where(jnp.abs(dMp) > 1e-300, dMp, 1.0)

    def M(r):
        return jnp.concatenate([amg_u(r[:nu_dofs]), inv_p * r[nu_dofs:]])

    return M


@dataclass
class SaddlePrecondParts:
    """Reusable pieces of the stencil-GMG saddle preconditioner.

    `Mv` applies the per-component velocity V-cycle to the blocked flat
    velocity vector; `inv_p` is the lumped pressure-mass Schur diagonal
    (nu / diag(M_p)); `mask_full` marks constrained mixed entries. The
    block-DIAGONAL combination (saddle_gmg_precond) stays SPD for
    MINRES; a block lower-TRIANGULAR combination (velocity solve, then
    Schur update zp = -inv_p (r_p - G^T zu)) is assembled by the
    Navier-Stokes FGMRES path, where symmetry is not required and the
    triangular form clusters the preconditioned spectrum near 1.
    """

    Mv: Callable
    inv_p: jnp.ndarray
    mask_full: jnp.ndarray
    nu_dofs: int
    ncomp: int
    # lattice-native velocity V-cycle: (fine..., d) block grid ->
    # (fine..., d), no dof<->lattice gathers (the per-iteration gather
    # round trips are the measured cost of the flat-dof saddle path —
    # BASELINE.md round-3 #11). None when the dofs don't form a lattice.
    Mv_grid: Optional[Callable] = None
    # optional POLYNOMIAL pressure-mass Schur solve: Mp_solve(r_p) ~=
    # nu * Mp^{-1} r_p via a degree-3 Chebyshev in the Jacobi-scaled
    # mass stencil (3 coarse-lattice stencil applies; SPD in the D
    # inner product, so valid inside MINRES too). None when the
    # pressure dofs don't form a lattice. The diagonal inv_p stays the
    # fallback: diag(Mp) alone leaves a kappa(D^-1 Mp) ~ 5-10 error in
    # the Schur block, which round-3 measured as the saddle iteration
    # limiter (not the velocity V-cycle).
    Mp_solve: Optional[Callable] = None


def saddle_gmg_precond_parts(
    V: FunctionSpace,
    nu_visc: float,
    cb: CellBatch,
    psi: jnp.ndarray,
    dofmap_p: jnp.ndarray,
    np_dofs: int,
    mask: jnp.ndarray,
    q_space: Optional[FunctionSpace] = None,
) -> Optional[SaddlePrecondParts]:
    """Stencil-GMG block preconditioner for structured-mesh Stokes.

    The velocity block is nu x blockdiag(scalar stiffness), so one
    scalar GMG hierarchy (on the constrained scalar stiffness stencil)
    preconditions every component — an entirely gather-free V-cycle.
    Returns None when the dofs don't form a lattice.
    """
    from ..fem.assemble import LocalOperator, local_stiffness
    from ..solvers.amg import constrained_csr
    from ..solvers.gmg import setup_gmg
    from ..solvers.stencil import LatticeOperator, detect_lattice

    lat = detect_lattice(V.dof_coords)
    if lat is None or len(lat.shape) != 2:
        return None
    d = V.ncomp
    nu_dofs = V.ndof
    mask_np = np.asarray(mask)
    # scalar mask: a node is constrained if any component is
    mask_u = mask_np[:nu_dofs].reshape(-1, d).any(axis=1)
    Ks = local_stiffness(cb) * nu_visc
    A_s = LocalOperator(
        np.asarray(Ks), V.dofmap_scalar, V.n_scalar_dofs
    ).to_scipy()
    A_bc = constrained_csr(A_s, mask_u)
    lat_bc = LatticeOperator(A_bc, lat, dtype=jnp.float32)
    W_bc = np.asarray(lat_bc.W, dtype=np.float64)
    if lat.masked:
        # absent sites of the masked lattice: unit diagonal for smoothers
        absent = (lat.perm == lat.n_dof).reshape(lat_bc.shape)
        for k, off in enumerate(lat_bc.offsets):
            if all(o == 0 for o in off):
                W_bc[k][absent] = 1.0
    gmg = setup_gmg(
        W_bc,
        lat_bc.offsets,
        lat_bc.shape,
        dtype=jnp.float32,
    )
    vcyc = gmg.precond()
    emb = lat_bc.embedding
    inv = lat_bc.inv_j
    shape = lat_bc.shape
    # on TPU the XLA V-cycle is launch-bound inside Arnoldi loops; fuse
    # a linear 2-V-cycle Richardson chain into one Pallas kernel per
    # component application (safe in non-flexible GMRES: linear in r)
    fused = None
    try:
        import os as _os

        import jax as _jax

        if _jax.devices()[0].platform in ("tpu", "axon"):
            from ..solvers.gmg_fused import build_fused_richardson

            # chain length trades per-application cost for outer
            # Krylov iterations (the saddle solves are latency-bound:
            # a longer chain is nearly free inside one kernel launch)
            _nv = int(
                _os.environ.get("PDEBENCH_TPU_SADDLE_VCYCLES", "2")
            )
            fused = build_fused_richardson(gmg, _nv)
    except Exception:
        fused = None

    Mp = jnp.einsum("qi,qj,cq->cij", psi, psi, cb.wdetJ)
    dMp = scatter_add(jnp.einsum("cii->ci", Mp), dofmap_p, np_dofs)
    dMp = dMp / max(nu_visc, 1e-300)
    mask_p = jnp.asarray(mask_np[nu_dofs:])
    dMp = jnp.where(mask_p, 1.0, dMp)
    inv_p = (1.0 / jnp.where(jnp.abs(dMp) > 1e-300, dMp, 1.0)).astype(
        jnp.float64
    )
    mask_full = jnp.asarray(mask_np)

    Mp_solve = None
    if q_space is not None:
        Mp_solve = _pressure_mass_chebyshev(
            q_space, cb, psi, nu_visc, np.asarray(mask_np[nu_dofs:])
        )

    def Mv(ru_flat):
        ru = ru_flat.reshape(-1, d)
        comps = []
        for c in range(d):
            rc32 = emb.embed(ru[:, c].astype(jnp.float32), 0.0)
            if fused is not None:
                zc = fused(rc32)[inv]
            else:
                zc = vcyc(rc32.reshape(shape)).reshape(-1)[inv]
            comps.append(zc.astype(ru_flat.dtype))
        return jnp.stack(comps, axis=1).reshape(-1)

    def Mv_grid(r_grid):
        """(fine..., d) block grid -> same, gather-free (the component
        planes ARE the scalar V-cycle grids; no embed/extract)."""
        comps = []
        for c in range(d):
            rc32 = r_grid[..., c].astype(jnp.float32)
            if fused is not None:
                zc = fused(rc32.reshape(-1)).reshape(shape)
            else:
                zc = vcyc(rc32)
            comps.append(zc.astype(r_grid.dtype))
        return jnp.stack(comps, axis=-1)

    return SaddlePrecondParts(
        Mv, inv_p, mask_full, nu_dofs, d, Mv_grid=Mv_grid,
        Mp_solve=Mp_solve,
    )


def _pressure_mass_chebyshev(
    Q, cb: CellBatch, psi: jnp.ndarray, nu_visc: float, mask_p: np.ndarray
) -> Optional[Callable]:
    """Traced f32 polynomial pressure-mass solve: r_p -> ~nu * Mp^{-1} r_p.

    Builds the pressure-lattice mass stencil host-side, estimates the
    Jacobi-scaled spectrum bounds by power iteration, and fits a
    degree-3 Chebyshev inverse (solvers.krylov.chebyshev_inverse_coeffs;
    residual factor ~0.1 at kappa ~ 8). Returns None off-lattice."""
    from ..solvers.gmg import _apply_stencil_np
    from ..solvers.krylov import chebyshev_inverse_coeffs
    from ..solvers.stencil import (
        constrain_stencil_weights,
        detect_lattice,
        lattice_weight_map,
    )

    lat_p = detect_lattice(Q.dof_coords)
    if lat_p is None:
        return None
    wm = lattice_weight_map(lat_p, Q.dofmap_scalar)
    if wm is None:
        return None
    Mp_loc = np.einsum(
        "qi,qj,cq->cij",
        np.asarray(psi),
        np.asarray(psi),
        np.asarray(cb.wdetJ),
    )
    WMp = wm.weights_np(Mp_loc)
    mask_lat = lat_p.embed_np(mask_p.astype(bool), True).reshape(wm.shape)
    WMp = constrain_stencil_weights(WMp, wm.offsets, mask_lat)
    diag = None
    for k, off in enumerate(wm.offsets):
        if all(o == 0 for o in off):
            diag = WMp[k]
    dinv_np = 1.0 / np.where(np.abs(diag) > 1e-300, diag, 1.0)
    # spectrum bounds of D^-1 Mp by power iteration (host, tiny lattice)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(wm.shape)
    lmax = 1.0
    for _ in range(30):
        x = dinv_np * _apply_stencil_np(WMp, wm.offsets, x)
        n = np.linalg.norm(x)
        if n == 0:
            return None
        lmax, x = n, x / n
    shift = 1.02 * lmax
    x = rng.standard_normal(wm.shape)
    lsh = shift
    for _ in range(40):
        x = shift * x - dinv_np * _apply_stencil_np(WMp, wm.offsets, x)
        n = np.linalg.norm(x)
        if n == 0:
            return None
        lsh, x = n, x / n
    lmin = max(shift - lsh, 1e-6 * lmax)
    coeffs, _ = chebyshev_inverse_coeffs(
        0.95 * lmin, 1.05 * lmax, 4
    )
    cs = [float(c) for c in coeffs]

    W32 = jnp.asarray(WMp, dtype=jnp.float32)
    dinv32 = jnp.asarray(dinv_np, dtype=jnp.float32)
    emb, inv_j = lat_p, jnp.asarray(lat_p.inv, dtype=jnp.int32)
    shape = wm.shape
    nu32 = jnp.float32(nu_visc)

    def solve(r_p):
        r_lat = emb.embed(r_p.astype(jnp.float32), 0.0).reshape(shape)
        br = dinv32 * r_lat
        z = cs[-1] * br
        for c in reversed(cs[:-1]):
            z = dinv32 * wm.apply_grid(W32, z) + jnp.float32(c) * br
        return (nu32 * z).reshape(-1)[inv_j].astype(r_p.dtype)

    return solve


def saddle_gmg_precond(
    V: FunctionSpace,
    nu_visc: float,
    cb: CellBatch,
    psi: jnp.ndarray,
    dofmap_p: jnp.ndarray,
    np_dofs: int,
    mask: jnp.ndarray,
) -> Optional[Callable]:
    """Block-DIAGONAL stencil-GMG saddle preconditioner (SPD, for
    MINRES). See saddle_gmg_precond_parts."""
    parts = saddle_gmg_precond_parts(
        V, nu_visc, cb, psi, dofmap_p, np_dofs, mask
    )
    if parts is None:
        return None
    nu_dofs = parts.nu_dofs

    def M(r):
        zu = parts.Mv(r[:nu_dofs])
        out = jnp.concatenate(
            [zu, parts.inv_p.astype(r.dtype) * r[nu_dofs:]]
        )
        # keep the preconditioner SPD w.r.t. constrained entries
        return jnp.where(parts.mask_full, r, out)

    return M


def saddle_to_scipy(
    A_loc: np.ndarray,
    G_loc: np.ndarray,
    dofmap_u: np.ndarray,
    dofmap_p: np.ndarray,
    nu_dofs: int,
    np_dofs: int,
):
    """Global sparse [[A, G], [G^T, 0]] CSR on host."""
    import scipy.sparse as sps

    A_loc = np.asarray(A_loc)
    G_loc = np.asarray(G_loc)
    dmu = np.asarray(dofmap_u, dtype=np.int64)
    dmp = np.asarray(dofmap_p, dtype=np.int64) + nu_dofs
    nlu = dmu.shape[1]
    nlp = dmp.shape[1]
    N = nu_dofs + np_dofs

    rows_A = np.repeat(dmu, nlu, axis=1).reshape(-1)
    cols_A = np.tile(dmu, (1, nlu)).reshape(-1)
    rows_G = np.repeat(dmu, nlp, axis=1).reshape(-1)
    cols_G = np.tile(dmp, (1, nlu)).reshape(-1)

    rows = np.concatenate([rows_A, rows_G, cols_G])
    cols = np.concatenate([cols_A, cols_G, rows_G])
    vals = np.concatenate(
        [A_loc.reshape(-1), G_loc.reshape(-1), G_loc.reshape(-1)]
    )
    return sps.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
