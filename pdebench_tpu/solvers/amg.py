"""Smoothed-aggregation algebraic multigrid preconditioner.

Fills the role of hypre BoomerAMG in the reference's solver configs
(cg+hypre on 248 cases, minres+hypre on 30 — oracle_solver per case).
TPUs have no ILU/AMG library, so:

  - SETUP on host (numpy/scipy): strength-of-connection graph, greedy
    aggregation, smoothed prolongator P = (I - omega D^-1 A) P0,
    Galerkin coarse operators A_c = P^T A P, down to a dense coarse
    solve.
  - APPLY on device: a fully traceable V-cycle. Every level operator
    (A, P, P^T) is stored as padded COO and applied as
    gather -> multiply -> segment_sum, the same HBM-bandwidth-bound
    pattern as the FEM operator itself; the coarsest level is a dense
    (pre-inverted) matmul on the MXU. The returned closure is safe as
    the M argument of the jitted Krylov loops (static shapes, no host
    sync).

Typical effect: Jacobi-PCG at res 150 P2 Poisson needs ~1-4k
iterations; AMG-PCG needs ~15-40.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps


# ---------------------------------------------------------------------------
# device-side sparse matvec (COO + segment_sum)
# ---------------------------------------------------------------------------


@dataclass
class DeviceCOO:
    rows: jnp.ndarray  # (nnz,) int32
    cols: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz,) f64
    shape: Tuple[int, int]

    @classmethod
    def from_scipy(cls, A: sps.spmatrix) -> "DeviceCOO":
        coo = A.tocoo()
        return cls(
            rows=jnp.asarray(coo.row, dtype=jnp.int32),
            cols=jnp.asarray(coo.col, dtype=jnp.int32),
            vals=jnp.asarray(coo.data),
            shape=A.shape,
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        prod = self.vals * x[self.cols]
        return jax.ops.segment_sum(prod, self.rows, self.shape[0])

    def rmatvec(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        prod = self.vals * x[self.rows]
        return jax.ops.segment_sum(prod, self.cols, self.shape[1])


# ---------------------------------------------------------------------------
# setup (host)
# ---------------------------------------------------------------------------


def _strength_graph(A: sps.csr_matrix, theta: float) -> sps.csr_matrix:
    """Symmetric strength-of-connection filter."""
    d = np.sqrt(np.abs(A.diagonal()))
    d[d == 0] = 1.0
    coo = A.tocoo()
    scale = d[coo.row] * d[coo.col]
    keep = (np.abs(coo.data) > theta * scale) | (coo.row == coo.col)
    return sps.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )


def _aggregate(S: sps.csr_matrix) -> np.ndarray:
    """Greedy standard aggregation; returns agg id per node (-1 none)."""
    n = S.shape[0]
    agg = -np.ones(n, dtype=np.int64)
    indptr, indices = S.indptr, S.indices
    next_agg = 0
    # pass 1: roots with no aggregated neighbors
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if np.any(agg[nbrs] != -1):
            continue
        agg[i] = next_agg
        agg[nbrs] = next_agg
        next_agg += 1
    # pass 2: attach stragglers to a neighboring aggregate
    for i in range(n):
        if agg[i] != -1:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        assigned = agg[nbrs]
        good = assigned[assigned != -1]
        if len(good):
            agg[i] = good[0]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg


def _condense_blocks(A: sps.csr_matrix, bs: int) -> sps.csr_matrix:
    """Node-level graph from a blocked dof matrix: |block| Frobenius."""
    coo = A.tocoo()
    rows = coo.row // bs
    cols = coo.col // bs
    n_nodes = A.shape[0] // bs
    return sps.csr_matrix(
        (coo.data**2, (rows, cols)), shape=(n_nodes, n_nodes)
    ).sqrt()


def _tentative_prolongator(
    agg: np.ndarray, B: np.ndarray
) -> Tuple[sps.csr_matrix, np.ndarray]:
    """SA tentative prolongator from near-nullspace B (n, k).

    Per aggregate: QR of B's rows -> k orthonormal columns of P0; R
    stacks into the coarse-level near-nullspace. Aggregates are batched
    by size so the QR runs as a few batched np.linalg.qr calls.
    """
    n, k = B.shape
    nc = int(agg.max()) + 1
    order = np.argsort(agg, kind="stable")
    sizes = np.bincount(agg, minlength=nc)
    starts = np.concatenate([[0], np.cumsum(sizes)])

    rows = np.empty(n * k, dtype=np.int64)
    cols = np.empty(n * k, dtype=np.int64)
    vals = np.empty(n * k, dtype=np.float64)
    Bc = np.zeros((nc * k, k))
    ptr = 0

    for size in np.unique(sizes):
        aggs = np.nonzero(sizes == size)[0]
        if size == 0 or len(aggs) == 0:
            continue
        # (m, size) node indices for all aggregates of this size
        idx = np.stack(
            [order[starts[a] : starts[a] + size] for a in aggs]
        )
        Ba = B[idx]  # (m, size, k)
        kk = min(k, size)
        Q, R = np.linalg.qr(Ba)  # Q (m, size, k'), R (m, k', k)
        m = len(aggs)
        # scatter Q into P0 columns [a*k, a*k+kk)
        r = np.repeat(idx[:, :, None], kk, axis=2).reshape(-1)
        c = (
            aggs[:, None, None] * k + np.arange(kk)[None, None, :]
        )
        c = np.broadcast_to(c, (m, size, kk)).reshape(-1)
        v = Q[:, :, :kk].reshape(-1)
        cnt = len(v)
        rows[ptr : ptr + cnt] = r
        cols[ptr : ptr + cnt] = c
        vals[ptr : ptr + cnt] = v
        ptr += cnt
        for j, a in enumerate(aggs):
            Bc[a * k : a * k + kk, :] = R[j, :kk, :]

    P0 = sps.csr_matrix(
        (vals[:ptr], (rows[:ptr], cols[:ptr])), shape=(n, nc * k)
    )
    return P0, Bc


@dataclass
class AMGLevel:
    A: DeviceCOO
    diag_inv: jnp.ndarray
    P: Optional[DeviceCOO]  # to the NEXT (coarser) level
    omega: float = 2.0 / 3.0  # level-specific damped-Jacobi weight


@dataclass
class AMG:
    levels: List[AMGLevel]
    coarse_inv: jnp.ndarray  # dense inverse of the coarsest operator
    pre_smooth: int = 1
    post_smooth: int = 1

    def precond(self) -> Callable:
        """Traceable one-V-cycle preconditioner r -> M r."""

        def vcycle(level: int, r: jnp.ndarray) -> jnp.ndarray:
            if level == len(self.levels):
                return self.coarse_inv @ r
            lv = self.levels[level]
            x = jnp.zeros_like(r)
            for _ in range(self.pre_smooth):
                x = x + lv.omega * lv.diag_inv * (r - lv.A.matvec(x))
            res = r - lv.A.matvec(x)
            rc = lv.P.rmatvec(res)
            xc = vcycle(level + 1, rc)
            x = x + lv.P.matvec(xc)
            for _ in range(self.post_smooth):
                x = x + lv.omega * lv.diag_inv * (r - lv.A.matvec(x))
            return x

        return lambda r: vcycle(0, r)

    def astype(self, dtype) -> "AMG":
        """Cast every level to `dtype` (f32 V-cycle for mixed precision)."""

        def cast_coo(c: DeviceCOO) -> DeviceCOO:
            return DeviceCOO(c.rows, c.cols, c.vals.astype(dtype), c.shape)

        return AMG(
            levels=[
                AMGLevel(
                    A=cast_coo(lv.A),
                    diag_inv=lv.diag_inv.astype(dtype),
                    P=cast_coo(lv.P),
                    omega=lv.omega,
                )
                for lv in self.levels
            ],
            coarse_inv=self.coarse_inv.astype(dtype),
            pre_smooth=self.pre_smooth,
            post_smooth=self.post_smooth,
        )


def _jacobi_omega(A: sps.csr_matrix, iters: int = 10) -> float:
    """Damping 1/rho(D^-1 A) (x 0.9) via power iteration — keeps the
    smoother contractive even when off-diagonal coupling is strong
    (near-incompressible elasticity breaks the usual 2/3 choice)."""
    d = A.diagonal()
    d[d == 0] = 1.0
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    lam = 1.0
    for _ in range(iters):
        x = (A @ x) / d
        nrm = np.linalg.norm(x)
        if nrm == 0:
            break
        lam = nrm
        x /= nrm
    return float(0.9 / max(lam, 1e-12))


def setup_amg(
    A: sps.spmatrix,
    theta: float = 0.08,
    max_levels: int = 12,
    coarse_size: int = 300,
    omega_smooth: float = 2.0 / 3.0,
    B: Optional[np.ndarray] = None,
    block_size: int = 1,
) -> AMG:
    """Build the SA-AMG hierarchy from a (constrained) CSR matrix.

    B: near-nullspace (n, k) — ones for scalar diffusion (default),
    rigid-body modes for elasticity (see rigid_body_modes). block_size:
    dofs per mesh node at the finest level (aggregation happens on the
    node graph so vector components stay together).

    NOTE: Dirichlet identity rows are decoupled singletons that stall
    aggregation — strip them first (setup_amg_masked) or pass an
    unconstrained SPD matrix.
    """
    A = A.tocsr()
    if B is None:
        B = np.ones((A.shape[0], 1))
    B = np.asarray(B, dtype=np.float64)
    bs = int(block_size)
    levels: List[AMGLevel] = []
    while A.shape[0] > coarse_size and len(levels) < max_levels:
        An = _condense_blocks(A, bs) if bs > 1 else A
        S = _strength_graph(An, theta)
        agg_nodes = _aggregate(S)
        agg = np.repeat(agg_nodes, bs) if bs > 1 else agg_nodes
        P0, Bc = _tentative_prolongator(agg, B)
        if P0.shape[1] >= 0.85 * A.shape[0]:  # aggregation stalled
            break
        d = A.diagonal()
        d[d == 0] = 1.0
        Dinv = sps.diags(1.0 / d)
        P = P0 - omega_smooth * (Dinv @ (A @ P0))
        Ac = (P.T @ A @ P).tocsr()
        Ac.eliminate_zeros()
        diag = A.diagonal()
        diag[diag == 0] = 1.0
        levels.append(
            AMGLevel(
                A=DeviceCOO.from_scipy(A),
                diag_inv=jnp.asarray(1.0 / diag),
                P=DeviceCOO.from_scipy(P),
                omega=_jacobi_omega(A),
            )
        )
        A = Ac
        B = Bc
        bs = B.shape[1]
    coarse_inv = jnp.asarray(np.linalg.pinv(A.toarray()))
    return AMG(levels=levels, coarse_inv=coarse_inv)


def rigid_body_modes(dof_coords: np.ndarray, ncomp: int) -> np.ndarray:
    """Rigid-body near-nullspace for elasticity, blocked-interleaved.

    dof_coords: (n_nodes, dim) scalar-dof coordinates. 2-D: two
    translations + one rotation (3 modes); 3-D: three + three (6).
    """
    x = np.asarray(dof_coords)
    n, dim = x.shape
    assert ncomp == dim
    k = 3 if dim == 2 else 6
    B = np.zeros((n * dim, k))
    for c in range(dim):  # translations
        B[c::dim, c] = 1.0
    if dim == 2:
        B[0::2, 2] = -x[:, 1]
        B[1::2, 2] = x[:, 0]
    else:
        # rotations about z, x, y
        B[0::3, 3] = -x[:, 1]
        B[1::3, 3] = x[:, 0]
        B[1::3, 4] = -x[:, 2]
        B[2::3, 4] = x[:, 1]
        B[0::3, 5] = x[:, 2]
        B[2::3, 5] = -x[:, 0]
    return B


def setup_amg_masked(
    A: sps.spmatrix,
    mask: np.ndarray,
    B: Optional[np.ndarray] = None,
    block_size: int = 1,
    **kwargs,
) -> Callable:
    """AMG preconditioner for the constrained system.

    Builds the hierarchy on the FREE-dof submatrix A_ff (Dirichlet rows
    would be permanent aggregation singletons) and returns a traceable
    closure acting on full-length residuals: V-cycle on the free part,
    identity on constrained entries.

    With block_size > 1, constrained dofs are eliminated per whole node
    (vector BCs constrain all components together in this benchmark),
    keeping the node-block structure intact on the submatrix.
    """
    m = np.asarray(mask, dtype=bool)
    free = np.nonzero(~m)[0]
    A_ff = A.tocsr()[free][:, free]
    if B is not None:
        B = np.asarray(B)[free]
    if block_size > 1 and len(free) % block_size != 0:
        # partial-node constraints: fall back to scalar aggregation
        block_size = 1
    amg = setup_amg(A_ff, B=B, block_size=block_size, **kwargs)
    return masked_precond(amg, m)


def masked_precond(amg: AMG, mask: np.ndarray) -> Callable:
    """Wrap a free-dof AMG hierarchy as a full-length preconditioner."""
    free = np.nonzero(~np.asarray(mask, dtype=bool))[0]
    vcycle = amg.precond()
    free_j = jnp.asarray(free, dtype=jnp.int32)
    mask_j = jnp.asarray(np.asarray(mask, dtype=bool))
    n = len(mask)

    def precond(r: jnp.ndarray) -> jnp.ndarray:
        x_f = vcycle(r[free_j])
        out = jnp.zeros(n, dtype=r.dtype).at[free_j].set(x_f)
        return jnp.where(mask_j, r, out)

    return precond


def setup_amg_masked_pair(
    A: sps.spmatrix,
    mask: np.ndarray,
    B: Optional[np.ndarray] = None,
    block_size: int = 1,
    **kwargs,
):
    """(M64, M32) preconditioner closures sharing one hierarchy setup —
    the f32 variant feeds mixed-precision iterative refinement."""
    m = np.asarray(mask, dtype=bool)
    free = np.nonzero(~m)[0]
    A_ff = A.tocsr()[free][:, free]
    if B is not None:
        B = np.asarray(B)[free]
    if block_size > 1 and len(free) % block_size != 0:
        block_size = 1
    amg = setup_amg(A_ff, B=B, block_size=block_size, **kwargs)
    return masked_precond(amg, m), masked_precond(
        amg.astype(jnp.float32), m
    )


def constrained_csr(
    A: sps.spmatrix, mask: np.ndarray
) -> sps.csr_matrix:
    """Zero Dirichlet rows/cols, unit diagonal — matches the matrix-free
    constrained_operator so the AMG preconditions the right system.

    Computed as D_f A D_f + D_c with diagonal masks (pure sparse
    products — no slow lil indexing at 10^5+ dofs).
    """
    m = np.asarray(mask, dtype=bool)
    free = sps.diags((~m).astype(np.float64))
    fixed = sps.diags(m.astype(np.float64))
    return (free @ A @ free + fixed).tocsr()
