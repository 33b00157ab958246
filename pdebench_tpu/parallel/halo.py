"""Stripe-partitioned stencil solves with ppermute halo exchange.

The cell-DD path (sharded.py) replicates the solution vector and
all-reduces a full-length vector every matvec — fine as MPI-size-1
parity, but O(ndof) ICI traffic per apply. This module is the actual
multi-chip design for structured meshes: the lattice's leading axis
(y in 2-D, z in 3-D) is split into contiguous stripes across a 1-D
device mesh axis, so

  - each device owns `rows/ndev` stencil-weight planes and solution
    rows (dofs are PARTITIONED, not replicated);
  - one apply exchanges only the `pad` boundary rows with each
    neighbor via `jax.lax.ppermute` (2*pad*nx values over ICI — the
    halo exchange of classic domain decomposition, reference role:
    PETSc VecGhost updates under DOLFINx MPI meshes,
    pdebench/oracle/common.py:52,352-365);
  - Krylov vectors stay stripe-sharded end to end; dot products
    compile to partial reductions + one scalar psum (GSPMD).

Covers scalar P1/P2/P3 lattices and blocked VECTOR lattices
(elasticity), 2-D and 3-D; Dirichlet conditions and masked-lattice
absent sites are handled by the same constrained-operator wrappers as
the single-chip path, so results match the dense stencil bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class HaloStencilOperator:
    """Stencil operator with the leading lattice axis sharded in stripes.

    W: (K, *shape) scalar or (K, *shape, d, d) block weight planes
    (numpy or jax array); offsets: K tuples of per-axis taps. The row
    axis (shape[0]) is zero-padded to a multiple of the mesh axis size;
    padded rows must be masked as constrained by the caller (see
    `pad_mask`), which makes them exact identity rows under
    `fem.assemble.constrained_operator`.
    """

    def __init__(
        self,
        W: np.ndarray,
        offsets: Sequence[Tuple[int, ...]],
        mesh: Mesh,
        axis: str = "stripe",
        ncomp: int = 1,
    ):
        offsets = [tuple(int(v) for v in o) for o in offsets]
        dim = len(offsets[0]) if offsets else 1
        W = np.asarray(W)
        shape = tuple(W.shape[1 : 1 + dim])
        d = int(ncomp)
        if d > 1:
            assert W.shape[1 + dim :] == (d, d), (W.shape, dim, d)
        pad = int(max(abs(v) for o in offsets for v in o)) if offsets else 0
        ndev = mesh.shape[axis]
        rows = shape[0]
        rows_pad = -(-rows // ndev) * ndev
        if rows_pad // ndev < max(pad, 1):
            raise ValueError(
                f"stripe of {rows_pad // ndev} rows < stencil halo {pad}: "
                f"lattice too small for {ndev} devices"
            )
        if rows_pad != rows:
            padw = [(0, 0), (0, rows_pad - rows)] + [(0, 0)] * (W.ndim - 2)
            W = np.pad(W, padw)
        self.offsets = offsets
        self.pad = pad
        self.ncomp = d
        self.dim = dim
        self.rows_orig = rows
        self.shape = (rows_pad,) + shape[1:]
        self.grid_shape = self.shape + ((d,) if d > 1 else ())
        self.mesh = mesh
        self.axis = axis
        w_spec = P(None, axis)
        self.w_sharding = NamedSharding(mesh, w_spec)
        self.grid_sharding = NamedSharding(mesh, P(axis))
        self.W = jax.device_put(jnp.asarray(W), self.w_sharding)

        fwd = [(i, i + 1) for i in range(ndev - 1)]  # src j-1 -> dest j
        bwd = [(i, i - 1) for i in range(1, ndev)]  # src j+1 -> dest j
        block = d > 1
        tail = (0,) if block else ()
        n_space = dim

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(w_spec, P(axis)),
            out_specs=P(axis),
        )
        def _apply(W_blk, u_blk):
            p = pad
            if p and ndev > 1:
                top = jax.lax.ppermute(u_blk[-p:], axis, fwd)
                bot = jax.lax.ppermute(u_blk[:p], axis, bwd)
            else:
                zp = jnp.zeros((p,) + u_blk.shape[1:], u_blk.dtype)
                top, bot = zp, zp
            u_ext = jnp.concatenate([top, u_blk, bot], axis=0)
            padw = [(0, 0)] + [(p, p)] * (n_space - 1)
            if block:
                padw.append((0, 0))
            u_ext = jnp.pad(u_ext, padw)
            core = u_blk.shape
            out = jnp.zeros_like(u_blk)
            for k, off in enumerate(offsets):
                start = tuple(p + o for o in off) + tail
                tap = jax.lax.dynamic_slice(u_ext, start, core)
                if block:
                    out = out + jnp.einsum("...ab,...b->...a", W_blk[k], tap)
                else:
                    out = out + W_blk[k] * tap
            return out

        self._apply = _apply

    def __call__(self, u_grid: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.W, u_grid)

    def diagonal(self) -> jnp.ndarray:
        """Grid-shaped operator diagonal (stripe-sharded)."""
        k0 = next(
            (k for k, o in enumerate(self.offsets) if all(v == 0 for v in o)),
            None,
        )
        if k0 is None:
            d = jnp.ones(self.grid_shape, self.W.dtype)
        elif self.ncomp > 1:
            d = jnp.einsum("...aa->...a", self.W[k0])
        else:
            d = self.W[k0]
        return jax.device_put(d, self.grid_sharding)

    # --- grid plumbing -------------------------------------------------
    def pad_grid(self, u, fill=0.0) -> jnp.ndarray:
        """Pad the row axis to the sharded shape and constrain sharding.

        Trace-friendly: works on host arrays and on traced values
        inside jit (the constraint then guides GSPMD partitioning).
        """
        u = jnp.asarray(u)
        extra = self.shape[0] - self.rows_orig
        if extra:
            padw = [(0, extra)] + [(0, 0)] * (u.ndim - 1)
            u = jnp.pad(u, padw, constant_values=fill)
        return jax.lax.with_sharding_constraint(u, self.grid_sharding)

    def pad_mask(self, mask) -> jnp.ndarray:
        """Pad a constraint mask with True on the padded rows."""
        return self.pad_grid(jnp.asarray(mask, dtype=bool), fill=True)

    def crop_grid(self, u: jnp.ndarray) -> jnp.ndarray:
        return u[: self.rows_orig]

    @classmethod
    def from_lattice_operator(
        cls, op, mesh: Mesh, axis: str = "stripe", use_f64: bool = True
    ) -> "HaloStencilOperator":
        """Build from a LatticeOperator / BlockLatticeOperator."""
        W = op.W_f64 if use_f64 else op.W
        return cls(
            np.asarray(W),
            op.offsets,
            mesh,
            axis=axis,
            ncomp=getattr(op, "ncomp", 1),
        )


def halo_pcg(
    op: HaloStencilOperator,
    b: np.ndarray,
    mask: np.ndarray,
    g: np.ndarray,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 10000,
):
    """Jacobi-PCG on stripe-sharded grids.

    b/mask/g are UNPADDED grid-shaped arrays (host or device); Dirichlet
    and pad rows become identity rows via the same constrained-operator
    wrappers as the single-chip path. Returns (x_grid_cropped, info).
    """
    from ..fem.assemble import (
        constrained_diag,
        constrained_operator,
        constrained_rhs,
    )
    from ..solvers.krylov import cg, jacobi_preconditioner

    b_s = op.pad_grid(b)
    g_s = op.pad_grid(g)
    mask_s = op.pad_mask(mask)
    A = constrained_operator(op, mask_s)
    rhs = constrained_rhs(op, b_s, mask_s, g_s)
    M = jacobi_preconditioner(constrained_diag(op.diagonal(), mask_s))
    x0 = jnp.where(mask_s, g_s, 0.0)
    x, info = cg(A, rhs, x0=x0, M=M, rtol=rtol, atol=atol, maxiter=maxiter)
    return op.crop_grid(x), info


def sharded_elasticity_step(
    n: int, mesh: Mesh, axis: str = "stripe", rtol: float = 1e-8
) -> Tuple[Callable, Tuple]:
    """Jittable sharded 2-D linear-elasticity solve on an n×n unit
    square: block stencil, stripe-partitioned dofs, halo-exchange
    matvec. Returns (step_fn, example_args) for the multi-chip dry run.
    """
    from ..fem import symbolic
    from ..fem.assemble import local_elasticity, local_vector_load, scatter_add
    from ..fem.mesh import unit_square_mesh
    from ..fem.spaces import FunctionSpace
    from ..solvers.stencil import block_lattice_operator_from_local

    lam, mu = 1.0, 1.0
    fmesh = unit_square_mesh(n)
    space = FunctionSpace(fmesh, 1, ncomp=2)
    from ..fem.assemble import cell_batch

    cb = cell_batch(fmesh, 1)
    K = local_elasticity(cb, mu, lam)
    lat_op = block_lattice_operator_from_local(
        np.asarray(K), space.dofmap, space.ndof, space.dof_coords, 2
    )
    assert lat_op is not None, "unit square must form a node lattice"
    op = HaloStencilOperator.from_lattice_operator(lat_op, mesh, axis=axis)

    # MMS body force for u = (sin(pi x) sin(pi y), x y (1-x)(1-y))
    fx = symbolic.lambdify_spatial(
        f"{2 * mu + lam} * 2*pi**2*sin(pi*x)*sin(pi*y)", 2
    )
    fy = symbolic.lambdify_spatial("x*(1-x) + y*(1-y)", 2)
    qp = cb.qpts
    f_q = jnp.stack([fx(qp), fy(qp)], axis=-1)
    b_dof = np.asarray(
        scatter_add(
            local_vector_load(cb, f_q), jnp.asarray(space.dofmap), space.ndof
        )
    )
    mask_dof = np.zeros(space.ndof, dtype=bool)
    bs = space.boundary_scalar_dofs
    mask_dof[(bs[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)] = True
    g_dof = np.zeros(space.ndof)

    emb = lat_op.embedding  # dof <-> (lattice, comp) flat injection
    gs = lat_op.grid_shape
    b_g = emb.embed_np(b_dof, 0.0).reshape(gs)
    mask_g = emb.embed_np(mask_dof, True).reshape(gs)
    g_g = emb.embed_np(g_dof, 0.0).reshape(gs)

    def step(b_arr, mask_arr, g_arr):
        x, info = halo_pcg(op, b_arr, mask_arr, g_arr, rtol=rtol)
        return x, info.iterations, info.residual

    return step, (b_g, mask_g, g_g)


class HaloSaddleOperator:
    """Stripe-sharded Taylor-Hood saddle apply [[A, G], [G^T, 0]].

    The single-chip SaddleStencil keeps velocity on the fine (r*R+1)^dim
    lattice and pressure on the coarse (R+1)^dim one. For sharding, the
    pressure is EMBEDDED on the fine lattice (values at every r-th site,
    zeros elsewhere — the same interleave _upsample performs, stored
    rather than recomputed) and the saddle vector becomes ONE
    (fine..., d+1) block grid, stripe-partitioned on the leading axis
    exactly like HaloStencilOperator grids:

      x[..., :d] = velocity components      x[..., d] = embedded pressure

    Every block is then a fine-lattice stencil: A is the (d x d)-block
    stencil; G taps the embedded pressure at its fine-unit offsets; G^T
    becomes a stencil whose weights are the coarse WGT planes embedded
    at the r-strided sites (zero rows elsewhere). One halo exchange of
    max(pad_A, pad_G, pad_GT) boundary rows per apply covers all three.
    Non-coarse pressure sites are constrained identity rows (their
    weights AND data are zero), so MINRES on the embedded vector is
    exactly MINRES on the compact one — inner products agree because
    the extra sites hold zeros on both sides of every dot.

    Reference role: the PETSc MatMult inside parallel fieldsplit Stokes
    solves (pdebench/oracle/stokes.py:253-263) under MPI meshes.
    """

    def __init__(self, sst, WA: np.ndarray, mesh: Mesh, axis: str = "stripe"):
        d = sst.d
        dim = len(sst.fine)
        fine = sst.fine
        r = sst.r
        WA = np.asarray(WA, dtype=np.float64)  # (KA, *fine, d, d)
        WG = np.asarray(sst.WG64)  # (KG, *fine, d)
        WGTc = np.asarray(sst.WGT64)  # (KGT, *coarse, d)
        # embed the coarse G^T planes on the fine lattice
        WGT = np.zeros((WGTc.shape[0],) + fine + (d,))
        sl = tuple(slice(0, None, r) for _ in range(dim))
        WGT[(slice(None),) + sl] = WGTc
        offsA = [tuple(int(v) for v in o) for o in sst.wmapA.offsets]
        pad = max(
            sst.wmapA.pad, sst.pad_g, sst.pad_gt, 1
        )
        ndev = mesh.shape[axis]
        rows = fine[0]
        rows_pad = -(-rows // ndev) * ndev
        if rows_pad // ndev < pad:
            raise ValueError(
                f"stripe of {rows_pad // ndev} rows < saddle halo {pad}"
            )
        extra = rows_pad - rows
        if extra:
            WA = np.pad(WA, [(0, 0), (0, extra)] + [(0, 0)] * (WA.ndim - 2))
            WG = np.pad(WG, [(0, 0), (0, extra)] + [(0, 0)] * (WG.ndim - 2))
            WGT = np.pad(WGT, [(0, 0), (0, extra)] + [(0, 0)] * (WGT.ndim - 2))
        self.sst = sst
        self.d = d
        self.dim = dim
        self.r = r
        self.pad = pad
        self.rows_orig = rows
        self.shape = (rows_pad,) + fine[1:]
        self.grid_shape = self.shape + (d + 1,)
        self.mesh = mesh
        self.axis = axis
        w_spec = P(None, axis)
        self.w_sharding = NamedSharding(mesh, w_spec)
        self.grid_sharding = NamedSharding(mesh, P(axis))
        self.WA = jax.device_put(jnp.asarray(WA), self.w_sharding)
        self.WG = jax.device_put(jnp.asarray(WG), self.w_sharding)
        self.WGT = jax.device_put(jnp.asarray(WGT), self.w_sharding)
        offs_g = [tuple(int(v) for v in o) for o in sst.offs_g]
        offs_gt = [tuple(int(v) for v in o) for o in sst.offs_gt]

        fwd = [(i, i + 1) for i in range(ndev - 1)]
        bwd = [(i, i - 1) for i in range(1, ndev)]

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(w_spec, w_spec, w_spec, P(axis)),
            out_specs=P(axis),
        )
        def _apply(WA_b, WG_b, WGT_b, x_b):
            p_ = pad
            if ndev > 1:
                top = jax.lax.ppermute(x_b[-p_:], axis, fwd)
                bot = jax.lax.ppermute(x_b[:p_], axis, bwd)
            else:
                zp = jnp.zeros((p_,) + x_b.shape[1:], x_b.dtype)
                top, bot = zp, zp
            x_ext = jnp.concatenate([top, x_b, bot], axis=0)
            padw = [(0, 0)] + [(p_, p_)] * (dim - 1) + [(0, 0)]
            x_ext = jnp.pad(x_ext, padw)
            core_u = x_b.shape[:-1] + (d,)
            core_p = x_b.shape[:-1] + (1,)
            ru = jnp.zeros(x_b.shape[:-1] + (d,), x_b.dtype)
            rp = jnp.zeros(x_b.shape[:-1], x_b.dtype)
            for k, off in enumerate(offsA):
                start = tuple(p_ + o for o in off) + (0,)
                tap = jax.lax.dynamic_slice(x_ext, start, core_u)
                ru = ru + jnp.einsum("...ab,...b->...a", WA_b[k], tap)
            for k, off in enumerate(offs_g):
                start = tuple(p_ + o for o in off) + (d,)
                tap = jax.lax.dynamic_slice(x_ext, start, core_p)[..., 0]
                ru = ru + WG_b[k] * tap[..., None]
            for k, off in enumerate(offs_gt):
                start = tuple(p_ + o for o in off) + (0,)
                tap = jax.lax.dynamic_slice(x_ext, start, core_u)
                rp = rp + jnp.einsum("...a,...a->...", WGT_b[k], tap)
            return jnp.concatenate([ru, rp[..., None]], axis=-1)

        self._apply = _apply

    def __call__(self, x_grid: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.WA, self.WG, self.WGT, x_grid)

    def pad_grid(self, x, fill=0.0) -> jnp.ndarray:
        x = jnp.asarray(x)
        extra = self.shape[0] - self.rows_orig
        if extra:
            padw = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, padw, constant_values=fill)
        return jax.lax.with_sharding_constraint(x, self.grid_sharding)

    def pad_mask(self, mask) -> jnp.ndarray:
        return self.pad_grid(jnp.asarray(mask, dtype=bool), fill=True)

    def crop_grid(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[: self.rows_orig]

    # -- dof <-> embedded-grid plumbing (host side) ----------------------
    def embed_np(self, x_dof: np.ndarray, fill=0.0) -> np.ndarray:
        """[u; p] flat dof vector -> (fine..., d+1) embedded grid."""
        sst = self.sst
        d = self.d
        u = sst.blat.embed_np(
            np.asarray(x_dof[: sst.n_u]), fill
        ).reshape(sst.fine + (d,))
        pc = sst.lat_p.embed_np(np.asarray(x_dof[sst.n_u :]), fill).reshape(
            sst.coarse
        )
        p = np.full(sst.fine, fill, dtype=pc.dtype)
        p[tuple(slice(0, None, self.r) for _ in range(self.dim))] = pc
        return np.concatenate([u, p[..., None]], axis=-1)

    def extract_np(self, x_grid: np.ndarray) -> np.ndarray:
        """(fine..., d+1) embedded grid -> [u; p] flat dof vector."""
        sst = self.sst
        u = np.asarray(x_grid[..., : self.d]).reshape(-1)[
            np.asarray(sst._binv)
        ]
        pc = np.asarray(
            x_grid[
                tuple(slice(0, None, self.r) for _ in range(self.dim))
                + (self.d,)
            ]
        ).reshape(-1)[np.asarray(sst._pinv)]
        return np.concatenate([u, pc])


def halo_saddle_minres(
    op: HaloSaddleOperator,
    b: np.ndarray,
    mask: np.ndarray,
    g: np.ndarray,
    rtol: float = 1e-9,
    atol: float = 1e-14,
    maxiter: int = 20000,
):
    """MINRES on the stripe-sharded embedded saddle grid.

    b/mask/g are UNPADDED (fine..., d+1) grids (non-coarse pressure
    sites must be masked True with zero data — embed_np with fill
    does this). Identity rows via the same constrained wrappers as the
    single-chip path; krylov.minres is shape-generic (vdot)."""
    from ..fem.assemble import constrained_operator, constrained_rhs
    from ..solvers.krylov import minres

    b_s = op.pad_grid(b)
    g_s = op.pad_grid(g)
    mask_s = op.pad_mask(mask)
    A = constrained_operator(op, mask_s)
    rhs = constrained_rhs(op, b_s, mask_s, g_s)
    x0 = jnp.where(mask_s, g_s, 0.0)
    x, info = minres(
        A, rhs, x0=x0, rtol=rtol, atol=atol, maxiter=maxiter
    )
    return op.crop_grid(x), info


def sharded_stokes_step(
    n: int, mesh: Mesh, axis: str = "stripe", rtol: float = 1e-8
) -> Tuple[Callable, Tuple]:
    """Jittable sharded Taylor-Hood Stokes solve on an n x n unit
    square: the full [[A, G], [G^T, 0]] saddle as stripe-partitioned
    fine-lattice stencils with halo exchange (third halo family,
    VERDICT r4 stretch #9). Returns (step_fn, example_args)."""
    from ..fem import symbolic
    from ..fem.assemble import (
        cell_batch,
        local_divergence,
        local_vector_laplacian,
        local_vector_load,
        scatter_add,
    )
    from ..fem.mesh import unit_square_mesh
    from ..fem.spaces import FunctionSpace
    from ..solvers.saddle_stencil import build_saddle_stencil

    fmesh = unit_square_mesh(n)
    V = FunctionSpace(fmesh, 2, ncomp=2)
    Q = FunctionSpace(fmesh, 1)
    # P1 pressure basis at the velocity quadrature points: a degree-1
    # cell batch sharing the same quadrature rule
    cb1 = cell_batch(fmesh, 1, qdegree=4)
    cb2 = cell_batch(fmesh, 2, qdegree=4)
    A_loc = np.asarray(local_vector_laplacian(cb2, 1.0))
    G_loc = np.asarray(local_divergence(cb2, np.asarray(cb1.phi)))
    sst = build_saddle_stencil(V, Q, G_loc)
    assert sst is not None, "unit square must form nested TH lattices"
    WA = sst.wmapA.weights_np(A_loc)
    op = HaloSaddleOperator(sst, WA, mesh, axis=axis)

    # MMS: u = (sin(pi x) sin(pi y), x(1-x)y(1-y)-ish), simple forcing
    fx = symbolic.lambdify_spatial("2*pi**2*sin(pi*x)*sin(pi*y)", 2)
    fy = symbolic.lambdify_spatial("x*(1-x) + y*(1-y)", 2)
    qp = np.asarray(cb2.qpts)
    f_q = np.stack([fx(qp), fy(qp)], axis=-1)
    b_u = np.asarray(
        scatter_add(
            local_vector_load(cb2, jnp.asarray(f_q)),
            jnp.asarray(V.dofmap),
            V.ndof,
        )
    )
    n_u, n_p = V.ndof, Q.ndof
    b_dof = np.concatenate([b_u, np.zeros(n_p)])
    mask_dof = np.zeros(n_u + n_p, dtype=bool)
    bs = V.boundary_scalar_dofs
    mask_dof[(bs[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)] = True
    mask_dof[n_u] = True  # pin one pressure dof
    g_dof = np.zeros(n_u + n_p)

    b_g = op.embed_np(b_dof, 0.0)
    mask_g = op.embed_np(mask_dof, True).astype(bool)
    g_g = op.embed_np(g_dof, 0.0)

    def step(b_arr, mask_arr, g_arr):
        x, info = halo_saddle_minres(op, b_arr, mask_arr, g_arr, rtol=rtol)
        return x, info.iterations, info.residual

    return step, (b_g, mask_g, g_g)
