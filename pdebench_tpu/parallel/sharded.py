"""Multi-chip FEM solves: cell-parallel domain decomposition over a Mesh.

The reference's only distribution mechanism is MPI domain decomposition
inside DOLFINx/PETSc (reference: pdebench/oracle/common.py:52,352-365 —
COMM_WORLD meshes + MPI.SUM reduction of sampled grids). The TPU-native
equivalent is expressed with `jax.sharding.Mesh` + `shard_map`:

  - cells (and their dense local matrices) are sharded across devices
    on a 1-D `cells` mesh axis — the FEM analog of data parallelism;
  - the solution vector is replicated; each device computes the partial
    global matvec for its cell block (gather -> batched matvec ->
    segment-sum) and a `psum` over the `cells` axis merges shared-dof
    contributions — exactly the role of PETSc's VecGhost updates, but
    as one XLA collective riding ICI;
  - Krylov iterations then run on the replicated vectors, so dot
    products need no extra collectives.

This scales the SpMV (the hot loop of every solve) to N chips with one
all-reduce per apply, and is what `__graft_entry__.dryrun_multichip`
exercises on a virtual device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.assemble import scatter_add
from ..solvers.krylov import KrylovInfo


def partition_cells(
    A_local: np.ndarray, dofmap: np.ndarray, n_devices: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad cell-local matrices/dofmap so n_cells % n_devices == 0.

    Padding cells carry zero matrices and point at dof 0 — they add
    exact zeros through the segment-sum, so results are unchanged.
    """
    A_local = np.asarray(A_local)
    dofmap = np.asarray(dofmap)
    n_cells = A_local.shape[0]
    rem = (-n_cells) % n_devices
    if rem:
        A_pad = np.zeros((rem,) + A_local.shape[1:], dtype=A_local.dtype)
        d_pad = np.zeros((rem, dofmap.shape[1]), dtype=dofmap.dtype)
        A_local = np.concatenate([A_local, A_pad], axis=0)
        dofmap = np.concatenate([dofmap, d_pad], axis=0)
    return A_local, dofmap


class ShardedOperator:
    """Global FEM operator with cells sharded over a device mesh axis.

    apply(u) = psum_over_devices( scatter(A_c @ u[dofmap_c]) ), with u
    replicated. Mathematically identical to assemble.LocalOperator.
    """

    def __init__(
        self,
        A_local: np.ndarray,
        dofmap: np.ndarray,
        ndof: int,
        mesh: Mesh,
        axis: str = "cells",
    ):
        n_devices = mesh.shape[axis]
        A_pad, d_pad = partition_cells(A_local, dofmap, n_devices)
        cell_sharding = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        self.mesh = mesh
        self.axis = axis
        self.ndof = int(ndof)
        self.A = jax.device_put(jnp.asarray(A_pad), cell_sharding)
        self.dofmap = jax.device_put(
            jnp.asarray(d_pad, dtype=jnp.int32), cell_sharding
        )
        self.rep_sharding = rep

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(),
        )
        def _apply(A_blk, dm_blk, u_rep):
            ve = jnp.einsum("cij,cj->ci", A_blk, u_rep[dm_blk])
            local = scatter_add(ve, dm_blk, self.ndof)
            return jax.lax.psum(local, axis)

        self._apply = _apply

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.A, self.dofmap, u)

    def diagonal(self) -> jnp.ndarray:
        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(),
        )
        def _diag(A_blk, dm_blk):
            d = jnp.einsum("cii->ci", A_blk)
            return jax.lax.psum(scatter_add(d, dm_blk, self.ndof), self.axis)

        return _diag(self.A, self.dofmap)


def sharded_cg(
    op: ShardedOperator,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    g: jnp.ndarray,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 10000,
):
    """Jacobi-PCG over the sharded operator with Dirichlet elimination.

    Vectors are replicated; the only cross-device communication is the
    psum inside op.apply. Mirrors solvers/dispatch._iterative.
    """
    from ..fem.assemble import (
        constrained_diag,
        constrained_operator,
        constrained_rhs,
    )
    from ..solvers.krylov import cg, jacobi_preconditioner

    A = constrained_operator(op, mask)
    rhs = constrained_rhs(op, b, mask, g)
    M = jacobi_preconditioner(constrained_diag(op.diagonal(), mask))
    x0 = jnp.where(mask, g, 0.0)
    return cg(A, rhs, x0=x0, M=M, rtol=rtol, atol=atol, maxiter=maxiter)


def sharded_poisson_step(
    n: int, mesh: Mesh, rtol: float = 1e-8
) -> Tuple[Callable, Tuple]:
    """Build a jittable full solve step for -Δu = f on an n×n unit square,
    cells sharded over `mesh`. Returns (step_fn, example_args).

    The step assembles the stiffness batch from (sharded) cell geometry,
    solves with sharded PCG, and returns the solution vector — the FEM
    framework's analog of "one training step" for the driver's
    multi-chip dry run.
    """
    import numpy as np

    from ..fem.assemble import cell_batch, local_stiffness, local_load
    from ..fem.mesh import unit_square_mesh
    from ..fem.spaces import FunctionSpace
    from ..fem import symbolic

    fmesh = unit_square_mesh(n)
    space = FunctionSpace(fmesh, 1)
    cb = cell_batch(fmesh, 1)
    K = np.asarray(local_stiffness(cb))
    f_fn = symbolic.lambdify_spatial("2*pi**2*sin(pi*x)*sin(pi*y)", 2)
    b = np.asarray(
        scatter_add(
            local_load(cb, f_fn(cb.qpts)),
            jnp.asarray(space.dofmap_scalar),
            space.ndof,
        )
    )
    bdofs = space.boundary_scalar_dofs
    mask = np.zeros(space.ndof, dtype=bool)
    mask[bdofs] = True
    g = np.zeros(space.ndof)

    op = ShardedOperator(K, space.dofmap_scalar, space.ndof, mesh)

    def step(b_arr, mask_arr, g_arr):
        x, info = sharded_cg(op, b_arr, mask_arr, g_arr, rtol=rtol)
        return x, info.iterations, info.residual

    example = (
        jax.device_put(jnp.asarray(b), op.rep_sharding),
        jax.device_put(jnp.asarray(mask), op.rep_sharding),
        jax.device_put(jnp.asarray(g), op.rep_sharding),
    )
    return step, example
