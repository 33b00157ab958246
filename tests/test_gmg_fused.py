"""Fused GMG-PCG Pallas kernel: interpret-mode correctness.

The compiled path is TPU-only (exercised on hardware); interpret mode
checks the kernel logic — stencil rolls, banded-matmul transfers,
coarsest-level sweeps, CG recurrence — against the XLA hierarchy.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pdebench_tpu.fem.assemble import cell_batch, local_mass, local_stiffness
from pdebench_tpu.fem.mesh import unit_square_mesh
from pdebench_tpu.fem.spaces import FunctionSpace
from pdebench_tpu.solvers.gmg import attach_lattice_gmg
from pdebench_tpu.solvers.stencil import lattice_operator_from_local
from pdebench_tpu.solvers.gmg_fused import build_fused_inner_cg


def _setup(n=64):
    mesh = unit_square_mesh(n)
    space = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 1)
    A = local_stiffness(cb) + 0.5 * local_mass(cb)
    lat32 = lattice_operator_from_local(
        np.asarray(A), space.dofmap_scalar, space.ndof,
        space.dof_coords, dtype=jnp.float32,
    )
    mask = np.zeros(space.ndof, bool)
    mask[space.boundary_scalar_dofs] = True
    attach_lattice_gmg(lat32, mask)
    assert lat32.gmg is not None
    return space, lat32, mask


def test_fused_inner_cg_reduces_residual():
    space, lat32, mask = _setup()
    inner = build_fused_inner_cg(lat32.gmg, inner_iters=12, interpret=True)
    assert inner is not None

    rng = np.random.default_rng(0)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    r_lat = np.asarray(lat32.embedding.embed_np(r.astype(np.float32), 0.0))
    z_lat = np.asarray(inner(jnp.asarray(r_lat)))
    assert np.all(np.isfinite(z_lat))

    # z must approximately solve the constrained fine system
    lv0 = lat32.gmg.levels[0]
    z2 = jnp.asarray(z_lat.reshape(lv0.shape))
    r2 = jnp.asarray(r_lat.reshape(lv0.shape))
    up = jnp.pad(z2, lv0.pad)
    Az = jnp.zeros_like(z2)
    for k, off in enumerate(lv0.offsets):
        start = tuple(lv0.pad + o for o in off)
        Az = Az + lv0.W[k] * jax.lax.dynamic_slice(up, start, lv0.shape)
    rel = float(jnp.linalg.norm(r2 - Az)) / float(jnp.linalg.norm(r2))
    assert rel < 1e-4, rel


def test_fused_builder_vmem_gate():
    """Oversized hierarchies must return None (fall back to XLA)."""
    space, lat32, mask = _setup(48)
    assert (
        build_fused_inner_cg(lat32.gmg, 12, vmem_budget=1000) is None
    )
