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


def test_fused_richardson_linear_and_matches_xla_vcycles():
    """mode=richardson must (a) be a linear operator in r and (b) match
    the XLA V-cycle chain z += V(r - A z) to f32 tolerance."""
    from pdebench_tpu.solvers.gmg_fused import build_fused_richardson

    space, lat32, mask = _setup(32)
    gmg = lat32.gmg
    fused = build_fused_richardson(gmg, n_cycles=2, interpret=True)
    assert fused is not None

    rng = np.random.default_rng(3)
    r1 = rng.standard_normal(space.ndof)
    r2 = rng.standard_normal(space.ndof)
    for r in (r1, r2):
        r[mask] = 0.0
    emb = lat32.embedding
    f = lambda r: np.asarray(
        fused(jnp.asarray(emb.embed_np(r.astype(np.float32), 0.0)))
    )
    z1, z2 = f(r1), f(r2)
    z12 = f(r1 + 2.0 * r2)
    # linearity (the property CG-mode lacks): f(a+2b) == f(a)+2f(b)
    np.testing.assert_allclose(
        z12, z1 + 2.0 * z2, rtol=2e-4, atol=2e-4 * np.abs(z1).max()
    )

    # richardson chain should reduce the residual more than one V-cycle
    lv0 = gmg.levels[0]
    r_lat = emb.embed_np(r1.astype(np.float32), 0.0)
    r2d = jnp.asarray(r_lat.reshape(lv0.shape))

    def fine_apply(z2d):
        up = jnp.pad(z2d, lv0.pad)
        Az = jnp.zeros_like(z2d)
        for k, off in enumerate(lv0.offsets):
            start = tuple(lv0.pad + o for o in off)
            Az = Az + lv0.W[k] * jax.lax.dynamic_slice(up, start, lv0.shape)
        return Az

    z2d = jnp.asarray(z1.reshape(lv0.shape)[: lv0.shape[0], : lv0.shape[1]])
    rel = float(jnp.linalg.norm(r2d - fine_apply(z2d))) / float(
        jnp.linalg.norm(r2d)
    )
    assert rel < 0.25, rel  # 2 V-cycles on a mass-shifted Laplacian


def _setup_nonsym(n=48):
    """Convection-diffusion lattice: nonsymmetric, gmres-class."""
    from pdebench_tpu.fem.assemble import local_advection

    mesh = unit_square_mesh(n)
    space = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 1)
    beta_q = jnp.stack(
        [jnp.ones_like(cb.qpts[..., 0]), 0.5 * jnp.ones_like(cb.qpts[..., 0])],
        axis=-1,
    )
    A = local_stiffness(cb) + local_advection(cb, beta_q)
    lat32 = lattice_operator_from_local(
        np.asarray(A), space.dofmap_scalar, space.ndof,
        space.dof_coords, dtype=jnp.float32,
    )
    mask = np.zeros(space.ndof, bool)
    mask[space.boundary_scalar_dofs] = True
    attach_lattice_gmg(lat32, mask)
    assert lat32.gmg is not None
    return space, lat32, mask


def test_fused_inner_gmres_matches_xla_cycle():
    """The fused Arnoldi kernel must reduce the preconditioned residual
    like the XLA inner_gmres it replaces (krylov.refined_solve)."""
    from pdebench_tpu.solvers.gmg_fused import build_fused_inner_gmres

    space, lat32, mask = _setup_nonsym()
    m = 12
    inner = build_fused_inner_gmres(lat32.gmg, m, interpret=True)
    assert inner is not None

    rng = np.random.default_rng(1)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    emb = lat32.embedding
    r_lat = np.asarray(emb.embed_np(r.astype(np.float32), 0.0))
    z_lat = np.asarray(inner(jnp.asarray(r_lat)))
    assert np.all(np.isfinite(z_lat))

    # z must reduce the fine-lattice residual substantially: one
    # GMG-preconditioned 12-step cycle on a res-48 CD lattice
    lv0 = lat32.gmg.levels[0]
    z2 = jnp.asarray(z_lat.reshape(lv0.shape))
    r2 = jnp.asarray(r_lat.reshape(lv0.shape))
    up = jnp.pad(z2, lv0.pad)
    Az = jnp.zeros_like(z2)
    for k, off in enumerate(lv0.offsets):
        start = tuple(lv0.pad + o for o in off)
        Az = Az + lv0.W[k] * jax.lax.dynamic_slice(up, start, lv0.shape)
    rel = float(jnp.linalg.norm(r2 - Az)) / float(jnp.linalg.norm(r2))
    assert rel < 1e-3, rel


def test_fused_inner_gmres_step_weights_matches_baked():
    """With step_offsets, the kernel takes the freshly scattered
    (constrained) operator weights as an input; feeding it the SAME
    operator the hierarchy was built from must reproduce the baked-
    operator kernel (the per-step Burgers/Newton path)."""
    from pdebench_tpu.fem.assemble import local_advection
    from pdebench_tpu.solvers.gmg_fused import build_fused_inner_gmres
    from pdebench_tpu.solvers.stencil import (
        constrain_step_weights,
        lattice_weight_map,
    )

    space, lat32, mask = _setup_nonsym()
    m = 8
    baked = build_fused_inner_gmres(lat32.gmg, m, interpret=True)
    wm = lattice_weight_map(lat32.lattice, space.dofmap_scalar)
    assert wm is not None
    stepf = build_fused_inner_gmres(
        lat32.gmg, m, interpret=True, step_offsets=wm.offsets
    )
    assert baked is not None and stepf is not None

    # rebuild the same operator through the per-step path
    mesh = unit_square_mesh(48)
    cb = cell_batch(mesh, 1)
    beta_q = jnp.stack(
        [jnp.ones_like(cb.qpts[..., 0]), 0.5 * jnp.ones_like(cb.qpts[..., 0])],
        axis=-1,
    )
    A32 = (local_stiffness(cb) + local_advection(cb, beta_q)).astype(
        jnp.float32
    )
    W32 = wm.weights(A32)
    mask_lat = lat32.embedding.embed_np(mask, True)
    keep2 = jnp.asarray(
        (1.0 - mask_lat.astype(np.float32)).reshape(lat32.grid_shape)
    )
    W32c = constrain_step_weights(W32, wm.offsets, keep2)

    rng = np.random.default_rng(5)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    r_lat = jnp.asarray(
        lat32.embedding.embed_np(r.astype(np.float32), 0.0)
    )
    z_baked = np.asarray(baked(r_lat))
    z_step = np.asarray(stepf(r_lat, W32c))
    assert np.all(np.isfinite(z_step))
    np.testing.assert_allclose(
        z_step, z_baked, rtol=2e-4, atol=2e-4 * np.abs(z_baked).max()
    )


def test_fused_inner_gmres_true_op_with_surrogate_hierarchy():
    """When the V-cycle hierarchy is built from a SURROGATE operator
    (helmholtz's shifted laplacian via attach_lattice_gmg A_override),
    hierarchy level-0 is NOT the system matrix. The dispatch path must
    feed the TRUE constrained weights through the step_offsets input;
    this test pins the failure mode: the baked kernel (operator =
    hierarchy level-0) cannot reduce the true residual, the true-op
    input kernel can. Regression for the round-2 helmholtz fallback
    (fused Arnoldi solving K+k2M while the outer measured K-k2M)."""
    import scipy.sparse as sps

    from pdebench_tpu.solvers.gmg_fused import build_fused_inner_gmres
    from pdebench_tpu.solvers.stencil import constrain_step_weights

    mesh = unit_square_mesh(48)
    space = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 1)
    K = local_stiffness(cb)
    M = local_mass(cb)
    k2 = 25.0
    A_true = K - k2 * M

    lat32 = lattice_operator_from_local(
        np.asarray(A_true), space.dofmap_scalar, space.ndof,
        space.dof_coords, dtype=jnp.float32,
    )
    mask = np.zeros(space.ndof, bool)
    mask[space.boundary_scalar_dofs] = True

    # surrogate: the SHIFTED laplacian K + k2 M as a CSR matrix
    A_shift = np.asarray(K + k2 * M)
    dm = np.asarray(space.dofmap_scalar, dtype=np.int64)
    nl = dm.shape[1]
    rows = np.repeat(dm, nl, axis=1).reshape(-1)
    cols = np.tile(dm, (1, nl)).reshape(-1)
    A_csr = sps.coo_matrix(
        (A_shift.reshape(-1), (rows, cols)),
        shape=(space.ndof, space.ndof),
    ).tocsr()
    attach_lattice_gmg(lat32, mask, A_override=A_csr)
    assert lat32.gmg is not None

    m = 12
    baked = build_fused_inner_gmres(lat32.gmg, m, interpret=True)
    stepf = build_fused_inner_gmres(
        lat32.gmg, m, interpret=True, step_offsets=lat32.offsets
    )
    assert baked is not None and stepf is not None

    emb = lat32.embedding
    mask_lat = emb.embed_np(mask, True)
    keep2 = jnp.asarray(
        (1.0 - mask_lat.astype(np.float32)).reshape(lat32.grid_shape)
    )
    W32c = constrain_step_weights(
        lat32.W.astype(jnp.float32), lat32.offsets, keep2
    )

    rng = np.random.default_rng(11)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    r_lat = jnp.asarray(emb.embed_np(r.astype(np.float32), 0.0))

    # residual against the TRUE constrained operator
    def true_resid(z_lat):
        z2 = jnp.asarray(np.asarray(z_lat).reshape(lat32.grid_shape))
        r2 = jnp.asarray(np.asarray(r_lat).reshape(lat32.grid_shape))
        pad = lat32.pad
        up = jnp.pad(z2, pad)
        Az = jnp.zeros_like(z2)
        for k, off in enumerate(lat32.offsets):
            start = tuple(pad + o for o in off)
            Az = Az + W32c[k] * jax.lax.dynamic_slice(
                up, start, lat32.grid_shape
            )
        return float(jnp.linalg.norm(r2 - Az) / jnp.linalg.norm(r2))

    rel_true = true_resid(stepf(r_lat, W32c))
    rel_baked = true_resid(baked(r_lat))
    assert rel_true < 0.05, rel_true
    # the baked kernel solves the surrogate, not the system: it must be
    # markedly worse on the true residual (this is the pinned bug)
    assert rel_baked > 5 * rel_true, (rel_baked, rel_true)


def test_fused_inner_gmres_vmem_gate():
    from pdebench_tpu.solvers.gmg_fused import build_fused_inner_gmres

    space, lat32, mask = _setup_nonsym(32)
    assert build_fused_inner_gmres(lat32.gmg, 12, vmem_budget=1000) is None


def _setup_block(n=32):
    from pdebench_tpu.fem.assemble import local_elasticity
    from pdebench_tpu.solvers.stencil import (
        block_lattice_operator_from_local,
    )

    mesh = unit_square_mesh(n)
    space = FunctionSpace(mesh, 1, ncomp=2)
    cb = cell_batch(mesh, 1)
    K = local_elasticity(cb, 1.0, 1.0)
    lat32 = block_lattice_operator_from_local(
        np.asarray(K), space.dofmap, space.ndof, space.dof_coords, 2,
        dtype=jnp.float32,
    )
    mask = np.zeros(space.ndof, bool)
    bs = space.boundary_scalar_dofs
    mask[(bs[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)] = True
    attach_lattice_gmg(lat32, mask)
    assert lat32.gmg is not None
    return space, lat32, mask


def _setup_3d(n=10, advect=False):
    from pdebench_tpu.fem.mesh import unit_cube_mesh

    mesh = unit_cube_mesh(n)
    space = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 1)
    A = local_stiffness(cb) + 0.5 * local_mass(cb)
    if advect:
        from pdebench_tpu.fem.assemble import local_advection

        ones = jnp.ones_like(cb.qpts[..., 0])
        beta_q = jnp.stack([ones, 0.5 * ones, 0.25 * ones], axis=-1)
        A = local_stiffness(cb) + local_advection(cb, beta_q)
    lat32 = lattice_operator_from_local(
        np.asarray(A), space.dofmap_scalar, space.ndof,
        space.dof_coords, dtype=jnp.float32,
    )
    assert lat32 is not None
    mask = np.zeros(space.ndof, bool)
    mask[space.boundary_scalar_dofs] = True
    attach_lattice_gmg(lat32, mask)
    assert lat32.gmg is not None
    assert len(lat32.gmg.levels[0].shape) == 3
    return space, lat32, mask


def _residual_3d(lat32, r_lat, z_lat):
    lv0 = lat32.gmg.levels[0]
    z3 = np.asarray(z_lat).reshape(lv0.shape)
    r3 = np.asarray(r_lat).reshape(lv0.shape)
    up = np.pad(z3, lv0.pad)
    Az = np.zeros_like(z3)
    for k, off in enumerate(lv0.offsets):
        sl = tuple(
            slice(lv0.pad + o, lv0.pad + o + s)
            for o, s in zip(off, lv0.shape)
        )
        Az = Az + np.asarray(lv0.W[k]) * up[sl]
    return np.linalg.norm(r3 - Az) / np.linalg.norm(r3)


def test_fused_inner_cg_3d_reduces_residual():
    """3-D lattices flatten into slab-packed 2-D planes (_Level3); the
    fused CG inner must solve the 3-D system like the 2-D one."""
    space, lat32, mask = _setup_3d()
    inner = build_fused_inner_cg(lat32.gmg, inner_iters=12, interpret=True)
    assert inner is not None
    rng = np.random.default_rng(0)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    r_lat = np.asarray(lat32.embedding.embed_np(r.astype(np.float32), 0.0))
    z_lat = np.asarray(inner(jnp.asarray(r_lat)))
    assert np.all(np.isfinite(z_lat))
    rel = _residual_3d(lat32, r_lat, z_lat)
    assert rel < 1e-3, rel


def test_fused_inner_gmres_3d_reduces_residual():
    from pdebench_tpu.solvers.gmg_fused import build_fused_inner_gmres

    space, lat32, mask = _setup_3d(advect=True)
    inner = build_fused_inner_gmres(lat32.gmg, 12, interpret=True)
    assert inner is not None
    rng = np.random.default_rng(2)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    r_lat = np.asarray(lat32.embedding.embed_np(r.astype(np.float32), 0.0))
    z_lat = np.asarray(inner(jnp.asarray(r_lat)))
    assert np.all(np.isfinite(z_lat))
    rel = _residual_3d(lat32, r_lat, z_lat)
    assert rel < 1e-2, rel


def test_fused_block_inner_cg_reduces_residual():
    from pdebench_tpu.solvers.gmg_fused import build_fused_block_inner_cg

    space, lat32, mask = _setup_block()
    inner = build_fused_block_inner_cg(
        lat32.gmg, inner_iters=12, interpret=True
    )
    assert inner is not None

    rng = np.random.default_rng(0)
    r = rng.standard_normal(space.ndof)
    r[mask] = 0.0
    emb = lat32.embedding
    r_lat = np.asarray(emb.embed_np(r.astype(np.float32), 0.0))
    z_lat = np.asarray(inner(jnp.asarray(r_lat)))
    assert np.all(np.isfinite(z_lat))

    # z approximately solves the constrained fine BLOCK system: apply
    # the constrained weights via the XLA block-GMG level-0 stencil
    lv0 = lat32.gmg.levels[0]
    from pdebench_tpu.solvers.gmg import _apply_block_np

    z3 = z_lat.reshape(lv0.shape + (2,))
    r3 = r_lat.reshape(lv0.shape + (2,))
    Az = _apply_block_np(
        np.asarray(lv0.W, np.float64),
        [tuple(o) for o in lv0.offsets],
        z3.astype(np.float64),
    )
    rel = np.linalg.norm(r3 - Az) / np.linalg.norm(r3)
    assert rel < 1e-3, rel


def test_padded_hierarchy_converges_and_fused_skips():
    """Lattices whose halving chain hits an EVEN axis size (76 at n=75;
    301->151->76 at res-150 P2 — the silent no-GMG regression) must
    still build a full hierarchy via identity padding, contract as a
    preconditioner, and be skipped by the fused builders (whose
    transfer-band layout assumes pure halving)."""
    space, lat32, mask = _setup(n=75)
    gmg = lat32.gmg
    assert gmg is not None and gmg.padded
    assert any(lv.pad_to is not None for lv in gmg.levels)
    # preconditioned Richardson on the constrained operator contracts
    from pdebench_tpu.solvers.gmg import _device_apply

    M = gmg.precond()
    rng = np.random.default_rng(3)
    lv0 = gmg.levels[0]
    r = jnp.asarray(
        rng.standard_normal(lv0.shape), dtype=jnp.float32
    )
    x = jnp.zeros_like(r)
    for _ in range(10):
        x = x + M(r - _device_apply(lv0, x))
    rel = float(
        jnp.linalg.norm(r - _device_apply(lv0, x)) / jnp.linalg.norm(r)
    )
    assert rel < 1e-2, rel
    assert build_fused_inner_cg(gmg, inner_iters=4, interpret=True) is None
