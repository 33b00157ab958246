"""Sharded (multi-chip) operator and solve-step tests on the virtual
8-device CPU mesh, plus the driver contract in __graft_entry__.py."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pdebench_tpu.fem.assemble import LocalOperator, cell_batch, local_stiffness
from pdebench_tpu.fem.mesh import unit_square_mesh
from pdebench_tpu.fem.spaces import FunctionSpace
from pdebench_tpu.parallel import ShardedOperator, sharded_poisson_step


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), axis_names=("cells",))


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_matvec_matches_local(n_dev):
    m = unit_square_mesh(7)
    space = FunctionSpace(m, 1)
    cb = cell_batch(m, 1)
    K = local_stiffness(cb)
    op_local = LocalOperator(K, space.dofmap_scalar, space.ndof)
    op_shard = ShardedOperator(
        np.asarray(K), space.dofmap_scalar, space.ndof, _mesh(n_dev)
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.ndof))
    np.testing.assert_allclose(
        np.asarray(op_shard(u)), np.asarray(op_local(u)), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op_shard.diagonal()),
        np.asarray(op_local.diagonal()),
        rtol=1e-12,
    )


def test_sharded_poisson_step_converges():
    step, args = sharded_poisson_step(8, _mesh(8))
    x, iters, res = jax.jit(step)(*args)
    assert float(res) < 1e-6
    assert np.all(np.isfinite(np.asarray(x)))


def test_graft_entry_contract():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)


# ---- halo-exchange stripe-partitioned stencil path ---------------------

from pdebench_tpu.fem.assemble import local_stiffness as _local_stiffness
from pdebench_tpu.fem.mesh import unit_cube_mesh
from pdebench_tpu.parallel import (
    HaloStencilOperator,
    halo_pcg,
    sharded_elasticity_step,
)
from pdebench_tpu.solvers.stencil import (
    block_lattice_operator_from_local,
    lattice_operator_from_local,
)


def _stripe_mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), axis_names=("stripe",))


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_halo_apply_matches_dense_stencil_p2(n_dev):
    m = unit_square_mesh(12)
    space = FunctionSpace(m, 2)
    cb = cell_batch(m, 2)
    K = np.asarray(local_stiffness(cb))
    lat = lattice_operator_from_local(
        K, space.dofmap_scalar, space.ndof, space.dof_coords
    )
    op = HaloStencilOperator.from_lattice_operator(lat, _stripe_mesh(n_dev))
    rng = np.random.default_rng(0)
    u = rng.standard_normal(lat.shape)
    y_ref = np.asarray(lat.apply_grid(jnp.asarray(u)))
    y_sh = np.asarray(op.crop_grid(op(op.pad_grid(u))))
    np.testing.assert_array_equal(y_sh, y_ref)  # bit-exact


def test_halo_apply_matches_dense_stencil_3d():
    m = unit_cube_mesh(5)
    space = FunctionSpace(m, 1)
    cb = cell_batch(m, 1)
    K = np.asarray(local_stiffness(cb))
    lat = lattice_operator_from_local(
        K, space.dofmap_scalar, space.ndof, space.dof_coords
    )
    op = HaloStencilOperator.from_lattice_operator(lat, _stripe_mesh(4))
    rng = np.random.default_rng(1)
    u = rng.standard_normal(lat.shape)
    y_ref = np.asarray(lat.apply_grid(jnp.asarray(u)))
    y_sh = np.asarray(op.crop_grid(op(op.pad_grid(u))))
    np.testing.assert_array_equal(y_sh, y_ref)


def test_halo_pcg_poisson_matches_single_chip():
    m = unit_square_mesh(14)
    space = FunctionSpace(m, 1)
    cb = cell_batch(m, 1)
    K = np.asarray(local_stiffness(cb))
    lat = lattice_operator_from_local(
        K, space.dofmap_scalar, space.ndof, space.dof_coords
    )
    op = HaloStencilOperator.from_lattice_operator(lat, _stripe_mesh(8))
    rng = np.random.default_rng(2)
    b_dof = rng.standard_normal(space.ndof)
    mask_dof = np.zeros(space.ndof, dtype=bool)
    mask_dof[space.boundary_scalar_dofs] = True
    g_dof = np.zeros(space.ndof)
    emb = lat.embedding
    b_g = emb.embed_np(b_dof, 0.0).reshape(lat.shape)
    mask_g = emb.embed_np(mask_dof, True).reshape(lat.shape)
    g_g = emb.embed_np(g_dof, 0.0).reshape(lat.shape)
    x_g, info = halo_pcg(op, b_g, mask_g, g_g, rtol=1e-12)
    assert bool(info.converged)
    # single-chip dense-stencil CG on the same system
    from pdebench_tpu.fem.assemble import (
        constrained_diag,
        constrained_operator,
        constrained_rhs,
    )
    from pdebench_tpu.solvers.krylov import cg, jacobi_preconditioner

    A = constrained_operator(lambda v: lat.apply_grid(v), jnp.asarray(mask_g))
    rhs = constrained_rhs(
        lambda v: lat.apply_grid(v),
        jnp.asarray(b_g),
        jnp.asarray(mask_g),
        jnp.asarray(g_g),
    )
    diag = np.zeros(space.ndof)
    for c in range(space.dofmap_scalar.shape[1]):
        np.add.at(diag, space.dofmap_scalar[:, c], K[:, c, c])
    M = jacobi_preconditioner(
        constrained_diag(
            jnp.asarray(emb.embed_np(diag, 1.0).reshape(lat.shape)),
            jnp.asarray(mask_g),
        )
    )
    x_ref, _ = cg(A, jnp.asarray(rhs), M=M, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(x_g), np.asarray(x_ref), rtol=1e-9, atol=1e-12
    )


@pytest.mark.parametrize("n_dev", [1, 8])
def test_sharded_elasticity_step(n_dev):
    step, args = sharded_elasticity_step(12, _stripe_mesh(n_dev))
    x, iters, res = jax.jit(step)(*args)
    assert float(res) < 1e-6
    assert np.all(np.isfinite(np.asarray(x)))


# ---- dataset-sized solves through the dispatch halo route ---------------
#
# PDEBENCH_TPU_HALO=1 routes structured-lattice SPD systems through the
# stripe-partitioned halo path from inside solvers/dispatch.solve_linear —
# the production multi-chip entry. These run REAL benchmark_v2 cases at
# dataset size on the 8-virtual-device mesh and compare grids against the
# default single-device stencil path.


def _load_case(cid):
    import json

    for line in open("/root/reference/data/benchmark_v2.jsonl"):
        c = json.loads(line)
        if c["id"] == cid:
            return c
    raise KeyError(cid)


@pytest.mark.parametrize(
    "cid",
    [
        "poisson_p2",  # res 100 P2, 40.4k dofs
        "linear_elasticity_exponential_gradients",  # res 150 block, 45.6k
        "poisson_3d_smooth_trig",  # unit_cube res 32, 35.9k dofs (3-D leg)
    ],
)
def test_halo_route_dataset_case_matches_single_device(cid, monkeypatch):
    from pdebench_tpu.oracle import OracleSolver

    case = _load_case(cid)
    if case["oracle_config"]["domain"]["type"] == "unit_cube":
        # 3-D stencil operators are TPU-gated (oracle/scalar.py
        # maybe_lattice32); force them so the CPU-mesh CI covers the
        # same lattice route a TPU pod would take, on BOTH solves
        monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "1")
    r_ref = OracleSolver().solve(case["oracle_config"])
    monkeypatch.setenv("PDEBENCH_TPU_HALO", "1")
    r_halo = OracleSolver().solve(case["oracle_config"])
    pc = r_halo.solver_info.get("pc_used", "")
    assert "halo-sharded[8]" in pc, r_halo.solver_info
    a, b = r_halo.reference, r_ref.reference
    ma, mb = np.isnan(a), np.isnan(b)
    assert (ma == mb).all()
    both = ~ma
    denom = np.linalg.norm(b[both])
    rel = np.linalg.norm(a[both] - b[both]) / (denom if denom > 0 else 1.0)
    assert rel < 1e-7, (cid, rel)
    # the oracle's accuracy verdict must be unchanged by the route
    assert r_halo.baseline_error < 1e-2


def test_halo_rejects_too_many_devices():
    m = unit_square_mesh(3)
    space = FunctionSpace(m, 2)
    cb = cell_batch(m, 2)
    K = np.asarray(local_stiffness(cb))
    lat = lattice_operator_from_local(
        K, space.dofmap_scalar, space.ndof, space.dof_coords
    )
    with pytest.raises(ValueError, match="too small"):
        HaloStencilOperator.from_lattice_operator(lat, _stripe_mesh(8))


def test_halo_saddle_minres_matches_direct():
    """Third halo family (VERDICT r4 stretch #9): the stripe-sharded
    Taylor-Hood saddle MINRES must land on the direct solve of the
    same constrained [[A, G], [G^T, 0]] system to solver tolerance on
    the 8-virtual-device mesh."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla

    from pdebench_tpu.fem.assemble import (
        local_divergence,
        local_vector_laplacian,
    )
    from pdebench_tpu.parallel.halo import sharded_stokes_step

    n = 8
    mesh = _stripe_mesh(8)
    step, (b_g, mask_g, g_g) = sharded_stokes_step(n, mesh, rtol=1e-9)
    x_g, its, res = step(b_g, mask_g, g_g)
    assert int(its) > 0 and float(res) < 1e-6

    # independent reference: assemble the same saddle system in scipy
    fmesh = unit_square_mesh(n)
    V = FunctionSpace(fmesh, 2, ncomp=2)
    Q = FunctionSpace(fmesh, 1)
    cb1 = cell_batch(fmesh, 1, qdegree=4)
    cb2 = cell_batch(fmesh, 2, qdegree=4)
    A_loc = np.asarray(local_vector_laplacian(cb2, 1.0))
    G_loc = np.asarray(local_divergence(cb2, np.asarray(cb1.phi)))
    n_u, n_p = V.ndof, Q.ndof
    N = n_u + n_p
    dmU = np.asarray(V.dofmap)
    dmP = np.asarray(Q.dofmap_scalar)
    c, nlu, nlp = G_loc.shape
    rows_a = np.repeat(dmU, nlu, axis=1).reshape(-1)
    cols_a = np.tile(dmU, (1, nlu)).reshape(-1)
    A = sps.coo_matrix((A_loc.reshape(-1), (rows_a, cols_a)),
                       shape=(N, N)).tocsr()
    rows_g = np.repeat(dmU, nlp, axis=1).reshape(-1)
    cols_g = (n_u + np.tile(dmP, (1, nlu))).reshape(-1)
    G = sps.coo_matrix((G_loc.reshape(-1), (rows_g, cols_g)),
                       shape=(N, N)).tocsr()
    S = A + G + G.T

    # same rhs/constraints as the sharded builder
    from pdebench_tpu.fem import symbolic
    from pdebench_tpu.fem.assemble import local_vector_load, scatter_add

    fx = symbolic.lambdify_spatial("2*pi**2*sin(pi*x)*sin(pi*y)", 2)
    fy = symbolic.lambdify_spatial("x*(1-x) + y*(1-y)", 2)
    qp = np.asarray(cb2.qpts)
    f_q = np.stack([fx(qp), fy(qp)], axis=-1)
    b_u = np.asarray(
        scatter_add(
            local_vector_load(cb2, jnp.asarray(f_q)),
            jnp.asarray(V.dofmap), n_u,
        )
    )
    b = np.concatenate([b_u, np.zeros(n_p)])
    mask = np.zeros(N, dtype=bool)
    bs = V.boundary_scalar_dofs
    mask[(bs[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)] = True
    mask[n_u] = True
    # constrained direct solve (identity rows, zero values)
    Sd = S.tolil()
    for i in np.nonzero(mask)[0]:
        Sd.rows[i] = [i]
        Sd.data[i] = [1.0]
    rhs = np.where(mask, 0.0, b - S @ np.zeros(N))
    x_ref = spla.spsolve(Sd.tocsr(), rhs)

    # sharded answer back to dof order
    from pdebench_tpu.parallel.halo import HaloSaddleOperator  # noqa: F401

    # rebuild the operator for extract_np (cheap host work)
    from pdebench_tpu.solvers.saddle_stencil import build_saddle_stencil

    sst = build_saddle_stencil(V, Q, G_loc)
    WA = sst.wmapA.weights_np(A_loc)
    op = HaloSaddleOperator(sst, WA, mesh)
    x_dof = op.extract_np(np.asarray(x_g))
    scale = max(np.abs(x_ref).max(), 1e-300)
    assert np.abs(x_dof - x_ref).max() / scale < 1e-6
