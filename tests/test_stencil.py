"""Stencil (lattice) operator tests — platform-independent correctness."""

import numpy as np
import jax.numpy as jnp

from pdebench_tpu.fem.assemble import LocalOperator, cell_batch, local_mass, local_stiffness
from pdebench_tpu.fem.mesh import unit_cube_mesh, unit_square_mesh
from pdebench_tpu.fem.spaces import FunctionSpace
from pdebench_tpu.solvers.stencil import (
    detect_lattice,
    lattice_operator_from_local,
)


def _check_operator(mesh, degree):
    space = FunctionSpace(mesh, degree)
    cb = cell_batch(mesh, degree)
    A = local_stiffness(cb) + 0.3 * local_mass(cb)
    op = LocalOperator(A, space.dofmap_scalar, space.ndof)
    lat = lattice_operator_from_local(
        np.asarray(A), space.dofmap_scalar, space.ndof, space.dof_coords
    )
    assert lat is not None
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.ndof))
    np.testing.assert_allclose(
        np.asarray(lat(u)), np.asarray(op(u)), rtol=1e-12, atol=1e-12
    )
    return lat


def test_stencil_p1_square():
    lat = _check_operator(unit_square_mesh(12), 1)
    assert lat.shape == (13, 13)
    assert len(lat.offsets) <= 9  # P1 on split triangles: 7-point stencil


def test_stencil_p2_square():
    lat = _check_operator(unit_square_mesh(8), 2)
    assert lat.shape == (17, 17)
    assert len(lat.offsets) <= 25


def test_stencil_p1_cube():
    lat = _check_operator(unit_cube_mesh(4), 1)
    assert lat.shape == (5, 5, 5)


def test_detect_lattice_rejects_unstructured():
    from pdebench_tpu.fem import geometry

    mesh = geometry.mesh_domain(
        "circle",
        {"type": "circle", "geometry_params": {"center": [0.5, 0.5], "radius": 0.5}},
        1.0 / 12,
    )
    space = FunctionSpace(mesh, 1)
    assert detect_lattice(space.dof_coords) is None


def test_lattice_weight_map_matches_operator():
    """In-jit scattered per-step weights must reproduce the host-built
    stencil operator (time-varying operators inside scans)."""
    import jax

    from pdebench_tpu.fem.assemble import local_advection
    from pdebench_tpu.solvers.stencil import lattice_weight_map

    mesh = unit_square_mesh(12)
    space = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 1)
    # nonsymmetric time-varying-style operator: mass + stiffness + advection
    beta_q = jnp.stack(
        [0.7 * jnp.ones_like(cb.wdetJ), -0.3 * jnp.ones_like(cb.wdetJ)],
        axis=-1,
    )
    A = local_mass(cb) + 0.1 * local_stiffness(cb) + local_advection(cb, beta_q)
    op = LocalOperator(A, space.dofmap_scalar, space.ndof)
    lat = detect_lattice(space.dof_coords)
    wmap = lattice_weight_map(lat, space.dofmap_scalar)
    assert wmap is not None

    W = jax.jit(wmap.weights)(jnp.asarray(A))
    rng = np.random.default_rng(1)
    u = rng.standard_normal(space.ndof)
    u_lat = lat.embed_np(u, 0.0).reshape(wmap.shape)
    y_lat = np.asarray(wmap.apply_grid(W, jnp.asarray(u_lat))).reshape(-1)
    y = y_lat[np.asarray(lat.inv)]
    np.testing.assert_allclose(y, np.asarray(op(jnp.asarray(u))), rtol=1e-12, atol=1e-12)


def test_bilinear_weight_map_matches_scatter():
    """Scatter-free bilinear per-step weights (lagged Burgers
    convection) must reproduce the scattered LatticeWeightMap build for
    an arbitrary nodal coefficient field, boundary cells included."""
    from pdebench_tpu.fem.assemble import local_advection
    from pdebench_tpu.solvers.stencil import (
        BilinearLatticeWeightMap,
        lattice_weight_map,
    )

    from pdebench_tpu.oracle import base as obase

    meshes = [
        (1, unit_square_mesh(12)),
        (2, unit_square_mesh(7)),
        # masked lattice (rectilinear l_shape): absent sites must stay
        # zero-filled in the tap shifts
        (1, obase.build_mesh({"type": "l_shape"}, {"resolution": 12})),
    ]
    for deg, mesh in meshes:
        space = FunctionSpace(mesh, deg)
        cb = cell_batch(mesh, deg)
        lat = detect_lattice(space.dof_coords)
        wmap = lattice_weight_map(lat, space.dofmap_scalar)
        assert wmap is not None

        rng = np.random.default_rng(deg)
        u = rng.standard_normal(space.ndof)
        # scattered reference: beta = u_n * (1, 1) at quadrature points
        un_q = jnp.einsum(
            "qi,ci->cq", cb.phi, jnp.asarray(u)[space.dofmap_scalar]
        )
        beta_q = jnp.repeat(un_q[..., None], 2, axis=-1)
        W_ref = np.asarray(
            wmap.weights(local_advection(cb, beta_q).astype(jnp.float32))
        )

        gph = np.asarray(cb.grad_phys())
        T_adv = np.einsum(
            "cq,qi,qk,cqj->cijk",
            np.asarray(cb.wdetJ),
            np.asarray(cb.phi),
            np.asarray(cb.phi),
            gph.sum(-1),
            optimize=True,
        )
        bwm = BilinearLatticeWeightMap(
            wmap, lat, space.dofmap_scalar, T_adv
        )
        u_lat = jnp.asarray(
            lat.embed_np(u.astype(np.float32), 0.0).reshape(wmap.shape)
        )
        W_blt = np.asarray(bwm.weights_w(bwm.P, u_lat))
        scale = np.abs(W_ref).max()
        np.testing.assert_allclose(W_blt, W_ref, atol=2e-6 * scale)

        # compressed P round trip: full lattices compress to a periodic
        # tile + boundary bands (masked l_shape must fall back dense);
        # P_dense(P_parts) must rebuild the stack to the compression
        # tolerance and produce the same step weights
        if not lat.masked:
            assert bwm._compressed is not None, "expected compression"
        P_rt = np.asarray(bwm.P_dense(bwm.P_parts))
        P_host = bwm.dense_np()
        pscale = np.abs(P_host).max()
        np.testing.assert_allclose(P_rt, P_host, atol=2e-6 * pscale)
        W_cmp = np.asarray(bwm.weights_w(jnp.asarray(P_rt), u_lat))
        np.testing.assert_allclose(W_cmp, W_ref, atol=4e-6 * scale)

        # tiled per-step build (no dense-P reads): must match the
        # dense-stack build bit-for-bit — same products, same order
        W_tiled = np.asarray(bwm.weights_w_parts(bwm.P_parts, u_lat))
        np.testing.assert_array_equal(W_tiled, W_cmp)


def test_bilinear_tile_direct_build_matches_dense(monkeypatch):
    """The tile-direct P build (default, PDEBENCH_TPU_PBUILD=tile) must
    reproduce the dense discovery build within the compression
    equivalence class on lattices large enough for it to engage."""
    from pdebench_tpu.fem.assemble import local_advection
    from pdebench_tpu.solvers.stencil import (
        BilinearLatticeWeightMap,
        lattice_weight_map,
    )

    for deg, res in ((1, 40), (2, 20)):
        mesh = unit_square_mesh(res)
        space = FunctionSpace(mesh, deg)
        cb = cell_batch(mesh, deg)
        lat = detect_lattice(space.dof_coords)
        wmap = lattice_weight_map(lat, space.dofmap_scalar)
        gph = np.asarray(cb.grad_phys())
        T_adv = np.einsum(
            "cq,qi,qk,cqj->cijk",
            np.asarray(cb.wdetJ),
            np.asarray(cb.phi),
            np.asarray(cb.phi),
            gph.sum(-1),
            optimize=True,
        )
        monkeypatch.setenv("PDEBENCH_TPU_PBUILD", "tile")
        bwm_t = BilinearLatticeWeightMap(
            wmap, lat, space.dofmap_scalar, T_adv
        )
        assert bwm_t.P_np is None, (
            f"tile-direct build did not engage (deg={deg}, res={res})"
        )
        monkeypatch.setenv("PDEBENCH_TPU_PBUILD", "dense")
        bwm_d = BilinearLatticeWeightMap(
            wmap, lat, space.dofmap_scalar, T_adv
        )
        assert bwm_t.pairs == bwm_d.pairs
        Pd, Pt = bwm_d.dense_np(), bwm_t.dense_np()
        pscale = np.abs(Pd).max()
        # interior is the periodic-tile reconstruction on both sides
        # (same equivalence class); bands are exact
        np.testing.assert_allclose(Pt, Pd, atol=5e-6 * pscale)
        rng = np.random.default_rng(deg)
        u = rng.standard_normal(space.ndof)
        u_lat = jnp.asarray(
            lat.embed_np(u.astype(np.float32), 0.0).reshape(wmap.shape)
        )
        Wt = np.asarray(bwm_t.weights_w(bwm_t.P, u_lat))
        Wd = np.asarray(bwm_d.weights_w(bwm_d.P, u_lat))
        scale = max(np.abs(Wd).max(), 1e-30)
        np.testing.assert_allclose(Wt, Wd, atol=5e-6 * scale)


def test_burgers_step_weights_match_cell_path(monkeypatch):
    """Per-step stencil weights (lagged convection) must reproduce the
    cell-based scan end-to-end."""
    from pdebench_tpu.oracle import OracleSolver

    cfg = {
        "pde": {
            "type": "burgers",
            "pde_params": {"nu": 0.05},
            "manufactured_solution": {
                "u": "exp(-t)*sin(pi*x)*sin(pi*y)"
            },
            "time": {"t0": 0.0, "t_end": 0.05, "dt": 0.01},
        },
        "domain": {"type": "unit_square"},
        # resolution high enough that GMG attaches (ndof >= 5000) and
        # the per-step stencil path actually engages
        "mesh": {"resolution": 72},
        "fem": {"degree": 1},
        "bc": {"dirichlet": {"on": "all", "value": "0"}},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 30, "ny": 30}},
    }
    monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "1")
    # with the exact cell-based f64 outer, the stencil path must match
    # the cell scan to refinement accuracy
    monkeypatch.setenv("PDEBENCH_TPU_STEP_OUTER", "cell")
    r1 = OracleSolver().solve(cfg)
    # the default stencil-cast f64 outer applies the f32 step weights
    # cast to f64: a ~1e-7 relative operator perturbation, so only
    # ~1e-6 absolute agreement is expected (far below the time-
    # discretization error it rides under)
    monkeypatch.setenv("PDEBENCH_TPU_STEP_OUTER", "stencil")
    r1c = OracleSolver().solve(cfg)
    monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "0")
    r2 = OracleSolver().solve(cfg)
    np.testing.assert_allclose(r1.reference, r2.reference, atol=2e-8)
    assert abs(r1.baseline_error - r2.baseline_error) < 1e-7
    np.testing.assert_allclose(r1c.reference, r2.reference, atol=1e-5)
    assert abs(r1c.baseline_error - r2.baseline_error) < 1e-4


def test_rd_bilinear_jacobian_matches_scatter_path(monkeypatch):
    """The interpolated-R'(u) bilinear Jacobian (inexact Newton) must
    reproduce the quadrature-exact scattered-Jacobian solve: the Newton
    loop enforces the same exact-residual tolerance either way."""
    from pdebench_tpu.oracle import OracleSolver

    cfg = {
        "pde": {
            "type": "reaction_diffusion",
            "pde_params": {
                "epsilon": 0.1,
                "reaction": {"type": "cubic", "alpha": 1.0, "beta": 1.0},
            },
            "manufactured_solution": {"u": "exp(-t)*sin(pi*x)*sin(pi*y)"},
            "time": {"t0": 0.0, "t_end": 0.05, "dt": 0.01},
        },
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 72},
        "fem": {"degree": 1},
        "bc": {"dirichlet": {"on": "all", "value": "0"}},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 30, "ny": 30}},
        "oracle_solver": {"rtol": 1e-9, "atol": 1e-12, "max_it": 30},
    }
    monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "1")
    monkeypatch.setenv("PDEBENCH_TPU_RD_CONV", "1")
    r1 = OracleSolver().solve(cfg)
    monkeypatch.setenv("PDEBENCH_TPU_RD_CONV", "0")
    r2 = OracleSolver().solve(cfg)
    np.testing.assert_allclose(r1.reference, r2.reference, atol=1e-6)
    assert abs(r1.baseline_error - r2.baseline_error) < 1e-5


def test_stencil_ir_solve_matches_f64(monkeypatch):
    """End-to-end: forced stencil path must reproduce the standard solve."""
    import os

    monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "1")
    from pdebench_tpu.oracle import OracleSolver

    cfg = {
        "pde": {
            "type": "poisson",
            "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"},
        },
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 48},
        "fem": {"degree": 2},
        "bc": {"dirichlet": {"on": "all", "value": "0"}},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 40, "ny": 40}},
        "oracle_solver": {"ksp_type": "cg", "pc_type": "hypre", "rtol": 1e-10},
    }
    r1 = OracleSolver().solve(cfg)
    assert "stencil" in r1.solver_info.get("pc_used", ""), r1.solver_info
    monkeypatch.setenv("PDEBENCH_TPU_FORCE_STENCIL", "0")
    r2 = OracleSolver().solve(cfg)
    np.testing.assert_allclose(r1.reference, r2.reference, atol=1e-7)
    assert abs(r1.baseline_error - r2.baseline_error) < 1e-7
