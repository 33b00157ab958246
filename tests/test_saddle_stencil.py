"""SaddleStencil: gather-free Taylor-Hood saddle apply vs the
cell-based reference apply (mixed.saddle_apply), plus the per-step
block weight map used by the Navier-Stokes device Newton path."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdebench_tpu.fem import refelem
from pdebench_tpu.fem.assemble import (
    cell_batch,
    local_divergence,
    local_vector_laplacian,
)
from pdebench_tpu.fem.mesh import unit_square_mesh
from pdebench_tpu.fem.spaces import FunctionSpace
from pdebench_tpu.oracle import mixed
from pdebench_tpu.solvers.saddle_stencil import build_saddle_stencil
from pdebench_tpu.solvers.stencil import block_lattice_weight_map, detect_lattice


def _taylor_hood(n=10):
    mesh = unit_square_mesh(n)
    V = FunctionSpace(mesh, 2, ncomp=2)
    Q = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 2)
    tables = refelem.element_tables(mesh.cell_type, 2, 6)
    psi, _ = refelem.tabulate(mesh.cell_type, 1, tables.qpoints)
    return mesh, V, Q, cb, jnp.asarray(psi)


def test_saddle_stencil_matches_cell_apply():
    _, V, Q, cb, psi = _taylor_hood(10)
    A_loc = local_vector_laplacian(cb, 0.7)
    G_loc = local_divergence(cb, psi)
    sst = build_saddle_stencil(V, Q, np.asarray(G_loc))
    assert sst is not None and sst.r == 2

    ref_apply = mixed.saddle_apply(
        A_loc, G_loc, jnp.asarray(V.dofmap), jnp.asarray(Q.dofmap_scalar),
        V.ndof, Q.ndof,
    )
    WA = jnp.asarray(sst.wmapA.weights_np(np.asarray(A_loc)))
    st_apply = sst.saddle_apply_w(WA)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(V.ndof + Q.ndof))
    y_ref = np.asarray(ref_apply(x))
    y_st = np.asarray(st_apply(x))
    assert np.linalg.norm(y_ref - y_st) <= 1e-13 * np.linalg.norm(y_ref)

    # f32 twin follows the weights' dtype
    y32 = np.asarray(sst.saddle_apply_w(WA.astype(jnp.float32))(
        x.astype(jnp.float32)
    ))
    assert np.linalg.norm(y_ref - y32) <= 1e-5 * np.linalg.norm(y_ref)


def test_block_weight_map_traced_weights_match_host():
    """In-jit scattered weights (NS per-Newton-step path) equal the
    host bincount build."""
    import jax

    _, V, Q, cb, psi = _taylor_hood(6)
    A_loc = local_vector_laplacian(cb, 1.3)
    lat = detect_lattice(V.dof_coords)
    wm = block_lattice_weight_map(lat, V.dofmap_scalar, V.ncomp)
    assert wm is not None
    W_host = wm.weights_np(np.asarray(A_loc))
    W_jit = np.asarray(jax.jit(wm.weights)(A_loc))
    np.testing.assert_allclose(W_jit, W_host, rtol=0, atol=1e-13)


def test_saddle_stencil_rejects_unstructured():
    from pdebench_tpu.oracle.base import build_mesh

    mesh = build_mesh({"type": "circle"}, {"resolution": 8})
    V = FunctionSpace(mesh, 2, ncomp=2)
    Q = FunctionSpace(mesh, 1)
    cb = cell_batch(mesh, 2)
    tables = refelem.element_tables(mesh.cell_type, 2, 6)
    psi, _ = refelem.tabulate(mesh.cell_type, 1, tables.qpoints)
    G_loc = local_divergence(cb, jnp.asarray(psi))
    assert build_saddle_stencil(V, Q, np.asarray(G_loc)) is None


@pytest.mark.parametrize("case_nu", [1.0])
def test_stokes_minres_stencil_route_end_to_end(case_nu):
    """stokes_basic-shaped config solves through the stencil MINRES
    route with a healthy MMS error."""
    from pdebench_tpu.oracle.stokes import StokesSolver

    config = {
        "domain": {"type": "unit_square"},
        "mesh": {"resolution": 24},
        "fem": {"degree_u": 2, "degree_p": 1},
        "pde": {
            "pde_params": {"nu": case_nu},
            "manufactured_solution": {
                "u": ["sin(pi*x)*cos(pi*y)", "-cos(pi*x)*sin(pi*y)"],
                "p": "sin(pi*x)*sin(pi*y)",
            },
        },
        "bc": {"dirichlet": {"boundary": "all", "value": [0.0, 0.0]}},
        "solver": {"ksp_type": "minres", "rtol": 1e-10},
        "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 32, "ny": 32}},
    }
    r = StokesSolver().solve(config, _compute_baseline=True)
    assert r.solver_info.get("method") == "minres"
    assert r.baseline_error < 5e-3
    assert np.isfinite(np.asarray(r.reference)).all()
