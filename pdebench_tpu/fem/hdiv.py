"""Raviart-Thomas (RT0 x DG0 and RT1 x DG1) mixed spaces on triangles.

H(div)-conforming flux spaces for the mixed Darcy formulation
(reference: pdebench/oracle/darcy.py:46-61 builds RT_k x DG_l through
basix with configurable order; no benchmark case exercises it, but the
capability is part of the oracle inventory). RT0 uses the closed-form
edge basis below; RT1 (basix 'RT' degree 2) tabulates per-cell bases
numerically from the standard dof functionals (rt1_assemble).
Array-native RT0 construction:

  - flux dofs = global mesh edges, oriented low->high vertex index;
    the cell-local sign sigma is +1 when the local edge agrees with
    the global orientation
  - on triangle T with vertices p0 p1 p2, the basis for the edge
    opposite vertex i is  phi_i(x) = sigma_i |e_i| / (2|T|) (x - p_i),
    with div phi_i = sigma_i |e_i| / |T|
  - pressure dofs = cells (piecewise constants)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from . import refelem
from .mesh import Mesh


@dataclass
class RT0Space:
    mesh: Mesh
    edge_verts: np.ndarray  # (n_edges, 2) global vertex pairs, sorted
    cell_edges: np.ndarray  # (n_cells, 3) global edge ids
    signs: np.ndarray  # (n_cells, 3) +-1 orientation
    opposite: np.ndarray  # (n_cells, 3) the vertex opposite each edge
    edge_lengths: np.ndarray  # (n_edges,)
    boundary_edges: np.ndarray  # (nb,) edge ids on the boundary
    edge_midpoints: np.ndarray  # (n_edges, 2)
    edge_normals: np.ndarray  # (n_edges, 2) unit, oriented with the edge

    @property
    def n_edges(self) -> int:
        return self.edge_verts.shape[0]


def rt0_space(mesh: Mesh) -> RT0Space:
    if mesh.cell_type != "triangle":
        raise NotImplementedError("RT0 is implemented for triangles")
    cells = mesh.cells.astype(np.int64)
    # local edge i is OPPOSITE local vertex i: (i+1, i+2)
    loc = [(1, 2), (2, 0), (0, 1)]
    ev = np.stack([cells[:, list(p)] for p in loc], axis=1)  # (c, 3, 2)
    ev_sorted = np.sort(ev, axis=2)
    flat = ev_sorted.reshape(-1, 2)
    uniq, ids = np.unique(flat, axis=0, return_inverse=True)
    cell_edges = ids.reshape(-1, 3)
    signs = np.where(ev[:, :, 0] < ev[:, :, 1], 1.0, -1.0)
    opposite = np.tile(np.arange(3), (mesh.n_cells, 1))

    coords = mesh.coords
    edge_vec = coords[uniq[:, 1]] - coords[uniq[:, 0]]
    lengths = np.linalg.norm(edge_vec, axis=1)
    midpoints = 0.5 * (coords[uniq[:, 0]] + coords[uniq[:, 1]])
    # normal = edge tangent rotated -90 deg (consistent with orientation)
    normals = np.stack([edge_vec[:, 1], -edge_vec[:, 0]], axis=1)
    normals /= np.maximum(lengths, 1e-300)[:, None]

    counts = np.bincount(cell_edges.reshape(-1), minlength=len(uniq))
    boundary = np.nonzero(counts == 1)[0]

    return RT0Space(
        mesh=mesh,
        edge_verts=uniq,
        cell_edges=cell_edges,
        signs=signs,
        opposite=opposite,
        edge_lengths=lengths,
        boundary_edges=boundary,
        edge_midpoints=midpoints,
        edge_normals=normals,
    )


def _edge_gauss(space: RT0Space, npts: int = 2):
    """Gauss points along every GLOBAL edge (low->high vertex order).

    Returns (pts (ne, g, 2), s (g,) in [0,1], w (ne, g)) with
    sum_g w = |e|. Using the global orientation for the linear edge
    moment makes adjacent cells share identical dof functionals, so
    H(div) conformity needs no per-cell sign bookkeeping.
    """
    x, w = np.polynomial.legendre.leggauss(npts)
    s = 0.5 * (x + 1.0)  # [0, 1]
    a = space.mesh.coords[space.edge_verts[:, 0]]  # (ne, 2)
    b = space.mesh.coords[space.edge_verts[:, 1]]
    pts = a[:, None, :] + s[None, :, None] * (b - a)[:, None, :]
    wts = 0.5 * w[None, :] * space.edge_lengths[:, None]
    return pts, s, wts


def rt1_assemble(space: RT0Space, kappa_inv_fn, qdeg: int = 5):
    """RT1 x DG1 local system (basix 'RT' degree 2 — the next order
    after RT0; reference: pdebench/oracle/darcy.py:46-61 builds RT_k x
    DG_l through basix for configurable k).

    Per-cell numerically-tabulated basis: the 8-dim RT1 space
    span{(1,0),(X,0),(Y,0),(0,1),(0,X),(0,Y), X(X,Y), Y(X,Y)} in
    cell-local scaled coordinates X=(x-xc)/h, with the standard dofs —
    two normal moments per edge (constant + linear Legendre along the
    GLOBAL edge orientation) and two interior moments against (P0)^2.
    Inverting the 8x8 generalized Vandermonde per cell (batched host
    numpy) yields physical basis functions directly; no Piola map or
    reference-orientation cases needed, and conformity is automatic
    because adjacent cells share the global edge functionals.

    Returns (M_loc (c,8,8), B_loc (c,3,8), fdofs (c,8) global flux dof
    ids, aux) where aux carries what BC construction and sampling need.
    """
    mesh = space.mesh
    cells = mesh.cells.astype(np.int64)
    v = mesh.coords[cells]  # (c, 3, 2)
    nc = mesh.n_cells
    ne = space.n_edges
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    detJ = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * np.abs(detJ)
    xc = v.mean(axis=1)  # (c, 2)
    h = np.sqrt(area)  # local length scale (conditioning)

    def mono(Xl):
        """(…, 2) local coords -> values (…, 8, 2) of the 8 monomials."""
        x, y = Xl[..., 0], Xl[..., 1]
        o = np.zeros_like(x)
        e = np.ones_like(x)
        mx = np.stack([e, x, y, o, o, o, x * x, x * y], axis=-1)
        my = np.stack([o, o, o, e, x, y, x * y, y * y], axis=-1)
        return np.stack([mx, my], axis=-1)

    def mono_div(Xl, h_):
        """Physical divergence of the monomials (d/dx = (1/h) d/dX)."""
        x, y = Xl[..., 0], Xl[..., 1]
        o = np.zeros_like(x)
        e = np.ones_like(x)
        return np.stack(
            [o, e, o, o, o, e, 3.0 * x, 3.0 * y], axis=-1
        ) / h_[..., None]

    # --- generalized Vandermonde -----------------------------------------
    epts, s_param, ew = _edge_gauss(space, 2)  # exact to edge-degree 3
    qlin = 2.0 * s_param - 1.0  # Legendre P1 along the global edge
    ce = space.cell_edges  # (c, 3)
    # edge quadrature data gathered per cell edge: (c, 3, g, 2)
    ep_c = epts[ce]
    ew_c = ew[ce]
    n_c = space.edge_normals[ce]  # (c, 3, 2) global normals
    Xl_e = (ep_c - xc[:, None, None, :]) / h[:, None, None, None]
    m_e = mono(Xl_e)  # (c, 3, g, 8, 2)
    mn = np.einsum("cegjd,ced->cegj", m_e, n_c)  # (c, 3, g, 8)
    mom0 = np.einsum("cegj,ceg->cej", mn, ew_c)  # (c, 3, 8)
    mom1 = np.einsum("cegj,ceg,g->cej", mn, ew_c, qlin)
    # interior moments: reference-triangle quadrature mapped to the cell
    rpts, rwts = refelem.quadrature("triangle", max(qdeg, 2))
    xq = (
        v[:, 0][:, None, :]
        + rpts[None, :, 0:1] * e1[:, None, :]
        + rpts[None, :, 1:2] * e2[:, None, :]
    )  # (c, q, 2)
    wq = rwts[None, :] * np.abs(detJ)[:, None]  # sums to area per cell
    Xl_q = (xq - xc[:, None, :]) / h[:, None, None]
    m_q = mono(Xl_q)  # (c, q, 8, 2)
    int_mom = np.einsum("cqjd,cq->cdj", m_q, wq)  # (c, 2, 8)

    V = np.empty((nc, 8, 8))
    V[:, 0:6:2, :] = mom0  # edge constant moments (rows 0, 2, 4)
    V[:, 1:6:2, :] = mom1  # edge linear moments (rows 1, 3, 5)
    V[:, 6:8, :] = int_mom
    C = np.linalg.inv(V)  # (c, 8, 8): phi_i = sum_j C[c, j, i] m_j

    # --- local matrices ---------------------------------------------------
    kinv_q = np.asarray(kappa_inv_fn(xq))  # (c, q)
    phi = np.einsum("cqjd,cji->cqid", m_q, C)  # (c, q, 8, 2)
    M_loc = np.einsum("cqid,cqjd,cq->cij", phi, phi, wq * kinv_q)
    dphi = np.einsum("cqj,cji->cqi", mono_div(Xl_q, h[:, None]), C)
    psi = np.stack(
        [np.ones_like(Xl_q[..., 0]), Xl_q[..., 0], Xl_q[..., 1]], axis=-1
    )  # (c, q, 3) DG1 basis in local coords
    B_loc = np.einsum("cqi,cql,cq->cli", dphi, psi, wq)  # (c, 3, 8)

    fdofs = np.empty((nc, 8), dtype=np.int64)
    fdofs[:, 0:6:2] = 2 * ce
    fdofs[:, 1:6:2] = 2 * ce + 1
    fdofs[:, 6] = 2 * ne + 2 * np.arange(nc)
    fdofs[:, 7] = 2 * ne + 2 * np.arange(nc) + 1
    aux = {
        "xq": xq, "wq": wq, "xc": xc, "h": h, "area": area,
        "qlin": qlin, "psi_dim": 3,
    }
    return M_loc, B_loc, fdofs, aux


def rt1_boundary_flux(space: RT0Space, u_fns):
    """Essential RT1 flux BC values on boundary edges from exact u.

    Returns (dofs, values): both edge moments ∫ u·n ds and
    ∫ u·n q ds per boundary edge (4-pt Gauss).
    """
    epts, s_param, ew = _edge_gauss(space, 4)
    qlin = 2.0 * s_param - 1.0
    be = space.boundary_edges
    un = (
        np.stack([f(epts[be].reshape(-1, 2)) for f in u_fns], axis=1)
        .reshape(len(be), -1, 2)
    )
    un = np.einsum("egd,ed->eg", un, space.edge_normals[be])
    g0 = np.einsum("eg,eg->e", un, ew[be])
    g1 = np.einsum("eg,eg,g->e", un, ew[be], qlin)
    dofs = np.concatenate([2 * be, 2 * be + 1])
    vals = np.concatenate([g0, g1])
    return dofs, vals


def rt0_local_matrices(space: RT0Space, kappa_inv_c: np.ndarray):
    """(M_loc (c,3,3), B_loc (c,3)) for the mixed Darcy system.

    M_loc = int_T kappa^-1 phi_i . phi_j  (3-point edge-midpoint rule,
    exact for the quadratic integrand when kappa is cellwise constant);
    B_loc[i] = int_T div phi_i = sigma_i |e_i|.
    """
    mesh = space.mesh
    cells = mesh.cells.astype(np.int64)
    v = mesh.coords[cells]  # (c, 3, 2)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    lens = space.edge_lengths[space.cell_edges]  # (c, 3)

    # midpoints of the three edges (the quadrature points; weights |T|/3)
    mids = np.stack(
        [0.5 * (v[:, 1] + v[:, 2]), 0.5 * (v[:, 2] + v[:, 0]),
         0.5 * (v[:, 0] + v[:, 1])],
        axis=1,
    )  # (c, 3q, 2)
    # phi_i at quadrature point q: sigma_i |e_i|/(2|T|) (x_q - p_i)
    diff = mids[:, :, None, :] - v[:, None, :, :]  # (c, q, i, 2)
    coef = (space.signs * lens)[:, None, :, None] / (2.0 * area)[:, None, None, None]
    phi = coef * diff  # (c, q, i, 2)
    w = (area / 3.0)[:, None]  # (c, q)
    Mloc = np.einsum("cqid,cqjd,cq->cij", phi, phi, w * kappa_inv_c[:, None])
    Bloc = space.signs * lens  # (c, 3) = sigma |e|
    return Mloc, Bloc, area
