"""Lowest-order Raviart-Thomas (RT0) x DG0 mixed spaces on triangles.

H(div)-conforming flux space for the mixed Darcy formulation
(reference: pdebench/oracle/darcy.py:46-61 builds RT_k x DG_l through
basix; no benchmark case exercises it, but the capability is part of
the oracle inventory). Array-native construction:

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
