// Unstructured simplex (2-D triangle) support for the native backend:
// binary mesh import, topological Lagrange dof numbering, binned point
// location with NaN masking for out-of-domain sample points.
//
// Role parity: the reference feeds deal.II complex domains through Gmsh
// files generated host-side (dealii_oracle/common.py:616-858, read by
// mesh_factory.h:48-67 with per-point out-of-domain NaN catch in
// grid_writer.h:170-181). Here the triangulation arrives as a flat
// binary written by the Python bridge; everything downstream — dof
// numbering, assembly, Krylov solve, grid sampling — is an independent
// C++ implementation.
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <utility>
#include <vector>

#include "pdebench_fem.hpp"
#include "pdebench_lagrange.hpp"

namespace pdebench {
namespace fem {

// binary layout: int32 magic 0x70646d31 ('pdm1'), dim, n_nodes, n_cells;
// then coords as f64 (n_nodes * dim), cells as int32 (n_cells * (dim+1)).
inline Mesh read_mesh_file(const std::string& path) {
  std::FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "mesh file open failed: %s\n", path.c_str());
    std::exit(5);
  }
  int32_t hdr[4];
  if (std::fread(hdr, sizeof(int32_t), 4, f) != 4 || hdr[0] != 0x70646d31) {
    std::fprintf(stderr, "bad mesh file header: %s\n", path.c_str());
    std::exit(5);
  }
  Mesh m;
  m.dim = hdr[1];
  m.nodes_per_cell = m.dim + 1;
  m.structured = false;
  int n_nodes = hdr[2], n_cells = hdr[3];
  std::vector<double> xy((size_t)n_nodes * m.dim);
  std::vector<int32_t> cl((size_t)n_cells * m.nodes_per_cell);
  if (std::fread(xy.data(), sizeof(double), xy.size(), f) != xy.size() ||
      std::fread(cl.data(), sizeof(int32_t), cl.size(), f) != cl.size()) {
    std::fprintf(stderr, "truncated mesh file: %s\n", path.c_str());
    std::exit(5);
  }
  std::fclose(f);
  m.coords.resize(n_nodes);
  for (int i = 0; i < n_nodes; ++i) {
    m.coords[i] = {xy[(size_t)i * m.dim], xy[(size_t)i * m.dim + 1],
                   m.dim == 3 ? xy[(size_t)i * m.dim + 2] : 0.0};
  }
  m.cells.resize(n_cells);
  for (int c = 0; c < n_cells; ++c) {
    for (int a = 0; a < m.nodes_per_cell; ++a)
      m.cells[c][a] = cl[(size_t)c * m.nodes_per_cell + a];
    if (m.nodes_per_cell < 4) m.cells[c][3] = -1;
  }
  return m;
}

// uniform cell bins over the mesh bbox for point location
inline void build_bins(Mesh& m) {
  double x0 = 1e300, x1 = -1e300, y0 = 1e300, y1 = -1e300, hmax = 0;
  for (const auto& p : m.coords) {
    x0 = std::min(x0, p[0]);
    x1 = std::max(x1, p[0]);
    y0 = std::min(y0, p[1]);
    y1 = std::max(y1, p[1]);
  }
  for (size_t c = 0; c < m.cells.size(); ++c) {
    for (int a = 0; a < 3; ++a)
      for (int b = a + 1; b < 3; ++b) {
        double dx = m.coords[m.cells[c][a]][0] - m.coords[m.cells[c][b]][0];
        double dy = m.coords[m.cells[c][a]][1] - m.coords[m.cells[c][b]][1];
        hmax = std::max(hmax, std::sqrt(dx * dx + dy * dy));
      }
  }
  m.bb[0] = x0;
  m.bb[1] = x1;
  m.bb[2] = y0;
  m.bb[3] = y1;
  double ext = std::max(x1 - x0, y1 - y0);
  double hb = std::max(hmax, ext * 1e-6);
  m.nbx = std::max(1, (int)((x1 - x0) / hb));
  m.nby = std::max(1, (int)((y1 - y0) / hb));
  m.bins.assign((size_t)m.nbx * m.nby, {});
  auto bin_of = [&](double x, double y) {
    int bx = std::min(m.nbx - 1,
                      std::max(0, (int)((x - x0) / (x1 - x0) * m.nbx)));
    int by = std::min(m.nby - 1,
                      std::max(0, (int)((y - y0) / (y1 - y0) * m.nby)));
    return by * m.nbx + bx;
  };
  for (size_t c = 0; c < m.cells.size(); ++c) {
    double cx0 = 1e300, cx1 = -1e300, cy0 = 1e300, cy1 = -1e300;
    for (int a = 0; a < 3; ++a) {
      const auto& p = m.coords[m.cells[c][a]];
      cx0 = std::min(cx0, p[0]);
      cx1 = std::max(cx1, p[0]);
      cy0 = std::min(cy0, p[1]);
      cy1 = std::max(cy1, p[1]);
    }
    int b00 = bin_of(cx0, cy0), b11 = bin_of(cx1, cy1);
    int bx0 = b00 % m.nbx, by0 = b00 / m.nbx;
    int bx1 = b11 % m.nbx, by1 = b11 / m.nbx;
    for (int by = by0; by <= by1; ++by)
      for (int bx = bx0; bx <= bx1; ++bx)
        m.bins[(size_t)by * m.nbx + bx].push_back((int)c);
  }
}

// containing cell via bins + barycentric test; -1 when outside the
// domain (the NaN mask of complex-geometry sample grids)
inline int locate_cell_unstructured(const Mesh& m, double x, double y,
                                    double tol) {
  if (m.bins.empty()) return -1;
  if (x < m.bb[0] - tol || x > m.bb[1] + tol || y < m.bb[2] - tol ||
      y > m.bb[3] + tol)
    return -1;
  int bx = std::min(
      m.nbx - 1,
      std::max(0, (int)((x - m.bb[0]) / (m.bb[1] - m.bb[0]) * m.nbx)));
  int by = std::min(
      m.nby - 1,
      std::max(0, (int)((y - m.bb[2]) / (m.bb[3] - m.bb[2]) * m.nby)));
  int best = -1;
  double best_def = 1e300;
  for (int dby = -1; dby <= 1; ++dby)
    for (int dbx = -1; dbx <= 1; ++dbx) {
      int cx = bx + dbx, cy = by + dby;
      if (cx < 0 || cx >= m.nbx || cy < 0 || cy >= m.nby) continue;
      for (int c : m.bins[(size_t)cy * m.nbx + cx]) {
        double jinv[3][3];
        cell_jinv(m, c, jinv);
        const auto& p0 = m.coords[m.cells[c][0]];
        double dx = x - p0[0], dy = y - p0[1];
        double xi = jinv[0][0] * dx + jinv[0][1] * dy;
        double eta = jinv[1][0] * dx + jinv[1][1] * dy;
        double def = std::max({-xi, -eta, xi + eta - 1.0});
        if (def <= tol) return c;
        if (def < best_def) {
          best_def = def;
          best = c;
        }
      }
    }
  // boundary-of-domain grid points can fall just outside the polygonal
  // mesh boundary of a curved domain; accept tiny deficits (matches the
  // reference's try/catch point_value leniency, grid_writer.h:174-181)
  if (best >= 0 && best_def <= 1e-6) return best;
  return -1;
}

// ---------------------------------------------------------------------------
// topological Lagrange dof numbering on unstructured triangle meshes:
// vertex dofs by vertex id, edge dofs by (sorted-pair) edge id with
// orientation-consistent positions, interior dofs per cell.
// ---------------------------------------------------------------------------

inline Space build_space_unstructured(const Mesh& m, const Element& el) {
  if (m.dim != 2) {
    std::fprintf(stderr, "unstructured spaces: 2-D only\n");
    std::exit(5);
  }
  const int d = el.degree;
  // classify local element nodes by their barycentric lattice position
  // node_lattice[a] = (i, j) with l0 = d - i - j
  struct LType {
    int kind;  // 0 vertex, 1 edge, 2 interior
    int which; // vertex: local vert; edge: 0=(0,1),1=(0,2),2=(1,2)
    int step;  // edge: 1..d-1 from first local vert; interior: index
  };
  std::vector<LType> cls(el.ndofs);
  int n_int = 0;
  for (int a = 0; a < el.ndofs; ++a) {
    int i = (int)std::llround(el.node_lattice[a][0]);
    int j = (int)std::llround(el.node_lattice[a][1]);
    int l0 = d - i - j;
    if (l0 == d) cls[a] = {0, 0, 0};
    else if (i == d) cls[a] = {0, 1, 0};
    else if (j == d) cls[a] = {0, 2, 0};
    else if (j == 0) cls[a] = {1, 0, i};        // edge v0-v1
    else if (i == 0) cls[a] = {1, 1, j};        // edge v0-v2
    else if (l0 == 0) cls[a] = {1, 2, j};       // edge v1-v2 (step from v1)
    else cls[a] = {2, 0, n_int++};
  }
  const int ev[3][2] = {{0, 1}, {0, 2}, {1, 2}};

  // edge ids + incidence counts (boundary = used once)
  int nv = (int)m.coords.size();
  std::unordered_map<int64_t, int> edge_ids;
  std::vector<int> edge_count;
  edge_ids.reserve(m.cells.size() * 2);
  auto edge_key = [&](int a, int b) {
    int lo = std::min(a, b), hi = std::max(a, b);
    return (int64_t)lo * nv + hi;
  };
  for (size_t c = 0; c < m.cells.size(); ++c)
    for (int e = 0; e < 3; ++e) {
      int64_t k =
          edge_key(m.cells[c][ev[e][0]], m.cells[c][ev[e][1]]);
      auto it = edge_ids.find(k);
      if (it == edge_ids.end()) {
        edge_ids.emplace(k, (int)edge_count.size());
        edge_count.push_back(1);
      } else {
        ++edge_count[it->second];
      }
    }
  int ne = (int)edge_count.size();

  Space sp;
  sp.degree = d;
  sp.dim = 2;
  sp.ndofs = nv + ne * (d - 1) + (int)m.cells.size() * n_int;
  sp.dof_coords.assign(sp.ndofs, {0, 0, 0});
  sp.dof_boundary.assign(sp.ndofs, 0);
  sp.cell_dofs.reserve(m.cells.size() * el.ndofs);

  for (size_t c = 0; c < m.cells.size(); ++c) {
    const auto& cell = m.cells[c];
    for (int a = 0; a < el.ndofs; ++a) {
      const LType& L = cls[a];
      int gid;
      if (L.kind == 0) {
        gid = cell[L.which];
      } else if (L.kind == 1) {
        int ga = cell[ev[L.which][0]], gb = cell[ev[L.which][1]];
        int eid = edge_ids[edge_key(ga, gb)];
        // orientation: positions run from the smaller global vertex id
        int pos = (ga < gb) ? L.step : d - L.step;
        gid = nv + eid * (d - 1) + (pos - 1);
      } else {
        gid = nv + ne * (d - 1) + (int)c * n_int + L.step;
      }
      // physical coordinates via the affine map
      double xi = el.node_lattice[a][0] / (double)d;
      double eta = el.node_lattice[a][1] / (double)d;
      const auto &p0 = m.coords[cell[0]], &p1 = m.coords[cell[1]],
                 &p2 = m.coords[cell[2]];
      sp.dof_coords[gid] = {
          p0[0] + xi * (p1[0] - p0[0]) + eta * (p2[0] - p0[0]),
          p0[1] + xi * (p1[1] - p0[1]) + eta * (p2[1] - p0[1]), 0.0};
      sp.cell_dofs.push_back(gid);
    }
  }

  // boundary dofs: vertices and edge nodes of single-cell edges
  for (size_t c = 0; c < m.cells.size(); ++c)
    for (int e = 0; e < 3; ++e) {
      int ga = m.cells[c][ev[e][0]], gb = m.cells[c][ev[e][1]];
      int eid = edge_ids[edge_key(ga, gb)];
      if (edge_count[eid] != 1) continue;
      sp.dof_boundary[ga] = 1;
      sp.dof_boundary[gb] = 1;
      for (int p = 1; p < d; ++p)
        sp.dof_boundary[nv + eid * (d - 1) + (p - 1)] = 1;
    }

  // Reverse Cuthill-McKee dof reordering. The topological numbering
  // above (vertices, then all edge dofs, then interiors) has O(n)
  // bandwidth, which wrecks the level-of-fill ILU0/ILUT preconditioners
  // (FGMRES iterations on unstructured Stokes grew 37->93->210 over
  // res 24->40->56 and stalled at res 92). The structured path's
  // lexicographic numbering is near-banded; RCM restores that property
  // for imported triangulations, and every consumer goes through
  // Space's fields, so a pure permutation is safe.
  {
    int n = sp.ndofs;
    std::vector<std::pair<int, int>> pairs;
    pairs.reserve(sp.cell_dofs.size() * el.ndofs);
    for (size_t c = 0; c < m.cells.size(); ++c) {
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      for (int a = 0; a < el.ndofs; ++a)
        for (int b = 0; b < el.ndofs; ++b)
          if (dofs[a] != dofs[b]) pairs.emplace_back(dofs[a], dofs[b]);
    }
    std::sort(pairs.begin(), pairs.end());
    pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
    std::vector<int> ptr(n + 1, 0);
    for (auto& pr : pairs) ++ptr[pr.first + 1];
    for (int i = 0; i < n; ++i) ptr[i + 1] += ptr[i];
    std::vector<int> adj(pairs.size());
    for (size_t k = 0; k < pairs.size(); ++k) adj[k] = pairs[k].second;

    std::vector<int> order;
    order.reserve(n);
    std::vector<uint8_t> seen(n, 0);
    auto degree = [&](int v) { return ptr[v + 1] - ptr[v]; };
    for (int comp_start = 0; comp_start < n; ++comp_start) {
      if (seen[comp_start]) continue;
      // peripheral-ish start: min degree within the unseen component
      int start = comp_start;
      size_t head = order.size();
      order.push_back(start);
      seen[start] = 1;
      while (head < order.size()) {
        int v = order[head++];
        int lo = ptr[v], hi = ptr[v + 1];
        size_t first = order.size();
        for (int k = lo; k < hi; ++k)
          if (!seen[adj[k]]) {
            seen[adj[k]] = 1;
            order.push_back(adj[k]);
          }
        std::sort(order.begin() + first, order.end(),
                  [&](int a, int b) { return degree(a) < degree(b); });
      }
    }
    // reverse CM; perm[old] = new
    std::vector<int> perm(n);
    for (int i = 0; i < n; ++i) perm[order[i]] = n - 1 - i;

    for (auto& gd : sp.cell_dofs) gd = perm[gd];
    std::vector<std::array<double, 3>> xc(n);
    std::vector<uint8_t> bd(n);
    for (int i = 0; i < n; ++i) {
      xc[perm[i]] = sp.dof_coords[i];
      bd[perm[i]] = sp.dof_boundary[i];
    }
    sp.dof_coords.swap(xc);
    sp.dof_boundary.swap(bd);
  }
  return sp;
}

}  // namespace fem
}  // namespace pdebench
