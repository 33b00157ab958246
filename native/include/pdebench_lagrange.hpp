// Generic degree-d Lagrange simplex elements + spaces for the native
// (C++) oracle backend.
//
// Functional role: the reference's deal.II binaries used FE_Q /
// FE_SimplexP / FESystem / Taylor-Hood factories (dealii_oracle/
// programs/common/mesh_factory.h:108-145). This is an original,
// dependency-free equivalent for the structured simplex meshes of
// pdebench_fem.hpp: element basis functions are constructed from a
// monomial Vandermonde inverse at the reference lattice nodes (works
// for any degree), quadrature is a collapsed (Duffy) tensor Gauss rule
// (exact to any requested degree), and global dof numbering comes from
// the integer coordinate lattice scale*x with scale = resolution*degree
// (every Lagrange node of a structured unit square/cube mesh sits
// exactly on that lattice, so flooring-jitter is impossible).
#pragma once

#include <array>
#include <cmath>
#include <cstdint>
#include <stdexcept>
#include <unordered_map>
#include <vector>

#include <limits>

#include "pdebench_fem.hpp"

namespace pdebench {
namespace fem {

// ---------------------------------------------------------------------------
// 1-D Gauss-Legendre on [0,1] (Newton on Legendre polynomials)
// ---------------------------------------------------------------------------

inline void gauss01(int n, std::vector<double>& x, std::vector<double>& w) {
  x.resize(n);
  w.resize(n);
  for (int i = 0; i < n; ++i) {
    // initial guess (Chebyshev) on [-1,1]
    double t = std::cos(M_PI * (i + 0.75) / (n + 0.5));
    for (int it = 0; it < 100; ++it) {
      // Legendre P_n(t) and P'_n(t) by recurrence
      double p0 = 1.0, p1 = t;
      for (int k = 2; k <= n; ++k) {
        double p2 = ((2 * k - 1) * t * p1 - (k - 1) * p0) / k;
        p0 = p1;
        p1 = p2;
      }
      double dp = n * (t * p1 - p0) / (t * t - 1.0);
      double dt = p1 / dp;
      t -= dt;
      if (std::fabs(dt) < 1e-15) break;
    }
    double p0 = 1.0, p1 = t;
    for (int k = 2; k <= n; ++k) {
      double p2 = ((2 * k - 1) * t * p1 - (k - 1) * p0) / k;
      p0 = p1;
      p1 = p2;
    }
    double dp = n * (t * p1 - p0) / (t * t - 1.0);
    x[i] = 0.5 * (t + 1.0);
    w[i] = 1.0 / ((1.0 - t * t) * dp * dp);  // = 0.5 * w_[-1,1]
  }
}

// ---------------------------------------------------------------------------
// reference-simplex quadrature (collapsed/Duffy tensor Gauss)
// ---------------------------------------------------------------------------

struct Quadrature {
  std::vector<std::array<double, 3>> pts;  // (xi, eta, zeta)
  std::vector<double> wts;                 // sums to |ref simplex|
};

// exact for polynomials of total degree <= 2*n_axis - 2 (2-D) /
// 2*n_axis - 3 (3-D) after the Duffy factor; pick n_axis generously.
inline Quadrature simplex_quadrature(int dim, int n_axis) {
  std::vector<double> gx, gw;
  gauss01(n_axis, gx, gw);
  Quadrature q;
  if (dim == 2) {
    for (int i = 0; i < n_axis; ++i)
      for (int j = 0; j < n_axis; ++j) {
        double a = gx[i], b = gx[j];
        q.pts.push_back({a * (1.0 - b), b, 0.0});
        q.wts.push_back(gw[i] * gw[j] * (1.0 - b));
      }
    return q;
  }
  for (int i = 0; i < n_axis; ++i)
    for (int j = 0; j < n_axis; ++j)
      for (int k = 0; k < n_axis; ++k) {
        double a = gx[i], b = gx[j], c = gx[k];
        q.pts.push_back({a * (1.0 - b) * (1.0 - c), b * (1.0 - c), c});
        q.wts.push_back(gw[i] * gw[j] * gw[k] * (1.0 - b) * (1.0 - c) *
                        (1.0 - c));
      }
  return q;
}

// ---------------------------------------------------------------------------
// Lagrange element of arbitrary degree on the reference simplex
// ---------------------------------------------------------------------------

struct Element {
  int dim = 2, degree = 1, ndofs = 0;
  std::vector<std::array<int, 3>> node_lattice;  // integer lattice (i,j,k), /degree
  std::vector<std::array<int, 3>> mono_exp;      // monomial exponents
  std::vector<double> coef;  // (ndofs x ndofs): phi_a = sum_m coef[m*ndofs+a] mono_m
  // tabulation at quadrature points:
  std::vector<double> phi;    // (nq x ndofs)
  std::vector<double> dphi;   // (nq x ndofs x dim), reference gradients
  std::vector<double> d2phi;  // (nq x ndofs x dim x dim), reference hessians
  int nq = 0;

  Element(int dim_, int degree_, const Quadrature& q) : dim(dim_), degree(degree_) {
    // lattice nodes and monomials (same count)
    for (int i = 0; i <= degree; ++i)
      for (int j = 0; j <= degree - i; ++j) {
        if (dim == 2) {
          node_lattice.push_back({i, j, 0});
          mono_exp.push_back({i, j, 0});
        } else {
          for (int k = 0; k <= degree - i - j; ++k) {
            node_lattice.push_back({i, j, k});
            mono_exp.push_back({i, j, k});
          }
        }
      }
    ndofs = (int)node_lattice.size();
    // Vandermonde V[a][m] = mono_m(node_a); coef = V^{-1}
    std::vector<double> V(ndofs * ndofs);
    for (int a = 0; a < ndofs; ++a) {
      double x = node_lattice[a][0] / (double)degree;
      double y = node_lattice[a][1] / (double)degree;
      double z = node_lattice[a][2] / (double)degree;
      for (int m = 0; m < ndofs; ++m)
        V[a * ndofs + m] = std::pow(x, mono_exp[m][0]) *
                           std::pow(y, mono_exp[m][1]) *
                           std::pow(z, mono_exp[m][2]);
    }
    coef = invert_dense(V, ndofs);
    // tabulate
    nq = (int)q.pts.size();
    phi.assign((size_t)nq * ndofs, 0.0);
    dphi.assign((size_t)nq * ndofs * dim, 0.0);
    d2phi.assign((size_t)nq * ndofs * dim * dim, 0.0);
    for (int iq = 0; iq < nq; ++iq) {
      const auto& p = q.pts[iq];
      for (int a = 0; a < ndofs; ++a) {
        phi[(size_t)iq * ndofs + a] = eval_basis(a, p[0], p[1], p[2]);
        for (int d = 0; d < dim; ++d) {
          dphi[((size_t)iq * ndofs + a) * dim + d] =
              eval_dbasis(a, d, p[0], p[1], p[2]);
          for (int e = 0; e < dim; ++e)
            d2phi[(((size_t)iq * ndofs + a) * dim + d) * dim + e] =
                eval_d2basis(a, d, e, p[0], p[1], p[2]);
        }
      }
    }
  }

  double eval_basis(int a, double x, double y, double z) const {
    double s = 0;
    for (int m = 0; m < ndofs; ++m)
      s += coef[(size_t)m * ndofs + a] * std::pow(x, mono_exp[m][0]) *
           std::pow(y, mono_exp[m][1]) * std::pow(z, mono_exp[m][2]);
    return s;
  }

  double eval_dbasis(int a, int d, double x, double y, double z) const {
    double s = 0;
    for (int m = 0; m < ndofs; ++m) {
      int e[3] = {mono_exp[m][0], mono_exp[m][1], mono_exp[m][2]};
      if (e[d] == 0) continue;
      double c = coef[(size_t)m * ndofs + a] * e[d];
      e[d] -= 1;
      s += c * std::pow(x, e[0]) * std::pow(y, e[1]) * std::pow(z, e[2]);
    }
    return s;
  }

  double eval_d2basis(int a, int d, int e, double x, double y,
                      double z) const {
    double s = 0;
    for (int m = 0; m < ndofs; ++m) {
      int ex[3] = {mono_exp[m][0], mono_exp[m][1], mono_exp[m][2]};
      if (ex[d] == 0) continue;
      double c = coef[(size_t)m * ndofs + a] * ex[d];
      ex[d] -= 1;
      if (ex[e] == 0) continue;
      c *= ex[e];
      ex[e] -= 1;
      s += c * std::pow(x, ex[0]) * std::pow(y, ex[1]) * std::pow(z, ex[2]);
    }
    return s;
  }

  static std::vector<double> invert_dense(std::vector<double> A, int n) {
    std::vector<double> I(n * n, 0.0);
    for (int i = 0; i < n; ++i) I[i * n + i] = 1.0;
    for (int c = 0; c < n; ++c) {
      int piv = c;
      for (int r = c + 1; r < n; ++r)
        if (std::fabs(A[r * n + c]) > std::fabs(A[piv * n + c])) piv = r;
      if (std::fabs(A[piv * n + c]) < 1e-14)
        throw std::runtime_error("singular Vandermonde");
      if (piv != c)
        for (int j = 0; j < n; ++j) {
          std::swap(A[c * n + j], A[piv * n + j]);
          std::swap(I[c * n + j], I[piv * n + j]);
        }
      double inv = 1.0 / A[c * n + c];
      for (int j = 0; j < n; ++j) {
        A[c * n + j] *= inv;
        I[c * n + j] *= inv;
      }
      for (int r = 0; r < n; ++r) {
        if (r == c) continue;
        double f = A[r * n + c];
        if (f == 0.0) continue;
        for (int j = 0; j < n; ++j) {
          A[r * n + j] -= f * A[c * n + j];
          I[r * n + j] -= f * I[c * n + j];
        }
      }
    }
    return I;
  }
};

// ---------------------------------------------------------------------------
// global scalar space on a structured mesh
// ---------------------------------------------------------------------------

struct Space {
  int ndofs = 0, degree = 1, dim = 2;
  std::vector<int> cell_dofs;  // (n_cells * element.ndofs)
  std::vector<std::array<double, 3>> dof_coords;
  std::vector<uint8_t> dof_boundary;
};

// exact integer-lattice numbering: every Lagrange node of the
// structured unit square/cube mesh has coordinates m/(n*degree).
inline Space build_space(const Mesh& m, const Element& el) {
  Space sp;
  sp.degree = el.degree;
  sp.dim = m.dim;
  int64_t scale = (int64_t)m.resolution * el.degree;
  int64_t S = scale + 1;
  std::unordered_map<int64_t, int> ids;
  ids.reserve(m.cells.size() * 2);
  sp.cell_dofs.reserve(m.cells.size() * el.ndofs);
  for (size_t c = 0; c < m.cells.size(); ++c) {
    const auto& cell = m.cells[c];
    const auto& p0 = m.coords[cell[0]];
    for (int a = 0; a < el.ndofs; ++a) {
      double xi = el.node_lattice[a][0] / (double)el.degree;
      double eta = el.node_lattice[a][1] / (double)el.degree;
      double zeta = el.node_lattice[a][2] / (double)el.degree;
      double x = p0[0], y = p0[1], z = p0[2];
      // affine map: p = p0 + xi (p1-p0) + eta (p2-p0) (+ zeta (p3-p0))
      const auto& p1 = m.coords[cell[1]];
      const auto& p2 = m.coords[cell[2]];
      x += xi * (p1[0] - p0[0]) + eta * (p2[0] - p0[0]);
      y += xi * (p1[1] - p0[1]) + eta * (p2[1] - p0[1]);
      z += xi * (p1[2] - p0[2]) + eta * (p2[2] - p0[2]);
      if (m.dim == 3) {
        const auto& p3 = m.coords[cell[3]];
        x += zeta * (p3[0] - p0[0]);
        y += zeta * (p3[1] - p0[1]);
        z += zeta * (p3[2] - p0[2]);
      }
      int64_t kx = (int64_t)std::llround(x * scale);
      int64_t ky = (int64_t)std::llround(y * scale);
      int64_t kz = (int64_t)std::llround(z * scale);
      int64_t key = (kx * S + ky) * S + kz;
      auto it = ids.find(key);
      int gid;
      if (it == ids.end()) {
        gid = (int)sp.dof_coords.size();
        ids.emplace(key, gid);
        sp.dof_coords.push_back({x, y, z});
        bool bnd = kx == 0 || kx == scale || ky == 0 || ky == scale;
        if (m.dim == 3) bnd = bnd || kz == 0 || kz == scale;
        sp.dof_boundary.push_back(bnd ? 1 : 0);
      } else {
        gid = it->second;
      }
      sp.cell_dofs.push_back(gid);
    }
  }
  sp.ndofs = (int)sp.dof_coords.size();
  return sp;
}

// inverse Jacobian (ref->phys) and physical cell volume
inline double cell_jinv(const Mesh& m, int c, double jinv[3][3]) {
  const auto& cell = m.cells[c];
  const auto &p0 = m.coords[cell[0]], &p1 = m.coords[cell[1]],
             &p2 = m.coords[cell[2]];
  if (m.dim == 2) {
    double J[2][2] = {{p1[0] - p0[0], p2[0] - p0[0]},
                      {p1[1] - p0[1], p2[1] - p0[1]}};
    double det = J[0][0] * J[1][1] - J[0][1] * J[1][0];
    jinv[0][0] = J[1][1] / det;
    jinv[0][1] = -J[0][1] / det;
    jinv[1][0] = -J[1][0] / det;
    jinv[1][1] = J[0][0] / det;
    return std::fabs(det);  // ref-area 1/2 folded into quadrature weights
  }
  const auto& p3 = m.coords[cell[3]];
  double J[3][3];
  for (int d = 0; d < 3; ++d) {
    J[d][0] = p1[d] - p0[d];
    J[d][1] = p2[d] - p0[d];
    J[d][2] = p3[d] - p0[d];
  }
  double det = J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
               J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
               J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
  jinv[0][0] = (J[1][1] * J[2][2] - J[1][2] * J[2][1]) / det;
  jinv[0][1] = (J[0][2] * J[2][1] - J[0][1] * J[2][2]) / det;
  jinv[0][2] = (J[0][1] * J[1][2] - J[0][2] * J[1][1]) / det;
  jinv[1][0] = (J[1][2] * J[2][0] - J[1][0] * J[2][2]) / det;
  jinv[1][1] = (J[0][0] * J[2][2] - J[0][2] * J[2][0]) / det;
  jinv[1][2] = (J[0][2] * J[1][0] - J[0][0] * J[1][2]) / det;
  jinv[2][0] = (J[1][0] * J[2][1] - J[1][1] * J[2][0]) / det;
  jinv[2][1] = (J[0][1] * J[2][0] - J[0][0] * J[2][1]) / det;
  jinv[2][2] = (J[0][0] * J[1][1] - J[0][1] * J[1][0]) / det;
  return std::fabs(det);
}

// quadrature-point physical coordinates for one cell
inline void cell_qpoints(const Mesh& m, int c, const Quadrature& q,
                         std::vector<std::array<double, 3>>& out) {
  const auto& cell = m.cells[c];
  const auto& p0 = m.coords[cell[0]];
  const auto& p1 = m.coords[cell[1]];
  const auto& p2 = m.coords[cell[2]];
  out.resize(q.pts.size());
  for (size_t iq = 0; iq < q.pts.size(); ++iq) {
    double xi = q.pts[iq][0], eta = q.pts[iq][1], zeta = q.pts[iq][2];
    for (int d = 0; d < 3; ++d)
      out[iq][d] = p0[d] + xi * (p1[d] - p0[d]) + eta * (p2[d] - p0[d]);
    if (m.dim == 3) {
      const auto& p3 = m.coords[cell[3]];
      for (int d = 0; d < 3; ++d) out[iq][d] += zeta * (p3[d] - p0[d]);
    }
  }
}

// CSR pattern over arbitrary (space, block) dof lists per cell
inline CSR csr_from_cells(int ndofs, const std::vector<std::vector<int>>& cell_dof_lists) {
  std::vector<std::vector<int>> adj(ndofs);
  for (const auto& dofs : cell_dof_lists)
    for (int a : dofs)
      for (int b : dofs) adj[a].push_back(b);
  CSR A;
  A.n = ndofs;
  A.indptr.resize(ndofs + 1, 0);
  for (int i = 0; i < ndofs; ++i) {
    auto& row = adj[i];
    std::sort(row.begin(), row.end());
    row.erase(std::unique(row.begin(), row.end()), row.end());
    A.indptr[i + 1] = A.indptr[i] + (int)row.size();
    for (int j : row) A.indices.push_back(j);
  }
  A.data.assign(A.indices.size(), 0.0);
  return A;
}

// ---------------------------------------------------------------------------
// point evaluation (structured meshes: direct cell location)
// ---------------------------------------------------------------------------

// local reference coords of (x,y,z) in cell c (affine simplex)
inline void local_coords(const Mesh& m, int c, double x, double y, double z,
                         double* xi) {
  double jinv[3][3];
  cell_jinv(m, c, jinv);
  const auto& p0 = m.coords[m.cells[c][0]];
  double dx = x - p0[0], dy = y - p0[1], dz = z - p0[2];
  // ref = Jinv^T? careful: J maps ref->phys (columns = edge vectors);
  // jinv rows as built satisfy ref_r = sum_d jinv[r][d] * phys_d? verify:
  // for 2-D, jinv = J^{-1} with (dx,dy)^T = J (xi,eta)^T -> (xi,eta)^T =
  // J^{-1} (dx,dy)^T; jinv[r][d] is (J^{-1})[r][d].
  if (m.dim == 2) {
    xi[0] = jinv[0][0] * dx + jinv[0][1] * dy;
    xi[1] = jinv[1][0] * dx + jinv[1][1] * dy;
    xi[2] = 0.0;
    return;
  }
  for (int r = 0; r < 3; ++r)
    xi[r] = jinv[r][0] * dx + jinv[r][1] * dy + jinv[r][2] * dz;
}

// unstructured location (defined in pdebench_unstructured.hpp);
// returns -1 for points outside the domain
inline int locate_cell_unstructured(const Mesh& m, double x, double y,
                                    double tol);

// containing cell index for a point (structured: analytic; imported
// meshes: binned barycentric search, -1 when outside)
inline int locate_cell(const Mesh& m, double x, double y, double z) {
  if (!m.structured) return locate_cell_unstructured(m, x, y, 1e-10);
  int n = m.resolution;
  auto clampi = [&](double v) {
    int i = (int)std::floor(v * n);
    return std::max(0, std::min(i, n - 1));
  };
  if (m.dim == 2) {
    int i = clampi(x), j = clampi(y);
    double lx = x * n - i, ly = y * n - j;
    int base = 2 * (i * n + j);
    return (lx >= ly) ? base : base + 1;
  }
  int i = clampi(x), j = clampi(y), k = clampi(z);
  double lx = x * n - i, ly = y * n - j, lz = z * n - k;
  // Kuhn tets as generated in unit_cube_mesh: 6 per cube in path order
  // (1,0,0)-(1,1,0); (1,0,0)-(1,0,1); (0,1,0)-(1,1,0); (0,1,0)-(0,1,1);
  // (0,0,1)-(1,0,1); (0,0,1)-(0,1,1) — tet t contains the point whose
  // coordinate order matches the path (descending order of lx,ly,lz).
  int t;
  if (lx >= ly && ly >= lz) t = 0;
  else if (lx >= lz && lz >= ly) t = 1;
  else if (ly >= lx && lx >= lz) t = 2;
  else if (ly >= lz && lz >= lx) t = 3;
  else if (lz >= lx && lx >= ly) t = 4;
  else t = 5;
  return 6 * ((i * n + j) * n + k) + t;
}

// evaluate a scalar field (space dofs u) at a physical point
inline double eval_space(const Mesh& m, const Space& sp, const Element& el,
                         const std::vector<double>& u, double x, double y,
                         double z) {
  int c = locate_cell(m, x, y, z);
  if (c < 0) return std::numeric_limits<double>::quiet_NaN();
  double xi[3];
  local_coords(m, c, x, y, z, xi);
  double s = 0;
  const int* dofs = &sp.cell_dofs[(size_t)c * el.ndofs];
  for (int a = 0; a < el.ndofs; ++a)
    s += u[dofs[a]] * el.eval_basis(a, xi[0], xi[1], xi[2]);
  return s;
}

}  // namespace fem
}  // namespace pdebench
