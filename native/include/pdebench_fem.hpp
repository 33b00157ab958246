// Minimal P1 FEM core for the native (C++) oracle backend: structured
// simplex meshes of the unit square/cube, CSR assembly, Jacobi-CG and
// BiCGStab, and uniform-grid sampling.
//
// Functional role: the reference shipped deal.II C++ oracle binaries
// (dealii_oracle/programs/*.cc — mesh_factory.h, grid_writer.h,
// poisson.cc cell-loop assembly). This is an original, dependency-free
// implementation of the same binary contract for the TPU rebuild's
// out-of-process backend.
#pragma once

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <stdexcept>
#include <string>
#include <vector>

namespace pdebench {
namespace fem {

// ---------------------------------------------------------------------------
// structured meshes (match pdebench_tpu.fem.mesh generators)
// ---------------------------------------------------------------------------

struct Mesh {
  int dim = 2;
  std::vector<std::array<double, 3>> coords;  // (n_nodes)
  std::vector<std::array<int, 4>> cells;      // tri: 3 used, tet: 4
  int nodes_per_cell = 3;
  int resolution = 0;  // structured n for point location
  // unstructured (imported) meshes: bbox + uniform cell bins for point
  // location (pdebench_unstructured.hpp); structured stays analytic
  bool structured = true;
  double bb[4] = {0.0, 1.0, 0.0, 1.0};
  int nbx = 0, nby = 0;
  std::vector<std::vector<int>> bins;
};

inline Mesh unit_square_mesh(int n) {
  Mesh m;
  m.dim = 2;
  m.nodes_per_cell = 3;
  m.resolution = n;
  auto vid = [&](int i, int j) { return i * (n + 1) + j; };
  for (int i = 0; i <= n; ++i)
    for (int j = 0; j <= n; ++j)
      m.coords.push_back({double(i) / n, double(j) / n, 0.0});
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      int v00 = vid(i, j), v10 = vid(i + 1, j);
      int v01 = vid(i, j + 1), v11 = vid(i + 1, j + 1);
      m.cells.push_back({v00, v10, v11, -1});
      m.cells.push_back({v00, v11, v01, -1});
    }
  return m;
}

inline Mesh unit_cube_mesh(int n) {
  Mesh m;
  m.dim = 3;
  m.nodes_per_cell = 4;
  m.resolution = n;
  auto vid = [&](int i, int j, int k) {
    return (i * (n + 1) + j) * (n + 1) + k;
  };
  for (int i = 0; i <= n; ++i)
    for (int j = 0; j <= n; ++j)
      for (int k = 0; k <= n; ++k)
        m.coords.push_back(
            {double(i) / n, double(j) / n, double(k) / n});
  // Kuhn: 6 tets per cube around the (0,0,0)-(1,1,1) diagonal
  const int paths[6][2][3] = {
      {{1, 0, 0}, {1, 1, 0}}, {{1, 0, 0}, {1, 0, 1}},
      {{0, 1, 0}, {1, 1, 0}}, {{0, 1, 0}, {0, 1, 1}},
      {{0, 0, 1}, {1, 0, 1}}, {{0, 0, 1}, {0, 1, 1}},
  };
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      for (int k = 0; k < n; ++k)
        for (auto& p : paths)
          m.cells.push_back({vid(i, j, k),
                             vid(i + p[0][0], j + p[0][1], k + p[0][2]),
                             vid(i + p[1][0], j + p[1][1], k + p[1][2]),
                             vid(i + 1, j + 1, k + 1)});
  return m;
}

inline bool on_boundary(const Mesh& m, int node, double tol = 1e-12) {
  const auto& c = m.coords[node];
  for (int d = 0; d < m.dim; ++d)
    if (c[d] < tol || c[d] > 1.0 - tol) return true;
  return false;
}

// ---------------------------------------------------------------------------
// CSR matrix
// ---------------------------------------------------------------------------

struct CSR {
  int n = 0;
  std::vector<int> indptr, indices;
  std::vector<double> data;

  static CSR from_pattern(const Mesh& m) {
    int n = (int)m.coords.size();
    std::vector<std::vector<int>> adj(n);
    for (auto& c : m.cells)
      for (int a = 0; a < m.nodes_per_cell; ++a)
        for (int b = 0; b < m.nodes_per_cell; ++b)
          adj[c[a]].push_back(c[b]);
    CSR A;
    A.n = n;
    A.indptr.resize(n + 1, 0);
    for (int i = 0; i < n; ++i) {
      auto& row = adj[i];
      std::sort(row.begin(), row.end());
      row.erase(std::unique(row.begin(), row.end()), row.end());
      A.indptr[i + 1] = A.indptr[i] + (int)row.size();
      for (int j : row) A.indices.push_back(j);
    }
    A.data.assign(A.indices.size(), 0.0);
    return A;
  }

  void add(int i, int j, double v) {
    for (int p = indptr[i]; p < indptr[i + 1]; ++p)
      if (indices[p] == j) {
        data[p] += v;
        return;
      }
    throw std::runtime_error("CSR add outside pattern");
  }

  void matvec(const std::vector<double>& x, std::vector<double>& y) const {
    for (int i = 0; i < n; ++i) {
      double s = 0;
      for (int p = indptr[i]; p < indptr[i + 1]; ++p)
        s += data[p] * x[indices[p]];
      y[i] = s;
    }
  }

  std::vector<double> diagonal() const {
    std::vector<double> d(n, 0.0);
    for (int i = 0; i < n; ++i)
      for (int p = indptr[i]; p < indptr[i + 1]; ++p)
        if (indices[p] == i) d[i] = data[p];
    return d;
  }

  // symmetric Dirichlet elimination: zero row/col, unit diagonal;
  // rhs -= A[:, fixed] * g beforehand (caller handles)
  void constrain(const std::vector<uint8_t>& fixed) {
    for (int i = 0; i < n; ++i)
      for (int p = indptr[i]; p < indptr[i + 1]; ++p) {
        int j = indices[p];
        if (fixed[i] || fixed[j]) data[p] = (i == j) ? 1.0 : 0.0;
      }
  }
};

// ---------------------------------------------------------------------------
// P1 element matrices
// ---------------------------------------------------------------------------

// gradients of P1 basis on a cell + volume; returns false on degenerate
inline double cell_grads(const Mesh& m, int c,
                         double grads[4][3]) {
  const auto& cell = m.cells[c];
  if (m.dim == 2) {
    const auto &p0 = m.coords[cell[0]], &p1 = m.coords[cell[1]],
               &p2 = m.coords[cell[2]];
    double J[2][2] = {{p1[0] - p0[0], p2[0] - p0[0]},
                      {p1[1] - p0[1], p2[1] - p0[1]}};
    double det = J[0][0] * J[1][1] - J[0][1] * J[1][0];
    double inv[2][2] = {{J[1][1] / det, -J[0][1] / det},
                        {-J[1][0] / det, J[0][0] / det}};
    // dphi_ref: phi0 = 1-xi-eta, phi1 = xi, phi2 = eta
    double dref[3][2] = {{-1, -1}, {1, 0}, {0, 1}};
    for (int a = 0; a < 3; ++a)
      for (int d = 0; d < 2; ++d)
        grads[a][d] =
            dref[a][0] * inv[0][d] + dref[a][1] * inv[1][d];
    return std::fabs(det) / 2.0;
  }
  const auto &p0 = m.coords[cell[0]], &p1 = m.coords[cell[1]],
             &p2 = m.coords[cell[2]], &p3 = m.coords[cell[3]];
  double J[3][3];
  for (int d = 0; d < 3; ++d) {
    J[d][0] = p1[d] - p0[d];
    J[d][1] = p2[d] - p0[d];
    J[d][2] = p3[d] - p0[d];
  }
  double det = J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
               J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
               J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
  double inv[3][3];
  inv[0][0] = (J[1][1] * J[2][2] - J[1][2] * J[2][1]) / det;
  inv[0][1] = (J[0][2] * J[2][1] - J[0][1] * J[2][2]) / det;
  inv[0][2] = (J[0][1] * J[1][2] - J[0][2] * J[1][1]) / det;
  inv[1][0] = (J[1][2] * J[2][0] - J[1][0] * J[2][2]) / det;
  inv[1][1] = (J[0][0] * J[2][2] - J[0][2] * J[2][0]) / det;
  inv[1][2] = (J[0][2] * J[1][0] - J[0][0] * J[1][2]) / det;
  inv[2][0] = (J[1][0] * J[2][1] - J[1][1] * J[2][0]) / det;
  inv[2][1] = (J[0][1] * J[2][0] - J[0][0] * J[2][1]) / det;
  inv[2][2] = (J[0][0] * J[1][1] - J[0][1] * J[1][0]) / det;
  double dref[4][3] = {{-1, -1, -1}, {1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int a = 0; a < 4; ++a)
    for (int d = 0; d < 3; ++d)
      grads[a][d] = dref[a][0] * inv[0][d] + dref[a][1] * inv[1][d] +
                    dref[a][2] * inv[2][d];
  return std::fabs(det) / 6.0;
}

template <class Kappa>
inline void assemble_stiffness(const Mesh& m, CSR& K, Kappa kappa) {
  int npc = m.nodes_per_cell;
  double grads[4][3];
  for (size_t c = 0; c < m.cells.size(); ++c) {
    double vol = cell_grads(m, (int)c, grads);
    // centroid kappa (P1, one-point rule on the coefficient)
    double cx = 0, cy = 0, cz = 0;
    for (int a = 0; a < npc; ++a) {
      cx += m.coords[m.cells[c][a]][0];
      cy += m.coords[m.cells[c][a]][1];
      cz += m.coords[m.cells[c][a]][2];
    }
    double kq = kappa(cx / npc, cy / npc, cz / npc);
    for (int a = 0; a < npc; ++a)
      for (int b = 0; b < npc; ++b) {
        double s = 0;
        for (int d = 0; d < m.dim; ++d) s += grads[a][d] * grads[b][d];
        K.add(m.cells[c][a], m.cells[c][b], kq * s * vol);
      }
  }
}

inline void assemble_mass(const Mesh& m, CSR& M) {
  int npc = m.nodes_per_cell;
  double grads[4][3];
  for (size_t c = 0; c < m.cells.size(); ++c) {
    double vol = cell_grads(m, (int)c, grads);
    // exact P1 mass: vol/(npc*(npc+1)) * (1 + delta_ab)
    double off = vol / double(npc * (npc + 1));
    for (int a = 0; a < npc; ++a)
      for (int b = 0; b < npc; ++b)
        M.add(m.cells[c][a], m.cells[c][b], (a == b ? 2.0 : 1.0) * off);
  }
}

template <class F>
inline void assemble_load(const Mesh& m, F f, std::vector<double>& b) {
  int npc = m.nodes_per_cell;
  double grads[4][3];
  std::fill(b.begin(), b.end(), 0.0);
  if (m.dim == 2) {
    // edge-midpoint rule (degree-2 exact): weights vol/3, and each
    // midpoint contributes phi_a = 1/2 to its two adjacent vertices
    for (size_t c = 0; c < m.cells.size(); ++c) {
      double vol = cell_grads(m, (int)c, grads);
      const auto& cell = m.cells[c];
      for (int e = 0; e < 3; ++e) {
        int a = cell[(e + 1) % 3], bb = cell[(e + 2) % 3];
        double mx = 0.5 * (m.coords[a][0] + m.coords[bb][0]);
        double my = 0.5 * (m.coords[a][1] + m.coords[bb][1]);
        double fv = f(mx, my, 0.0) * vol / 3.0;
        b[a] += 0.5 * fv;
        b[bb] += 0.5 * fv;
      }
    }
    return;
  }
  for (size_t c = 0; c < m.cells.size(); ++c) {
    double vol = cell_grads(m, (int)c, grads);
    // nodal (vertex) quadrature for tets
    for (int a = 0; a < npc; ++a) {
      const auto& p = m.coords[m.cells[c][a]];
      b[m.cells[c][a]] += f(p[0], p[1], p[2]) * vol / npc;
    }
  }
}

// ---------------------------------------------------------------------------
// Krylov solvers
// ---------------------------------------------------------------------------

struct SolveInfo {
  int iterations = 0;
  double residual = 0;
  bool converged = false;
};

inline SolveInfo cg_jacobi(const CSR& A, const std::vector<double>& b,
                           std::vector<double>& x, double rtol,
                           double atol, int maxiter) {
  int n = A.n;
  std::vector<double> r(n), z(n), p(n), Ap(n);
  std::vector<double> dinv = A.diagonal();
  for (auto& v : dinv) v = (std::fabs(v) > 1e-300) ? 1.0 / v : 1.0;
  A.matvec(x, Ap);
  double bn = 0;
  for (int i = 0; i < n; ++i) {
    r[i] = b[i] - Ap[i];
    bn += b[i] * b[i];
  }
  double tol = std::max(rtol * std::sqrt(bn), atol);
  double rz = 0;
  for (int i = 0; i < n; ++i) {
    z[i] = dinv[i] * r[i];
    p[i] = z[i];
    rz += r[i] * z[i];
  }
  SolveInfo info;
  for (int k = 0; k < maxiter; ++k) {
    double rn = 0;
    for (int i = 0; i < n; ++i) rn += r[i] * r[i];
    info.residual = std::sqrt(rn);
    info.iterations = k;
    if (info.residual <= tol) {
      info.converged = true;
      return info;
    }
    A.matvec(p, Ap);
    double pAp = 0;
    for (int i = 0; i < n; ++i) pAp += p[i] * Ap[i];
    double alpha = rz / pAp;
    for (int i = 0; i < n; ++i) {
      x[i] += alpha * p[i];
      r[i] -= alpha * Ap[i];
    }
    double rz_new = 0;
    for (int i = 0; i < n; ++i) {
      z[i] = dinv[i] * r[i];
      rz_new += r[i] * z[i];
    }
    double beta = rz_new / rz;
    rz = rz_new;
    for (int i = 0; i < n; ++i) p[i] = z[i] + beta * p[i];
  }
  return info;
}

inline SolveInfo bicgstab_jacobi(const CSR& A, const std::vector<double>& b,
                                 std::vector<double>& x, double rtol,
                                 double atol, int maxiter) {
  int n = A.n;
  std::vector<double> dinv = A.diagonal();
  for (auto& v : dinv) v = (std::fabs(v) > 1e-300) ? 1.0 / v : 1.0;
  std::vector<double> r(n), rhat(n), p(n, 0), v(n, 0), s(n), t(n), ph(n),
      sh(n), tmp(n);
  A.matvec(x, tmp);
  double bn = 0;
  for (int i = 0; i < n; ++i) {
    r[i] = b[i] - tmp[i];
    rhat[i] = r[i];
    bn += b[i] * b[i];
  }
  double tol = std::max(rtol * std::sqrt(bn), atol);
  double rho = 1, alpha = 1, omega = 1;
  SolveInfo info;
  for (int k = 0; k < maxiter; ++k) {
    double rn = 0;
    for (int i = 0; i < n; ++i) rn += r[i] * r[i];
    info.residual = std::sqrt(rn);
    info.iterations = k;
    if (info.residual <= tol) {
      info.converged = true;
      return info;
    }
    double rho_new = 0;
    for (int i = 0; i < n; ++i) rho_new += rhat[i] * r[i];
    double beta = (rho_new / rho) * (alpha / omega);
    rho = rho_new;
    for (int i = 0; i < n; ++i) p[i] = r[i] + beta * (p[i] - omega * v[i]);
    for (int i = 0; i < n; ++i) ph[i] = dinv[i] * p[i];
    A.matvec(ph, v);
    double rv = 0;
    for (int i = 0; i < n; ++i) rv += rhat[i] * v[i];
    alpha = rho / rv;
    for (int i = 0; i < n; ++i) s[i] = r[i] - alpha * v[i];
    for (int i = 0; i < n; ++i) sh[i] = dinv[i] * s[i];
    A.matvec(sh, t);
    double tt = 0, ts = 0;
    for (int i = 0; i < n; ++i) {
      tt += t[i] * t[i];
      ts += t[i] * s[i];
    }
    omega = ts / std::max(tt, 1e-300);
    for (int i = 0; i < n; ++i) {
      x[i] += alpha * ph[i] + omega * sh[i];
      r[i] = s[i] - omega * t[i];
    }
  }
  return info;
}

// ---------------------------------------------------------------------------
// structured-grid sampling (P1)
// ---------------------------------------------------------------------------

inline double eval_p1(const Mesh& m, const std::vector<double>& u,
                      double x, double y, double z) {
  int n = m.resolution;
  auto clampi = [&](double v) {
    int i = (int)std::floor(v * n);
    return std::max(0, std::min(i, n - 1));
  };
  if (m.dim == 2) {
    int i = clampi(x), j = clampi(y);
    double lx = x * n - i, ly = y * n - j;
    auto vid = [&](int a, int b) { return a * (n + 1) + b; };
    // cell split along the (i,j)-(i+1,j+1) diagonal:
    // lower tri (v00,v10,v11): lx >= ly ; upper tri (v00,v11,v01)
    if (lx >= ly) {
      double l1 = lx - ly, l2 = ly, l0 = 1.0 - lx;
      return l0 * u[vid(i, j)] + l1 * u[vid(i + 1, j)] +
             l2 * u[vid(i + 1, j + 1)];
    }
    double l1 = lx, l2 = ly - lx, l0 = 1.0 - ly;
    return l0 * u[vid(i, j)] + l1 * u[vid(i + 1, j + 1)] +
           l2 * u[vid(i, j + 1)];
  }
  // 3-D: trilinear on vertex values is NOT P1-conforming across the Kuhn
  // tets, but agrees at vertices; use barycentric in the containing tet.
  int i = clampi(x), j = clampi(y), k = clampi(z);
  double lx = x * n - i, ly = y * n - j, lz = z * n - k;
  auto vid = [&](int a, int b, int c) {
    return (a * (n + 1) + b) * (n + 1) + c;
  };
  // Kuhn tets: order coordinates descending -> permutation determines tet;
  // barycentric weights are successive differences.
  struct P {
    double v;
    int d;
  };
  P s[3] = {{lx, 0}, {ly, 1}, {lz, 2}};
  std::sort(s, s + 3, [](const P& a, const P& b) { return a.v > b.v; });
  int cur[3] = {0, 0, 0};
  double w0 = 1.0 - s[0].v;
  int idx[4];
  idx[0] = vid(i + cur[0], j + cur[1], k + cur[2]);
  double w[4] = {w0, s[0].v - s[1].v, s[1].v - s[2].v, s[2].v};
  for (int step = 0; step < 3; ++step) {
    cur[s[step].d] = 1;
    idx[step + 1] = vid(i + cur[0], j + cur[1], k + cur[2]);
  }
  double out = 0;
  for (int a = 0; a < 4; ++a) out += w[a] * u[idx[a]];
  return out;
}

}  // namespace fem
}  // namespace pdebench
