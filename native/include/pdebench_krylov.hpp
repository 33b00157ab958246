// Krylov solvers + preconditioners for the native (C++) oracle backend:
// flexible GMRES with a pluggable right preconditioner, preconditioned
// CG, SSOR and ILU(0) preconditioners for CSR matrices.
//
// Functional role: the reference's deal.II binaries leaned on
// UMFPACK/MUMPS direct solves and PETSc KSP (CG/GMRES + SSOR/ILU,
// e.g. programs/poisson.cc:172-199, navier_stokes.cc:425-556). This is
// an original iterative equivalent: saddle-point systems are solved by
// FGMRES with block preconditioners instead of sparse LU.
#pragma once

#include <cmath>
#include <functional>
#include <vector>

#include "pdebench_fem.hpp"

namespace pdebench {
namespace fem {

using Apply = std::function<void(const std::vector<double>&, std::vector<double>&)>;

inline double dot(const std::vector<double>& a, const std::vector<double>& b) {
  double s = 0;
  for (size_t i = 0; i < a.size(); ++i) s += a[i] * b[i];
  return s;
}

inline double nrm2(const std::vector<double>& a) { return std::sqrt(dot(a, a)); }

// ---------------------------------------------------------------------------
// SSOR preconditioner (SPD for SPD A): z = M^{-1} r with
// M = (D/w + L) (w/(2-w) D)^{-1} (D/w + U)
// ---------------------------------------------------------------------------

struct SSOR {
  const CSR* A = nullptr;
  double omega = 1.2;
  std::vector<double> diag;

  explicit SSOR(const CSR& A_, double omega_ = 1.2) : A(&A_), omega(omega_) {
    diag = A_.diagonal();
    for (auto& d : diag)
      if (std::fabs(d) < 1e-300) d = 1.0;
  }

  void apply(const std::vector<double>& r, std::vector<double>& z) const {
    int n = A->n;
    // forward solve (D/w + L) y = r
    for (int i = 0; i < n; ++i) {
      double s = r[i];
      for (int p = A->indptr[i]; p < A->indptr[i + 1]; ++p) {
        int j = A->indices[p];
        if (j < i) s -= A->data[p] * z[j];
      }
      z[i] = s * omega / diag[i];
    }
    // scale: y <- ((2-w)/w D)^{-1} ... combined with backward pass:
    for (int i = 0; i < n; ++i) z[i] *= diag[i] * (2.0 - omega) / omega;
    // backward solve (D/w + U) z = y
    for (int i = n - 1; i >= 0; --i) {
      double s = z[i];
      for (int p = A->indptr[i]; p < A->indptr[i + 1]; ++p) {
        int j = A->indices[p];
        if (j > i) s -= A->data[p] * z[j];
      }
      z[i] = s * omega / diag[i];
    }
  }
};

// ---------------------------------------------------------------------------
// ILU(0): incomplete LU on the CSR sparsity pattern (IKJ variant)
// ---------------------------------------------------------------------------

struct ILU0 {
  CSR LU;
  std::vector<int> diag_ptr;

  explicit ILU0(const CSR& A) : LU(A) {
    int n = LU.n;
    diag_ptr.assign(n, -1);
    for (int i = 0; i < n; ++i)
      for (int p = LU.indptr[i]; p < LU.indptr[i + 1]; ++p)
        if (LU.indices[p] == i) diag_ptr[i] = p;
    // column lookup scratch
    std::vector<int> colpos(n, -1);
    for (int i = 0; i < n; ++i) {
      for (int p = LU.indptr[i]; p < LU.indptr[i + 1]; ++p)
        colpos[LU.indices[p]] = p;
      for (int p = LU.indptr[i]; p < LU.indptr[i + 1]; ++p) {
        int k = LU.indices[p];
        if (k >= i) break;  // indices sorted; only strictly-lower part
        double dkk = LU.data[diag_ptr[k]];
        if (std::fabs(dkk) < 1e-300) dkk = 1e-300;
        double lik = LU.data[p] / dkk;
        LU.data[p] = lik;
        for (int pk = diag_ptr[k] + 1; pk < LU.indptr[k + 1]; ++pk) {
          int j = LU.indices[pk];
          int pj = colpos[j];
          if (pj >= 0) LU.data[pj] -= lik * LU.data[pk];
        }
      }
      for (int p = LU.indptr[i]; p < LU.indptr[i + 1]; ++p)
        colpos[LU.indices[p]] = -1;
      if (diag_ptr[i] < 0 || std::fabs(LU.data[diag_ptr[i]]) < 1e-12)
        if (diag_ptr[i] >= 0) LU.data[diag_ptr[i]] =
            (LU.data[diag_ptr[i]] >= 0 ? 1e-12 : -1e-12);
    }
  }

  void apply(const std::vector<double>& r, std::vector<double>& z) const {
    int n = LU.n;
    // L y = r (unit lower)
    for (int i = 0; i < n; ++i) {
      double s = r[i];
      for (int p = LU.indptr[i]; p < LU.indptr[i + 1]; ++p) {
        int j = LU.indices[p];
        if (j >= i) break;
        s -= LU.data[p] * z[j];
      }
      z[i] = s;
    }
    // U z = y
    for (int i = n - 1; i >= 0; --i) {
      double s = z[i];
      for (int p = diag_ptr[i] + 1; p < LU.indptr[i + 1]; ++p)
        s -= LU.data[p] * z[LU.indices[p]];
      z[i] = s / LU.data[diag_ptr[i]];
    }
  }
};

// ---------------------------------------------------------------------------
// ILUT(p, tau): dual-threshold incomplete LU (Saad). Much stronger than
// ILU(0); with velocity-first ordering it factorizes saddle-point
// matrices (the pressure rows pick up Schur-complement fill), playing
// the role UMFPACK/MUMPS played for the reference's deal.II solvers.
// ---------------------------------------------------------------------------

struct ILUT {
  int n = 0;
  // L: strictly lower (unit diagonal implied), U: diagonal + upper
  std::vector<int> Lptr, Lind, Uptr, Uind;
  std::vector<double> Lval, Uval;

  ILUT(const CSR& A, double tau = 1e-4, int p = 60) : n(A.n) {
    Lptr.assign(n + 1, 0);
    Uptr.assign(n + 1, 0);
    std::vector<double> w(n, 0.0);      // sparse accumulator values
    std::vector<int> nzlist;            // its nonzero indices
    std::vector<uint8_t> marker(n, 0);
    nzlist.reserve(4096);
    for (int i = 0; i < n; ++i) {
      nzlist.clear();
      double row_norm = 0.0;
      int row_len = 0;
      for (int q = A.indptr[i]; q < A.indptr[i + 1]; ++q) {
        int j = A.indices[q];
        double v = A.data[q];
        w[j] = v;
        if (!marker[j]) {
          marker[j] = 1;
          nzlist.push_back(j);
        }
        row_norm += std::fabs(v);
        ++row_len;
      }
      row_norm /= std::max(row_len, 1);
      double drop = tau * row_norm;
      // eliminate against previous rows, ascending column order
      std::sort(nzlist.begin(), nzlist.end());
      for (size_t pos = 0; pos < nzlist.size(); ++pos) {
        int k = nzlist[pos];
        if (k >= i) break;
        double lik = w[k] / Uval[Uptr[k]];  // U diag stored first in row k
        if (std::fabs(lik) <= drop) {
          w[k] = 0.0;
          continue;
        }
        w[k] = lik;
        for (int q = Uptr[k] + 1; q < Uptr[k + 1]; ++q) {
          int j = Uind[q];
          double upd = lik * Uval[q];
          if (marker[j]) {
            w[j] -= upd;
          } else if (std::fabs(upd) > drop) {
            marker[j] = 1;
            w[j] = -upd;
            // insert keeping nzlist sorted beyond current position
            auto it = std::lower_bound(nzlist.begin() + pos + 1,
                                       nzlist.end(), j);
            nzlist.insert(it, j);
          }
        }
      }
      // split into L and U candidates, apply dual threshold
      std::vector<std::pair<double, int>> lpart, upart;
      double dii = 0.0;
      for (int j : nzlist) {
        double v = w[j];
        if (j == i) {
          dii = v;
        } else if (j < i) {
          if (std::fabs(v) > drop) lpart.push_back({std::fabs(v), j});
        } else {
          if (std::fabs(v) > drop) upart.push_back({std::fabs(v), j});
        }
      }
      auto keep_largest = [&](std::vector<std::pair<double, int>>& part) {
        if ((int)part.size() > p) {
          std::nth_element(part.begin(), part.begin() + p, part.end(),
                           [](const auto& a, const auto& b) {
                             return a.first > b.first;
                           });
          part.resize(p);
        }
        std::sort(part.begin(), part.end(),
                  [](const auto& a, const auto& b) {
                    return a.second < b.second;
                  });
      };
      keep_largest(lpart);
      keep_largest(upart);
      if (std::fabs(dii) < 1e-12 * std::max(row_norm, 1e-30))
        dii = (dii >= 0 ? 1.0 : -1.0) * std::max(tau * row_norm, 1e-12);
      for (auto& e : lpart) {
        Lind.push_back(e.second);
        Lval.push_back(w[e.second]);
      }
      Lptr[i + 1] = (int)Lind.size();
      // U row: diagonal first, then upper entries ascending
      Uind.push_back(i);
      Uval.push_back(dii);
      for (auto& e : upart) {
        Uind.push_back(e.second);
        Uval.push_back(w[e.second]);
      }
      Uptr[i + 1] = (int)Uind.size();
      for (int j : nzlist) {
        w[j] = 0.0;
        marker[j] = 0;
      }
    }
  }

  void apply(const std::vector<double>& r, std::vector<double>& z) const {
    // L y = r (unit lower)
    for (int i = 0; i < n; ++i) {
      double s = r[i];
      for (int q = Lptr[i]; q < Lptr[i + 1]; ++q) s -= Lval[q] * z[Lind[q]];
      z[i] = s;
    }
    // U z = y (diag first in each row)
    for (int i = n - 1; i >= 0; --i) {
      double s = z[i];
      for (int q = Uptr[i] + 1; q < Uptr[i + 1]; ++q)
        s -= Uval[q] * z[Uind[q]];
      z[i] = s / Uval[Uptr[i]];
    }
  }

  size_t nnz() const { return Lval.size() + Uval.size(); }
};

// ---------------------------------------------------------------------------
// preconditioned CG (SPD A, SPD M)
// ---------------------------------------------------------------------------

inline SolveInfo pcg(int n, const Apply& A, const std::vector<double>& b,
                     std::vector<double>& x, const Apply& M, double rtol,
                     double atol, int maxiter) {
  std::vector<double> r(n), z(n), p(n), Ap(n);
  A(x, Ap);
  for (int i = 0; i < n; ++i) r[i] = b[i] - Ap[i];
  double tol = std::max(rtol * nrm2(b), atol);
  M(r, z);
  p = z;
  double rz = dot(r, z);
  SolveInfo info;
  for (int k = 0; k < maxiter; ++k) {
    info.residual = nrm2(r);
    info.iterations = k;
    if (info.residual <= tol) {
      info.converged = true;
      return info;
    }
    A(p, Ap);
    double alpha = rz / dot(p, Ap);
    for (int i = 0; i < n; ++i) {
      x[i] += alpha * p[i];
      r[i] -= alpha * Ap[i];
    }
    M(r, z);
    double rz_new = dot(r, z);
    double beta = rz_new / rz;
    rz = rz_new;
    for (int i = 0; i < n; ++i) p[i] = z[i] + beta * p[i];
  }
  return info;
}

// ---------------------------------------------------------------------------
// FGMRES(restart) with right preconditioning (flexible: M may vary)
// ---------------------------------------------------------------------------

inline SolveInfo fgmres(int n, const Apply& A, const std::vector<double>& b,
                        std::vector<double>& x, const Apply& M, double rtol,
                        double atol, int maxiter, int restart = 200) {
  SolveInfo info;
  std::vector<double> r(n), w(n);
  A(x, w);
  for (int i = 0; i < n; ++i) r[i] = b[i] - w[i];
  double beta = nrm2(r);
  double tol = std::max(rtol * nrm2(b), atol);
  info.residual = beta;
  if (beta <= tol) {
    info.converged = true;
    return info;
  }
  int m = restart;
  std::vector<std::vector<double>> V(m + 1, std::vector<double>(n));
  std::vector<std::vector<double>> Z(m, std::vector<double>(n));
  std::vector<double> H((m + 1) * m, 0.0), cs(m), sn(m), g(m + 1);
  int total_it = 0;
  while (total_it < maxiter) {
    for (int i = 0; i < n; ++i) V[0][i] = r[i] / beta;
    std::fill(g.begin(), g.end(), 0.0);
    g[0] = beta;
    int j = 0;
    for (; j < m && total_it < maxiter; ++j, ++total_it) {
      M(V[j], Z[j]);
      A(Z[j], w);
      // modified Gram-Schmidt
      for (int i = 0; i <= j; ++i) {
        double h = dot(w, V[i]);
        H[i * m + j] = h;
        for (int k = 0; k < n; ++k) w[k] -= h * V[i][k];
      }
      double h1 = nrm2(w);
      H[(j + 1) * m + j] = h1;
      if (h1 > 1e-300)
        for (int k = 0; k < n; ++k) V[j + 1][k] = w[k] / h1;
      // apply existing Givens rotations
      for (int i = 0; i < j; ++i) {
        double t = cs[i] * H[i * m + j] + sn[i] * H[(i + 1) * m + j];
        H[(i + 1) * m + j] =
            -sn[i] * H[i * m + j] + cs[i] * H[(i + 1) * m + j];
        H[i * m + j] = t;
      }
      double denom = std::sqrt(H[j * m + j] * H[j * m + j] + h1 * h1);
      if (denom < 1e-300) denom = 1e-300;
      cs[j] = H[j * m + j] / denom;
      sn[j] = H[(j + 1) * m + j] / denom;
      H[j * m + j] = cs[j] * H[j * m + j] + sn[j] * H[(j + 1) * m + j];
      H[(j + 1) * m + j] = 0.0;
      g[j + 1] = -sn[j] * g[j];
      g[j] = cs[j] * g[j];
      info.residual = std::fabs(g[j + 1]);
      if (info.residual <= tol) {
        ++j;
        ++total_it;
        break;
      }
    }
    // back substitution: y = H^{-1} g
    std::vector<double> y(j);
    for (int i = j - 1; i >= 0; --i) {
      double s = g[i];
      for (int k = i + 1; k < j; ++k) s -= H[i * m + k] * y[k];
      y[i] = s / H[i * m + i];
    }
    for (int i = 0; i < j; ++i)
      for (int k = 0; k < n; ++k) x[k] += y[i] * Z[i][k];
    A(x, w);
    for (int i = 0; i < n; ++i) r[i] = b[i] - w[i];
    beta = nrm2(r);
    info.residual = beta;
    info.iterations = total_it;
    if (beta <= tol) {
      info.converged = true;
      return info;
    }
  }
  info.iterations = total_it;
  return info;
}

}  // namespace fem
}  // namespace pdebench
