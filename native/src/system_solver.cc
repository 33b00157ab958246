// Native system-PDE oracle binary: biharmonic (split two-Poisson),
// linear elasticity (vector Lagrange), Stokes and Navier-Stokes
// (Taylor-Hood, grad-div augmented, Newton) on structured unit
// square/cube meshes. Contract: `<solver> <case_spec.json> <outdir>`,
// writing solution_grid.bin (raw float64, C-order (ny,nx)/(nz,ny,nx))
// + meta.json — the same binary contract as the reference's deal.II
// programs (dealii_oracle/programs/{biharmonic,linear_elasticity,
// stokes,navier_stokes}.cc). Original design: generic-degree Lagrange
// elements via Vandermonde tabulation (pdebench_lagrange.hpp), and
// block-preconditioned FGMRES instead of UMFPACK/MUMPS sparse LU for
// the saddle-point systems (the reference forced direct solvers,
// dealii_oracle/oracle.py:503-513; here ILU(0)-momentum x lumped
// pressure-mass Schur with grad-div gamma=1 plays that role, following
// navier_stokes.cc's augmented-Lagrangian gamma (:383-393)).

#include <chrono>
#include <cstdlib>
#include <cstdio>
#include <memory>
#include <string>
#include <vector>

#include "pdebench_expr.hpp"
#include "pdebench_fem.hpp"
#include "pdebench_json.hpp"
#include "pdebench_krylov.hpp"
#include "pdebench_lagrange.hpp"

using pdebench::expr::Expression;
using namespace pdebench::fem;
namespace json = pdebench::json;

// ---------------------------------------------------------------------------
// spec helpers
// ---------------------------------------------------------------------------

static std::string num_or_str(const json::Value& v, const std::string& dflt) {
  if (v.is_null()) return dflt;
  if (v.is_string()) return v.str();
  char buf[64];
  std::snprintf(buf, sizeof(buf), "%.17g", v.number_or(0.0));
  return buf;
}

// vector of component expressions from a JSON array (or scalar broadcast)
static std::vector<Expression> vec_expr(const json::Value& v, int dim,
                                        const std::string& dflt = "0") {
  std::vector<Expression> out;
  for (int d = 0; d < dim; ++d) {
    if (v.is_array() && v.size() > (size_t)d)
      out.emplace_back(num_or_str(v[d], dflt));
    else
      out.emplace_back(v.is_null() ? dflt : num_or_str(v, dflt));
  }
  return out;
}

struct BCSegment {
  std::string on;
  std::vector<Expression> value;
};

// boundary selector DSL (reference: oracle/stokes.py:40-59)
static bool sel_match(const std::string& on, const std::array<double, 3>& c,
                      int dim, double tol = 1e-12) {
  if (on == "all") return true;
  if (on == "x0") return c[0] < tol;
  if (on == "x1") return c[0] > 1.0 - tol;
  if (on == "y0") return c[1] < tol;
  if (on == "y1") return c[1] > 1.0 - tol;
  if (on == "z0") return dim == 3 && c[2] < tol;
  if (on == "z1") return dim == 3 && c[2] > 1.0 - tol;
  return false;
}

static std::vector<BCSegment> parse_bc(const json::Value& spec, int dim) {
  std::vector<BCSegment> segs;
  const auto& pde = spec["pde"];
  if (pde.contains("_computed_bc")) {
    segs.push_back({"all", vec_expr(pde["_computed_bc"], dim)});
    return segs;
  }
  const auto& d = spec["bc"]["dirichlet"];
  if (d.is_array()) {
    for (size_t i = 0; i < d.size(); ++i)
      segs.push_back(
          {d[i]["on"].str_or("all"), vec_expr(d[i]["value"], dim)});
  } else if (d.is_object()) {
    segs.push_back({d["on"].str_or("all"), vec_expr(d["value"], dim)});
  }
  return segs;
}

// fixed-dof mask + values for one scalar space and one component index
static void apply_bc_component(const Space& sp, int dim,
                               const std::vector<BCSegment>& segs, int comp,
                               int offset, std::vector<uint8_t>& fixed,
                               std::vector<double>& g) {
  for (const auto& seg : segs)
    for (int i = 0; i < sp.ndofs; ++i) {
      if (!sp.dof_boundary[i]) continue;
      const auto& c = sp.dof_coords[i];
      if (!sel_match(seg.on, c, dim)) continue;
      fixed[offset + i] = 1;
      g[offset + i] = seg.value[comp](c[0], c[1], c[2], 0.0);
    }
}

// symmetric Dirichlet elimination of (A, b) given mask+values
static void constrain_system(CSR& A, std::vector<double>& b,
                             const std::vector<uint8_t>& fixed,
                             const std::vector<double>& g) {
  int n = A.n;
  std::vector<double> gz(n, 0.0), Ag(n);
  for (int i = 0; i < n; ++i)
    if (fixed[i]) gz[i] = g[i];
  A.matvec(gz, Ag);
  for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
  A.constrain(fixed);
}

// ---------------------------------------------------------------------------
// generic scalar assembly (degree-d Lagrange)
// ---------------------------------------------------------------------------

struct CellGeom {
  double jinv[3][3];
  double scale;  // |det J| (ref measure folded into quadrature weights)
};

static void physical_grads(const Element& el, const CellGeom& gm, int iq,
                           int dim, std::vector<std::array<double, 3>>& g) {
  g.resize(el.ndofs);
  for (int a = 0; a < el.ndofs; ++a)
    for (int d = 0; d < dim; ++d) {
      double s = 0;
      for (int r = 0; r < dim; ++r)
        s += el.dphi[((size_t)iq * el.ndofs + a) * dim + r] * gm.jinv[r][d];
      g[a][d] = s;
    }
}

static void assemble_laplacian(const Mesh& m, const Space& sp,
                               const Element& el, const Quadrature& q,
                               CSR& K) {
  std::vector<std::array<double, 3>> g;
  for (size_t c = 0; c < m.cells.size(); ++c) {
    CellGeom gm;
    gm.scale = cell_jinv(m, (int)c, gm.jinv);
    const int* dofs = &sp.cell_dofs[c * el.ndofs];
    for (int iq = 0; iq < el.nq; ++iq) {
      physical_grads(el, gm, iq, m.dim, g);
      double w = q.wts[iq] * gm.scale;
      for (int a = 0; a < el.ndofs; ++a)
        for (int b = 0; b < el.ndofs; ++b) {
          double s = 0;
          for (int d = 0; d < m.dim; ++d) s += g[a][d] * g[b][d];
          K.add(dofs[a], dofs[b], w * s);
        }
    }
  }
}

template <class F>
static void assemble_load_q(const Mesh& m, const Space& sp, const Element& el,
                            const Quadrature& q, F f, std::vector<double>& b) {
  std::fill(b.begin(), b.end(), 0.0);
  std::vector<std::array<double, 3>> xq;
  for (size_t c = 0; c < m.cells.size(); ++c) {
    CellGeom gm;
    gm.scale = cell_jinv(m, (int)c, gm.jinv);
    cell_qpoints(m, (int)c, q, xq);
    const int* dofs = &sp.cell_dofs[c * el.ndofs];
    for (int iq = 0; iq < el.nq; ++iq) {
      double w = q.wts[iq] * gm.scale;
      double fv = f(xq[iq][0], xq[iq][1], xq[iq][2]);
      for (int a = 0; a < el.ndofs; ++a)
        b[dofs[a]] += w * fv * el.phi[(size_t)iq * el.ndofs + a];
    }
  }
}

static std::vector<std::vector<int>> scalar_cell_lists(const Space& sp,
                                                       int npc) {
  std::vector<std::vector<int>> lists(sp.cell_dofs.size() / npc);
  for (size_t c = 0; c < lists.size(); ++c)
    lists[c].assign(sp.cell_dofs.begin() + c * npc,
                    sp.cell_dofs.begin() + (c + 1) * npc);
  return lists;
}

// ---------------------------------------------------------------------------
// output grid sampling
// ---------------------------------------------------------------------------

struct GridSpec {
  int nx, ny, nz;
  double x0, x1, y0, y1, z0, z1;
};

static GridSpec read_grid(const json::Value& spec) {
  const auto& grid = spec["output"]["grid"];
  GridSpec g;
  g.nx = (int)grid["nx"].int_or(50);
  g.ny = (int)grid["ny"].int_or(50);
  g.nz = (int)grid["nz"].int_or(0);
  const auto& bbox = grid["bbox"];
  g.x0 = bbox[0].number_or(0);
  g.x1 = bbox[1].number_or(1);
  g.y0 = bbox[2].number_or(0);
  g.y1 = bbox[3].number_or(1);
  g.z0 = g.nz > 0 ? bbox[4].number_or(0) : 0;
  g.z1 = g.nz > 0 ? bbox[5].number_or(1) : 1;
  return g;
}

// sample: fields = per-component dof vectors over sp; writes magnitude
// (1 field: the value itself)
static std::vector<double> sample_grid(const Mesh& m, const Space& sp,
                                       const Element& el, const GridSpec& g,
                                       const std::vector<const double*>& fields) {
  int nz = std::max(g.nz, 1);
  std::vector<double> out((size_t)nz * g.ny * g.nx);
  for (int kz = 0; kz < nz; ++kz)
    for (int jy = 0; jy < g.ny; ++jy)
      for (int ix = 0; ix < g.nx; ++ix) {
        double x = g.x0 + (g.x1 - g.x0) * (g.nx > 1 ? (double)ix / (g.nx - 1) : 0);
        double y = g.y0 + (g.y1 - g.y0) * (g.ny > 1 ? (double)jy / (g.ny - 1) : 0);
        double z = g.nz > 0
                       ? g.z0 + (g.z1 - g.z0) * (g.nz > 1 ? (double)kz / (g.nz - 1) : 0)
                       : 0.0;
        int c = locate_cell(m, x, y, z);
        double xi[3];
        local_coords(m, c, x, y, z, xi);
        const int* dofs = &sp.cell_dofs[(size_t)c * el.ndofs];
        double mag2 = 0, last = 0;
        for (const double* u : fields) {
          double s = 0;
          for (int a = 0; a < el.ndofs; ++a)
            s += u[dofs[a]] * el.eval_basis(a, xi[0], xi[1], xi[2]);
          mag2 += s * s;
          last = s;
        }
        // one field: signed value; several: magnitude
        out[((size_t)kz * g.ny + jy) * g.nx + ix] =
            fields.size() == 1 ? last : std::sqrt(mag2);
      }
  return out;
}

static void write_outputs(const std::string& outdir,
                          const std::vector<double>& out, const GridSpec& g,
                          int num_dofs, double elapsed, int resolution,
                          int degree, const std::string& ksp,
                          const std::string& pc, double rtol,
                          const SolveInfo& info) {
  std::FILE* fb = std::fopen((outdir + "/solution_grid.bin").c_str(), "wb");
  if (!fb) std::exit(4);
  std::fwrite(out.data(), sizeof(double), out.size(), fb);
  std::fclose(fb);
  std::FILE* fm = std::fopen((outdir + "/meta.json").c_str(), "w");
  std::fprintf(fm,
               "{\"nx\": %d, \"ny\": %d, \"nz\": %d, \"num_dofs\": %d, "
               "\"baseline_time\": %.6f, \"solver_info\": {"
               "\"mesh_resolution\": %d, \"element_degree\": %d, "
               "\"ksp_type\": \"%s\", \"pc_type\": \"%s\", "
               "\"rtol\": %g, \"iterations\": %d, \"residual\": %g, "
               "\"converged\": %s}}\n",
               g.nx, g.ny, g.nz, num_dofs, elapsed, resolution, degree,
               ksp.c_str(), pc.c_str(), rtol, info.iterations, info.residual,
               info.converged ? "true" : "false");
  std::fclose(fm);
}

// ---------------------------------------------------------------------------
// flow solver (Stokes / Navier-Stokes): Taylor-Hood + grad-div, Newton,
// FGMRES with block-triangular ILU(0)/pressure-mass preconditioner
// ---------------------------------------------------------------------------

struct FlowSystem {
  const Mesh* mesh;
  const Quadrature* q;
  const Element *el_u, *el_p;
  const Space *sp_u, *sp_p;
  int dim, nu_sp, np_sp, nvel, ntot;
  double nu = 1.0, gamma = 1.0;
  bool convection = false;
  std::vector<Expression>* f_expr;
  CSR J;                     // full saddle Jacobian (pattern reused)
  std::vector<double> mp;    // lumped pressure mass
  std::vector<uint8_t> fixed;
  std::vector<double> gbc;
  int p_pin;                 // pinned pressure dof (global index)

  // per-cell scratch
  std::vector<std::array<double, 3>> gu, gp, xq;

  void residual_and_jacobian(const std::vector<double>& U,
                             std::vector<double>& F, bool with_J) {
    int ndu = el_u->ndofs, ndp = el_p->ndofs;
    std::fill(F.begin(), F.end(), 0.0);
    if (with_J) std::fill(J.data.begin(), J.data.end(), 0.0);
    for (size_t c = 0; c < mesh->cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(*mesh, (int)c, gm.jinv);
      cell_qpoints(*mesh, (int)c, *q, xq);
      const int* du = &sp_u->cell_dofs[c * ndu];
      const int* dp = &sp_p->cell_dofs[c * ndp];
      for (int iq = 0; iq < el_u->nq; ++iq) {
        physical_grads(*el_u, gm, iq, dim, gu);
        double w = q->wts[iq] * gm.scale;
        const double* phiu = &el_u->phi[(size_t)iq * ndu];
        const double* phip = &el_p->phi[(size_t)iq * ndp];
        // field values at qpt
        double uq[3] = {0, 0, 0}, gradu[3][3] = {{0}}, pq = 0;
        for (int i = 0; i < dim; ++i)
          for (int a = 0; a < ndu; ++a) {
            double ua = U[(size_t)i * nu_sp + du[a]];
            uq[i] += ua * phiu[a];
            for (int d = 0; d < dim; ++d) gradu[i][d] += ua * gu[a][d];
          }
        for (int cc = 0; cc < ndp; ++cc) pq += U[nvel + dp[cc]] * phip[cc];
        double divu = 0;
        for (int d = 0; d < dim; ++d) divu += gradu[d][d];
        double fq[3];
        for (int i = 0; i < dim; ++i)
          fq[i] = (*f_expr)[i](xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
        // residual
        for (int a = 0; a < ndu; ++a)
          for (int i = 0; i < dim; ++i) {
            double r = 0;
            for (int d = 0; d < dim; ++d) r += nu * gradu[i][d] * gu[a][d];
            if (convection) {
              double conv = 0;
              for (int d = 0; d < dim; ++d) conv += uq[d] * gradu[i][d];
              r += conv * phiu[a];
            }
            r += gamma * divu * gu[a][i];
            r -= pq * gu[a][i];
            r -= fq[i] * phiu[a];
            F[(size_t)i * nu_sp + du[a]] += w * r;
          }
        for (int cc = 0; cc < ndp; ++cc)
          F[nvel + dp[cc]] += w * (-divu * phip[cc]);
        if (!with_J) continue;
        // Jacobian
        for (int a = 0; a < ndu; ++a) {
          for (int b = 0; b < ndu; ++b) {
            double lap = 0, ugb = 0;
            for (int d = 0; d < dim; ++d) lap += gu[a][d] * gu[b][d];
            if (convection)
              for (int d = 0; d < dim; ++d) ugb += uq[d] * gu[b][d];
            for (int i = 0; i < dim; ++i)
              for (int jj = 0; jj < dim; ++jj) {
                double v = gamma * gu[a][i] * gu[b][jj];
                if (i == jj) {
                  v += nu * lap;
                  if (convection) v += ugb * phiu[a];
                }
                if (convection) v += phiu[a] * phiu[b] * gradu[i][jj];
                if (v != 0.0)
                  J.add((size_t)i * nu_sp + du[a],
                        (size_t)jj * nu_sp + du[b], w * v);
              }
          }
          for (int cc = 0; cc < ndp; ++cc)
            for (int i = 0; i < dim; ++i) {
              J.add((size_t)i * nu_sp + du[a], nvel + dp[cc],
                    -w * gu[a][i] * phip[cc]);
              J.add(nvel + dp[cc], (size_t)i * nu_sp + du[a],
                    -w * gu[a][i] * phip[cc]);
            }
        }
      }
    }
    // constrain residual rows
    for (int i = 0; i < ntot; ++i)
      if (fixed[i]) F[i] = 0.0;
    if (with_J) J.constrain(fixed);
  }

  double res_norm(const std::vector<double>& U, std::vector<double>& F) {
    residual_and_jacobian(U, F, false);
    return nrm2(F);
  }
};

// ---------------------------------------------------------------------------
// main
// ---------------------------------------------------------------------------

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s case_spec.json outdir\n", argv[0]);
    return 2;
  }
  auto t_start = std::chrono::steady_clock::now();
  auto spec = json::parse_file(argv[1]);
  std::string outdir = argv[2];

  const std::string pde_type = spec["pde"]["type"].str();
  const std::string domain = spec["domain"]["type"].str();
  const int resolution = (int)spec["mesh"]["resolution"].int_or(32);

  Mesh mesh;
  if (domain == "unit_square")
    mesh = unit_square_mesh(resolution);
  else if (domain == "unit_cube")
    mesh = unit_cube_mesh(resolution);
  else {
    std::fprintf(stderr, "native backend: unsupported domain '%s'\n",
                 domain.c_str());
    return 3;
  }
  const int dim = mesh.dim;

  const auto& solver = spec["oracle_solver"];
  double rtol = solver["rtol"].number_or(1e-10);
  double atol = solver["atol"].number_or(1e-12);
  std::string ksp = solver["ksp_type"].str_or("cg");
  GridSpec grid = read_grid(spec);

  auto elapsed = [&]() {
    return std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                         t_start)
        .count();
  };

  if (pde_type == "biharmonic") {
    // split: -lap w = f with w = -lap(u_exact) on boundary; -lap u = w_h
    // (reference: oracle/biharmonic.py:1-13, programs/biharmonic.cc)
    int degree = (int)spec["fem"]["degree"].int_or(1);
    Quadrature q = simplex_quadrature(dim, degree + 2);
    Element el(dim, degree, q);
    Space sp = build_space(mesh, el);
    int n = sp.ndofs;
    CSR K0 = csr_from_cells(n, scalar_cell_lists(sp, el.ndofs));
    assemble_laplacian(mesh, sp, el, q, K0);

    Expression f_expr(num_or_str(
        spec["pde"].contains("_computed_source")
            ? spec["pde"]["_computed_source"]
            : spec["pde"]["source_term"],
        "0"));
    Expression ubc(num_or_str(spec["pde"].contains("_computed_bc")
                                  ? spec["pde"]["_computed_bc"]
                                  : spec["bc"]["dirichlet"]["value"],
                              "0"));
    Expression wbc(num_or_str(spec["pde"]["_computed_bc_lap"], "0"));

    std::vector<double> b(n), w_h(n, 0.0), u(n, 0.0), g(n, 0.0);
    std::vector<uint8_t> fixed(sp.dof_boundary.begin(), sp.dof_boundary.end());

    // pass 1: -lap w = f
    assemble_load_q(mesh, sp, el, q,
                    [&](double x, double y, double z) {
                      return f_expr(x, y, z, 0.0);
                    },
                    b);
    for (int i = 0; i < n; ++i)
      if (fixed[i]) {
        const auto& c = sp.dof_coords[i];
        g[i] = wbc(c[0], c[1], c[2], 0.0);
      }
    CSR K1 = K0;
    constrain_system(K1, b, fixed, g);
    SSOR M1(K1);
    for (int i = 0; i < n; ++i) w_h[i] = fixed[i] ? g[i] : 0.0;
    SolveInfo info = pcg(
        n, [&](const std::vector<double>& x, std::vector<double>& y) { K1.matvec(x, y); },
        b, w_h,
        [&](const std::vector<double>& r, std::vector<double>& z) { M1.apply(r, z); },
        rtol, atol, 100000);

    // pass 2: -lap u = w_h  (rhs = mass-weighted w_h via quadrature)
    std::fill(b.begin(), b.end(), 0.0);
    {
      std::vector<std::array<double, 3>> xq;
      for (size_t c = 0; c < mesh.cells.size(); ++c) {
        CellGeom gm;
        gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
        const int* dofs = &sp.cell_dofs[c * el.ndofs];
        for (int iq = 0; iq < el.nq; ++iq) {
          double wq = q.wts[iq] * gm.scale;
          double wv = 0;
          for (int a = 0; a < el.ndofs; ++a)
            wv += w_h[dofs[a]] * el.phi[(size_t)iq * el.ndofs + a];
          for (int a = 0; a < el.ndofs; ++a)
            b[dofs[a]] += wq * wv * el.phi[(size_t)iq * el.ndofs + a];
        }
      }
    }
    for (int i = 0; i < n; ++i)
      if (fixed[i]) {
        const auto& c = sp.dof_coords[i];
        g[i] = ubc(c[0], c[1], c[2], 0.0);
      }
    CSR K2 = K0;
    constrain_system(K2, b, fixed, g);
    SSOR M2(K2);
    for (int i = 0; i < n; ++i) u[i] = fixed[i] ? g[i] : 0.0;
    SolveInfo info2 = pcg(
        n, [&](const std::vector<double>& x, std::vector<double>& y) { K2.matvec(x, y); },
        b, u,
        [&](const std::vector<double>& r, std::vector<double>& z) { M2.apply(r, z); },
        rtol, atol, 100000);
    info.iterations += info2.iterations;
    info.residual = info2.residual;
    info.converged = info.converged && info2.converged;

    auto out = sample_grid(mesh, sp, el, grid, {u.data()});
    write_outputs(outdir, out, grid, n, elapsed(), resolution, degree, "cg",
                  "ssor", rtol, info);
    return 0;
  }

  if (pde_type == "linear_elasticity") {
    int degree = (int)spec["fem"]["degree"].int_or(1);
    Quadrature q = simplex_quadrature(dim, degree + 2);
    Element el(dim, degree, q);
    Space sp = build_space(mesh, el);
    int nsp = sp.ndofs, n = dim * nsp;
    // Lame parameters (plane strain), reference:
    // oracle/linear_elasticity.py:28-35
    const auto& pp = spec["pde"]["pde_params"];
    double lam, mu;
    if (pp.contains("lambda")) {
      lam = pp["lambda"].number_or(1.0);
      mu = pp["mu"].number_or(1.0);
    } else {
      double E = pp["E"].number_or(1.0), nu_p = pp["nu"].number_or(0.3);
      mu = E / (2.0 * (1.0 + nu_p));
      lam = E * nu_p / ((1.0 + nu_p) * (1.0 - 2.0 * nu_p));
    }
    // block dof layout: comp*nsp + i
    std::vector<std::vector<int>> lists(mesh.cells.size());
    for (size_t c = 0; c < mesh.cells.size(); ++c)
      for (int comp = 0; comp < dim; ++comp)
        for (int a = 0; a < el.ndofs; ++a)
          lists[c].push_back(comp * nsp + sp.cell_dofs[c * el.ndofs + a]);
    CSR A = csr_from_cells(n, lists);
    std::vector<double> b(n, 0.0);
    auto f_comp =
        vec_expr(spec["pde"].contains("_computed_source")
                     ? spec["pde"]["_computed_source"]
                     : spec["pde"]["source_term"],
                 dim);
    std::vector<std::array<double, 3>> gph, xq;
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      cell_qpoints(mesh, (int)c, q, xq);
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      for (int iq = 0; iq < el.nq; ++iq) {
        physical_grads(el, gm, iq, dim, gph);
        double w = q.wts[iq] * gm.scale;
        const double* phi = &el.phi[(size_t)iq * el.ndofs];
        for (int a = 0; a < el.ndofs; ++a)
          for (int bb = 0; bb < el.ndofs; ++bb) {
            double lap = 0;
            for (int d = 0; d < dim; ++d) lap += gph[a][d] * gph[bb][d];
            for (int i = 0; i < dim; ++i)
              for (int j = 0; j < dim; ++j) {
                // sigma(u):eps(v): mu(delta_ij grad.grad + djphi_a diphi_b)
                // + lam diphi_a djphi_b
                double v = mu * gph[a][j] * gph[bb][i] +
                           lam * gph[a][i] * gph[bb][j];
                if (i == j) v += mu * lap;
                A.add(i * nsp + dofs[a], j * nsp + dofs[bb], w * v);
              }
          }
        for (int a = 0; a < el.ndofs; ++a)
          for (int i = 0; i < dim; ++i) {
            double fv = f_comp[i](xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
            b[i * nsp + dofs[a]] += w * fv * phi[a];
          }
      }
    }
    auto segs = parse_bc(spec, dim);
    std::vector<uint8_t> fixed(n, 0);
    std::vector<double> g(n, 0.0);
    for (int comp = 0; comp < dim; ++comp)
      apply_bc_component(sp, dim, segs, comp, comp * nsp, fixed, g);
    constrain_system(A, b, fixed, g);
    std::vector<double> u(n, 0.0);
    for (int i = 0; i < n; ++i)
      if (fixed[i]) u[i] = g[i];
    SolveInfo info;
    std::string pc_used;
    if (ksp == "gmres") {
      ILU0 M(A);
      info = fgmres(
          n, [&](const std::vector<double>& x, std::vector<double>& y) { A.matvec(x, y); },
          b, u,
          [&](const std::vector<double>& r, std::vector<double>& z) { M.apply(r, z); },
          rtol, atol, 20000, 150);
      pc_used = "ilu";
    } else {
      SSOR M(A);
      info = pcg(
          n, [&](const std::vector<double>& x, std::vector<double>& y) { A.matvec(x, y); },
          b, u,
          [&](const std::vector<double>& r, std::vector<double>& z) { M.apply(r, z); },
          rtol, atol, 50000);
      pc_used = "ssor";
    }
    std::vector<const double*> comps;
    for (int i = 0; i < dim; ++i) comps.push_back(u.data() + (size_t)i * nsp);
    auto out = sample_grid(mesh, sp, el, grid, comps);
    write_outputs(outdir, out, grid, n, elapsed(), resolution, degree,
                  ksp.c_str(), pc_used, rtol, info);
    return 0;
  }

  if (pde_type == "stokes" || pde_type == "navier_stokes") {
    int deg_u = (int)spec["fem"]["degree_u"].int_or(2);
    int deg_p = (int)spec["fem"]["degree_p"].int_or(1);
    double nu_target = spec["pde"]["pde_params"]["nu"].number_or(1.0);
    Quadrature q = simplex_quadrature(dim, deg_u + 2);
    Element el_u(dim, deg_u, q), el_p(dim, deg_p, q);
    Space sp_u = build_space(mesh, el_u), sp_p = build_space(mesh, el_p);

    FlowSystem sys;
    sys.mesh = &mesh;
    sys.q = &q;
    sys.el_u = &el_u;
    sys.el_p = &el_p;
    sys.sp_u = &sp_u;
    sys.sp_p = &sp_p;
    sys.dim = dim;
    sys.nu_sp = sp_u.ndofs;
    sys.np_sp = sp_p.ndofs;
    sys.nvel = dim * sp_u.ndofs;
    sys.ntot = sys.nvel + sp_p.ndofs;
    // gamma=0: with an ILUT factorization of the full saddle matrix the
    // augmented-Lagrangian grad-div term (reference navier_stokes.cc
    // gamma=1, paired with exact MUMPS LU) only degrades the incomplete
    // factorization; the Schur fill forms naturally in the pressure rows.
    sys.gamma = 0.0;
    int n = sys.ntot;

    auto f_comp =
        vec_expr(spec["pde"].contains("_computed_source")
                     ? spec["pde"]["_computed_source"]
                     : spec["pde"]["source_term"],
                 dim);
    sys.f_expr = &f_comp;

    // saddle CSR pattern
    std::vector<std::vector<int>> lists(mesh.cells.size());
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      for (int comp = 0; comp < dim; ++comp)
        for (int a = 0; a < el_u.ndofs; ++a)
          lists[c].push_back(comp * sp_u.ndofs +
                             sp_u.cell_dofs[c * el_u.ndofs + a]);
      for (int a = 0; a < el_p.ndofs; ++a)
        lists[c].push_back(sys.nvel + sp_p.cell_dofs[c * el_p.ndofs + a]);
    }
    sys.J = csr_from_cells(n, lists);

    // lumped pressure mass
    sys.mp.assign(sp_p.ndofs, 0.0);
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      const int* dp = &sp_p.cell_dofs[c * el_p.ndofs];
      for (int iq = 0; iq < el_p.nq; ++iq) {
        double w = q.wts[iq] * gm.scale;
        for (int a = 0; a < el_p.ndofs; ++a)
          sys.mp[dp[a]] += w * el_p.phi[(size_t)iq * el_p.ndofs + a];
      }
    }

    // BCs: velocity components; pressure pinned at dof 0
    auto segs = parse_bc(spec, dim);
    sys.fixed.assign(n, 0);
    sys.gbc.assign(n, 0.0);
    for (int comp = 0; comp < dim; ++comp)
      apply_bc_component(sp_u, dim, segs, comp, comp * sp_u.ndofs, sys.fixed,
                         sys.gbc);
    sys.p_pin = sys.nvel;  // first pressure dof
    sys.fixed[sys.p_pin] = 1;
    sys.gbc[sys.p_pin] = 0.0;

    std::vector<double> U(n, 0.0), F(n), delta(n), rhs(n), Utrial(n);
    for (int i = 0; i < n; ++i)
      if (sys.fixed[i]) U[i] = sys.gbc[i];

    SolveInfo lin_info;
    long total_lin = 0;
    int newton_steps = 0;
    bool nl_converged = true;

    auto newton_solve = [&](double nu_now, bool convection, double nl_rtol,
                            double nl_atol, int max_it,
                            double linear_rtol = -1.0) {
      sys.nu = nu_now;
      sys.convection = convection;
      double f0 = -1.0;
      for (int it = 0; it < max_it; ++it) {
        sys.residual_and_jacobian(U, F, true);
        double fn = nrm2(F);
        if (f0 < 0) f0 = std::max(fn, 1e-300);
        if (fn <= std::max(nl_rtol * f0, nl_atol)) return true;
        // linear solve J delta = -F
        for (int i = 0; i < n; ++i) rhs[i] = -F[i];
        std::fill(delta.begin(), delta.end(), 0.0);
        // ILUT of the full (constrained) saddle Jacobian: velocity-first
        // ordering lets the pressure rows accumulate Schur fill
        auto t_ilut0 = std::chrono::steady_clock::now();
        ILUT Milut(sys.J, 1e-3, 60);
        if (std::getenv("PDEBENCH_NATIVE_VERBOSE"))
          std::fprintf(stderr, "[newton] |F|=%.3e ilut_build=%.2fs nnz=%zu\n",
                       fn,
                       std::chrono::duration<double>(
                           std::chrono::steady_clock::now() - t_ilut0)
                           .count(),
                       Milut.nnz());
        // inexact-Newton forcing: eta = min(1e-4, 0.1*rel), floored at
        // 1e-6 (a fixed eta<1 still converges; avoids 1e-10 inner solves).
        // Linear problems (Stokes) use the requested solver rtol directly.
        double lin_rtol =
            convection ? std::max(std::min(1e-4, 0.1 * fn / f0), 1e-6)
                       : (linear_rtol > 0 ? linear_rtol : rtol);
        lin_info = fgmres(
            n,
            [&](const std::vector<double>& x, std::vector<double>& y) {
              sys.J.matvec(x, y);
            },
            rhs, delta,
            [&](const std::vector<double>& r, std::vector<double>& z) {
              Milut.apply(r, z);
            },
            lin_rtol, 1e-14, 2000, 150);
        total_lin += lin_info.iterations;
        if (std::getenv("PDEBENCH_NATIVE_VERBOSE"))
          std::fprintf(stderr, "[newton] lin its=%d res=%.2e rtol=%.1e\n",
                       lin_info.iterations, lin_info.residual, lin_rtol);
        // backtracking line search
        double alpha = 1.0;
        bool accepted = false;
        for (int ls = 0; ls < 12; ++ls) {
          for (int i = 0; i < n; ++i) Utrial[i] = U[i] + alpha * delta[i];
          double ft = sys.res_norm(Utrial, F);
          if (ft < (1.0 - 1e-4 * alpha) * fn || !convection) {
            U = Utrial;
            accepted = true;
            break;
          }
          alpha *= 0.5;
        }
        ++newton_steps;
        if (!accepted) return false;
        if (!convection) {
          // linear problem: single step
          sys.residual_and_jacobian(U, F, false);
          return true;
        }
      }
      sys.residual_and_jacobian(U, F, false);
      return nrm2(F) <= std::max(nl_rtol * f0, nl_atol);
    };

    double nl_rtol = solver["rtol"].number_or(1e-10);
    double nl_atol = solver["atol"].number_or(1e-12);
    int max_it = (int)solver["max_it"].int_or(30);

    if (pde_type == "stokes") {
      nl_converged = newton_solve(nu_target, false, nl_rtol, nl_atol, 2);
    } else {
      std::string init = solver["init"].str_or("stokes");
      if (init == "continuation") {
        double nu_start =
            solver["continuation_nu_start"].number_or(10.0 * nu_target);
        int steps = (int)solver["continuation_steps"].int_or(6);
        newton_solve(nu_start, false, nl_rtol, nl_atol, 2, 1e-8);  // stokes at nu0
        for (int s = 0; s < steps; ++s) {
          double frac = (double)(s + 1) / steps;
          double nu_s = nu_start * std::pow(nu_target / nu_start, frac);
          nl_converged =
              newton_solve(nu_s, true, (s + 1 == steps) ? nl_rtol : 1e-6,
                           (s + 1 == steps) ? nl_atol : 1e-8, max_it);
        }
      } else {
        if (init != "zero")
          newton_solve(nu_target, false, nl_rtol, nl_atol, 2, 1e-8);  // stokes init
        nl_converged = newton_solve(nu_target, true, nl_rtol, nl_atol, max_it);
      }
    }

    lin_info.iterations = (int)total_lin;
    lin_info.converged = nl_converged;
    lin_info.residual = nrm2(F);

    std::vector<const double*> comps;
    for (int i = 0; i < dim; ++i)
      comps.push_back(U.data() + (size_t)i * sp_u.ndofs);
    auto out = sample_grid(mesh, sp_u, el_u, grid, comps);
    write_outputs(outdir, out, grid, n, elapsed(), resolution, deg_u,
                  "fgmres", "block_ilu_schur", rtol, lin_info);
    return 0;
  }

  std::fprintf(stderr, "native backend: unsupported pde '%s'\n",
               pde_type.c_str());
  return 3;
}
