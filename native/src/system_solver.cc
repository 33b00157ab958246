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
#include "pdebench_assembly.hpp"
#include "pdebench_krylov.hpp"
#include "pdebench_lagrange.hpp"
#include "pdebench_unstructured.hpp"

using pdebench::expr::Expression;
using namespace pdebench::fem;
namespace json = pdebench::json;

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
  else if (spec["domain"].contains("_mesh_file")) {
    // complex 2-D geometry: triangulation imported from the Python
    // bridge; dof numbering / assembly / sampling stay native
    mesh = read_mesh_file(spec["domain"]["_mesh_file"].str());
    mesh.resolution = resolution;
    build_bins(mesh);
  } else {
    std::fprintf(stderr, "native backend: unsupported domain '%s'\n",
                 domain.c_str());
    return 3;
  }
  const int dim = mesh.dim;

  const auto& solver = spec["oracle_solver"];
  double rtol = solver["rtol"].number_or(1e-10);
  double atol = solver["atol"].number_or(1e-12);
  std::string ksp = solver["ksp_type"].str_or("cg");
  // robustness override injected by oracle/cpp_backend.py on
  // default-strength failure (reference: dealii_oracle/oracle.py:503-529)
  const auto& nsol = spec["native_solver"];
  double ilut_tau = nsol["ilut_tau"].number_or(1e-3);
  int ilut_fill = (int)nsol["ilut_fill"].number_or(60);
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
    Space sp = mesh.structured ? build_space(mesh, el)
                           : build_space_unstructured(mesh, el);
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
    Space sp = mesh.structured ? build_space(mesh, el)
                           : build_space_unstructured(mesh, el);
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
    Space sp_u = mesh.structured ? build_space(mesh, el_u)
                                 : build_space_unstructured(mesh, el_u);
    Space sp_p = mesh.structured ? build_space(mesh, el_p)
                                 : build_space_unstructured(mesh, el_p);

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
        ILUT Milut(sys.J, ilut_tau, ilut_fill);
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
