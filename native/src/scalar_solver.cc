// Native scalar oracle binary: poisson / darcy / helmholtz /
// convection_diffusion (steady + transient, residual-based SUPG) /
// heat / wave (Newmark theta=1/4) / reaction_diffusion (linear;
// steady + backward Euler) on structured unit square/cube meshes with
// generic degree-d Lagrange elements. Contract:
// `<solver> <case_spec.json> <outdir>` -> solution_grid.bin (raw
// float64, C-order (ny,nx)/(nz,ny,nx)) + meta.json.
//
// Role parity with the reference's deal.II scalar programs
// (dealii_oracle/programs/{poisson,heat,convection_diffusion,helmholtz,
// reaction_diffusion}.cc + the wave family): FunctionParser-style
// expression coefficients arrive as `_computed_*` sympy strings from
// the Python bridge (dealii_oracle/common.py:104-605 did sympy ->
// muParser; here the evaluator reads sympy syntax directly). SUPG uses
// the full residual term tau (b.grad v)(b.grad u - eps lap u) with
// exact basis hessians, as convection_diffusion.cc:153-220 did via
// update_hessians. SPD systems solve with CG+SSOR(1.2) (poisson.cc
// used SSOR(1.2)); indefinite/nonsymmetric ones with FGMRES + ILUT.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "pdebench_assembly.hpp"
#include "pdebench_expr.hpp"
#include "pdebench_fem.hpp"
#include "pdebench_json.hpp"
#include "pdebench_krylov.hpp"
#include "pdebench_lagrange.hpp"
#include "pdebench_unstructured.hpp"

using pdebench::expr::Expression;
using namespace pdebench::fem;
namespace json = pdebench::json;

static std::string pick(const json::Value& spec, const char* computed,
                        const char* fallback_section, const char* key,
                        const std::string& dflt) {
  const auto& pde = spec["pde"];
  if (pde.contains(computed)) return pde[computed].str();
  if (fallback_section[0] == 0)
    return pde[key].is_null() ? dflt : num_or_str(pde[key], dflt);
  const auto& sec = spec[fallback_section];
  const auto& v = sec[key];
  if (v.is_object()) return num_or_str(v["value"], dflt);
  return num_or_str(v, dflt);
}

static std::string kappa_string(const json::Value& spec) {
  if (spec["pde"].contains("_computed_kappa"))
    return spec["pde"]["_computed_kappa"].str();
  const auto& coeffs = spec["pde"]["coefficients"];
  if (coeffs.contains("kappa")) {
    const auto& kp = coeffs["kappa"];
    if (kp.str_or("") != "") return kp.str();
    if (kp["type"].str_or("constant") == "expr") return kp["expr"].str();
    return num_or_str(kp["value"], "1");
  }
  return "1";
}

// physical laplacians of the basis at quadrature point iq
static void physical_laplacians(const Element& el, const CellGeom& gm,
                                int iq, int dim, std::vector<double>& lap) {
  lap.assign(el.ndofs, 0.0);
  for (int a = 0; a < el.ndofs; ++a) {
    double s = 0;
    for (int r = 0; r < dim; ++r)
      for (int ss = 0; ss < dim; ++ss) {
        double h = el.d2phi[(((size_t)iq * el.ndofs + a) * dim + r) * dim + ss];
        if (h == 0.0) continue;
        for (int d = 0; d < dim; ++d) s += h * gm.jinv[r][d] * gm.jinv[ss][d];
      }
    lap[a] = s;
  }
}

// cell diameter (longest edge)
static double cell_diameter(const Mesh& m, int c) {
  int npc = m.nodes_per_cell;
  double h = 0.0;
  for (int a = 0; a < npc; ++a)
    for (int b = a + 1; b < npc; ++b) {
      double s = 0;
      for (int d = 0; d < m.dim; ++d) {
        double dd = m.coords[m.cells[c][a]][d] - m.coords[m.cells[c][b]][d];
        s += dd * dd;
      }
      h = std::max(h, std::sqrt(s));
    }
  return h;
}

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
  const int degree = (int)spec["fem"]["degree"].int_or(1);

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

  Quadrature q = simplex_quadrature(dim, degree + 2);
  Element el(dim, degree, q);
  Space sp = mesh.structured ? build_space(mesh, el)
                           : build_space_unstructured(mesh, el);
  const int n = sp.ndofs;
  CSR A0 = csr_from_cells(n, scalar_cell_lists(sp, el.ndofs));

  Expression f_expr(pick(spec, "_computed_source", "", "source_term", "0"));
  Expression bc_expr(pick(spec, "_computed_bc", "bc", "dirichlet", "0"));
  Expression kappa(kappa_string(spec));

  const auto& solver = spec["oracle_solver"];
  double rtol = solver["rtol"].number_or(1e-10);
  double atol = solver["atol"].number_or(1e-14);
  std::string ksp = solver["ksp_type"].str_or("cg");
  // robustness override (the reference's dealii driver forces stronger
  // solvers per case, oracle.py:503-529): the python driver
  // (oracle/cpp_backend.py) injects "native_solver" to escalate the
  // ILUT strength / restart length when the default-strength FGMRES
  // stagnates (e.g. high-Pe SUPG systems on complex domains)
  const auto& nsol = spec["native_solver"];
  double ilut_tau = nsol["ilut_tau"].number_or(1e-3);
  int ilut_fill = (int)nsol["ilut_fill"].number_or(60);
  int gmres_restart = (int)nsol["restart"].number_or(200);
  int gmres_maxiter = (int)nsol["maxiter"].number_or(20000);

  std::vector<uint8_t> fixed(sp.dof_boundary.begin(), sp.dof_boundary.end());
  std::vector<double> u(n, 0.0), b(n, 0.0), g(n, 0.0);
  SolveInfo info;
  std::string ksp_used = "cg", pc_used = "ssor";

  auto set_bc = [&](double t) {
    for (int i = 0; i < n; ++i)
      if (fixed[i]) {
        const auto& c = sp.dof_coords[i];
        g[i] = bc_expr(c[0], c[1], c[2], t);
      }
  };

  auto solve_spd = [&](CSR& A) {
    constrain_system(A, b, fixed, g);
    SSOR M(A);
    for (int i = 0; i < n; ++i) u[i] = fixed[i] ? g[i] : u[i];
    info = pcg(
        n,
        [&](const std::vector<double>& x, std::vector<double>& y) {
          A.matvec(x, y);
        },
        b, u,
        [&](const std::vector<double>& r, std::vector<double>& z) {
          M.apply(r, z);
        },
        rtol, atol, 100000);
  };

  auto solve_general = [&](CSR& A) {
    constrain_system(A, b, fixed, g);
    ILUT M(A, ilut_tau, ilut_fill);
    for (int i = 0; i < n; ++i) u[i] = fixed[i] ? g[i] : u[i];
    info = fgmres(
        n,
        [&](const std::vector<double>& x, std::vector<double>& y) {
          A.matvec(x, y);
        },
        b, u,
        [&](const std::vector<double>& r, std::vector<double>& z) {
          M.apply(r, z);
        },
        rtol, atol, gmres_maxiter, gmres_restart);
    ksp_used = "fgmres";
    pc_used = "ilut";
  };

  // generic assemblers ------------------------------------------------------
  auto assemble_kappa_stiffness = [&](CSR& K) {
    std::vector<std::array<double, 3>> gph, xq;
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      cell_qpoints(mesh, (int)c, q, xq);
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      for (int iq = 0; iq < el.nq; ++iq) {
        physical_grads(el, gm, iq, dim, gph);
        double w = q.wts[iq] * gm.scale *
                   kappa(xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
        for (int a = 0; a < el.ndofs; ++a)
          for (int bb = 0; bb < el.ndofs; ++bb) {
            double s = 0;
            for (int d = 0; d < dim; ++d) s += gph[a][d] * gph[bb][d];
            K.add(dofs[a], dofs[bb], w * s);
          }
      }
    }
  };
  auto assemble_mass_q = [&](CSR& M) {
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      for (int iq = 0; iq < el.nq; ++iq) {
        double w = q.wts[iq] * gm.scale;
        const double* phi = &el.phi[(size_t)iq * el.ndofs];
        for (int a = 0; a < el.ndofs; ++a)
          for (int bb = 0; bb < el.ndofs; ++bb)
            M.add(dofs[a], dofs[bb], w * phi[a] * phi[bb]);
      }
    }
  };
  auto load_at = [&](double t, std::vector<double>& out) {
    assemble_load_q(mesh, sp, el, q,
                    [&](double x, double y, double z) {
                      return f_expr(x, y, z, t);
                    },
                    out);
  };

  // time parameters ---------------------------------------------------------
  const auto& tc = spec["pde"]["time"];
  bool transient = !tc.is_null();
  double t0 = tc["t0"].number_or(0.0);
  double t_end, dt;
  int num_steps = 0;
  if (pde_type == "heat") {
    t_end = tc["t_end"].number_or(0.1);
    dt = tc["dt"].number_or(0.01);
    num_steps = std::max((int)((t_end - t0) / dt + 0.5), 1);
  } else if (pde_type == "wave") {
    t_end = tc["t_end"].number_or(0.2);
    dt = tc["dt"].number_or(0.005);
    num_steps = std::max((int)((t_end - t0) / dt + 0.5), 1);
  } else {
    t_end = tc["t_end"].number_or(0.5);
    dt = tc["dt"].number_or(0.01);
    num_steps = std::max((int)std::ceil((t_end - t0) / dt - 1e-9), 1);
  }

  // ---------------------------------------------------------------------
  if (pde_type == "poisson" || pde_type == "darcy" ||
      pde_type == "helmholtz") {
    CSR A = A0;
    assemble_kappa_stiffness(A);
    if (pde_type == "helmholtz") {
      double k = spec["pde"]["pde_params"]["k"].number_or(1.0);
      CSR M = A0;
      assemble_mass_q(M);
      for (size_t p = 0; p < A.data.size(); ++p)
        A.data[p] -= k * k * M.data[p];
    }
    load_at(0.0, b);
    set_bc(0.0);
    if (pde_type == "helmholtz")
      solve_general(A);
    else
      solve_spd(A);
  } else if (pde_type == "convection_diffusion" && !transient) {
    // steady: eps K + advection + SUPG tau (b.grad v)(b.grad u - eps lap u)
    double eps = spec["pde"]["pde_params"]["epsilon"].number_or(1.0);
    auto beta = vec_expr(spec["pde"]["pde_params"]["beta"], dim);
    std::string stab = solver["stabilization"].str_or(
        spec["pde"]["pde_params"]["stabilization"].str_or("none"));
    double alpha = solver["upwind_parameter"].number_or(1.0);
    CSR A = A0;
    std::fill(b.begin(), b.end(), 0.0);
    std::vector<std::array<double, 3>> gph, xq;
    std::vector<double> lap;
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      cell_qpoints(mesh, (int)c, q, xq);
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      // tau from centroid beta + cell diameter
      double cb[3] = {0, 0, 0};
      {
        double cx = 0, cy = 0, cz = 0;
        for (int a = 0; a < mesh.nodes_per_cell; ++a) {
          cx += mesh.coords[mesh.cells[c][a]][0];
          cy += mesh.coords[mesh.cells[c][a]][1];
          cz += mesh.coords[mesh.cells[c][a]][2];
        }
        cx /= mesh.nodes_per_cell;
        cy /= mesh.nodes_per_cell;
        cz /= mesh.nodes_per_cell;
        for (int d = 0; d < dim; ++d) cb[d] = beta[d](cx, cy, cz, 0.0);
      }
      double bnorm = 0;
      for (int d = 0; d < dim; ++d) bnorm += cb[d] * cb[d];
      bnorm = std::sqrt(bnorm);
      double tau = (stab == "supg")
                       ? alpha * cell_diameter(mesh, (int)c) /
                             (2.0 * bnorm + 1e-12)
                       : 0.0;
      for (int iq = 0; iq < el.nq; ++iq) {
        physical_grads(el, gm, iq, dim, gph);
        if (tau > 0) physical_laplacians(el, gm, iq, dim, lap);
        double w = q.wts[iq] * gm.scale;
        const double* phi = &el.phi[(size_t)iq * el.ndofs];
        double bq[3];
        for (int d = 0; d < dim; ++d)
          bq[d] = beta[d](xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
        double fv = f_expr(xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
        for (int a = 0; a < el.ndofs; ++a) {
          double bga = 0;
          for (int d = 0; d < dim; ++d) bga += bq[d] * gph[a][d];
          for (int bb = 0; bb < el.ndofs; ++bb) {
            double diff = 0, bgb = 0;
            for (int d = 0; d < dim; ++d) {
              diff += gph[a][d] * gph[bb][d];
              bgb += bq[d] * gph[bb][d];
            }
            double v = eps * diff + bgb * phi[a];
            if (tau > 0) v += tau * bga * (bgb - eps * lap[bb]);
            A.add(dofs[a], dofs[bb], w * v);
          }
          b[dofs[a]] += w * fv * (phi[a] + tau * bga);
        }
      }
    }
    set_bc(0.0);
    solve_general(A);
  } else if (pde_type == "convection_diffusion" && transient) {
    // backward Euler: (M + dt (eps K + C + SUPG)) u^{n+1} = M u^n + dt f v
    //   + dt tau (b.grad v) f   (reference convection_diffusion.cc
    //   transient path; stabilization residual is spatial-only)
    double eps = spec["pde"]["pde_params"]["epsilon"].number_or(1.0);
    auto beta = vec_expr(spec["pde"]["pde_params"]["beta"], dim);
    std::string stab = solver["stabilization"].str_or(
        spec["pde"]["pde_params"]["stabilization"].str_or("none"));
    double alpha = solver["upwind_parameter"].number_or(1.0);
    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    CSR M = A0, S = A0;  // S = eps K + C + SUPG
    assemble_mass_q(M);
    std::vector<std::array<double, 3>> gph, xq;
    std::vector<double> lap;
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      CellGeom gm;
      gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
      cell_qpoints(mesh, (int)c, q, xq);
      const int* dofs = &sp.cell_dofs[c * el.ndofs];
      double cb[3] = {0, 0, 0};
      {
        double cx = 0, cy = 0, cz = 0;
        for (int a = 0; a < mesh.nodes_per_cell; ++a) {
          cx += mesh.coords[mesh.cells[c][a]][0];
          cy += mesh.coords[mesh.cells[c][a]][1];
          cz += mesh.coords[mesh.cells[c][a]][2];
        }
        cx /= mesh.nodes_per_cell;
        cy /= mesh.nodes_per_cell;
        cz /= mesh.nodes_per_cell;
        for (int d = 0; d < dim; ++d) cb[d] = beta[d](cx, cy, cz, 0.0);
      }
      double bnorm = 0;
      for (int d = 0; d < dim; ++d) bnorm += cb[d] * cb[d];
      bnorm = std::sqrt(bnorm);
      double tau = (stab == "supg")
                       ? alpha * cell_diameter(mesh, (int)c) /
                             (2.0 * bnorm + 1e-12)
                       : 0.0;
      for (int iq = 0; iq < el.nq; ++iq) {
        physical_grads(el, gm, iq, dim, gph);
        if (tau > 0) physical_laplacians(el, gm, iq, dim, lap);
        double w = q.wts[iq] * gm.scale;
        const double* phi = &el.phi[(size_t)iq * el.ndofs];
        double bq[3];
        for (int d = 0; d < dim; ++d)
          bq[d] = beta[d](xq[iq][0], xq[iq][1], xq[iq][2], 0.0);
        for (int a = 0; a < el.ndofs; ++a) {
          double bga = 0;
          for (int d = 0; d < dim; ++d) bga += bq[d] * gph[a][d];
          for (int bb = 0; bb < el.ndofs; ++bb) {
            double diff = 0, bgb = 0;
            for (int d = 0; d < dim; ++d) {
              diff += gph[a][d] * gph[bb][d];
              bgb += bq[d] * gph[bb][d];
            }
            double v = eps * diff + bgb * phi[a];
            if (tau > 0) v += tau * bga * (bgb - eps * lap[bb]);
            S.add(dofs[a], dofs[bb], w * v);
          }
        }
      }
    }
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p)
      A.data[p] = M.data[p] + dt * S.data[p];
    CSR A_full = A;  // unconstrained copy for BC elimination shift
    for (int i = 0; i < n; ++i) {
      const auto& c3 = sp.dof_coords[i];
      u[i] = ic_expr(c3[0], c3[1], c3[2], t0);
    }
    // constrain once
    set_bc(t0);
    CSR A_c = A;
    A_c.constrain(fixed);
    ILUT Milut(A_c, ilut_tau, ilut_fill);
    std::vector<double> Mu(n), fvec(n), gz(n), Ag(n);
    long total_it = 0;
    double t = t0;
    auto beta_tau_rhs = [&](double tnow, std::vector<double>& out) {
      // f v + tau (b.grad v) f via quadrature
      std::fill(out.begin(), out.end(), 0.0);
      std::vector<std::array<double, 3>> gph2, xq2;
      for (size_t c = 0; c < mesh.cells.size(); ++c) {
        CellGeom gm;
        gm.scale = cell_jinv(mesh, (int)c, gm.jinv);
        cell_qpoints(mesh, (int)c, q, xq2);
        const int* dofs = &sp.cell_dofs[c * el.ndofs];
        double cb[3] = {0, 0, 0};
        double cx = 0, cy = 0, cz = 0;
        for (int a = 0; a < mesh.nodes_per_cell; ++a) {
          cx += mesh.coords[mesh.cells[c][a]][0];
          cy += mesh.coords[mesh.cells[c][a]][1];
          cz += mesh.coords[mesh.cells[c][a]][2];
        }
        cx /= mesh.nodes_per_cell;
        cy /= mesh.nodes_per_cell;
        cz /= mesh.nodes_per_cell;
        for (int d = 0; d < dim; ++d) cb[d] = beta[d](cx, cy, cz, 0.0);
        double bnorm = 0;
        for (int d = 0; d < dim; ++d) bnorm += cb[d] * cb[d];
        bnorm = std::sqrt(bnorm);
        double tau = (stab == "supg")
                         ? alpha * cell_diameter(mesh, (int)c) /
                               (2.0 * bnorm + 1e-12)
                         : 0.0;
        for (int iq = 0; iq < el.nq; ++iq) {
          physical_grads(el, gm, iq, dim, gph2);
          double w = q.wts[iq] * gm.scale;
          const double* phi = &el.phi[(size_t)iq * el.ndofs];
          double bq[3];
          for (int d = 0; d < dim; ++d)
            bq[d] = beta[d](xq2[iq][0], xq2[iq][1], xq2[iq][2], 0.0);
          double fv = f_expr(xq2[iq][0], xq2[iq][1], xq2[iq][2], tnow);
          for (int a = 0; a < el.ndofs; ++a) {
            double bga = 0;
            for (int d = 0; d < dim; ++d) bga += bq[d] * gph2[a][d];
            out[dofs[a]] += w * fv * (phi[a] + tau * bga);
          }
        }
      }
    };
    for (int s = 0; s < num_steps; ++s) {
      t += dt;
      beta_tau_rhs(t, fvec);
      M.matvec(u, Mu);
      for (int i = 0; i < n; ++i) b[i] = Mu[i] + dt * fvec[i];
      set_bc(t);
      std::fill(gz.begin(), gz.end(), 0.0);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A_full.matvec(gz, Ag);
      for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) u[i] = g[i];
      info = fgmres(
          n,
          [&](const std::vector<double>& x, std::vector<double>& y) {
            A_c.matvec(x, y);
          },
          b, u,
          [&](const std::vector<double>& r, std::vector<double>& z) {
            Milut.apply(r, z);
          },
          rtol, atol, gmres_maxiter, gmres_restart);
      total_it += info.iterations;
    }
    info.iterations = (int)total_it;
    ksp_used = "fgmres";
    pc_used = "ilut";
  } else if (pde_type == "heat") {
    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    CSR K = A0, M = A0;
    assemble_kappa_stiffness(K);
    assemble_mass_q(M);
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p)
      A.data[p] = M.data[p] + dt * K.data[p];
    CSR A_full = A;
    for (int i = 0; i < n; ++i) {
      const auto& c = sp.dof_coords[i];
      u[i] = ic_expr(c[0], c[1], c[2], t0);
    }
    CSR A_c = A;
    A_c.constrain(fixed);
    SSOR M_pc(A_c);
    std::vector<double> Mu(n), fvec(n), gz(n), Ag(n);
    long total_it = 0;
    double t = t0;
    for (int s = 0; s < num_steps; ++s) {
      t += dt;
      load_at(t, fvec);
      M.matvec(u, Mu);
      for (int i = 0; i < n; ++i) b[i] = Mu[i] + dt * fvec[i];
      set_bc(t);
      std::fill(gz.begin(), gz.end(), 0.0);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A_full.matvec(gz, Ag);
      for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) u[i] = g[i];
      info = pcg(
          n,
          [&](const std::vector<double>& x, std::vector<double>& y) {
            A_c.matvec(x, y);
          },
          b, u,
          [&](const std::vector<double>& r, std::vector<double>& z) {
            M_pc.apply(r, z);
          },
          rtol, atol, 100000);
      total_it += info.iterations;
    }
    info.iterations = (int)total_it;
  } else if (pde_type == "wave") {
    // Newmark/theta scheme, theta = 1/4 (reference oracle/wave.py:34)
    double cw = spec["pde"]["pde_params"]["c"].number_or(1.0);
    double c2w = cw * cw, theta = 0.25, inv_dt2 = 1.0 / (dt * dt);
    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    Expression iv_expr(
        pick(spec, "_computed_iv", "", "initial_velocity", "0"));
    CSR K = A0, M = A0;
    assemble_kappa_stiffness(K);  // kappa defaults to 1
    assemble_mass_q(M);
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p)
      A.data[p] = inv_dt2 * M.data[p] + theta * c2w * K.data[p];
    CSR A_full = A;
    CSR A_c = A;
    A_c.constrain(fixed);
    SSOR M_pc(A_c);
    std::vector<double> un(n), unm1(n), tmp1(n), tmp2(n), fvec(n), gz(n),
        Ag(n);
    for (int i = 0; i < n; ++i) {
      const auto& c3 = sp.dof_coords[i];
      un[i] = ic_expr(c3[0], c3[1], c3[2], t0);
      unm1[i] = un[i] - dt * iv_expr(c3[0], c3[1], c3[2], t0);
    }
    long total_it = 0;
    double t = t0;
    for (int s = 0; s < num_steps; ++s) {
      load_at(t, fvec);  // source at t_n
      for (int i = 0; i < n; ++i) tmp1[i] = 2.0 * un[i] - unm1[i];
      M.matvec(tmp1, b);
      for (int i = 0; i < n; ++i) b[i] *= inv_dt2;
      K.matvec(un, tmp2);
      for (int i = 0; i < n; ++i) b[i] -= (1.0 - 2.0 * theta) * c2w * tmp2[i];
      K.matvec(unm1, tmp2);
      for (int i = 0; i < n; ++i) b[i] += -theta * c2w * tmp2[i] + fvec[i];
      t += dt;
      set_bc(t);
      std::fill(gz.begin(), gz.end(), 0.0);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A_full.matvec(gz, Ag);
      for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      std::vector<double> unew = un;
      for (int i = 0; i < n; ++i)
        if (fixed[i]) unew[i] = g[i];
      info = pcg(
          n,
          [&](const std::vector<double>& x, std::vector<double>& y) {
            A_c.matvec(x, y);
          },
          b, unew,
          [&](const std::vector<double>& r, std::vector<double>& z) {
            M_pc.apply(r, z);
          },
          rtol, atol, 100000);
      total_it += info.iterations;
      unm1 = un;
      un = unew;
    }
    info.iterations = (int)total_it;
    u = un;
  } else if (pde_type == "reaction_diffusion") {
    double eps = spec["pde"]["pde_params"]["epsilon"].number_or(1.0);
    const auto& reaction = spec["pde"]["pde_params"]["reaction"];
    if (reaction["type"].str_or("linear") != "linear") {
      std::fprintf(stderr,
                   "native backend: nonlinear reactions unsupported\n");
      return 3;
    }
    double alpha = reaction["alpha"].number_or(0.0);
    CSR K = A0, M = A0;
    assemble_kappa_stiffness(K);
    assemble_mass_q(M);
    if (!transient) {
      // steady: eps K + alpha M
      CSR A = A0;
      for (size_t p = 0; p < A.data.size(); ++p)
        A.data[p] = eps * K.data[p] + alpha * M.data[p];
      load_at(0.0, b);
      set_bc(0.0);
      solve_spd(A);
    } else {
      Expression ic_expr(
          pick(spec, "_computed_ic", "", "initial_condition", "0"));
      CSR A = A0;
      for (size_t p = 0; p < A.data.size(); ++p)
        A.data[p] =
            (1.0 + dt * alpha) * M.data[p] + dt * eps * K.data[p];
      CSR A_full = A;
      CSR A_c = A;
      A_c.constrain(fixed);
      SSOR M_pc(A_c);
      for (int i = 0; i < n; ++i) {
        const auto& c3 = sp.dof_coords[i];
        u[i] = ic_expr(c3[0], c3[1], c3[2], t0);
      }
      std::vector<double> Mu(n), fvec(n), gz(n), Ag(n);
      long total_it = 0;
      double t = t0;
      for (int s = 0; s < num_steps; ++s) {
        t += dt;
        load_at(t, fvec);
        M.matvec(u, Mu);
        for (int i = 0; i < n; ++i) b[i] = Mu[i] + dt * fvec[i];
        set_bc(t);
        std::fill(gz.begin(), gz.end(), 0.0);
        for (int i = 0; i < n; ++i)
          if (fixed[i]) gz[i] = g[i];
        A_full.matvec(gz, Ag);
        for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
        for (int i = 0; i < n; ++i)
          if (fixed[i]) u[i] = g[i];
        info = pcg(
            n,
            [&](const std::vector<double>& x, std::vector<double>& y) {
              A_c.matvec(x, y);
            },
            b, u,
            [&](const std::vector<double>& r, std::vector<double>& z) {
              M_pc.apply(r, z);
            },
            rtol, atol, 100000);
        total_it += info.iterations;
      }
      info.iterations = (int)total_it;
    }
  } else {
    std::fprintf(stderr, "native backend: unsupported pde '%s'\n",
                 pde_type.c_str());
    return 3;
  }

  GridSpec grid = read_grid(spec);
  auto out = sample_grid(mesh, sp, el, grid, {u.data()});
  double elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                    t_start)
          .count();
  (void)elapsed;
  write_outputs(outdir, out, grid, n, elapsed, resolution, degree,
                ksp_used, pc_used, rtol, info);
  return 0;
}
