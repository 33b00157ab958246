// Native scalar oracle binary: poisson / helmholtz / heat (P1, unit
// square or cube), contract `<solver> <case_spec.json> <outdir>`.
//
// Expects the Python bridge to inject derived expression strings
// (_computed_source, _computed_bc, _computed_ic) the way the reference
// preprocessed specs for its deal.II binaries
// (dealii_oracle/common.py:104-605); falls back to the literal
// source_term / bc when absent. Writes solution_grid.bin (raw float64,
// C-order (ny, nx) / (nz, ny, nx)) + meta.json.

#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

#include "pdebench_expr.hpp"
#include "pdebench_fem.hpp"
#include "pdebench_json.hpp"

using pdebench::expr::Expression;
using namespace pdebench::fem;
namespace json = pdebench::json;

static std::string pick(const json::Value& spec, const char* computed,
                        const char* fallback_section, const char* key,
                        const std::string& dflt) {
  const auto& pde = spec["pde"];
  if (pde.contains(computed)) return pde[computed].str();
  if (fallback_section[0] == 0)
    return pde[key].is_null() ? dflt : pde[key].str_or(dflt);
  const auto& sec = spec[fallback_section];
  const auto& v = sec[key];
  if (v.is_object()) return v["value"].str_or(dflt);
  return v.str_or(dflt);
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
  int n = (int)mesh.coords.size();

  Expression f_expr(pick(spec, "_computed_source", "", "source_term", "0"));
  Expression bc_expr(pick(spec, "_computed_bc", "bc", "dirichlet", "0"));

  const auto& solver = spec["oracle_solver"];
  double rtol = solver["rtol"].number_or(1e-10);
  double atol = solver["atol"].number_or(1e-14);
  std::string ksp = solver["ksp_type"].str_or("cg");

  std::vector<uint8_t> fixed(n, 0);
  for (int i = 0; i < n; ++i) fixed[i] = on_boundary(mesh, i);

  std::vector<double> u(n, 0.0);
  SolveInfo info;
  double t_now = 0.0;

  auto constrain_system = [&](CSR& A, std::vector<double>& b,
                              const std::vector<double>& g) {
    // b -= A[:, fixed] g ; then zero rows/cols
    std::vector<double> gz(n, 0.0);
    for (int i = 0; i < n; ++i)
      if (fixed[i]) gz[i] = g[i];
    std::vector<double> Ag(n);
    A.matvec(gz, Ag);
    for (int i = 0; i < n; ++i) b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
    A.constrain(fixed);
  };

  if (pde_type == "convection_diffusion" &&
      spec["pde"]["time"].is_null()) {
    // steady CD: eps K + C (+ P1 SUPG: tau (b.grad v)(b.grad u))
    double eps = spec["pde"]["pde_params"]["epsilon"].number_or(1.0);
    double bx = spec["pde"]["pde_params"]["beta"][0].number_or(0.0);
    double by = spec["pde"]["pde_params"]["beta"][1].number_or(0.0);
    std::string stab = solver["stabilization"].str_or(
        spec["pde"]["pde_params"]["stabilization"].str_or("none"));
    double alpha = solver["upwind_parameter"].number_or(1.0);
    double bnorm = std::sqrt(bx * bx + by * by);

    CSR A = CSR::from_pattern(mesh);
    double grads[4][3];
    int npc = mesh.nodes_per_cell;
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      double vol = cell_grads(mesh, (int)c, grads);
      // cell diameter (longest edge) for tau
      double h = 0.0;
      for (int a = 0; a < npc; ++a)
        for (int b2 = a + 1; b2 < npc; ++b2) {
          double dx = mesh.coords[mesh.cells[c][a]][0] -
                      mesh.coords[mesh.cells[c][b2]][0];
          double dy = mesh.coords[mesh.cells[c][a]][1] -
                      mesh.coords[mesh.cells[c][b2]][1];
          h = std::max(h, std::sqrt(dx * dx + dy * dy));
        }
      double tau =
          (stab == "supg") ? alpha * h / (2.0 * bnorm + 1e-12) : 0.0;
      for (int a = 0; a < npc; ++a) {
        double bga = bx * grads[a][0] + by * grads[a][1];
        for (int b2 = 0; b2 < npc; ++b2) {
          double bgb = bx * grads[b2][0] + by * grads[b2][1];
          double diff = 0;
          for (int d = 0; d < mesh.dim; ++d)
            diff += grads[a][d] * grads[b2][d];
          // advection (b.grad u) v with nodal v quadrature: v_a -> vol/npc
          double adv = bgb * vol / npc;
          A.add(mesh.cells[c][a], mesh.cells[c][b2],
                eps * diff * vol + adv + tau * bga * bgb * vol);
        }
      }
    }
    std::vector<double> b(n);
    // rhs: f v + tau (b.grad v) f (SUPG-consistent), edge-midpoint rule
    std::fill(b.begin(), b.end(), 0.0);
    for (size_t c = 0; c < mesh.cells.size(); ++c) {
      double vol = cell_grads(mesh, (int)c, grads);
      double h = 0.0;
      for (int a = 0; a < npc; ++a)
        for (int b2 = a + 1; b2 < npc; ++b2) {
          double dx = mesh.coords[mesh.cells[c][a]][0] -
                      mesh.coords[mesh.cells[c][b2]][0];
          double dy = mesh.coords[mesh.cells[c][a]][1] -
                      mesh.coords[mesh.cells[c][b2]][1];
          h = std::max(h, std::sqrt(dx * dx + dy * dy));
        }
      double tau =
          (stab == "supg") ? alpha * h / (2.0 * bnorm + 1e-12) : 0.0;
      const auto& cell = mesh.cells[c];
      for (int e = 0; e < 3; ++e) {
        int va = cell[(e + 1) % 3], vb = cell[(e + 2) % 3];
        double mx = 0.5 * (mesh.coords[va][0] + mesh.coords[vb][0]);
        double my = 0.5 * (mesh.coords[va][1] + mesh.coords[vb][1]);
        double fv = f_expr(mx, my, 0.0, 0.0) * vol / 3.0;
        // phi weights 1/2 at the two adjacent vertices; grad phi constant
        for (int a : {va, vb}) b[a] += 0.5 * fv;
        for (int a = 0; a < 3; ++a) {
          double bga = bx * grads[a][0] + by * grads[a][1];
          b[cell[a]] += tau * bga * fv;
        }
      }
    }
    std::vector<double> g(n, 0.0);
    for (int i = 0; i < n; ++i)
      if (fixed[i]) {
        const auto& c2 = mesh.coords[i];
        g[i] = bc_expr(c2[0], c2[1], c2[2], 0.0);
      }
    constrain_system(A, b, g);
    for (int i = 0; i < n; ++i) u[i] = fixed[i] ? g[i] : 0.0;
    info = bicgstab_jacobi(A, b, u, rtol, atol, 100000);
  } else if (pde_type == "wave") {
    const auto& tc = spec["pde"]["time"];
    double t0 = tc["t0"].number_or(0.0);
    double t_end = tc["t_end"].number_or(0.2);
    double dt = tc["dt"].number_or(0.005);
    int num_steps = (int)((t_end - t0) / dt + 0.5);
    double cw = spec["pde"]["pde_params"]["c"].number_or(1.0);
    double c2w = cw * cw, theta = 0.25, inv_dt2 = 1.0 / (dt * dt);

    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    Expression iv_expr(
        pick(spec, "_computed_iv", "", "initial_velocity", "0"));
    CSR K = CSR::from_pattern(mesh), M = CSR::from_pattern(mesh);
    assemble_stiffness(mesh, K, [](double, double, double) { return 1.0; });
    assemble_mass(mesh, M);
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p)
      A.data[p] = inv_dt2 * M.data[p] + theta * c2w * K.data[p];
    CSR A_c = A;
    A_c.constrain(fixed);

    std::vector<double> un(n), unm1(n), b(n), tmp1(n), tmp2(n), g(n, 0.0),
        fvec(n);
    for (int i = 0; i < n; ++i) {
      const auto& c3 = mesh.coords[i];
      un[i] = ic_expr(c3[0], c3[1], c3[2], t0);
      unm1[i] = un[i] - dt * iv_expr(c3[0], c3[1], c3[2], t0);
    }
    long total_it = 0;
    double t = t0;
    for (int s = 0; s < num_steps; ++s) {
      assemble_load(mesh, [&](double x, double y, double z) {
        return f_expr(x, y, z, t);  // source at t_n
      }, fvec);
      for (int i = 0; i < n; ++i) tmp1[i] = 2.0 * un[i] - unm1[i];
      M.matvec(tmp1, b);
      for (int i = 0; i < n; ++i) b[i] *= inv_dt2;
      K.matvec(un, tmp2);
      for (int i = 0; i < n; ++i)
        b[i] -= (1.0 - 2.0 * theta) * c2w * tmp2[i];
      K.matvec(unm1, tmp2);
      for (int i = 0; i < n; ++i)
        b[i] += -theta * c2w * tmp2[i] + fvec[i];
      t += dt;
      for (int i = 0; i < n; ++i)
        if (fixed[i]) {
          const auto& c3 = mesh.coords[i];
          g[i] = bc_expr(c3[0], c3[1], c3[2], t);
        }
      std::vector<double> gz(n, 0.0), Ag(n);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A.matvec(gz, Ag);
      for (int i = 0; i < n; ++i)
        b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      std::vector<double> unew = un;
      for (int i = 0; i < n; ++i)
        if (fixed[i]) unew[i] = g[i];
      info = cg_jacobi(A_c, b, unew, rtol, atol, 100000);
      total_it += info.iterations;
      unm1 = un;
      un = unew;
    }
    info.iterations = (int)total_it;
    u = un;
  } else if (pde_type == "reaction_diffusion") {
    // linear reaction only (sigma u); backward Euler
    const auto& tc = spec["pde"]["time"];
    double t0 = tc["t0"].number_or(0.0);
    double t_end = tc["t_end"].number_or(0.5);
    double dt = tc["dt"].number_or(0.01);
    int num_steps = (int)std::ceil((t_end - t0) / dt - 1e-9);
    if (num_steps < 1) num_steps = 1;
    double eps = spec["pde"]["pde_params"]["epsilon"].number_or(1.0);
    const auto& reaction = spec["pde"]["pde_params"]["reaction"];
    if (reaction["type"].str_or("linear") != "linear") {
      std::fprintf(stderr,
                   "native backend: nonlinear reactions unsupported\n");
      return 3;
    }
    double alpha = reaction["alpha"].number_or(0.0);
    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    CSR K = CSR::from_pattern(mesh), M = CSR::from_pattern(mesh);
    assemble_stiffness(mesh, K, [](double, double, double) { return 1.0; });
    assemble_mass(mesh, M);
    // A = M + dt (eps K + alpha M)
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p)
      A.data[p] = (1.0 + dt * alpha) * M.data[p] + dt * eps * K.data[p];
    CSR A_c = A;
    A_c.constrain(fixed);
    for (int i = 0; i < n; ++i) {
      const auto& c3 = mesh.coords[i];
      u[i] = ic_expr(c3[0], c3[1], c3[2], t0);
    }
    std::vector<double> b(n), Mu(n), g(n, 0.0), fvec(n);
    long total_it = 0;
    double t = t0;
    for (int s = 0; s < num_steps; ++s) {
      t += dt;
      assemble_load(mesh, [&](double x, double y, double z) {
        return f_expr(x, y, z, t);
      }, fvec);
      M.matvec(u, Mu);
      for (int i = 0; i < n; ++i) b[i] = Mu[i] + dt * fvec[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) {
          const auto& c3 = mesh.coords[i];
          g[i] = bc_expr(c3[0], c3[1], c3[2], t);
        }
      std::vector<double> gz(n, 0.0), Ag(n);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A.matvec(gz, Ag);
      for (int i = 0; i < n; ++i)
        b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) u[i] = g[i];
      info = cg_jacobi(A_c, b, u, rtol, atol, 100000);
      total_it += info.iterations;
    }
    info.iterations = (int)total_it;
  } else if (pde_type == "poisson" || pde_type == "helmholtz" ||
      pde_type == "darcy") {
    CSR A = CSR::from_pattern(mesh);
    std::string kappa_s = "1";
    const auto& coeffs = spec["pde"]["coefficients"];
    if (coeffs.contains("kappa")) {
      const auto& kp = coeffs["kappa"];
      kappa_s = kp["type"].str_or("constant") == "expr"
                    ? kp["expr"].str()
                    : std::to_string(kp["value"].number_or(1.0));
    }
    if (spec["pde"].contains("_computed_kappa"))
      kappa_s = spec["pde"]["_computed_kappa"].str();
    Expression kappa(kappa_s);
    assemble_stiffness(mesh, A,
                       [&](double x, double y, double z) {
                         return kappa(x, y, z);
                       });
    if (pde_type == "helmholtz") {
      double k = spec["pde"]["pde_params"]["k"].number_or(1.0);
      CSR M = CSR::from_pattern(mesh);
      assemble_mass(mesh, M);
      for (size_t p = 0; p < A.data.size(); ++p)
        A.data[p] -= k * k * M.data[p];
    }
    std::vector<double> b(n);
    assemble_load(mesh, [&](double x, double y, double z) {
      return f_expr(x, y, z, 0.0);
    }, b);
    std::vector<double> g(n, 0.0);
    for (int i = 0; i < n; ++i)
      if (fixed[i]) {
        const auto& c = mesh.coords[i];
        g[i] = bc_expr(c[0], c[1], c[2], 0.0);
      }
    constrain_system(A, b, g);
    for (int i = 0; i < n; ++i) u[i] = fixed[i] ? g[i] : 0.0;
    if (pde_type == "helmholtz")
      info = bicgstab_jacobi(A, b, u, rtol, atol, 100000);
    else
      info = cg_jacobi(A, b, u, rtol, atol, 100000);
  } else if (pde_type == "heat") {
    const auto& tc = spec["pde"]["time"];
    double t0 = tc["t0"].number_or(0.0);
    double t_end = tc["t_end"].number_or(0.1);
    double dt = tc["dt"].number_or(0.01);
    int num_steps = (int)((t_end - t0) / dt + 0.5);
    if (num_steps < 1) num_steps = 1;

    Expression ic_expr(
        pick(spec, "_computed_ic", "", "initial_condition", "0"));
    std::string kappa_s = "1";
    const auto& coeffs = spec["pde"]["coefficients"];
    if (coeffs.contains("kappa")) {
      const auto& kp = coeffs["kappa"];
      kappa_s = kp["type"].str_or("constant") == "expr"
                    ? kp["expr"].str()
                    : std::to_string(kp["value"].number_or(1.0));
    }
    Expression kappa(kappa_s);
    CSR K = CSR::from_pattern(mesh), M = CSR::from_pattern(mesh);
    assemble_stiffness(mesh, K, [&](double x, double y, double z) {
      return kappa(x, y, z);
    });
    assemble_mass(mesh, M);
    // A = M + dt K (constant; constrained once)
    CSR A = M;
    for (size_t p = 0; p < A.data.size(); ++p) A.data[p] += dt * K.data[p];

    for (int i = 0; i < n; ++i) {
      const auto& c = mesh.coords[i];
      u[i] = ic_expr(c[0], c[1], c[2], t0);
    }
    std::vector<double> b(n), Mu(n), g(n, 0.0), fvec(n);
    CSR A_c = A;
    A_c.constrain(fixed);
    long total_it = 0;
    double t = t0;
    for (int s = 0; s < num_steps; ++s) {
      t += dt;
      assemble_load(mesh, [&](double x, double y, double z) {
        return f_expr(x, y, z, t);
      }, fvec);
      M.matvec(u, Mu);
      for (int i = 0; i < n; ++i) b[i] = Mu[i] + dt * fvec[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) {
          const auto& c = mesh.coords[i];
          g[i] = bc_expr(c[0], c[1], c[2], t);
        }
      // eliminate: b -= A[:, fixed] g
      std::vector<double> gz(n, 0.0), Ag(n);
      for (int i = 0; i < n; ++i)
        if (fixed[i]) gz[i] = g[i];
      A.matvec(gz, Ag);
      for (int i = 0; i < n; ++i)
        b[i] = fixed[i] ? g[i] : b[i] - Ag[i];
      for (int i = 0; i < n; ++i)
        if (fixed[i]) u[i] = g[i];
      info = cg_jacobi(A_c, b, u, rtol, atol, 100000);
      total_it += info.iterations;
    }
    info.iterations = (int)total_it;
    t_now = t;
  } else {
    std::fprintf(stderr, "native backend: unsupported pde '%s'\n",
                 pde_type.c_str());
    return 3;
  }

  // sample on the output grid
  const auto& grid = spec["output"]["grid"];
  int nx = (int)grid["nx"].int_or(50), ny = (int)grid["ny"].int_or(50);
  int nz = (int)grid["nz"].int_or(0);
  const auto& bbox = grid["bbox"];
  double x0 = bbox[0].number_or(0), x1 = bbox[1].number_or(1);
  double y0 = bbox[2].number_or(0), y1 = bbox[3].number_or(1);
  std::vector<double> out;
  if (nz > 0) {
    double z0 = bbox[4].number_or(0), z1 = bbox[5].number_or(1);
    out.resize((size_t)nz * ny * nx);
    for (int kz = 0; kz < nz; ++kz)
      for (int jy = 0; jy < ny; ++jy)
        for (int ix = 0; ix < nx; ++ix) {
          double x = x0 + (x1 - x0) * ix / (nx - 1);
          double y = y0 + (y1 - y0) * jy / (ny - 1);
          double z = z0 + (z1 - z0) * kz / (nz - 1);
          out[((size_t)kz * ny + jy) * nx + ix] = eval_p1(mesh, u, x, y, z);
        }
  } else {
    out.resize((size_t)ny * nx);
    for (int jy = 0; jy < ny; ++jy)
      for (int ix = 0; ix < nx; ++ix) {
        double x = x0 + (x1 - x0) * ix / (nx - 1);
        double y = y0 + (y1 - y0) * jy / (ny - 1);
        out[(size_t)jy * nx + ix] = eval_p1(mesh, u, x, y, 0.0);
      }
  }

  double elapsed =
      std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                    t_start)
          .count();

  std::FILE* fb = std::fopen((outdir + "/solution_grid.bin").c_str(), "wb");
  if (!fb) return 4;
  std::fwrite(out.data(), sizeof(double), out.size(), fb);
  std::fclose(fb);
  std::FILE* fm = std::fopen((outdir + "/meta.json").c_str(), "w");
  std::fprintf(fm,
               "{\"nx\": %d, \"ny\": %d, \"nz\": %d, \"num_dofs\": %d, "
               "\"baseline_time\": %.6f, \"solver_info\": {"
               "\"mesh_resolution\": %d, \"element_degree\": 1, "
               "\"ksp_type\": \"%s\", \"pc_type\": \"jacobi\", "
               "\"rtol\": %g, \"iterations\": %d, \"residual\": %g, "
               "\"converged\": %s}}\n",
               nx, ny, nz, n, elapsed, resolution, ksp.c_str(), rtol,
               info.iterations, info.residual,
               info.converged ? "true" : "false");
  std::fclose(fm);
  return 0;
}
