// Shared spec/BC/assembly/sampling helpers for the native oracle
// binaries (scalar_solver.cc, system_solver.cc): expression plumbing for
// the _computed_* contract, the boundary selector DSL
// (reference: oracle/stokes.py:40-59), symmetric Dirichlet elimination,
// generic-degree quadrature assembly, and the solution_grid.bin +
// meta.json output contract of the reference's deal.II programs
// (dealii_oracle/programs/common/grid_writer.h).
#pragma once

#include <cstdio>
#include <string>
#include <vector>

#include "pdebench_expr.hpp"
#include <limits>

#include "pdebench_fem.hpp"
#include "pdebench_json.hpp"
#include "pdebench_lagrange.hpp"
// locate_cell() dispatches to locate_cell_unstructured(), whose
// definition lives in pdebench_unstructured.hpp (it needs lagrange
// types, so lagrange can only forward-declare it). Include it here so
// agent programs that include this plumbing header alone still link
// at -O0 (the declared-but-undefined inline is a link error otherwise).
#include "pdebench_unstructured.hpp"

namespace pdebench {
namespace fem {

using pdebench::expr::Expression;
namespace json = pdebench::json;

// ---------------------------------------------------------------------------
// spec helpers
// ---------------------------------------------------------------------------

inline std::string num_or_str(const json::Value& v, const std::string& dflt) {
  if (v.is_null()) return dflt;
  if (v.is_string()) return v.str();
  char buf[64];
  std::snprintf(buf, sizeof(buf), "%.17g", v.number_or(0.0));
  return buf;
}

// vector of component expressions from a JSON array (or scalar broadcast)
inline std::vector<Expression> vec_expr(const json::Value& v, int dim,
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
inline bool sel_match(const std::string& on, const std::array<double, 3>& c,
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

inline std::vector<BCSegment> parse_bc(const json::Value& spec, int dim) {
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
inline void apply_bc_component(const Space& sp, int dim,
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
inline void constrain_system(CSR& A, std::vector<double>& b,
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

inline void physical_grads(const Element& el, const CellGeom& gm, int iq,
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

inline void assemble_laplacian(const Mesh& m, const Space& sp,
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
inline void assemble_load_q(const Mesh& m, const Space& sp, const Element& el,
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

inline std::vector<std::vector<int>> scalar_cell_lists(const Space& sp,
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

inline GridSpec read_grid(const json::Value& spec) {
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
inline std::vector<double> sample_grid(const Mesh& m, const Space& sp,
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
        if (c < 0) {  // outside a complex domain: NaN mask
          out[((size_t)kz * g.ny + jy) * g.nx + ix] =
              std::numeric_limits<double>::quiet_NaN();
          continue;
        }
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

inline void write_outputs(const std::string& outdir,
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


}  // namespace fem
}  // namespace pdebench
