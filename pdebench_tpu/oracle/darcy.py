"""Darcy oracle: -div(kappa grad p) = f (elliptic pressure formulation).

Parity (reference: pdebench/oracle/darcy.py:128-370): the reference
supports an elliptic pressure formulation and a mixed RT_k x DG_l
formulation; the benchmark datasets contain no darcy cases (v2 has none,
SURVEY 2.3) and the mixed form is never exercised by the harness. Here
the elliptic formulation is implemented on the same pipeline as Poisson
(with the positive-kappa check of darcy.py:63-70); the H(div) mixed
form covers RT0 x DG0 (degree_u=1) and RT1 x DG1 (degree_u=2),
matching the reference's configurable-order basix construction.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..fem import symbolic
from ..fem.assemble import LocalOperator, local_stiffness
from ..solvers.dispatch import solve_linear
from . import base, scalar
from .types import OracleResult, compute_rel_L2_grid


class DarcySolver:
    def solve(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        pde = config["pde"]
        formulation = str(pde.get("formulation", "elliptic")).lower()
        if formulation in ("mixed", "rt", "hdiv"):
            return self._solve_mixed(config, _compute_baseline)
        if formulation not in ("elliptic", "pressure"):
            raise NotImplementedError(
                f"unknown darcy formulation '{formulation}'"
            )
        mms_u = pde.get("manufactured_solution", {}).get(
            "p", pde.get("manufactured_solution", {}).get("u")
        )
        if mms_u is not None:
            config = scalar.override_bc_with_mms(config, mms_u)
            pde = config["pde"]
            # baseline-error machinery reads manufactured_solution.u
            pde.setdefault("manufactured_solution", {})["u"] = mms_u
        ctx = scalar.setup_scalar(config)
        dim = ctx.dim
        kspec = pde.get("coefficients", {}).get("kappa") or {}
        kappa = base.coefficient_fn(kspec or None, dim)

        # positive-permeability check (reference: darcy.py:63-70)
        kq_probe = np.asarray(kappa(ctx.qpts()))
        if not np.all(kq_probe > 0):
            raise ValueError("darcy permeability must be strictly positive")

        if mms_u is not None:
            kexpr = kspec.get("expr", kspec.get("value", 1.0)) if kspec else 1.0
            src = symbolic.poisson_source(mms_u, kexpr, dim)
        else:
            src = pde.get("source_term", 0.0)
        f_fn = symbolic.lambdify_spatial(src, dim)
        opts = base.solver_opts(config)
        opts["_lattice32"] = scalar.maybe_lattice32(
            ctx, local_stiffness(ctx.cb, kappa(ctx.qpts()))
        )

        def build():
            K = local_stiffness(ctx.cb, kappa(ctx.qpts()))
            op = LocalOperator(K, ctx.space.dofmap_scalar, ctx.space.ndof)
            return op, ctx.load_vector(f_fn(ctx.qpts()))

        op, b = base.charge_setup(ctx, build)

        def run():
            x, info = solve_linear(op, b, ctx.mask, ctx.g, opts)
            grid = ctx.sample(x)
            return grid, info

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)
        baseline_time = ctx.t_setup + t_warm

        baseline_error = 1e-2
        if _compute_baseline:
            err = scalar.mms_baseline_error(config, fem_grid)
            if err is None and "reference_config" in config:
                ref = self.solve(
                    scalar.merge_reference_config(config),
                    _compute_baseline=False,
                )
                err = compute_rel_L2_grid(fem_grid, ref.reference)
            baseline_error = err if err is not None else 0.0

        solver_info = {
            "library": "pdebench_tpu",
            "pde": "darcy",
            "formulation": "elliptic",
            "mesh_resolution": int(config.get("mesh", {}).get("resolution", 0)),
            "element_degree": ctx.space.degree,
            "t_setup": ctx.t_setup,
            "t_cold": t_cold,
            **info,
        }
        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(baseline_time),
            reference=fem_grid,
            solver_info=solver_info,
            num_dofs=ctx.space.ndof,
        )

    def _solve_mixed(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        """Mixed RT0 x DG0: kappa^-1 u + grad p = 0, div u = f.

        Parity: the reference's H(div) formulation (darcy.py:46-61,
        :290-322 — mixed weak form, flux BCs from the manufactured
        velocity u = -kappa grad p, pressure point fix, direct LU with
        explicit convergence check).
        """
        import time as _time

        import scipy.sparse as sps
        import sympy as sp

        from ..solvers import direct as directmod

        from ..fem import sampling
        from ..fem.hdiv import rt0_local_matrices, rt0_space

        t_start = _time.perf_counter()
        pde = config["pde"]
        degree_u = int(config.get("fem", {}).get("degree_u", 1))
        # the reference builds RT_k x DG_l independently
        # (reference pdebench/oracle/darcy.py:46-61); here only the
        # stable RT_k x DG_{k-1} pairings are implemented, so an
        # explicit degree_p that is not degree_u - 1 must raise rather
        # than silently solve a different discretization (ADVICE r4)
        degree_p = config.get("fem", {}).get("degree_p")
        if degree_p is not None and int(degree_p) != degree_u - 1:
            raise NotImplementedError(
                f"mixed darcy supports the stable RT_k x DG_(k-1) "
                f"pairings only; got degree_u={degree_u}, "
                f"degree_p={degree_p}"
            )
        if degree_u >= 2:
            # basix 'RT' degree m (RT_{m-1} x DG_{m-1}) for any order,
            # matching the reference's configurable-order generality
            return self._solve_mixed_rtk(
                config, k=degree_u - 1, _compute_baseline=_compute_baseline
            )
        if degree_u != 1:
            raise NotImplementedError(
                f"mixed darcy needs degree_u >= 1; got {degree_u}"
            )
        mms = pde.get("manufactured_solution", {})
        p_expr = mms.get("p", mms.get("u"))
        kspec = pde.get("coefficients", {}).get("kappa") or {}
        kappa_np = base.coefficient_fn(kspec or None, 2)

        mesh = base.build_mesh(config["domain"], config.get("mesh", {}))
        space = rt0_space(mesh)
        cells = mesh.cells.astype(np.int64)
        centroids = mesh.coords[cells].mean(axis=1)
        kap_c = np.asarray(kappa_np(jnp_asarray(centroids)))
        if not np.all(kap_c > 0):
            raise ValueError("darcy permeability must be strictly positive")

        # sources & exact data
        if p_expr is not None:
            kexpr = kspec.get("expr", kspec.get("value", 1.0)) if kspec else 1.0
            f_sym = symbolic.poisson_source(p_expr, kexpr, 2)
            p_sym = symbolic.parse(p_expr)
            k_sym = symbolic.parse(kexpr)
            u_sym = [-k_sym * sp.diff(p_sym, v) for v in (symbolic.X, symbolic.Y)]
            u_fns = [symbolic.lambdify_numpy(e, 2) for e in u_sym]
        else:
            f_sym = pde.get("source_term", 0.0)
            u_fns = None
        f_fn = symbolic.lambdify_numpy(f_sym, 2)

        Mloc, Bloc, area = rt0_local_matrices(space, 1.0 / kap_c)
        ne, nc = space.n_edges, mesh.n_cells
        N = ne + nc

        ce = space.cell_edges
        rows = np.repeat(ce, 3, axis=1).reshape(-1)
        cols = np.tile(ce, (1, 3)).reshape(-1)
        entries = [
            (rows, cols, Mloc.reshape(-1)),
            # -B^T p block (flux row, pressure col)
            (ce.reshape(-1), ne + np.repeat(np.arange(nc), 3), -np.repeat(Bloc.reshape(-1), 1)),
            # B u block (pressure row, flux col)
            (ne + np.repeat(np.arange(nc), 3), ce.reshape(-1), Bloc.reshape(-1)),
        ]
        A = sps.coo_matrix(
            (
                np.concatenate([e[2] for e in entries]),
                (
                    np.concatenate([e[0] for e in entries]),
                    np.concatenate([e[1] for e in entries]),
                ),
            ),
            shape=(N, N),
        ).tocsr()

        rhs = np.zeros(N)
        rhs[ne:] = f_fn(centroids) * area  # int_T f

        # essential flux BCs on boundary edges from the manufactured u
        mask = np.zeros(N, dtype=bool)
        g = np.zeros(N)
        if u_fns is not None:
            be = space.boundary_edges
            mask[be] = True
            # RT0 coefficients are normal-flux densities: with the basis
            # phi_e = sigma |e|/(2|T|) (x - p_opp) (own edge flux = |e|),
            # the coefficient equals u . n at the edge
            un = np.stack([f(space.edge_midpoints[be]) for f in u_fns], 1)
            g[be] = (un * space.edge_normals[be]).sum(1)
        # pressure point fix (cell 0)
        mask[ne] = True
        if p_expr is not None:
            g[ne] = float(
                symbolic.lambdify_numpy(p_expr, 2)(centroids[:1])[0]
            )
        t_setup = _time.perf_counter() - t_start

        def run():
            x = directmod.solve_direct_constrained(A, rhs, mask, g)
            # convergence check on the free rows (reference darcy.py:318-322)
            resid = np.linalg.norm((A @ x - rhs)[~mask])
            p = x[ne:]
            grid_cfg = config["output"]["grid"]
            pts, shape = sampling.grid_points(grid_cfg)
            loc = sampling.locate_points(mesh, pts)
            vals = np.where(
                loc.found, p[np.maximum(loc.cells, 0)], np.nan
            )
            return vals.reshape(shape), {"residual": float(resid)}

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)

        baseline_error = 0.0
        if _compute_baseline and p_expr is not None:
            exact = base.exact_grid_scalar(
                p_expr, config["output"]["grid"], mask_from=fem_grid
            )
            baseline_error = compute_rel_L2_grid(fem_grid, exact)

        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(t_setup + t_warm),
            reference=fem_grid,
            solver_info={
                "library": "pdebench_tpu",
                "pde": "darcy",
                "formulation": "mixed_rt0_dg0",
                "ksp_type": "preonly",
                "pc_type": "lu",
                "rtol": 1e-10,
                "iterations": 1,
                "t_setup": t_setup,
                "t_cold": t_cold,
                **info,
            },
            num_dofs=N,
        )


    def _solve_mixed_rt1(
        self, config: Dict[str, Any], _compute_baseline: bool = True
    ) -> OracleResult:
        return self._solve_mixed_rtk(config, 1, _compute_baseline)

    def _solve_mixed_rtk(
        self, config: Dict[str, Any], k: int = 1,
        _compute_baseline: bool = True,
    ) -> OracleResult:
        """Mixed RT_k x DG_k (basix 'RT' degree k+1) for any k >= 1.

        Parity: the reference's configurable-order mixed space
        (darcy.py:46-61); same weak form, flux BCs and pressure fixing
        as the RT0 path, with O(h^{k+1}) pressure convergence
        (tests/test_fem_core.py: test_darcy_rt1_convergence_order and
        test_darcy_rt2_convergence_order).
        """
        import time as _time

        import scipy.sparse as sps
        import sympy as sp

        from ..fem import sampling
        from ..fem.hdiv import rt0_space, rtk_assemble, rtk_boundary_flux
        from ..solvers import direct as directmod

        t_start = _time.perf_counter()
        pde = config["pde"]
        mms = pde.get("manufactured_solution", {})
        p_expr = mms.get("p", mms.get("u"))
        kspec = pde.get("coefficients", {}).get("kappa") or {}
        kappa_np = base.coefficient_fn(kspec or None, 2)

        mesh = base.build_mesh(config["domain"], config.get("mesh", {}))
        space = rt0_space(mesh)

        def kinv(pts):
            k = np.asarray(kappa_np(jnp_asarray(pts)))
            if not np.all(k > 0):
                raise ValueError(
                    "darcy permeability must be strictly positive"
                )
            return 1.0 / k

        if p_expr is not None:
            kexpr = kspec.get("expr", kspec.get("value", 1.0)) if kspec else 1.0
            f_sym = symbolic.poisson_source(p_expr, kexpr, 2)
            p_sym = symbolic.parse(p_expr)
            k_sym = symbolic.parse(kexpr)
            u_sym = [-k_sym * sp.diff(p_sym, v) for v in (symbolic.X, symbolic.Y)]
            u_fns = [symbolic.lambdify_numpy(e, 2) for e in u_sym]
        else:
            f_sym = pde.get("source_term", 0.0)
            u_fns = None
        f_fn = symbolic.lambdify_numpy(f_sym, 2)

        M_loc, B_loc, fdofs, aux = rtk_assemble(space, kinv, k=k)
        ne, nc = space.n_edges, mesh.n_cells
        nd, nem, nint = aux["nd"], aux["nem"], aux["nint"]
        npl = aux["psi_dim"]
        nf = nem * ne + nint * nc  # flux dofs
        N = nf + npl * nc
        pdofs = nf + npl * np.arange(nc)[:, None] + np.arange(npl)[None, :]

        rows_m = np.repeat(fdofs, nd, axis=1).reshape(-1)
        cols_m = np.tile(fdofs, (1, nd)).reshape(-1)
        rows_b = np.repeat(pdofs, nd, axis=1).reshape(-1)
        cols_b = np.tile(fdofs, (1, npl)).reshape(-1)
        A = sps.coo_matrix(
            (
                np.concatenate(
                    [M_loc.reshape(-1), -B_loc.reshape(-1), B_loc.reshape(-1)]
                ),
                (
                    np.concatenate([rows_m, cols_b, rows_b]),
                    np.concatenate([cols_m, rows_b, cols_b]),
                ),
            ),
            shape=(N, N),
        ).tocsr()

        # rhs: (f, psi) over the DG_k test functions
        xq, wq, xc, h = aux["xq"], aux["wq"], aux["xc"], aux["h"]
        psi_exp = aux["psi_exp"]
        Xl_q = (xq - xc[:, None, :]) / h[:, None, None]
        psi = np.stack(
            [Xl_q[..., 0] ** a * Xl_q[..., 1] ** b for (a, b) in psi_exp],
            axis=-1,
        )
        fq = f_fn(xq.reshape(-1, 2)).reshape(xq.shape[:2])
        rhs = np.zeros(N)
        rhs[nf:] = np.einsum("cq,cql->cl", fq * wq, psi).reshape(-1)

        mask = np.zeros(N, dtype=bool)
        g = np.zeros(N)
        if u_fns is not None:
            bd, bv = rtk_boundary_flux(space, u_fns, k=k)
            mask[bd] = True
            g[bd] = bv
        # pressure fixing: the constant DG_k coefficient of cell 0
        # equals p_h at the centroid (every non-constant local monomial
        # vanishes at Xl = 0)
        mask[nf] = True
        if p_expr is not None:
            g[nf] = float(
                symbolic.lambdify_numpy(p_expr, 2)(xc[:1])[0]
            )
        t_setup = _time.perf_counter() - t_start

        def run():
            x = directmod.solve_direct_constrained(A, rhs, mask, g)
            resid = np.linalg.norm((A @ x - rhs)[~mask])
            pc = x[nf:].reshape(nc, npl)
            grid_cfg = config["output"]["grid"]
            pts, shape = sampling.grid_points(grid_cfg)
            loc = sampling.locate_points(mesh, pts)
            cells_s = np.maximum(loc.cells, 0)
            Xl = (pts - xc[cells_s]) / h[cells_s][:, None]
            basis = np.stack(
                [Xl[:, 0] ** a * Xl[:, 1] ** b for (a, b) in psi_exp],
                axis=-1,
            )  # (P, npl)
            vals = (pc[cells_s] * basis).sum(axis=-1)
            vals = np.where(loc.found, vals, np.nan)
            return vals.reshape(shape), {"residual": float(resid)}

        (fem_grid, info), t_warm, t_cold = base.timed_run(run)

        baseline_error = 0.0
        if _compute_baseline and p_expr is not None:
            exact = base.exact_grid_scalar(
                p_expr, config["output"]["grid"], mask_from=fem_grid
            )
            baseline_error = compute_rel_L2_grid(fem_grid, exact)

        return OracleResult(
            baseline_error=float(baseline_error),
            baseline_time=float(t_setup + t_warm),
            reference=fem_grid,
            solver_info={
                "library": "pdebench_tpu",
                "pde": "darcy",
                "formulation": f"mixed_rt{k}_dg{k}",
                "ksp_type": "preonly",
                "pc_type": "lu",
                "rtol": 1e-10,
                "iterations": 1,
                "t_setup": t_setup,
                "t_cold": t_cold,
                **info,
            },
            num_dofs=N,
        )


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
