"""Shared oracle machinery: spec -> mesh/space/coefficients/BCs/sampling.

Each per-PDE solver module composes these pieces; this module owns the
case-spec conventions (reference: pdebench/oracle/common.py — mesh factory
:21-167, BC helpers :198-221, kappa fields :285-301, exact-grid eval
:575-704) re-expressed for the array-native core.

Timing policy: `baseline_time` is the wall-clock of the warm compute path
(host setup + device execute + grid sampling), measured after one warm-up
execution so XLA compilation is excluded. The cold (compile-included)
time is reported alongside in solver_info["t_cold"]. Rationale: the
reference's baseline_time (oracle/poisson.py:39,161) is a steady-state
CPU number with no JIT; compile time is a one-off artifact of the XLA
execution model, and the benchmark gate multiplies baseline_time by 3.
Set PDEBENCH_TPU_COLD_TIMING=1 to gate on cold times instead.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..fem import mesh as meshmod
from ..fem import sampling, symbolic
from ..fem.mesh import Mesh
from ..fem.spaces import FunctionSpace
from .types import OracleResult, compute_rel_L2_grid

ExprLike = symbolic.ExprLike


# ---------------------------------------------------------------------------
# Cross-case geometry memoization
# ---------------------------------------------------------------------------

_GEOM_CACHE: "dict" = {}
_GEOM_CACHE_MAX = 6


def memo_geometry(key_obj, builder: Callable[[], Any]) -> Any:
    """Memoize per-(domain, resolution, degree) geometry artifacts.

    Mesh generation, dof maps, point location and quadrature batches are
    pure functions of the case's (domain, mesh, fem) spec; across cases
    (and across a case's main + reference_config re-solve) they repeat.
    The cached objects are treated as immutable everywhere (solvers
    attach state to per-solve OPERATORS, never to the mesh/space/batch),
    so sharing is safe. baseline_time's t_setup then charges the warm
    (lookup) cost on a hit — consistent with the documented
    "host work + warm geometry" timing contract. Small LRU: a sweep
    visits many resolutions, and meshes at res 200+ are tens of MB.
    Disable with PDEBENCH_TPU_GEOM_CACHE=0.
    """
    if os.environ.get("PDEBENCH_TPU_GEOM_CACHE", "1") != "1":
        return builder()
    import json as _json

    try:
        key = _json.dumps(key_obj, sort_keys=True)
    except TypeError:
        # Non-JSON key component (e.g. an ndarray in a future spec): do
        # NOT coerce with str() — numpy's truncated repr can collide two
        # distinct specs and silently return the wrong cached mesh.
        # An unhashable spec disables caching instead (ADVICE r3).
        return builder()
    if key in _GEOM_CACHE:
        val = _GEOM_CACHE.pop(key)
        _GEOM_CACHE[key] = val  # move to MRU
        return val
    val = builder()
    _GEOM_CACHE[key] = val
    while len(_GEOM_CACHE) > _GEOM_CACHE_MAX:
        _GEOM_CACHE.pop(next(iter(_GEOM_CACHE)))
    return val


def geom_cache_has(key_obj) -> bool:
    """True if memo_geometry would hit (and caching is enabled)."""
    if os.environ.get("PDEBENCH_TPU_GEOM_CACHE", "1") != "1":
        return False
    import json as _json

    try:
        return _json.dumps(key_obj, sort_keys=True) in _GEOM_CACHE
    except TypeError:
        return False


def clear_setup_caches() -> None:
    """Drop every process-level setup cache (geometry + sympy parse/
    lambdify), restoring cold per-case setup costs.

    Used by bench.py between its best-of-2 whole-case passes so the
    second pass pays the same cold t_setup as the frozen CPU baseline's
    single cold solve (scripts/freeze_cpu_baseline.py) — otherwise the
    TPU-vs-CPU comparison is protocol-asymmetric (ADVICE r3, medium).
    """
    _GEOM_CACHE.clear()
    for fn_name in ("_parse_str", "_lambdify_spatial_cached", "_lambdify_numpy_cached"):
        fn = getattr(symbolic, fn_name, None)
        if fn is not None and hasattr(fn, "cache_clear"):
            fn.cache_clear()
    # the distmesh lru (fem/geometry._mesh_domain_cached) survived the
    # r4 protocol "cold" pass — meshing a complex domain is 1-3 s of
    # genuine per-case setup the frozen CPU single-cold-solve charges,
    # so the TPU passes must charge it too (round-5 protocol fix)
    from ..fem import geometry as _geometry

    _geometry._mesh_domain_cached.cache_clear()


# ---------------------------------------------------------------------------
# Mesh factory
# ---------------------------------------------------------------------------


def build_mesh(domain_spec: Dict[str, Any], mesh_spec: Dict[str, Any]) -> Mesh:
    """Mesh a case domain (reference: common.py:21-167 create_mesh)."""
    resolution = int(mesh_spec.get("resolution", 16))
    domain_type = domain_spec["type"]
    cell_type = mesh_spec.get("cell_type", "triangle")

    if domain_type == "unit_square":
        ct = "quadrilateral" if cell_type == "quadrilateral" else "triangle"
        return meshmod.unit_square_mesh(resolution, ct)
    if domain_type == "unit_cube":
        return meshmod.unit_cube_mesh(resolution)
    if domain_type == "periodic_square":
        params = domain_spec.get("geometry_params", {})
        b = params.get("bounds", params.get("extents", [0.0, 1.0, 0.0, 1.0]))
        x0, x1, y0, y1 = [float(v) for v in b]
        # keep cells near-isotropic on non-square extents
        nx = resolution
        ny = max(int(round(resolution * (y1 - y0) / max(x1 - x0, 1e-300))), 1)
        m = meshmod.rectangle_mesh(nx, ny, (x0, x1, y0, y1), "triangle")
        m.periodic = (x0, x1, y0, y1)
        return m

    # complex 2-D geometries via the signed-distance mesher
    from ..fem import geometry

    char_length = 1.0 / float(resolution)
    return geometry.mesh_domain(domain_type, domain_spec, char_length)


# ---------------------------------------------------------------------------
# Coefficients & expressions
# ---------------------------------------------------------------------------


def coefficient_fn(
    spec: Optional[Dict[str, Any]], dim: int, default: float = 1.0
) -> Callable[[np.ndarray], np.ndarray]:
    """kappa-style coefficient: constant or expression of x[, y, z].

    Returns a traceable fn(points (..., dim)) -> (...,). Reference:
    common.py:285-301 create_kappa_field (we evaluate at quadrature points
    directly rather than projecting to DG0).
    """
    if spec is None:
        spec = {"type": "constant", "value": default}
    if spec.get("type") == "constant":
        val = float(spec.get("value", default))
        import jax.numpy as jnp

        return lambda pts: jnp.full(pts.shape[:-1], val, dtype=pts.dtype)
    if spec.get("type") == "expr":
        return symbolic.lambdify_spatial(spec["expr"], dim)
    raise ValueError(f"unknown coefficient spec {spec}")


# ---------------------------------------------------------------------------
# Dirichlet boundary conditions
# ---------------------------------------------------------------------------


def dirichlet_dofs_values(
    space: FunctionSpace,
    bc_spec: Dict[str, Any],
    t: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[Callable]]:
    """Resolve a case's Dirichlet spec to (blocked dofs, values, value_fn(t)).

    Handles 'on': 'all' | side | list of {on, value} segments, and scalar
    or vector (list) value expressions. value_fn is returned for
    time-dependent BCs: value_fn(t) -> values at the same dofs.
    Reference: common.py:198-221, oracle/stokes.py:40-127 selector DSL.
    """
    d = bc_spec.get("dirichlet")
    if d is None:
        return np.zeros(0, dtype=np.int64), np.zeros(0), None

    segments: List[Dict[str, Any]]
    if isinstance(d, list):
        segments = d
    else:
        on = d.get("on", "all")
        if isinstance(on, list):
            segments = [{"on": o, "value": d.get("value", 0.0)} for o in on]
        else:
            segments = [d]

    ncomp = space.ncomp
    dim = space.mesh.dim
    all_dofs: List[np.ndarray] = []
    fns: List[Tuple[np.ndarray, List[Callable], bool]] = []
    any_time = False

    for seg in segments:
        on = seg.get("on", "all")
        sdofs = space.boundary_dofs_on(on)
        value = seg.get("value", 0.0)
        exprs = value if isinstance(value, (list, tuple)) else [value] * ncomp
        if len(exprs) != ncomp:
            raise ValueError(f"BC value arity {len(exprs)} != ncomp {ncomp}")
        seg_time = any(symbolic.depends_on_t(e) for e in exprs)
        any_time = any_time or seg_time
        comp_fns = [
            symbolic.lambdify_numpy(e, dim, with_time=True) for e in exprs
        ]
        fns.append((sdofs, comp_fns, seg_time))
        blocked = (sdofs[:, None] * ncomp + np.arange(ncomp)[None, :]).reshape(-1)
        all_dofs.append(blocked)

    dofs = np.concatenate(all_dofs) if all_dofs else np.zeros(0, dtype=np.int64)

    def value_fn(tv: float) -> np.ndarray:
        out = []
        for sdofs, comp_fns, _ in fns:
            pts = space.dof_coords[sdofs]
            vals = np.stack([f(pts, tv) for f in comp_fns], axis=1)  # (n, ncomp)
            out.append(vals.reshape(-1))
        return np.concatenate(out) if out else np.zeros(0)

    t0 = 0.0 if t is None else float(t)
    values = value_fn(t0)
    # dedupe (corner dofs may appear in several segments; last wins is fine,
    # but keep unique for mask construction)
    uniq, first = np.unique(dofs, return_index=True)
    return uniq, values[first], (value_fn if any_time else None)


def dirichlet_traceable(
    space: FunctionSpace, bc_spec: Dict[str, Any]
) -> Tuple[np.ndarray, Callable]:
    """Traceable time-dependent Dirichlet values for scan-based time loops.

    Returns (bc_dofs (blocked, unique), g_fn) where g_fn(t) -> (ndof,)
    jnp vector with boundary values written at bc_dofs (zeros elsewhere);
    `t` may be a traced scalar, so g_fn is safe inside lax.scan bodies.
    Segment order matches dirichlet_dofs_values; later segments win.
    """
    import jax.numpy as jnp

    d = bc_spec.get("dirichlet")
    if d is None:
        return np.zeros(0, dtype=np.int64), lambda t: jnp.zeros(space.ndof)

    if isinstance(d, list):
        segments = d
    else:
        on = d.get("on", "all")
        if isinstance(on, list):
            segments = [{"on": o, "value": d.get("value", 0.0)} for o in on]
        else:
            segments = [d]

    ncomp = space.ncomp
    dim = space.mesh.dim
    compiled = []
    all_dofs = []
    for seg in segments:
        sdofs = space.boundary_dofs_on(seg.get("on", "all"))
        value = seg.get("value", 0.0)
        exprs = value if isinstance(value, (list, tuple)) else [value] * ncomp
        fns = [symbolic.lambdify_spatial(e, dim, with_time=True) for e in exprs]
        pts = jnp.asarray(space.dof_coords[sdofs])  # (n, dim)
        blocked = (sdofs[:, None] * ncomp + np.arange(ncomp)[None, :]).reshape(-1)
        compiled.append((pts, fns, jnp.asarray(blocked)))
        all_dofs.append(blocked)

    bc_dofs = (
        np.unique(np.concatenate(all_dofs)) if all_dofs else np.zeros(0, np.int64)
    )

    def g_fn(t):
        g = jnp.zeros(space.ndof)
        for pts, fns, blocked in compiled:
            vals = jnp.stack([f(pts, t) for f in fns], axis=1).reshape(-1)
            g = g.at[blocked].set(vals)
        return g

    return bc_dofs, g_fn


def interpolate_nodal(
    space: FunctionSpace,
    exprs: Union[ExprLike, Sequence[ExprLike]],
    t: Optional[float] = None,
) -> np.ndarray:
    """Nodal interpolation: evaluate expression(s) at dof coordinates.

    Equispaced Lagrange nodes make this exactly the reference's
    `interpolate_expression` (dolfinx nodal interpolation,
    common.py:262-283). Returns (ndof,) blocked for vector spaces.
    """
    dim = space.mesh.dim
    if isinstance(exprs, (list, tuple)):
        comps = []
        for e in exprs:
            fn = symbolic.lambdify_numpy(e, dim, with_time=t is not None)
            comps.append(fn(space.dof_coords, t) if t is not None else fn(space.dof_coords))
        return np.stack(comps, axis=1).reshape(-1)
    fn = symbolic.lambdify_numpy(exprs, dim, with_time=t is not None)
    vals = fn(space.dof_coords, t) if t is not None else fn(space.dof_coords)
    if space.ncomp != 1:
        raise ValueError("scalar expression on vector space")
    return vals


def time_params(pde_cfg: Dict[str, Any], default_t_end=0.1, default_dt=0.01):
    """(t0, t_end, dt, num_steps) from a case's pde.time block.

    num_steps = int((t_end - t0)/dt + 0.5), the reference's rounding
    (oracle/wave.py:44, heat.py).
    """
    tc = pde_cfg.get("time", {}) or {}
    t0 = float(tc.get("t0", 0.0))
    t_end = float(tc.get("t_end", pde_cfg.get("t_final", default_t_end)))
    dt = float(tc.get("dt", pde_cfg.get("dt", default_dt)))
    num_steps = max(int((t_end - t0) / dt + 0.5), 1)
    return t0, t_end, dt, num_steps


# ---------------------------------------------------------------------------
# Exact solutions & baseline error
# ---------------------------------------------------------------------------


def exact_grid_scalar(
    expr: ExprLike,
    grid: Dict[str, Any],
    mask_from: Optional[np.ndarray] = None,
    t: Optional[float] = None,
) -> np.ndarray:
    """Analytic (machine-precision) exact solution on the output grid.

    Reference: common.py:575-624 — exact grids are evaluated symbolically,
    NOT FEM-interpolated; the FEM solve's domain mask is then applied.
    """
    pts, shape = sampling.grid_points(grid)
    dim = pts.shape[1]
    fn = symbolic.lambdify_numpy(expr, dim, with_time=t is not None)
    vals = fn(pts, t) if t is not None else fn(pts)
    out = vals.reshape(shape)
    if mask_from is not None:
        out = np.where(np.isnan(mask_from), np.nan, out)
    return out


def exact_grid_vector_magnitude(
    exprs: Sequence[ExprLike],
    grid: Dict[str, Any],
    mask_from: Optional[np.ndarray] = None,
    t: Optional[float] = None,
) -> np.ndarray:
    pts, shape = sampling.grid_points(grid)
    dim = pts.shape[1]
    comps = []
    for e in exprs:
        fn = symbolic.lambdify_numpy(e, dim, with_time=t is not None)
        comps.append(fn(pts, t) if t is not None else fn(pts))
    mag = np.linalg.norm(np.stack(comps, axis=1), axis=1).reshape(shape)
    if mask_from is not None:
        mag = np.where(np.isnan(mask_from), np.nan, mag)
    return mag


# ---------------------------------------------------------------------------
# Timing
# ---------------------------------------------------------------------------

_COLD = os.environ.get("PDEBENCH_TPU_COLD_TIMING", "0") == "1"
# remote-TPU execution times are noisy (shared service); benchmarks can
# take the best of N warm passes. Read at CALL time (not import) so
# bench.py can drop to 1 repeat for minute-scale monster cases where
# the ~10 s service stalls are <10% relative and N repeats would blow
# the capture window (VERDICT r4 #1).


def _warm_repeats() -> int:
    return max(int(os.environ.get("PDEBENCH_TPU_WARM_REPEATS", "1")), 1)


def charge_setup(ctx, fn: Callable[[], Any]) -> Any:
    """Run one-time pipeline work NOW and charge its wall time to
    ctx.t_setup.

    Used to hoist per-case constants (host assembly einsums, eager
    operator builds, host->device transfers) OUT of the timed run():
    inside run() they re-execute on every warm pass — on the remote
    axon platform each eager op is a network round trip, which inflated
    warm times by 0.3-1.5 s/case (round-3 phase splits). baseline_time
    = t_setup + warm still counts the work exactly once, matching the
    reference's one-pass pipeline accounting (dolfinx oracles time mesh
    + assembly + solve + sampling once; e.g. reference
    pdebench/oracle/poisson.py:39,161).
    """
    import jax as _jax

    def _block(v):
        for leaf in _jax.tree_util.tree_leaves(v):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()

    # cold/warm split, exactly like timed_run: the first call absorbs
    # the one-time remote XLA compiles of any eager device ops (those
    # were previously excluded via run()'s cold pass); the second call
    # measures the steady work (host einsums, transfers) and is charged.
    _block(fn())
    t0 = time.perf_counter()
    out = fn()
    _block(out)
    ctx.t_setup += time.perf_counter() - t0
    return out


def timed_run(run: Callable[[], Any]) -> Tuple[Any, float, float]:
    """Execute `run` with warm timing: returns (result, t_warm, t_cold)."""
    t0 = time.perf_counter()
    result = run()
    t_cold = time.perf_counter() - t0
    if _COLD:
        return result, t_cold, t_cold
    t_warm = None
    for attempt in range(3):
        for _ in range(_warm_repeats()):
            t1 = time.perf_counter()
            result = run()
            dt = time.perf_counter() - t1
            t_warm = dt if t_warm is None else min(t_warm, dt)
        # a warm pass slower than the cold pass (which INCLUDED the
        # compile) is a measurement pathology, not a property of the
        # solver — observed as a sustained ~7 min remote-TPU tunnel
        # stall that inflated one bench case 165x. Retry (bounded),
        # keeping the global minimum.
        if t_warm <= 1.5 * t_cold + 1.0:
            break
        time.sleep(2.0 * attempt)
    return result, t_warm, t_cold


def solver_opts(config: Dict[str, Any]) -> Dict[str, Any]:
    o = dict(config.get("oracle_solver", {}))
    o.setdefault("ksp_type", "cg")
    o.setdefault("pc_type", "jacobi")
    o.setdefault("rtol", 1e-10)
    o.setdefault("atol", 1e-14)
    return o
