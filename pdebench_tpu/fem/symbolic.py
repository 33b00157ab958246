"""Symbolic layer: case expressions -> traceable JAX callables + MMS calculus.

Every PDE case carries sympy-syntax strings for sources, coefficients,
boundary/initial conditions, and manufactured solutions in the variables
x, y, z, t. This module parses them once on host and lambdifies them into
functions of coordinate arrays that trace cleanly under jit (so, e.g.,
time-dependent sources can be evaluated *inside* a lax.scan time loop).

Parity: replaces the sympy->UFL compiler and MMS helpers of the reference
(pdebench/oracle/common.py:224-283 parse_expression, :544-624 MMS /
exact-grid evaluation).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
import sympy as sp

X, Y, Z, T = sp.symbols("x y z t", real=True)
_LOCALS = {"x": X, "y": Y, "z": Z, "t": T, "pi": sp.pi}

ExprLike = Union[str, float, int, sp.Expr]


def parse(expr: ExprLike) -> sp.Expr:
    if isinstance(expr, sp.Expr):
        return expr
    if isinstance(expr, (int, float)):
        return sp.Float(float(expr))
    return _parse_str(expr)


@lru_cache(maxsize=2048)
def _parse_str(expr: str) -> sp.Expr:
    # sympify is tens of ms per expression and cases repeat expressions
    # heavily (the same u_exact on every BC side, MMS re-derivations,
    # reference_config re-solves) — memoize by source string
    return sp.sympify(expr, locals=_LOCALS)


def _jnp_modules():
    # sympy's lambdify printer for jax-compatible numpy semantics
    return [
        {
            "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "exp": jnp.exp,
            "log": jnp.log, "sqrt": jnp.sqrt, "tanh": jnp.tanh,
            "sinh": jnp.sinh, "cosh": jnp.cosh, "Abs": jnp.abs,
            "atan": jnp.arctan, "asin": jnp.arcsin, "acos": jnp.arccos,
            "atan2": jnp.arctan2, "pi": np.pi, "Max": jnp.maximum,
            "Min": jnp.minimum, "sign": jnp.sign,
        },
        jnp,
    ]


def lambdify_spatial(
    expr: ExprLike, dim: int, with_time: bool = False
) -> Callable:
    """Compile an expression to f(points[, t]) -> values.

    `points` has shape (..., dim); the result broadcasts to points[..., 0].
    The returned callable is jnp-traceable (safe inside jit / scan).
    Memoized: the closures are pure, and repeated (expr, dim) pairs are
    the common case (BC sides, re-solves).
    """
    return _lambdify_spatial_cached(parse(expr), dim, with_time)


@lru_cache(maxsize=1024)
def _lambdify_spatial_cached(
    e: sp.Expr, dim: int, with_time: bool
) -> Callable:
    syms = [X, Y, Z][:dim] + ([T] if with_time else [])
    fn = sp.lambdify(syms, e, modules=_jnp_modules())

    if with_time:

        def call(points, t):
            args = [points[..., d] for d in range(dim)] + [t]
            out = fn(*args)
            return jnp.broadcast_to(jnp.asarray(out, dtype=points.dtype),
                                    points.shape[:-1])

    else:

        def call(points):
            args = [points[..., d] for d in range(dim)]
            out = fn(*args)
            return jnp.broadcast_to(jnp.asarray(out, dtype=points.dtype),
                                    points.shape[:-1])

    return call


def lambdify_numpy(expr: ExprLike, dim: int, with_time: bool = False) -> Callable:
    """Like lambdify_spatial but pure-numpy (for exact grids at f64 on host)."""
    return _lambdify_numpy_cached(parse(expr), dim, with_time)


@lru_cache(maxsize=1024)
def _lambdify_numpy_cached(e: sp.Expr, dim: int, with_time: bool) -> Callable:
    syms = [X, Y, Z][:dim] + ([T] if with_time else [])
    fn = sp.lambdify(syms, e, modules=["numpy"])

    def call(points, t=None):
        args = [points[..., d] for d in range(dim)]
        if with_time:
            args.append(t)
        out = fn(*args)
        return np.broadcast_to(np.asarray(out, dtype=np.float64),
                               points.shape[:-1]).copy()

    return call


def depends_on_t(expr: ExprLike) -> bool:
    return T in parse(expr).free_symbols


# ---------------------------------------------------------------------------
# MMS calculus (manufactured solutions -> derived data)
# ---------------------------------------------------------------------------


def _space_vars(dim: int):
    return [X, Y, Z][:dim]


def laplacian(u: sp.Expr, dim: int) -> sp.Expr:
    return sum(sp.diff(u, v, 2) for v in _space_vars(dim))


def grad(u: sp.Expr, dim: int) -> Sequence[sp.Expr]:
    return [sp.diff(u, v) for v in _space_vars(dim)]


def div(vec: Sequence[sp.Expr], dim: int) -> sp.Expr:
    return sum(sp.diff(f, v) for f, v in zip(vec, _space_vars(dim)))


def div_kappa_grad(u: sp.Expr, kappa: sp.Expr, dim: int) -> sp.Expr:
    """div(kappa * grad(u))."""
    return sum(
        sp.diff(kappa * sp.diff(u, v), v) for v in _space_vars(dim)
    )


def poisson_source(u: ExprLike, kappa: ExprLike, dim: int) -> sp.Expr:
    """f = -div(kappa grad u)  (reference: oracle/poisson.py:59-73)."""
    return sp.simplify(-div_kappa_grad(parse(u), parse(kappa), dim))


def heat_source(u: ExprLike, kappa: ExprLike, dim: int) -> sp.Expr:
    """f = u_t - div(kappa grad u)  (reference: oracle/heat.py:63-77)."""
    uu = parse(u)
    return sp.diff(uu, T) - div_kappa_grad(uu, parse(kappa), dim)
