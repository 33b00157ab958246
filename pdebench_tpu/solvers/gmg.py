"""Geometric multigrid on stencil lattices — an entirely gather-free
V-cycle for structured-mesh operators.

The AMG V-cycle's COO matvecs are gather/scatter-bound on TPU. When the
operator lives on a regular lattice (solvers/stencil.py), every piece of
a multigrid hierarchy can be a stencil too:

  - restriction R: 2x full-weighting (a fixed 3x3 [1/4 1/2 1/4]^2 conv,
    evaluated at even lattice points)
  - prolongation P: bilinear interpolation (transpose of R, x4)
  - coarse operator A_c = R A P: ALSO a lattice stencil; its
    position-dependent weights are extracted numerically by comb
    probing (apply T = R.A.P to indicator combs whose spacing exceeds
    the stencil reach; read the rows off the responses)

The resulting V-cycle is shifted multiply-adds + strided slicing only —
VPU work at HBM bandwidth, no sparse machinery. Used as the M32
preconditioner inside mixed-precision refinement for structured cases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side stencil ops (setup only)
# ---------------------------------------------------------------------------


def _apply_stencil_np(W: np.ndarray, offsets, u: np.ndarray) -> np.ndarray:
    pad = int(max(abs(o) for off in offsets for o in off)) if offsets else 0
    up = np.pad(u, pad)
    out = np.zeros_like(u)
    ny, nx = u.shape
    for k, (dy, dx) in enumerate(offsets):
        out += W[k] * up[pad + dy : pad + dy + ny, pad + dx : pad + dx + nx]
    return out


def _restrict_np(u: np.ndarray) -> np.ndarray:
    """Full weighting at even points; shape (m+1,)->(m/2+1,) per axis."""
    k = np.array([0.25, 0.5, 0.25])
    up = np.pad(u, 1)
    ny, nx = u.shape
    out = np.zeros_like(u)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out += (
                k[dy + 1]
                * k[dx + 1]
                * up[1 + dy : 1 + dy + ny, 1 + dx : 1 + dx + nx]
            )
    return out[::2, ::2]


def _prolong_np(uc: np.ndarray, fine_shape) -> np.ndarray:
    """Bilinear interpolation from the even-point coarse lattice."""
    ny, nx = fine_shape
    out = np.zeros(fine_shape, dtype=uc.dtype)
    out[::2, ::2] = uc
    out[1::2, ::2] = 0.5 * (out[:-1:2, ::2] + out[2::2, ::2])
    out[:, 1::2] = 0.5 * (out[:, :-1:2] + out[:, 2::2])
    return out


def _coarsen_stencil(
    W: np.ndarray, offsets, shape
) -> Tuple[np.ndarray, list, tuple]:
    """Galerkin coarse stencil A_c = R A P via comb probing."""
    ny, nx = shape
    nyc, nxc = (ny - 1) // 2 + 1, (nx - 1) // 2 + 1
    pad_f = int(max(abs(o) for off in offsets for o in off))
    # T's coarse reach: (pad_f + 2) / 2 rounded up
    pad_c = -(-(pad_f + 2) // 2)
    s = 2 * pad_c + 1  # comb spacing in coarse points

    # responses to coarse indicator combs, one per phase
    resp = {}
    for py in range(s):
        for px in range(s):
            e = np.zeros((nyc, nxc))
            e[py::s, px::s] = 1.0
            Te = _restrict_np(
                _apply_stencil_np(W, offsets, _prolong_np(e, shape))
            )
            resp[(py, px)] = Te

    offs_c = [
        (dy, dx)
        for dy in range(-pad_c, pad_c + 1)
        for dx in range(-pad_c, pad_c + 1)
    ]
    PY, PX = np.meshgrid(np.arange(nyc), np.arange(nxc), indexing="ij")
    Wc = np.zeros((len(offs_c), nyc, nxc))
    for k, (dy, dx) in enumerate(offs_c):
        cy, cx = PY + dy, PX + dx
        valid = (cy >= 0) & (cy < nyc) & (cx >= 0) & (cx < nxc)
        phase_y = np.mod(cy, s)
        phase_x = np.mod(cx, s)
        vals = np.zeros((nyc, nxc))
        for py in range(s):
            for px in range(s):
                m = valid & (phase_y == py) & (phase_x == px)
                if m.any():
                    vals[m] = resp[(py, px)][PY[m], PX[m]]
        Wc[k] = vals
    # drop all-zero offsets
    keep = [k for k in range(len(offs_c)) if np.abs(Wc[k]).max() > 0]
    return Wc[keep], [offs_c[k] for k in keep], (nyc, nxc)


# ---------------------------------------------------------------------------
# device-side V-cycle
# ---------------------------------------------------------------------------


@dataclass
class GMGLevel:
    W: jnp.ndarray
    offsets: tuple
    pad: int
    shape: Tuple[int, int]
    diag_inv: jnp.ndarray
    omega: float


def _device_apply(level: GMGLevel, u: jnp.ndarray) -> jnp.ndarray:
    up = jnp.pad(u, level.pad)
    out = jnp.zeros_like(u)
    for k, off in enumerate(level.offsets):
        start = tuple(level.pad + o for o in off)
        out = out + level.W[k] * jax.lax.dynamic_slice(up, start, level.shape)
    return out


def _device_restrict(u: jnp.ndarray) -> jnp.ndarray:
    k = jnp.asarray([0.25, 0.5, 0.25], dtype=u.dtype)
    up = jnp.pad(u, 1)
    ny, nx = u.shape
    out = jnp.zeros_like(u)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out + k[dy + 1] * k[dx + 1] * jax.lax.dynamic_slice(
                up, (1 + dy, 1 + dx), (ny, nx)
            )
    return out[::2, ::2]


def _device_prolong(uc: jnp.ndarray, fine_shape) -> jnp.ndarray:
    out = jnp.zeros(fine_shape, dtype=uc.dtype)
    out = out.at[::2, ::2].set(uc)
    out = out.at[1::2, ::2].set(0.5 * (out[:-1:2, ::2] + out[2::2, ::2]))
    out = out.at[:, 1::2].set(0.5 * (out[:, :-1:2] + out[:, 2::2]))
    return out


@dataclass
class LatticeGMG:
    levels: List[GMGLevel]
    coarse_inv: jnp.ndarray  # dense pinv on the coarsest lattice (flat)
    coarse_shape: Tuple[int, int]

    def precond(self) -> Callable:
        def vcycle(i: int, r: jnp.ndarray) -> jnp.ndarray:
            if i == len(self.levels):
                flat = self.coarse_inv @ r.reshape(-1)
                return flat.reshape(self.coarse_shape)
            lv = self.levels[i]
            x = lv.omega * lv.diag_inv * r
            res = r - _device_apply(lv, x)
            xc = vcycle(i + 1, _device_restrict(res))
            x = x + _device_prolong(xc, lv.shape)
            x = x + lv.omega * lv.diag_inv * (r - _device_apply(lv, x))
            return x

        return lambda r2d: vcycle(0, r2d)


def _level_from_np(W, offsets, shape, dtype) -> GMGLevel:
    pad = int(max(abs(o) for off in offsets for o in off))
    # diagonal = the (0,0) offset plane
    diag = None
    for k, off in enumerate(offsets):
        if off == (0, 0):
            diag = W[k]
    diag = np.where(np.abs(diag) > 1e-300, diag, 1.0)
    # spectral-safe damping via power iteration on D^-1 A
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape)
    lam = 1.0
    for _ in range(8):
        x = _apply_stencil_np(W, offsets, x) / diag
        nrm = np.linalg.norm(x)
        if nrm == 0:
            break
        lam = nrm
        x /= nrm
    return GMGLevel(
        W=jnp.asarray(W).astype(dtype),
        offsets=tuple(tuple(o) for o in offsets),
        pad=pad,
        shape=shape,
        diag_inv=jnp.asarray(1.0 / diag).astype(dtype),
        omega=float(0.9 / max(lam, 1e-12)),
    )


def setup_gmg(
    W: np.ndarray,
    offsets,
    shape: Tuple[int, int],
    dtype=jnp.float32,
    coarse_size: int = 600,
    max_levels: int = 10,
) -> LatticeGMG:
    """Build the stencil-GMG hierarchy for a (constrained) 2-D lattice
    operator. W must already encode Dirichlet rows as identity (use
    stencil weights of the constrained matrix)."""
    levels: List[GMGLevel] = []
    W_cur, offs_cur, shape_cur = np.asarray(W, dtype=np.float64), list(
        map(tuple, offsets)
    ), tuple(shape)
    while (
        shape_cur[0] * shape_cur[1] > coarse_size
        and len(levels) < max_levels
        # halving needs an odd point count (m+1 points, m even) per axis
        and (shape_cur[0] - 1) % 2 == 0
        and (shape_cur[1] - 1) % 2 == 0
    ):
        levels.append(_level_from_np(W_cur, offs_cur, shape_cur, dtype))
        W_cur, offs_cur, shape_cur = _coarsen_stencil(
            W_cur, offs_cur, shape_cur
        )
    # dense coarse inverse
    n = shape_cur[0] * shape_cur[1]
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(shape_cur)
        e.flat[j] = 1.0
        A[:, j] = _apply_stencil_np(W_cur, offs_cur, e).reshape(-1)
    coarse_inv = jnp.asarray(np.linalg.pinv(A)).astype(dtype)
    return LatticeGMG(
        levels=levels, coarse_inv=coarse_inv, coarse_shape=shape_cur
    )
