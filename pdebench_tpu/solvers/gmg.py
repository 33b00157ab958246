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

import dataclasses
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side stencil ops (setup only)
# ---------------------------------------------------------------------------


import itertools


def _apply_stencil_np(W: np.ndarray, offsets, u: np.ndarray) -> np.ndarray:
    pad = int(max(abs(o) for off in offsets for o in off)) if offsets else 0
    up = np.pad(u, pad)
    out = np.zeros_like(u)
    for k, off in enumerate(offsets):
        sl = tuple(slice(pad + o, pad + o + s) for o, s in zip(off, u.shape))
        out += W[k] * up[sl]
    return out


def _restrict_np(u: np.ndarray) -> np.ndarray:
    """Full weighting at even points; shape (m+1,)->(m/2+1,) per axis."""
    k = np.array([0.25, 0.5, 0.25])
    dim = u.ndim
    up = np.pad(u, 1)
    out = np.zeros_like(u)
    for off in itertools.product((-1, 0, 1), repeat=dim):
        w = np.prod([k[o + 1] for o in off])
        sl = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, u.shape))
        out += w * up[sl]
    return out[(slice(None, None, 2),) * dim]


def _prolong_np(uc: np.ndarray, fine_shape) -> np.ndarray:
    """Multilinear interpolation from the even-point coarse lattice.

    Axis-by-axis: inject at even points, then average odd points along
    each axis in turn (gives exact bi/tri-linear weights)."""
    dim = len(fine_shape)
    out = np.zeros(fine_shape, dtype=uc.dtype)
    out[(slice(None, None, 2),) * dim] = uc
    for ax in range(dim):
        even = [slice(None)] * dim
        odd = [slice(None)] * dim
        lo = [slice(None)] * dim
        hi = [slice(None)] * dim
        # along ax, only where previous axes already filled: previous
        # axes are fully filled, later axes still even-only — restrict
        # later axes to even indices
        for later in range(ax + 1, dim):
            for sl in (odd, lo, hi):
                sl[later] = slice(None, None, 2)
        odd[ax] = slice(1, None, 2)
        lo[ax] = slice(None, -1, 2)
        hi[ax] = slice(2, None, 2)
        out[tuple(odd)] = 0.5 * (out[tuple(lo)] + out[tuple(hi)])
    return out


def _coarsen_stencil(
    W: np.ndarray, offsets, shape
) -> Tuple[np.ndarray, list, tuple]:
    """Galerkin coarse stencil A_c = R A P via comb probing (any dim)."""
    dim = len(shape)
    shape_c = tuple((s - 1) // 2 + 1 for s in shape)
    pad_f = int(max(abs(o) for off in offsets for o in off))
    # T's coarse reach: (pad_f + 2) / 2 rounded up
    pad_c = -(-(pad_f + 2) // 2)
    s = 2 * pad_c + 1  # comb spacing in coarse points

    # responses to coarse indicator combs, one per phase
    resp = {}
    for phase in itertools.product(range(s), repeat=dim):
        e = np.zeros(shape_c)
        e[tuple(slice(p, None, s) for p in phase)] = 1.0
        resp[phase] = _restrict_np(
            _apply_stencil_np(W, offsets, _prolong_np(e, shape))
        )

    offs_c = list(
        itertools.product(range(-pad_c, pad_c + 1), repeat=dim)
    )
    grids = np.meshgrid(*[np.arange(n) for n in shape_c], indexing="ij")
    Wc = np.zeros((len(offs_c),) + shape_c)
    for k, off in enumerate(offs_c):
        col = [g + o for g, o in zip(grids, off)]
        valid = np.ones(shape_c, dtype=bool)
        for c, n in zip(col, shape_c):
            valid &= (c >= 0) & (c < n)
        phases = [np.mod(c, s) for c in col]
        vals = np.zeros(shape_c)
        for phase in itertools.product(range(s), repeat=dim):
            m = valid.copy()
            for p, ph in zip(phases, phase):
                m &= p == ph
            if m.any():
                vals[m] = resp[phase][tuple(g[m] for g in grids)]
        Wc[k] = vals
    # drop all-zero offsets
    keep = [k for k in range(len(offs_c)) if np.abs(Wc[k]).max() > 0]
    return Wc[keep], [offs_c[k] for k in keep], shape_c


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
    # identity-padded shape restriction goes THROUGH when an axis point
    # count is even (halving needs odd); None = direct halving
    pad_to: Optional[Tuple[int, ...]] = None


def _device_apply(level: GMGLevel, u: jnp.ndarray) -> jnp.ndarray:
    up = jnp.pad(u, level.pad)
    out = jnp.zeros_like(u)
    for k, off in enumerate(level.offsets):
        start = tuple(level.pad + o for o in off)
        out = out + level.W[k] * jax.lax.dynamic_slice(up, start, level.shape)
    return out


_FW = (0.25, 0.5, 0.25)


def _device_restrict(u: jnp.ndarray) -> jnp.ndarray:
    dim = u.ndim
    up = jnp.pad(u, 1)
    out = jnp.zeros_like(u)
    import itertools as _it

    for off in _it.product((-1, 0, 1), repeat=dim):
        w = 1.0
        for o in off:
            w *= _FW[o + 1]
        out = out + w * jax.lax.dynamic_slice(
            up, tuple(1 + o for o in off), u.shape
        )
    return out[(slice(None, None, 2),) * dim]


def _device_prolong(uc: jnp.ndarray, fine_shape) -> jnp.ndarray:
    dim = len(fine_shape)
    out = jnp.zeros(fine_shape, dtype=uc.dtype)
    out = out.at[(slice(None, None, 2),) * dim].set(uc)
    for ax in range(dim):
        odd = [slice(None)] * dim
        lo = [slice(None)] * dim
        hi = [slice(None)] * dim
        for later in range(ax + 1, dim):
            for sl in (odd, lo, hi):
                sl[later] = slice(None, None, 2)
        odd[ax] = slice(1, None, 2)
        lo[ax] = slice(None, -1, 2)
        hi[ax] = slice(2, None, 2)
        out = out.at[tuple(odd)].set(
            0.5 * (out[tuple(lo)] + out[tuple(hi)])
        )
    return out


@dataclass
class LatticeGMG:
    levels: List[GMGLevel]
    coarse_inv: jnp.ndarray  # dense pinv on the coarsest lattice (flat)
    coarse_shape: Tuple[int, int]
    # True when the hierarchy was coarsened from a DIFFERENT matrix than
    # the system operator (e.g. Helmholtz's shifted Laplacian): level-0
    # is then only valid as a preconditioner, never as the Krylov
    # operator (see dispatch.solve_constrained_ir).
    surrogate: bool = False
    # True when any level restricts through an identity-padded shape
    # (even axis sizes mid-hierarchy); fused Pallas builders assume the
    # pure-halving layout and must skip padded hierarchies.
    padded: bool = False

    def precond(self) -> Callable:
        def vcycle(i: int, r: jnp.ndarray) -> jnp.ndarray:
            if i == len(self.levels):
                flat = self.coarse_inv @ r.reshape(-1)
                return flat.reshape(self.coarse_shape)
            lv = self.levels[i]
            x = lv.omega * lv.diag_inv * r
            res = r - _device_apply(lv, x)
            if lv.pad_to is not None:
                res = jnp.pad(
                    res,
                    [(0, p - s) for s, p in zip(lv.shape, lv.pad_to)],
                )
            xc = vcycle(i + 1, _device_restrict(res))
            xp = _device_prolong(xc, lv.pad_to or lv.shape)
            if lv.pad_to is not None:
                xp = xp[tuple(slice(0, s) for s in lv.shape)]
            x = x + xp
            x = x + lv.omega * lv.diag_inv * (r - _device_apply(lv, x))
            return x

        return lambda r2d: vcycle(0, r2d)


def _level_from_np(W, offsets, shape, dtype) -> GMGLevel:
    pad = int(max(abs(o) for off in offsets for o in off))
    # diagonal = the all-zero offset plane
    diag = None
    for k, off in enumerate(offsets):
        if all(o == 0 for o in off):
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


# ---------------------------------------------------------------------------
# block (vector) lattices — elasticity-class systems
# ---------------------------------------------------------------------------


def _apply_block_np(W, offsets, u):
    """u (..., d) -> (..., d) with block stencil W (K, ..., d, d)."""
    pad = int(max(abs(o) for off in offsets for o in off)) if offsets else 0
    spatial = u.shape[:-1]
    up = np.pad(u, [(pad, pad)] * len(spatial) + [(0, 0)])
    out = np.zeros_like(u)
    for k, off in enumerate(offsets):
        sl = tuple(
            slice(pad + o, pad + o + s) for o, s in zip(off, spatial)
        ) + (slice(None),)
        out += np.einsum("...ab,...b->...a", W[k], up[sl])
    return out


def _restrict_block_np(u):
    return np.stack(
        [_restrict_np(u[..., c]) for c in range(u.shape[-1])], axis=-1
    )


def _prolong_block_np(uc, fine_spatial):
    return np.stack(
        [
            _prolong_np(uc[..., c], fine_spatial)
            for c in range(uc.shape[-1])
        ],
        axis=-1,
    )


def _coarsen_block_stencil(W, offsets, shape, d):
    """Galerkin coarse BLOCK stencil via per-component comb probing."""
    dim = len(shape)
    shape_c = tuple((s - 1) // 2 + 1 for s in shape)
    pad_f = int(max(abs(o) for off in offsets for o in off))
    pad_c = -(-(pad_f + 2) // 2)
    s = 2 * pad_c + 1

    resp = {}
    for phase in itertools.product(range(s), repeat=dim):
        for b in range(d):
            e = np.zeros(shape_c + (d,))
            e[tuple(slice(p, None, s) for p in phase) + (b,)] = 1.0
            resp[phase + (b,)] = _restrict_block_np(
                _apply_block_np(W, offsets, _prolong_block_np(e, shape))
            )

    offs_c = list(itertools.product(range(-pad_c, pad_c + 1), repeat=dim))
    grids = np.meshgrid(*[np.arange(n) for n in shape_c], indexing="ij")
    Wc = np.zeros((len(offs_c),) + shape_c + (d, d))
    for k, off in enumerate(offs_c):
        col = [g + o for g, o in zip(grids, off)]
        valid = np.ones(shape_c, dtype=bool)
        for c, n in zip(col, shape_c):
            valid &= (c >= 0) & (c < n)
        phases = [np.mod(c, s) for c in col]
        for phase in itertools.product(range(s), repeat=dim):
            m = valid.copy()
            for p, ph in zip(phases, phase):
                m &= p == ph
            if not m.any():
                continue
            for b in range(d):
                r = resp[phase + (b,)]
                Wc[k][m, :, b] = r[tuple(g[m] for g in grids)]
    keep = [k for k in range(len(offs_c)) if np.abs(Wc[k]).max() > 0]
    return Wc[keep], [offs_c[k] for k in keep], shape_c


def _block_inv_np(D):
    """Per-point inverse of (..., d, d) blocks."""
    d = D.shape[-1]
    if d == 2:
        a, b = D[..., 0, 0], D[..., 0, 1]
        c, e = D[..., 1, 0], D[..., 1, 1]
        det = a * e - b * c
        det = np.where(np.abs(det) > 1e-300, det, 1.0)
        inv = np.empty_like(D)
        inv[..., 0, 0] = e / det
        inv[..., 0, 1] = -b / det
        inv[..., 1, 0] = -c / det
        inv[..., 1, 1] = a / det
        return inv
    return np.linalg.pinv(D)


@dataclass
class BlockGMGLevel:
    W: jnp.ndarray  # (K, ..., d, d)
    offsets: tuple
    pad: int
    shape: Tuple[int, ...]  # spatial
    d: int
    diag_inv: jnp.ndarray  # (..., d, d) block inverse
    omega: float
    pad_to: Optional[Tuple[int, ...]] = None  # see GMGLevel.pad_to


def _device_apply_block(lv: BlockGMGLevel, u: jnp.ndarray) -> jnp.ndarray:
    up = jnp.pad(u, [(lv.pad, lv.pad)] * len(lv.shape) + [(0, 0)])
    out = jnp.zeros_like(u)
    for k, off in enumerate(lv.offsets):
        start = tuple(lv.pad + o for o in off) + (0,)
        tap = jax.lax.dynamic_slice(up, start, lv.shape + (lv.d,))
        out = out + jnp.einsum("...ab,...b->...a", lv.W[k], tap)
    return out


def _device_restrict_block(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [_device_restrict(u[..., c]) for c in range(u.shape[-1])], axis=-1
    )


def _device_prolong_block(uc: jnp.ndarray, fine_spatial) -> jnp.ndarray:
    return jnp.stack(
        [
            _device_prolong(uc[..., c], fine_spatial)
            for c in range(uc.shape[-1])
        ],
        axis=-1,
    )


@dataclass
class BlockLatticeGMG:
    levels: List[BlockGMGLevel]
    coarse_inv: jnp.ndarray
    coarse_shape: Tuple[int, ...]
    d: int
    surrogate: bool = False  # see LatticeGMG.surrogate
    padded: bool = False  # see LatticeGMG.padded

    def precond(self) -> Callable:
        def vcycle(i: int, r: jnp.ndarray) -> jnp.ndarray:
            if i == len(self.levels):
                flat = self.coarse_inv @ r.reshape(-1)
                return flat.reshape(self.coarse_shape + (self.d,))
            lv = self.levels[i]
            smooth = lambda rr: lv.omega * jnp.einsum(
                "...ab,...b->...a", lv.diag_inv, rr
            )
            x = smooth(r)
            res = r - _device_apply_block(lv, x)
            if lv.pad_to is not None:
                res = jnp.pad(
                    res,
                    [(0, p - s) for s, p in zip(lv.shape, lv.pad_to)]
                    + [(0, 0)],
                )
            xc = vcycle(i + 1, _device_restrict_block(res))
            xp = _device_prolong_block(xc, lv.pad_to or lv.shape)
            if lv.pad_to is not None:
                xp = xp[tuple(slice(0, s) for s in lv.shape)]
            x = x + xp
            x = x + smooth(r - _device_apply_block(lv, x))
            return x

        return lambda r: vcycle(0, r)


def _block_level_from_np(W, offsets, shape, d, dtype) -> BlockGMGLevel:
    pad = int(max(abs(o) for off in offsets for o in off))
    D = None
    for k, off in enumerate(offsets):
        if all(o == 0 for o in off):
            D = W[k]
    Dinv = _block_inv_np(D)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape + (d,))
    lam = 1.0
    for _ in range(8):
        x = np.einsum(
            "...ab,...b->...a", Dinv, _apply_block_np(W, offsets, x)
        )
        nrm = np.linalg.norm(x)
        if nrm == 0:
            break
        lam = nrm
        x /= nrm
    return BlockGMGLevel(
        W=jnp.asarray(W).astype(dtype),
        offsets=tuple(tuple(o) for o in offsets),
        pad=pad,
        shape=shape,
        d=d,
        diag_inv=jnp.asarray(Dinv).astype(dtype),
        omega=float(0.9 / max(lam, 1e-12)),
    )


def _pad_identity(W, offsets, shape, shape_pad) -> np.ndarray:
    """Grow a stencil lattice with decoupled identity sites: weight
    planes zero-padded (no row couples into the new slab), diagonal
    plane = 1 at padded sites. The padded operator acts as the original
    on the original block and as the identity on the slab."""
    pads = [(0, p - s) for s, p in zip(shape, shape_pad)]
    Wp = np.stack([np.pad(np.asarray(W)[k], pads) for k in range(len(W))])
    for k, off in enumerate(offsets):
        if all(o == 0 for o in off):
            mask = np.ones(shape_pad, dtype=bool)
            mask[tuple(slice(0, s) for s in shape)] = False
            Wp[k][mask] = 1.0
    return Wp


def _pad_identity_block(W, offsets, shape, shape_pad, d) -> np.ndarray:
    """Block analog of _pad_identity: spatial zero-pad, eye(d) diagonal
    blocks at the padded sites."""
    dim = len(shape)
    pads = [(0, p - s) for s, p in zip(shape, shape_pad)] + [(0, 0), (0, 0)]
    Wp = np.stack([np.pad(np.asarray(W)[k], pads) for k in range(len(W))])
    for k, off in enumerate(offsets):
        if all(o == 0 for o in off):
            mask = np.ones(shape_pad, dtype=bool)
            mask[tuple(slice(0, s) for s in shape)] = False
            Wp[k][mask] = np.eye(d)
    del dim
    return Wp


def _dense_coarse_inv(A: np.ndarray) -> np.ndarray:
    """Dense coarse-level inverse. LU-based inv (the constrained coarse
    operator is nonsingular); SVD pinv only as the singular fallback —
    pinv's SVD is O(n^3) with a huge constant and hung for hours on a
    non-halvable 18k-dof coarse level (res-190 elasticity)."""
    if A.shape[0] > 4000:
        # a coarse level this size means halving stopped early; the
        # V-cycle would be dominated by the dense solve anyway — make
        # the caller fall back to AMG/Jacobi paths
        raise ValueError(
            f"coarse level too large for dense inverse: {A.shape[0]}"
        )
    try:
        return np.linalg.inv(A)
    except np.linalg.LinAlgError:
        return np.linalg.pinv(A)


def setup_block_gmg(
    W: np.ndarray,
    offsets,
    shape: Tuple[int, ...],
    d: int,
    dtype=jnp.float32,
    coarse_size: int = 800,
    max_levels: int = 10,
) -> BlockLatticeGMG:
    """Block-stencil GMG for vector lattice operators (elasticity)."""
    levels: List[BlockGMGLevel] = []
    padded = False
    W_cur = np.asarray(W, dtype=np.float64)
    offs_cur = list(map(tuple, offsets))
    shape_cur = tuple(shape)
    while (
        int(np.prod(shape_cur)) * d > coarse_size
        and len(levels) < max_levels
        and all(s >= 5 for s in shape_cur)
    ):
        lv = _block_level_from_np(W_cur, offs_cur, shape_cur, d, dtype)
        if any((s - 1) % 2 != 0 for s in shape_cur):
            # even axis mid-hierarchy: identity-pad and keep coarsening
            # (res-190 elasticity used to strand an 18k-dof coarse
            # level here) — see setup_gmg
            shape_pad = tuple(
                s + 1 if (s - 1) % 2 != 0 else s for s in shape_cur
            )
            lv = dataclasses.replace(lv, pad_to=shape_pad)
            padded = True
            W_next = _pad_identity_block(
                W_cur, offs_cur, shape_cur, shape_pad, d
            )
            levels.append(lv)
            W_cur, offs_cur, shape_cur = _coarsen_block_stencil(
                W_next, offs_cur, shape_pad, d
            )
        else:
            levels.append(lv)
            W_cur, offs_cur, shape_cur = _coarsen_block_stencil(
                W_cur, offs_cur, shape_cur, d
            )
    n = int(np.prod(shape_cur)) * d
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(shape_cur + (d,))
        e.reshape(-1)[j] = 1.0
        A[:, j] = _apply_block_np(W_cur, offs_cur, e).reshape(-1)
    coarse_inv = jnp.asarray(_dense_coarse_inv(A)).astype(dtype)
    return BlockLatticeGMG(
        levels=levels,
        coarse_inv=coarse_inv,
        coarse_shape=shape_cur,
        d=d,
        padded=padded,
    )


def attach_lattice_gmg(lat32, mask_np, A_override=None) -> None:
    """Build and attach a GMG hierarchy (scalar or block) to a lattice
    operator, from the CONSTRAINED weights.

    Default path derives the constrained stencil directly from the
    operator's own weights (no CSR round trip — that cost minutes at
    5e5 dofs). A_override provides a DIFFERENT matrix to coarsen (e.g.
    Helmholtz's shifted Laplacian), taking the CSR route.
    """
    from .amg import constrained_csr
    from .stencil import (
        BlockLatticeOperator,
        LatticeOperator,
        constrain_stencil_weights,
    )

    d = getattr(lat32, "ncomp", 1)
    mask_np = np.asarray(mask_np, dtype=bool)
    if A_override is not None:
        A_bc = constrained_csr(A_override, mask_np)
        if d > 1:
            lat_bc = BlockLatticeOperator(
                A_bc, lat32.lattice, d, dtype=jnp.float32
            )
        else:
            lat_bc = LatticeOperator(A_bc, lat32.lattice, dtype=jnp.float32)
        W_bc, offs, shape = (
            np.asarray(lat_bc.W, dtype=np.float64),
            lat_bc.offsets,
            lat_bc.shape,
        )
        if lat32.lattice.masked:
            # absent sites embed as all-zero rows; give them a unit
            # diagonal so smoothers never divide by zero
            absent = (lat32.lattice.perm == lat32.lattice.n_dof).reshape(
                shape
            )
            for k, off in enumerate(offs):
                if all(o == 0 for o in off):
                    if d > 1:
                        W_bc[k][absent] = np.eye(d)
                    else:
                        W_bc[k][absent] = 1.0
    else:
        # node-level mask in lattice order (benchmark BCs constrain
        # whole nodes; partial constraints fall back to a plain mask-any)
        if d > 1:
            node_mask = mask_np.reshape(-1, d).any(axis=1)
        else:
            node_mask = mask_np
        # absent sites of masked lattices count as constrained (True)
        mask_lat = lat32.lattice.embed_np(node_mask, True).reshape(
            lat32.shape
        )
        W_bc = constrain_stencil_weights(
            np.asarray(lat32.W, dtype=np.float64),
            lat32.offsets,
            mask_lat,
            d=d,
        )
        offs, shape = lat32.offsets, lat32.shape

    if d > 1:
        lat32.gmg = setup_block_gmg(
            W_bc, offs, shape, d, dtype=jnp.float32
        )
    else:
        lat32.gmg = setup_gmg(W_bc, offs, shape, dtype=jnp.float32)
    lat32.gmg.surrogate = A_override is not None


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
    padded = False
    W_cur, offs_cur, shape_cur = np.asarray(W, dtype=np.float64), list(
        map(tuple, offsets)
    ), tuple(shape)
    while (
        int(np.prod(shape_cur)) > coarse_size
        and len(levels) < max_levels
        and all(s >= 5 for s in shape_cur)
    ):
        lv = _level_from_np(W_cur, offs_cur, shape_cur, dtype)
        # halving needs an odd point count (m+1 points, m even) per
        # axis; when an axis lands EVEN mid-hierarchy (301 -> 151 -> 76
        # at res-150 P2: the silent heat/poisson no-GMG regression),
        # pad it by ONE decoupled identity plane and keep coarsening —
        # the V-cycle zero-pads residuals into (and crops corrections
        # out of) the padded slab.
        if any((s - 1) % 2 != 0 for s in shape_cur):
            shape_pad = tuple(
                s + 1 if (s - 1) % 2 != 0 else s for s in shape_cur
            )
            lv = dataclasses.replace(lv, pad_to=shape_pad)
            padded = True
            W_next = _pad_identity(W_cur, offs_cur, shape_cur, shape_pad)
            levels.append(lv)
            W_cur, offs_cur, shape_cur = _coarsen_stencil(
                W_next, offs_cur, shape_pad
            )
        else:
            levels.append(lv)
            W_cur, offs_cur, shape_cur = _coarsen_stencil(
                W_cur, offs_cur, shape_cur
            )
    # dense coarse inverse
    n = int(np.prod(shape_cur))
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros(shape_cur)
        e.flat[j] = 1.0
        A[:, j] = _apply_stencil_np(W_cur, offs_cur, e).reshape(-1)
    coarse_inv = jnp.asarray(_dense_coarse_inv(A)).astype(dtype)
    return LatticeGMG(
        levels=levels, coarse_inv=coarse_inv, coarse_shape=shape_cur,
        padded=padded,
    )
