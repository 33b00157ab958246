"""Traced (dynamic-weight) Galerkin block-GMG hierarchies.

Per-Newton-step convected Jacobians (the Navier-Stokes velocity block)
share the mesh adjacency of the constant Stokes part, so their stencil
OFFSETS are fixed and only the weight planes change per step. The GMG
hierarchy built from the STOKES operator gains ~0.1 digit/restart on
the convected Jacobian (measured, BASELINE.md #5) — the fix is to
rebuild the hierarchy from the TRUE per-step Jacobian, inside the jit.

The enabler: Galerkin coarsening A_c = R A P with the fixed
full-weighting R and multilinear P is LINEAR and (up to boundary
truncation) TRANSLATION-INVARIANT in the stencil weight planes:

    A_c[I, I+oc] = sum_{k, a} cR(a) * cP(a + off_k - 2*oc) * W[k][2I+a]

with a in {-1,0,1}^dim, cR(a) = prod(1/4,1/2,1/4), cP(b) = prod(1,1/2,0
for |b|=0,1,>1): each coarse plane is a strided 3^dim correlation of
the fine planes with CONSTANT coefficients — a handful of strided
slices plus one einsum, fully traceable. Boundary truncation of R/P is
reproduced exactly by zero-padding the fine planes (dropped band
entries multiply zeros) and by masking coarse entries whose column
I+oc falls outside the lattice (the static `valid` planes).

Equivalence to the comb-probing coarsener (gmg._coarsen_block_stencil)
is through the OPERATOR ACTION (tests/test_gmg_dyn.py): the probed
version also zeroes out-of-range column entries, and both zero-pad
applies.

Role parity: the reference re-assembles and re-factorizes the PETSc
Jacobian per Newton step (pdebench/oracle/navier_stokes.py:321-353);
here the per-step "factorization" is this traced multigrid hierarchy.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CR = {-1: 0.25, 0: 0.5, 1: 0.25}


def _cp(b: int) -> float:
    if b == 0:
        return 1.0
    if abs(b) == 1:
        return 0.5
    return 0.0


def _taps(dim: int):
    return list(itertools.product((-1, 0, 1), repeat=dim))


def galerkin_coeffs(offsets: Sequence[Tuple[int, ...]], dim: int):
    """Static coarsening coefficients: (offs_c, C) with C[oc, k, a] =
    cR(a) * cP(a + off_k - 2*oc), offsets pruned to nonzero columns.

    Purely adjacency-determined (weight-independent), so one spec
    serves every per-step weight set on the same mesh."""
    taps = _taps(dim)
    pad_f = max(abs(o) for off in offsets for o in off)
    # |2 oc| <= |a + off_k| + 1 <= pad_f + 2  ->  |oc| <= ceil((pad_f+2)/2)
    pad_c = -(-(pad_f + 2) // 2)
    offs_c_all = list(
        itertools.product(range(-pad_c, pad_c + 1), repeat=dim)
    )
    C = np.zeros((len(offs_c_all), len(offsets), len(taps)))
    for o_i, oc in enumerate(offs_c_all):
        for k, off in enumerate(offsets):
            for a_i, a in enumerate(taps):
                cr = 1.0
                cp = 1.0
                for ax in range(dim):
                    cr *= _CR[a[ax]]
                    cp *= _cp(a[ax] + off[ax] - 2 * oc[ax])
                C[o_i, k, a_i] = cr * cp
    keep = [i for i in range(len(offs_c_all)) if np.abs(C[i]).max() > 0]
    return [offs_c_all[i] for i in keep], C[keep]


def _valid_planes(offs_c, shape_c) -> np.ndarray:
    """(Oc,)+shape_c indicator: 1 where the column site I+oc exists."""
    dim = len(shape_c)
    grids = np.meshgrid(
        *[np.arange(n) for n in shape_c], indexing="ij"
    )
    out = np.ones((len(offs_c),) + tuple(shape_c), dtype=np.float64)
    for i, oc in enumerate(offs_c):
        v = np.ones(shape_c, dtype=bool)
        for ax in range(dim):
            c = grids[ax] + oc[ax]
            v &= (c >= 0) & (c < shape_c[ax])
        out[i] = v
    return out


def coarsen_block_np(W, offsets, shape, offs_c, C, valid):
    """Numpy twin of coarsen_block_traced (spec probing + tests)."""
    dim = len(shape)
    shape_c = tuple((s - 1) // 2 + 1 for s in shape)
    d = W.shape[-1]
    K = W.shape[0]
    pads = [(0, 0)] + [(1, 1)] * dim + [(0, 0), (0, 0)]
    Wp = np.pad(np.asarray(W, dtype=np.float64), pads)
    taps = []
    for a in _taps(dim):
        sl = (slice(None),) + tuple(
            slice(1 + ai, 1 + ai + 2 * (sc - 1) + 1, 2)
            for ai, sc in zip(a, shape_c)
        )
        taps.append(Wp[sl])
    S = np.stack(taps, axis=1)  # (K, A, *shape_c, d, d)
    Wc = np.einsum("oka,ka...->o...", C, S)
    return Wc * valid[(...,) + (None,) * 2], shape_c


def coarsen_block_traced(W, offs_c, C, valid, shape_c):
    """Traced Galerkin coarsening of a block stencil.

    W: (K, *shape_f, d, d) traced; C/valid: static (as jnp constants).
    Returns (Oc, *shape_c, d, d).

    2-D runs as ONE stride-2 grouped correlation (the K fine planes are
    input channels, the Oc coarse planes output channels, C the 3x3
    kernel, the (d, d) block entries the batch) — a single conv op
    instead of 3^dim * K strided slices per level, which matters for
    both compile time and launch count inside whole-Newton jits."""
    dim = len(shape_c)
    K, d = W.shape[0], W.shape[-1]
    Oc = len(offs_c)
    if dim == 2:
        ny_c, nx_c = shape_c
        # (K, ny, nx, d, d) -> (d*d, K, ny, nx) batch-of-channels
        Wb = jnp.moveaxis(W, (3, 4), (0, 1)).reshape(
            d * d, K, W.shape[1], W.shape[2]
        )
        kern = jnp.asarray(
            np.asarray(C).reshape(Oc, K, 3, 3), W.dtype
        )
        out = jax.lax.conv_general_dilated(
            Wb.astype(W.dtype), kern,
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # (d*d, Oc, ny_c, nx_c)
        Wc = jnp.moveaxis(
            out.reshape(d, d, Oc, ny_c, nx_c), (0, 1), (3, 4)
        )
    else:
        pads = [(0, 0)] + [(1, 1)] * dim + [(0, 0), (0, 0)]
        Wp = jnp.pad(W, pads)
        taps = []
        for a in _taps(dim):
            start = (0,) + tuple(1 + ai for ai in a) + (0, 0)
            limit = (K,) + tuple(
                1 + ai + 2 * (sc - 1) + 1 for ai, sc in zip(a, shape_c)
            ) + (d, d)
            strides = (1,) + (2,) * dim + (1, 1)
            taps.append(jax.lax.slice(Wp, start, limit, strides))
        S = jnp.stack(taps, axis=1)
        Wc = jnp.einsum("oka,ka...->o...", jnp.asarray(C, W.dtype), S)
    return Wc * jnp.asarray(valid, W.dtype)[(...,) + (None,) * 2]


def constrain_block_weights_traced(W, offsets, keep, eye_d):
    """Traced Dirichlet constraining of block stencil weights: zero
    rows at masked nodes, zero taps with masked sources, eye(d) diagonal
    blocks at masked nodes. `keep` is the static lattice node indicator
    (1 = free, shape = spatial); eye_d the static (d, d) identity."""
    dim = keep.ndim
    pad = max(abs(o) for off in offsets for o in off)
    kp = jnp.pad(keep, pad)
    outs = []
    for k, off in enumerate(offsets):
        src = jax.lax.dynamic_slice(
            kp, tuple(pad + o for o in off), keep.shape
        )
        Wk = W[k] * (keep * src)[..., None, None]
        if all(o == 0 for o in off):
            Wk = Wk + (1.0 - keep)[..., None, None] * eye_d
        outs.append(Wk)
    return jnp.stack(outs)


def _apply_block_w(W, offsets, pad, shape, u):
    """Block stencil apply with explicit traced weights; u (*shape, d)."""
    up = jnp.pad(u, [(pad, pad)] * len(shape) + [(0, 0)])
    out = jnp.zeros_like(u)
    d = u.shape[-1]
    for k, off in enumerate(offsets):
        start = tuple(pad + o for o in off) + (0,)
        tap = jax.lax.dynamic_slice(up, start, tuple(shape) + (d,))
        out = out + jnp.einsum("...ab,...b->...a", W[k], tap)
    return out


def _block_inv_traced(D):
    """Per-point inverse of (..., 2, 2) blocks (Cramer); identity on
    near-singular blocks. d > 2 falls back to a diagonal inverse."""
    d = D.shape[-1]
    if d == 2:
        a, b = D[..., 0, 0], D[..., 0, 1]
        c, e = D[..., 1, 0], D[..., 1, 1]
        det = a * e - b * c
        ok = jnp.abs(det) > 1e-30
        ds = jnp.where(ok, det, 1.0)
        inv = jnp.stack(
            [
                jnp.stack([e / ds, -b / ds], axis=-1),
                jnp.stack([-c / ds, a / ds], axis=-1),
            ],
            axis=-2,
        )
        eye = jnp.broadcast_to(jnp.eye(2, dtype=D.dtype), inv.shape)
        return jnp.where(ok[..., None, None], inv, eye)
    dg = jnp.diagonal(D, axis1=-2, axis2=-1)
    safe = jnp.where(jnp.abs(dg) > 1e-30, dg, 1.0)
    return jnp.eye(d, dtype=D.dtype) / safe[..., None]


@dataclass
class DynLevelSpec:
    offsets: List[Tuple[int, ...]]
    shape: Tuple[int, ...]
    pad: int
    diag_k: int
    omega: float
    pad_to: Optional[Tuple[int, ...]] = None
    # coarsening to the next level (None on the coarsest)
    offs_c: Optional[List[Tuple[int, ...]]] = None
    C: Optional[np.ndarray] = None
    valid: Optional[np.ndarray] = None
    # identity-pad constants (set when pad_to is not None)
    eye_pad: Optional[np.ndarray] = None


@dataclass
class DynBlockHierarchySpec:
    levels: List[DynLevelSpec]
    d: int
    coarse_sweeps: int = 10

    def build_levels(self, W0: jnp.ndarray):
        """Per-step traced hierarchy: [(W, omega*Dinv)] per level."""
        out = []
        W = W0
        for i, sp in enumerate(self.levels):
            Dinv = _block_inv_traced(W[sp.diag_k]) * jnp.asarray(
                sp.omega, W.dtype
            )
            out.append((W, Dinv))
            if sp.C is None:
                break
            Wn = W
            if sp.pad_to is not None:
                pads = [(0, 0)] + [
                    (0, p - s) for s, p in zip(sp.shape, sp.pad_to)
                ] + [(0, 0), (0, 0)]
                Wn = jnp.pad(W, pads) + jnp.asarray(sp.eye_pad, W.dtype)
            W = coarsen_block_traced(
                Wn, sp.offs_c, sp.C, sp.valid,
                self.levels[i + 1].shape,
            )
        return out

    def vcycle(self, lv, r):
        """One V-cycle on traced levels lv = build_levels(W0);
        r: (*shape0, d). Damped block-Jacobi smoothing, Jacobi sweeps
        on the coarsest stencil."""
        from .gmg import _device_prolong_block, _device_restrict_block

        n = len(lv)

        def smooth(i, rr):
            return jnp.einsum("...ab,...b->...a", lv[i][1], rr)

        def go(i, r):
            sp = self.levels[i]
            W = lv[i][0]
            x = smooth(i, r)
            if i == n - 1:
                for _ in range(self.coarse_sweeps - 1):
                    res = r - _apply_block_w(
                        W, sp.offsets, sp.pad, sp.shape, x
                    )
                    x = x + smooth(i, res)
                return x
            res = r - _apply_block_w(W, sp.offsets, sp.pad, sp.shape, x)
            if sp.pad_to is not None:
                res = jnp.pad(
                    res,
                    [(0, p - s) for s, p in zip(sp.shape, sp.pad_to)]
                    + [(0, 0)],
                )
            xc = go(i + 1, _device_restrict_block(res))
            xp = _device_prolong_block(xc, sp.pad_to or sp.shape)
            if sp.pad_to is not None:
                xp = xp[tuple(slice(0, s) for s in sp.shape) + (slice(None),)]
            x = x + xp
            res = r - _apply_block_w(W, sp.offsets, sp.pad, sp.shape, x)
            return x + smooth(i, res)

        return go(0, r)


def build_dyn_block_spec(
    offsets: Sequence[Tuple[int, ...]],
    shape: Tuple[int, ...],
    d: int,
    probe_W: Optional[np.ndarray] = None,
    coarse_size: int = 700,
    max_levels: int = 10,
    default_omega: float = 0.6,
) -> Optional[DynBlockHierarchySpec]:
    """Host-side static hierarchy spec from adjacency alone.

    probe_W: optional numpy block weights of a REPRESENTATIVE operator
    (e.g. the constrained Stokes velocity block) — per-level damping
    omegas come from power iteration on its numpy-twin hierarchy;
    without it every level uses default_omega. Returns None when the
    fine stencil is non-compact."""
    dim = len(shape)
    offsets = [tuple(int(v) for v in o) for o in offsets]
    pad0 = max(abs(o) for off in offsets for o in off)
    if pad0 == 0 or pad0 > 4:
        return None

    levels: List[DynLevelSpec] = []
    offs_cur, shape_cur = offsets, tuple(shape)
    W_cur = (
        np.asarray(probe_W, dtype=np.float64)
        if probe_W is not None
        else None
    )
    while True:
        pad = max(abs(o) for off in offs_cur for o in off)
        diag_k = next(
            k for k, off in enumerate(offs_cur) if all(o == 0 for o in off)
        )
        omega = default_omega
        if W_cur is not None:
            from .gmg import _apply_block_np, _block_inv_np

            Dinv = _block_inv_np(W_cur[diag_k])
            rng = np.random.default_rng(0)
            x = rng.standard_normal(shape_cur + (d,))
            lam = 1.0
            for _ in range(8):
                x = np.einsum(
                    "...ab,...b->...a",
                    Dinv,
                    _apply_block_np(W_cur, offs_cur, x),
                )
                nrm = np.linalg.norm(x)
                if nrm == 0:
                    break
                lam = nrm
                x /= nrm
            omega = float(0.9 / max(lam, 1e-12))
        sp = DynLevelSpec(
            offsets=offs_cur, shape=shape_cur, pad=pad,
            diag_k=diag_k, omega=omega,
        )
        done = (
            int(np.prod(shape_cur)) * d <= coarse_size
            or len(levels) + 1 >= max_levels
            or any(s < 5 for s in shape_cur)
        )
        if done:
            levels.append(sp)
            break
        shape_pad = shape_cur
        if any((s - 1) % 2 != 0 for s in shape_cur):
            shape_pad = tuple(
                s + 1 if (s - 1) % 2 != 0 else s for s in shape_cur
            )
            sp.pad_to = shape_pad
            eye_pad = np.zeros(
                (len(offs_cur),) + shape_pad + (d, d)
            )
            m = np.ones(shape_pad, dtype=bool)
            m[tuple(slice(0, s) for s in shape_cur)] = False
            eye_pad[diag_k][m] = np.eye(d)
            sp.eye_pad = eye_pad
            if W_cur is not None:
                from .gmg import _pad_identity_block

                W_cur = _pad_identity_block(
                    W_cur, offs_cur, shape_cur, shape_pad, d
                )
        offs_c, C = galerkin_coeffs(offs_cur, dim)
        shape_c = tuple((s - 1) // 2 + 1 for s in shape_pad)
        valid = _valid_planes(offs_c, shape_c)
        sp.offs_c, sp.C, sp.valid = offs_c, C, valid
        levels.append(sp)
        if W_cur is not None:
            W_cur, _ = coarsen_block_np(
                W_cur, offs_cur, shape_pad, offs_c, C, valid
            )
        offs_cur, shape_cur = offs_c, shape_c
    return DynBlockHierarchySpec(levels=levels, d=d)
