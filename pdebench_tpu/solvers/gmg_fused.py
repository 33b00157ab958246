"""Fused GMG-preconditioned inner CG as ONE Pallas TPU kernel.

The mixed-precision refinement's inner loop (krylov.refined_solve
inner_cg) runs `inner_iters` PCG steps where each step is a fine-level
stencil apply plus a full V-cycle — dozens of XLA ops per iteration,
each re-reading the weight planes from HBM. At benchmark lattice sizes
everything (all levels' weights, transfer bands, work vectors) fits in
VMEM, so this kernel keeps the ENTIRE inner CG resident:

  - stencil applies: pltpu.roll taps inside zero-padded buffers (the
    pad region is wide enough that wrap-around only brings zeros)
  - restriction / prolongation: banded 1-D transfer matrices applied
    as two matmuls per level (MXU work; no strided ops, which Mosaic
    rejects)
  - coarsest solve: `COARSE_SWEEPS` damped-Jacobi sweeps on the
    coarsest stencil (a slightly weaker coarse solve than the XLA
    path's dense pinv, compensated by a couple of extra CG iterations)
  - CG dots: full-array reductions (pads stay exactly zero: weight,
    diag and transfer pads are zero, so every op preserves the
    invariant)

Scope: 2-D lattices, f32, total VMEM footprint under ~10 MB (P1
benchmark meshes; P2's 25-plane fine stencils at res>=150 exceed it and
keep the XLA path).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

COARSE_SWEEPS = 10


def _ru(v: int, m: int) -> int:
    return -(-v // m) * m


def _restrict_band(n_f: int) -> np.ndarray:
    """(n_c, n_f) full-weighting band: rows [1/4, 1/2, 1/4] at even
    fine points (boundary-truncated, matching gmg._restrict_np)."""
    n_c = (n_f - 1) // 2 + 1
    B = np.zeros((n_c, n_f))
    for i in range(n_c):
        j = 2 * i
        B[i, j] = 0.5
        if j - 1 >= 0:
            B[i, j - 1] = 0.25
        if j + 1 < n_f:
            B[i, j + 1] = 0.25
    return B


def _prolong_band(n_f: int) -> np.ndarray:
    """(n_f, n_c) linear-interpolation band (matching _prolong_np)."""
    n_c = (n_f - 1) // 2 + 1
    B = np.zeros((n_f, n_c))
    for j in range(n_f):
        if j % 2 == 0:
            B[j, j // 2] = 1.0
        else:
            B[j, (j - 1) // 2] = 0.5
            B[j, (j + 1) // 2] = 0.5
    return B


class _Level:
    def __init__(self, W, offsets, pad, shape, diag_inv, omega):
        ny, nx = shape
        self.ny, self.nx = ny, nx
        self.pad = pad
        self.offsets = offsets
        # zero-pad so in-kernel rolls only wrap zeros across edges
        self.nyp = _ru(ny + pad, 8)
        self.nxp = _ru(nx + pad, 128)
        self.W = np.zeros((W.shape[0], self.nyp, self.nxp), np.float32)
        self.W[:, :ny, :nx] = np.asarray(W, np.float32)
        self.dinv = np.zeros((self.nyp, self.nxp), np.float32)
        self.dinv[:ny, :nx] = omega * np.asarray(diag_inv, np.float32)


def build_fused_inner_cg(
    gmg, inner_iters: int, vmem_budget=10_000_000, interpret: bool = False
):
    """Returns fn(r_lat_flat_f32) -> z_lat_flat_f32 running the whole
    GMG-PCG inner solve in one pallas call, or None if out of scope."""
    if not _HAS_PLTPU:
        return None
    levels = getattr(gmg, "levels", None)
    if not levels or len(levels[0].shape) != 2:
        return None

    lv: List[_Level] = [
        _Level(
            np.asarray(l.W), l.offsets, l.pad, l.shape,
            np.asarray(l.diag_inv), l.omega,
        )
        for l in levels
    ]
    # coarsest stencil: re-probe one level below the last (the XLA path
    # holds a dense pinv there; here we smooth on the coarsest STENCIL
    # instead), when the last level is still halvable
    from .gmg import _coarsen_stencil

    if all((s - 1) % 2 == 0 and s >= 5 for s in levels[-1].shape):
        Wc, offs_c, shape_c = _coarsen_stencil(
            np.asarray(levels[-1].W, np.float64),
            [tuple(o) for o in levels[-1].offsets],
            levels[-1].shape,
        )
        # numpy-only level build: the builder runs at TRACE time inside
        # jitted scans, where any jnp op gets staged (_level_from_np's
        # jnp.asarray would yield tracers)
        diag_c = None
        for k, off in enumerate(offs_c):
            if all(o == 0 for o in off):
                diag_c = Wc[k]
        diag_c = np.where(np.abs(diag_c) > 1e-300, diag_c, 1.0)
        from .gmg import _apply_stencil_np

        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape_c)
        lam = 1.0
        for _ in range(8):
            x = _apply_stencil_np(Wc, offs_c, x) / diag_c
            nrm = np.linalg.norm(x)
            if nrm == 0:
                break
            lam = nrm
            x /= nrm
        pad_c = int(max(abs(o) for off in offs_c for o in off))
        lv.append(
            _Level(
                Wc, [tuple(o) for o in offs_c], pad_c, shape_c,
                1.0 / diag_c, float(0.9 / max(lam, 1e-12)),
            )
        )

    # transfer bands, padded into each level pair's layouts
    Bry, Brx, Bpy, Bpx = [], [], [], []
    for f, c in zip(lv[:-1], lv[1:]):
        by = np.zeros((c.nyp, f.nyp), np.float32)
        by[: (f.ny - 1) // 2 + 1, : f.ny] = _restrict_band(f.ny)
        bx = np.zeros((c.nxp, f.nxp), np.float32)
        bx[: (f.nx - 1) // 2 + 1, : f.nx] = _restrict_band(f.nx)
        py = np.zeros((f.nyp, c.nyp), np.float32)
        py[: f.ny, : c.ny] = _prolong_band(f.ny)
        px = np.zeros((f.nxp, c.nxp), np.float32)
        px[: f.nx, : c.nx] = _prolong_band(f.nx)
        Bry.append(by)
        Brx.append(bx)
        Bpy.append(py)
        Bpx.append(px)

    total = sum(l.W.nbytes + l.dinv.nbytes for l in lv) + sum(
        b.nbytes for bl in (Bry, Brx, Bpy, Bpx) for b in bl
    )
    # work vectors: ~6 fine-size arrays
    total += 8 * lv[0].W.nbytes // max(lv[0].W.shape[0], 1)
    if total > vmem_budget:
        return None

    n_lv = len(lv)
    fine = lv[0]
    meta = [
        dict(
            offsets=[tuple(int(v) for v in o) for o in l.offsets],
            pad=l.pad, nyp=l.nyp, nxp=l.nxp,
        )
        for l in lv
    ]

    def _apply(l, W, u):
        out = None
        for k, (dy, dx) in enumerate(meta[l]["offsets"]):
            t = u
            sy = (-dy) % meta[l]["nyp"]
            if sy:
                t = pltpu.roll(t, jnp.int32(sy), axis=0)
            sx = (-dx) % meta[l]["nxp"]
            if sx:
                t = pltpu.roll(t, jnp.int32(sx), axis=1)
            contrib = W[k] * t
            out = contrib if out is None else out + contrib
        return out

    def _kernel(*refs):
        # refs: r, W_0..W_{n-1}, dinv_0..dinv_{n-1},
        #       Bry_0.., Brx_0.., Bpy_0.., Bpx_0.., out
        r_ref = refs[0]
        Ws = refs[1 : 1 + n_lv]
        Ds = refs[1 + n_lv : 1 + 2 * n_lv]
        k0 = 1 + 2 * n_lv
        m = n_lv - 1
        BryR = refs[k0 : k0 + m]
        BrxR = refs[k0 + m : k0 + 2 * m]
        BpyR = refs[k0 + 2 * m : k0 + 3 * m]
        BpxR = refs[k0 + 3 * m : k0 + 4 * m]
        out_ref = refs[k0 + 4 * m]

        W = [w[:, :, :] for w in Ws]
        D = [d[:, :] for d in Ds]
        By = [b[:, :] for b in BryR]
        Bx = [b[:, :] for b in BrxR]
        Py = [b[:, :] for b in BpyR]
        Px = [b[:, :] for b in BpxR]

        def vcycle(l, r):
            x = D[l] * r
            if l == n_lv - 1:
                for _ in range(COARSE_SWEEPS - 1):
                    x = x + D[l] * (r - _apply(l, W[l], x))
                return x
            res = r - _apply(l, W[l], x)
            rc = jnp.dot(
                By[l], jnp.dot(res, Bx[l].T),
                preferred_element_type=jnp.float32,
            )
            xc = vcycle(l + 1, rc)
            x = x + jnp.dot(
                Py[l], jnp.dot(xc, Px[l].T),
                preferred_element_type=jnp.float32,
            )
            x = x + D[l] * (r - _apply(l, W[l], x))
            return x

        r0 = r_ref[:, :]

        def cg_body(i, state):
            z, res, p, rz = state
            Ap = _apply(0, W[0], p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
            z = z + alpha * p
            res = res - alpha * Ap
            s = vcycle(0, res)
            rz_new = jnp.sum(res * s)
            beta = rz_new / jnp.where(jnp.abs(rz) > 0, rz, 1.0)
            return (z, res, s + beta * p, rz_new)

        p0 = vcycle(0, r0)
        rz0 = jnp.sum(r0 * p0)
        z, _, _, _ = jax.lax.fori_loop(
            0, inner_iters, cg_body,
            (jnp.zeros_like(r0), r0, p0, rz0),
        )
        out_ref[:, :] = z

    args_np = (
        [jnp.asarray(l.W) for l in lv]
        + [jnp.asarray(l.dinv) for l in lv]
        + [jnp.asarray(b) for b in Bry]
        + [jnp.asarray(b) for b in Brx]
        + [jnp.asarray(b) for b in Bpy]
        + [jnp.asarray(b) for b in Bpx]
    )
    in_specs = [
        pl.BlockSpec(
            (fine.nyp, fine.nxp), lambda: (jnp.int32(0), jnp.int32(0))
        )
    ]
    for a in args_np:
        if a.ndim == 3:
            in_specs.append(
                pl.BlockSpec(
                    a.shape,
                    lambda: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    a.shape, lambda: (jnp.int32(0), jnp.int32(0))
                )
            )

    call = pl.pallas_call(
        _kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (fine.nyp, fine.nxp), lambda: (jnp.int32(0), jnp.int32(0))
        ),
        out_shape=jax.ShapeDtypeStruct((fine.nyp, fine.nxp), jnp.float32),
        interpret=interpret,
    )

    ny, nx = fine.ny, fine.nx

    def inner(r_flat: jnp.ndarray) -> jnp.ndarray:
        r2 = r_flat.reshape(ny, nx).astype(jnp.float32)
        r2p = jnp.pad(
            r2, ((0, fine.nyp - ny), (0, fine.nxp - nx))
        )
        z = call(r2p, *args_np)
        return z[:ny, :nx].reshape(-1)

    return inner
