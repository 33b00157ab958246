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

Scope: scalar 2-D and 3-D lattices (3-D flattens into slab-packed 2-D
planes, _Level3), block (vector) 2-D lattices, CG / GMRES / Richardson
inners, constant or per-step (scan-traced) fine operators. All f32;
per-kernel budgets are checked against the raised Mosaic scoped-vmem
limit (_VMEM_LIMIT; the 16 MB default is far below the 128 MB v5e
VMEM).
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

# Mosaic's scoped-vmem default is 16 MB — far below the 128 MB v5e
# VMEM. The fused kernels keep whole hierarchies + Krylov bases
# resident, so raise the per-kernel limit (measured OOM: m=20 basis +
# P2 res-128 weights needs ~27 MB of stack).
_VMEM_LIMIT = 100 * 1024 * 1024


def _tpu_params():
    try:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    except Exception:  # pragma: no cover - older pallas API
        return None


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


class _Level3:
    """A 3-D lattice level flattened into slab-packed 2-D planes.

    Row index = z * nyp_s + y with nyp_s = ny + pad zero rows between
    slabs: every 3-D stencil offset (dz, dy, dx) becomes the single
    2-D offset (dz * nyp_s + dy, dx), so the 2-D kernel body (rolls,
    banded-matmul transfers, Jacobi sweeps) runs UNCHANGED on 3-D
    problems. The inter-slab zero rows guarantee y-shifts never bleed
    across slabs, and the trailing row pad covers the largest combined
    shift so rolls still only wrap zeros."""

    def __init__(self, W, offsets, pad, shape, diag_inv, omega):
        nz, ny, nx = shape
        self.shape3 = tuple(shape)
        self.pad = pad
        self.nyp_s = ny + pad
        rows = nz * self.nyp_s
        self.ny, self.nx = rows, nx  # flattened logical dims
        self.nyp = _ru(rows + pad * self.nyp_s + pad, 8)
        self.nxp = _ru(nx + pad, 128)
        self.offsets = [
            (dz * self.nyp_s + dy, dx) for (dz, dy, dx) in offsets
        ]
        K = W.shape[0]
        self.W = np.zeros((K, self.nyp, self.nxp), np.float32)
        self.dinv = np.zeros((self.nyp, self.nxp), np.float32)
        for z in range(nz):
            r0 = z * self.nyp_s
            self.W[:, r0 : r0 + ny, :nx] = np.asarray(W[:, z], np.float32)
            self.dinv[r0 : r0 + ny, :nx] = omega * np.asarray(
                diag_inv[z], np.float32
            )

    def embed3(self, r_flat: jnp.ndarray) -> jnp.ndarray:
        """Flat (nz*ny*nx) lattice vector -> packed 2-D plane."""
        nz, ny, nx = self.shape3
        r3 = r_flat.reshape(self.shape3)
        r3p = jnp.pad(
            r3, ((0, 0), (0, self.nyp_s - ny), (0, self.nxp - nx))
        )
        r2 = r3p.reshape(nz * self.nyp_s, self.nxp)
        return jnp.pad(r2, ((0, self.nyp - nz * self.nyp_s), (0, 0)))

    def extract3(self, z2: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.shape3
        z3 = z2[: nz * self.nyp_s].reshape(nz, self.nyp_s, self.nxp)
        return z3[:, :ny, :nx].reshape(-1)

    def embedW3(self, W: jnp.ndarray) -> jnp.ndarray:
        """(K, nz, ny, nx) weight planes -> slab-packed (K, nyp, nxp)."""
        nz, ny, nx = self.shape3
        Wp = jnp.pad(
            W,
            ((0, 0), (0, 0), (0, self.nyp_s - ny), (0, self.nxp - nx)),
        )
        W2 = Wp.reshape(W.shape[0], nz * self.nyp_s, self.nxp)
        return jnp.pad(
            W2, ((0, 0), (0, self.nyp - nz * self.nyp_s), (0, 0))
        )


def _probe_extra_coarse(levels):
    """Re-probe one level below the GMG's last (any dim), numpy-only
    (the builder runs at TRACE time inside jitted scans, where any jnp
    op gets staged). Returns (W, offsets, pad, shape, diag_inv, omega)
    or None when the last level isn't halvable."""
    from .gmg import _apply_stencil_np, _coarsen_stencil

    if not all((s - 1) % 2 == 0 and s >= 5 for s in levels[-1].shape):
        return None
    Wc, offs_c, shape_c = _coarsen_stencil(
        np.asarray(levels[-1].W, np.float64),
        [tuple(o) for o in levels[-1].offsets],
        levels[-1].shape,
    )
    diag_c = None
    for k, off in enumerate(offs_c):
        if all(o == 0 for o in off):
            diag_c = Wc[k]
    diag_c = np.where(np.abs(diag_c) > 1e-300, diag_c, 1.0)
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
    return (
        Wc, [tuple(o) for o in offs_c], pad_c, shape_c,
        1.0 / diag_c, float(0.9 / max(lam, 1e-12)),
    )


def _scalar_hierarchy(gmg):
    """Shared scalar-lattice hierarchy construction: padded levels, an
    extra probed coarsest level (smoothed on its stencil instead of the
    XLA path's dense pinv), and the per-level-pair transfer bands.
    2-D levels map directly; 3-D levels flatten into slab-packed 2-D
    planes (_Level3) with kron'd z*y left-transfer bands.
    Returns (lv, Bry, Brx, Bpy, Bpx, static_bytes) or None."""
    levels = getattr(gmg, "levels", None)
    if getattr(gmg, "padded", False):
        # identity-padded restriction shapes (even mid-hierarchy axes)
        # break the pure-halving transfer-band layout assumed here
        return None
    if not levels or len(levels[0].shape) not in (2, 3):
        return None
    is3d = len(levels[0].shape) == 3
    cls = _Level3 if is3d else _Level

    lv = [
        cls(
            np.asarray(l.W), [tuple(o) for o in l.offsets], l.pad,
            l.shape, np.asarray(l.diag_inv), l.omega,
        )
        for l in levels
    ]
    # coarsest stencil: re-probe one level below the last, when the
    # last level is still halvable
    extra = _probe_extra_coarse(levels)
    shapes = [l.shape for l in levels]
    if extra is not None:
        lv.append(cls(*extra))
        shapes.append(extra[3])

    # transfer bands, padded into each level pair's layouts
    Bry, Brx, Bpy, Bpx = [], [], [], []
    for i, (f, c) in enumerate(zip(lv[:-1], lv[1:])):
        if is3d:
            nz_f, ny_f, nx_f = shapes[i]
            nz_c, ny_c, nx_c = shapes[i + 1]
            # left transfer = kron(Bz, By) placed at slab-packed rows
            Bz_r, By_r = _restrict_band(nz_f), _restrict_band(ny_f)
            Bz_p, By_p = _prolong_band(nz_f), _prolong_band(ny_f)
            rc = (
                np.arange(nz_c)[:, None] * c.nyp_s + np.arange(ny_c)[None, :]
            )
            rf = (
                np.arange(nz_f)[:, None] * f.nyp_s + np.arange(ny_f)[None, :]
            )
            by = np.zeros((c.nyp, f.nyp), np.float32)
            by[rc.reshape(-1)[:, None], rf.reshape(-1)[None, :]] = np.einsum(
                "ab,cd->acbd", Bz_r, By_r
            ).reshape(nz_c * ny_c, nz_f * ny_f)
            py = np.zeros((f.nyp, c.nyp), np.float32)
            py[rf.reshape(-1)[:, None], rc.reshape(-1)[None, :]] = np.einsum(
                "ab,cd->acbd", Bz_p, By_p
            ).reshape(nz_f * ny_f, nz_c * ny_c)
            bx = np.zeros((c.nxp, f.nxp), np.float32)
            bx[: (nx_f - 1) // 2 + 1, :nx_f] = _restrict_band(nx_f)
            px = np.zeros((f.nxp, c.nxp), np.float32)
            px[:nx_f, :nx_c] = _prolong_band(nx_f)
        else:
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

    static = sum(l.W.nbytes + l.dinv.nbytes for l in lv) + sum(
        b.nbytes for bl in (Bry, Brx, Bpy, Bpx) for b in bl
    )
    return lv, Bry, Brx, Bpy, Bpx, static


def build_fused_inner_cg(
    gmg,
    inner_iters: int,
    vmem_budget=10_000_000,
    interpret: bool = False,
    mode: str = "cg",
):
    """Returns fn(r_lat_flat_f32) -> z_lat_flat_f32 running the whole
    GMG-PCG inner solve in one pallas call, or None if out of scope.

    mode="cg": inner_iters PCG steps (nonlinear in r — only valid as a
    full inner solver under iterative refinement).
    mode="richardson": inner_iters chained V-cycles z += V(r - A z) —
    a LINEAR operator in r, safe as the preconditioner inside standard
    (non-flexible) GMRES/MINRES cycles, still one kernel launch."""
    if not _HAS_PLTPU:
        return None
    built = _scalar_hierarchy(gmg)
    if built is None:
        return None
    lv, Bry, Brx, Bpy, Bpx, total = built
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

        if mode == "richardson":
            z = vcycle(0, r0)
            for _ in range(inner_iters - 1):
                res = r0 - _apply(0, W[0], z)
                z = z + vcycle(0, res)
            out_ref[:, :] = z
            return

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
        compiler_params=_tpu_params(),
    )

    ny, nx = fine.ny, fine.nx

    def inner(r_flat: jnp.ndarray) -> jnp.ndarray:
        if isinstance(fine, _Level3):
            z = call(fine.embed3(r_flat.astype(jnp.float32)), *args_np)
            return fine.extract3(z)
        r2 = r_flat.reshape(ny, nx).astype(jnp.float32)
        r2p = jnp.pad(
            r2, ((0, fine.nyp - ny), (0, fine.nxp - nx))
        )
        z = call(r2p, *args_np)
        return z[:ny, :nx].reshape(-1)

    return inner


def build_fused_richardson(
    gmg, n_cycles: int = 2, vmem_budget=10_000_000, interpret: bool = False
):
    """Fused chain of n V-cycles as ONE kernel: z_{k+1} = z_k +
    V(r - A z_k). Linear in r, so usable as the preconditioner in
    non-flexible Krylov cycles (GMRES Arnoldi, MINRES) — one pallas
    launch replaces the dozens of XLA ops per V-cycle that made the
    device saddle path launch-bound."""
    return build_fused_inner_cg(
        gmg, n_cycles, vmem_budget=vmem_budget, interpret=interpret,
        mode="richardson",
    )


# ---------------------------------------------------------------------------
# block (vector) lattices — fused elasticity-class inner solve
# ---------------------------------------------------------------------------


class _BlockLevel:
    def __init__(self, W, offsets, pad, shape, diag_inv, omega, d):
        ny, nx = shape
        self.ny, self.nx = ny, nx
        self.pad = pad
        self.offsets = offsets
        self.d = d
        self.nyp = _ru(ny + pad, 8)
        self.nxp = _ru(nx + pad, 128)
        # (K, d, d, nyp, nxp): W[k, a, b] is the (a<-b) weight plane
        Wn = np.asarray(W, np.float32)  # (K, ny, nx, d, d)
        self.W = np.zeros(
            (Wn.shape[0], d, d, self.nyp, self.nxp), np.float32
        )
        self.W[:, :, :, :ny, :nx] = np.moveaxis(Wn, (3, 4), (1, 2))
        Dn = omega * np.asarray(diag_inv, np.float32)  # (ny, nx, d, d)
        self.dinv = np.zeros((d, d, self.nyp, self.nxp), np.float32)
        self.dinv[:, :, :ny, :nx] = np.moveaxis(Dn, (2, 3), (0, 1))


def build_fused_block_inner_cg(
    gmg,
    inner_iters: int,
    vmem_budget=10_000_000,
    interpret: bool = False,
    mode: str = "cg",
):
    """Fused GMG-PCG inner solve for BLOCK (vector) lattices — the
    elasticity analog of build_fused_inner_cg. Each component lives in
    its own 2-D plane; block taps are d*d plane FMAs per offset, block
    smoothing is a 2x2 per-point matmul, transfers are per-component
    banded matmuls, and the coarsest solve is damped block-Jacobi
    sweeps. Scope: 2-D lattices, d == 2, f32, VMEM-bounded.

    Returns fn(r_lat_flat_f32) -> z_lat_flat_f32 on the block-lattice
    flat layout (site-major, component-minor — the embedding of
    stencil.BlockLatticeOperator), or None if out of scope."""
    if not _HAS_PLTPU:
        return None
    levels = getattr(gmg, "levels", None)
    d = getattr(gmg, "d", 0)
    if getattr(gmg, "padded", False):
        return None  # identity-padded transfers unsupported (see scalar)
    if not levels or len(levels[0].shape) != 2 or d != 2:
        return None

    from .gmg import _apply_block_np, _block_inv_np, _coarsen_block_stencil

    lv: List[_BlockLevel] = [
        _BlockLevel(
            np.asarray(l.W), [tuple(int(v) for v in o) for o in l.offsets],
            l.pad, l.shape, np.asarray(l.diag_inv), l.omega, d,
        )
        for l in levels
    ]
    # coarsest: probe one more level and smooth on its block stencil
    last = levels[-1]
    if all((s - 1) % 2 == 0 and s >= 5 for s in last.shape):
        Wc, offs_c, shape_c = _coarsen_block_stencil(
            np.asarray(last.W, np.float64),
            [tuple(int(v) for v in o) for o in last.offsets],
            last.shape,
            d,
        )
        Dc = None
        for k, off in enumerate(offs_c):
            if all(o == 0 for o in off):
                Dc = Wc[k]
        Dinv_c = _block_inv_np(Dc)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape_c + (d,))
        lam = 1.0
        for _ in range(8):
            x = np.einsum(
                "...ab,...b->...a", Dinv_c,
                _apply_block_np(Wc, offs_c, x),
            )
            nrm = np.linalg.norm(x)
            if nrm == 0:
                break
            lam = nrm
            x /= nrm
        pad_c = int(max(abs(o) for off in offs_c for o in off))
        lv.append(
            _BlockLevel(
                Wc, [tuple(int(v) for v in o) for o in offs_c], pad_c,
                shape_c, Dinv_c, float(0.9 / max(lam, 1e-12)), d,
            )
        )

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
    total += 10 * d * lv[0].nyp * lv[0].nxp * 4
    if total > vmem_budget:
        return None

    n_lv = len(lv)
    fine = lv[0]
    meta = [
        dict(offsets=l.offsets, nyp=l.nyp, nxp=l.nxp) for l in lv
    ]

    def _roll2(t, dy, dx, l):
        sy = (-dy) % meta[l]["nyp"]
        if sy:
            t = pltpu.roll(t, jnp.int32(sy), axis=0)
        sx = (-dx) % meta[l]["nxp"]
        if sx:
            t = pltpu.roll(t, jnp.int32(sx), axis=1)
        return t

    def _apply_b(l, W, u0, u1):
        """Block stencil apply on component planes."""
        o0 = None
        o1 = None
        for k, (dy, dx) in enumerate(meta[l]["offsets"]):
            t0 = _roll2(u0, dy, dx, l)
            t1 = _roll2(u1, dy, dx, l)
            c0 = W[k, 0, 0] * t0 + W[k, 0, 1] * t1
            c1 = W[k, 1, 0] * t0 + W[k, 1, 1] * t1
            o0 = c0 if o0 is None else o0 + c0
            o1 = c1 if o1 is None else o1 + c1
        return o0, o1

    def _kernel(*refs):
        # refs: r0, r1, W_0.., dinv_0.., Bry.., Brx.., Bpy.., Bpx..,
        #       out0, out1
        r0_ref, r1_ref = refs[0], refs[1]
        Ws = refs[2 : 2 + n_lv]
        Ds = refs[2 + n_lv : 2 + 2 * n_lv]
        k0 = 2 + 2 * n_lv
        m = n_lv - 1
        By = [b[:, :] for b in refs[k0 : k0 + m]]
        Bx = [b[:, :] for b in refs[k0 + m : k0 + 2 * m]]
        Py = [b[:, :] for b in refs[k0 + 2 * m : k0 + 3 * m]]
        Px = [b[:, :] for b in refs[k0 + 3 * m : k0 + 4 * m]]
        out0_ref = refs[k0 + 4 * m]
        out1_ref = refs[k0 + 4 * m + 1]

        W = [w[:, :, :, :, :] for w in Ws]
        D = [dd[:, :, :, :] for dd in Ds]

        def smooth(l, r0, r1):
            return (
                D[l][0, 0] * r0 + D[l][0, 1] * r1,
                D[l][1, 0] * r0 + D[l][1, 1] * r1,
            )

        def mm(Bl, Bt, u):
            return jnp.dot(
                Bl, jnp.dot(u, Bt.T, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        def vcycle(l, r0, r1):
            x0, x1 = smooth(l, r0, r1)
            if l == n_lv - 1:
                for _ in range(COARSE_SWEEPS - 1):
                    a0, a1 = _apply_b(l, W[l], x0, x1)
                    s0, s1 = smooth(l, r0 - a0, r1 - a1)
                    x0, x1 = x0 + s0, x1 + s1
                return x0, x1
            a0, a1 = _apply_b(l, W[l], x0, x1)
            rc0 = mm(By[l], Bx[l], r0 - a0)
            rc1 = mm(By[l], Bx[l], r1 - a1)
            xc0, xc1 = vcycle(l + 1, rc0, rc1)
            x0 = x0 + mm(Py[l], Px[l], xc0)
            x1 = x1 + mm(Py[l], Px[l], xc1)
            a0, a1 = _apply_b(l, W[l], x0, x1)
            s0, s1 = smooth(l, r0 - a0, r1 - a1)
            return x0 + s0, x1 + s1

        r0 = r0_ref[:, :]
        r1 = r1_ref[:, :]

        if mode == "richardson":
            z0, z1 = vcycle(0, r0, r1)
            for _ in range(inner_iters - 1):
                a0, a1 = _apply_b(0, W[0], z0, z1)
                s0, s1 = vcycle(0, r0 - a0, r1 - a1)
                z0, z1 = z0 + s0, z1 + s1
            out0_ref[:, :] = z0
            out1_ref[:, :] = z1
            return

        def cg_body(i, state):
            z0, z1, e0, e1, p0, p1, rz = state
            Ap0, Ap1 = _apply_b(0, W[0], p0, p1)
            denom = jnp.sum(p0 * Ap0) + jnp.sum(p1 * Ap1)
            alpha = rz / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
            z0, z1 = z0 + alpha * p0, z1 + alpha * p1
            e0, e1 = e0 - alpha * Ap0, e1 - alpha * Ap1
            s0, s1 = vcycle(0, e0, e1)
            rz_new = jnp.sum(e0 * s0) + jnp.sum(e1 * s1)
            beta = rz_new / jnp.where(jnp.abs(rz) > 0, rz, 1.0)
            return (z0, z1, e0, e1, s0 + beta * p0, s1 + beta * p1, rz_new)

        p0, p1 = vcycle(0, r0, r1)
        rz0 = jnp.sum(r0 * p0) + jnp.sum(r1 * p1)
        z0, z1, *_ = jax.lax.fori_loop(
            0, inner_iters, cg_body,
            (jnp.zeros_like(r0), jnp.zeros_like(r1), r0, r1, p0, p1, rz0),
        )
        out0_ref[:, :] = z0
        out1_ref[:, :] = z1

    args_np = (
        [jnp.asarray(l.W) for l in lv]
        + [jnp.asarray(l.dinv) for l in lv]
        + [jnp.asarray(b) for b in Bry]
        + [jnp.asarray(b) for b in Brx]
        + [jnp.asarray(b) for b in Bpy]
        + [jnp.asarray(b) for b in Bpx]
    )
    zero2 = lambda: (jnp.int32(0), jnp.int32(0))
    in_specs = [
        pl.BlockSpec((fine.nyp, fine.nxp), zero2),
        pl.BlockSpec((fine.nyp, fine.nxp), zero2),
    ]
    for a in args_np:
        idx = {
            2: zero2,
            4: lambda: (jnp.int32(0),) * 4,
            5: lambda: (jnp.int32(0),) * 5,
        }[a.ndim]
        in_specs.append(pl.BlockSpec(a.shape, idx))

    call = pl.pallas_call(
        _kernel,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((fine.nyp, fine.nxp), zero2),
            pl.BlockSpec((fine.nyp, fine.nxp), zero2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((fine.nyp, fine.nxp), jnp.float32),
            jax.ShapeDtypeStruct((fine.nyp, fine.nxp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_tpu_params(),
    )

    ny, nx = fine.ny, fine.nx

    def inner(r_flat: jnp.ndarray) -> jnp.ndarray:
        # block-lattice flat layout: (ny, nx, d), component-minor
        r3 = r_flat.reshape(ny, nx, d).astype(jnp.float32)
        pads = ((0, fine.nyp - ny), (0, fine.nxp - nx))
        r0 = jnp.pad(r3[:, :, 0], pads)
        r1 = jnp.pad(r3[:, :, 1], pads)
        z0, z1 = call(r0, r1, *args_np)
        z = jnp.stack([z0[:ny, :nx], z1[:ny, :nx]], axis=-1)
        return z.reshape(-1)

    return inner


# ---------------------------------------------------------------------------
# dynamic-weight block V-cycle — per-Newton-step convected hierarchies
# ---------------------------------------------------------------------------


def build_fused_dyn_block_vcycle(
    spec,
    n_cycles: int = 1,
    vmem_budget=60_000_000,
    interpret: bool = False,
):
    """Fused Richardson chain of V-cycles on a BLOCK hierarchy whose
    weights are CALL-TIME arguments — the kernel twin of
    gmg_dyn.DynBlockHierarchySpec.vcycle, for per-Newton-step convected
    Jacobian hierarchies (solvers/gmg_dyn.py builds the level weights
    in-trace; this runs the whole V-cycle in ONE Pallas launch instead
    of the ~dozens of XLA ops per level that make the saddle FGMRES
    latency-bound on the remote-TPU platform).

    Scope: 2-D, d == 2, pure-halving hierarchies (no identity padding),
    VMEM-bounded. Returns fn(r_flat, Ws, Dinvs) -> z_flat where r_flat
    is the (ny*nx*d) block-lattice vector (site-major, component-minor),
    Ws/Dinvs the per-level traced weight stacks from spec.build_levels
    layouts ((K, ny, nx, d, d) / (ny, nx, d, d)); or None if out of
    scope."""
    if not _HAS_PLTPU:
        return None
    if spec is None or spec.d != 2:
        return None
    if any(sp.pad_to is not None for sp in spec.levels):
        return None
    if any(len(sp.shape) != 2 for sp in spec.levels):
        return None

    n_lv = len(spec.levels)
    d = spec.d
    # padded per-level layouts (shared x padding keeps specs simple)
    nyps, nxps = [], []
    for sp in spec.levels:
        ny, nx = sp.shape
        nyps.append(_ru(ny + sp.pad, 8))
        nxps.append(_ru(nx + sp.pad, 128))

    # transfer bands per level pair
    Bry, Brx, Bpy, Bpx = [], [], [], []
    for i in range(n_lv - 1):
        fy, fx = spec.levels[i].shape
        by = np.zeros((nyps[i + 1], nyps[i]), np.float32)
        by[: (fy - 1) // 2 + 1, :fy] = _restrict_band(fy)
        bx = np.zeros((nxps[i + 1], nxps[i]), np.float32)
        bx[: (fx - 1) // 2 + 1, :fx] = _restrict_band(fx)
        py = np.zeros((nyps[i], nyps[i + 1]), np.float32)
        py[:fy, : (fy - 1) // 2 + 1] = _prolong_band(fy)
        px = np.zeros((nxps[i], nxps[i + 1]), np.float32)
        px[:fx, : (fx - 1) // 2 + 1] = _prolong_band(fx)
        Bry.append(by)
        Brx.append(bx)
        Bpy.append(py)
        Bpx.append(px)

    total = sum(b.nbytes for bl in (Bry, Brx, Bpy, Bpx) for b in bl)
    for i, sp in enumerate(spec.levels):
        K = len(sp.offsets)
        total += (K * d * d + d * d) * nyps[i] * nxps[i] * 4
    total += 10 * d * nyps[0] * nxps[0] * 4
    if total > vmem_budget:
        return None

    meta = [
        dict(
            offsets=[tuple(int(v) for v in o) for o in sp.offsets],
            nyp=nyps[i], nxp=nxps[i], ny=sp.shape[0], nx=sp.shape[1],
        )
        for i, sp in enumerate(spec.levels)
    ]
    sweeps = int(getattr(spec, "coarse_sweeps", 10))

    def _roll2(t, dy, dx, l):
        sy = (-dy) % meta[l]["nyp"]
        if sy:
            t = pltpu.roll(t, jnp.int32(sy), axis=0)
        sx = (-dx) % meta[l]["nxp"]
        if sx:
            t = pltpu.roll(t, jnp.int32(sx), axis=1)
        return t

    def _apply_b(l, W, u0, u1):
        o0 = None
        o1 = None
        for k, (dy, dx) in enumerate(meta[l]["offsets"]):
            t0 = _roll2(u0, dy, dx, l)
            t1 = _roll2(u1, dy, dx, l)
            c0 = W[k, 0, 0] * t0 + W[k, 0, 1] * t1
            c1 = W[k, 1, 0] * t0 + W[k, 1, 1] * t1
            o0 = c0 if o0 is None else o0 + c0
            o1 = c1 if o1 is None else o1 + c1
        return o0, o1

    def _kernel(*refs):
        # refs: r0, r1, W_0.., D_0.., Bry.., Brx.., Bpy.., Bpx..,
        #       out0, out1
        r0_ref, r1_ref = refs[0], refs[1]
        Ws = refs[2 : 2 + n_lv]
        Ds = refs[2 + n_lv : 2 + 2 * n_lv]
        k0 = 2 + 2 * n_lv
        m = n_lv - 1
        By = [b[:, :] for b in refs[k0 : k0 + m]]
        Bx = [b[:, :] for b in refs[k0 + m : k0 + 2 * m]]
        Py = [b[:, :] for b in refs[k0 + 2 * m : k0 + 3 * m]]
        Px = [b[:, :] for b in refs[k0 + 3 * m : k0 + 4 * m]]
        out0_ref = refs[k0 + 4 * m]
        out1_ref = refs[k0 + 4 * m + 1]

        W = [w[:, :, :, :, :] for w in Ws]
        D = [dd[:, :, :, :] for dd in Ds]

        def smooth(l, r0, r1):
            return (
                D[l][0, 0] * r0 + D[l][0, 1] * r1,
                D[l][1, 0] * r0 + D[l][1, 1] * r1,
            )

        def mm(Bl, Bt, u):
            return jnp.dot(
                Bl, jnp.dot(u, Bt.T, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

        def vcycle(l, r0, r1):
            x0, x1 = smooth(l, r0, r1)
            if l == n_lv - 1:
                for _ in range(sweeps - 1):
                    a0, a1 = _apply_b(l, W[l], x0, x1)
                    s0, s1 = smooth(l, r0 - a0, r1 - a1)
                    x0, x1 = x0 + s0, x1 + s1
                return x0, x1
            a0, a1 = _apply_b(l, W[l], x0, x1)
            rc0 = mm(By[l], Bx[l], r0 - a0)
            rc1 = mm(By[l], Bx[l], r1 - a1)
            xc0, xc1 = vcycle(l + 1, rc0, rc1)
            x0 = x0 + mm(Py[l], Px[l], xc0)
            x1 = x1 + mm(Py[l], Px[l], xc1)
            a0, a1 = _apply_b(l, W[l], x0, x1)
            s0, s1 = smooth(l, r0 - a0, r1 - a1)
            return x0 + s0, x1 + s1

        r0 = r0_ref[:, :]
        r1 = r1_ref[:, :]
        z0, z1 = vcycle(0, r0, r1)
        for _ in range(n_cycles - 1):
            a0, a1 = _apply_b(0, W[0], z0, z1)
            s0, s1 = vcycle(0, r0 - a0, r1 - a1)
            z0, z1 = z0 + s0, z1 + s1
        out0_ref[:, :] = z0
        out1_ref[:, :] = z1

    band_args = (
        [jnp.asarray(b) for b in Bry]
        + [jnp.asarray(b) for b in Brx]
        + [jnp.asarray(b) for b in Bpy]
        + [jnp.asarray(b) for b in Bpx]
    )
    zero2 = lambda: (jnp.int32(0), jnp.int32(0))
    zero4 = lambda: (jnp.int32(0),) * 4
    zero5 = lambda: (jnp.int32(0),) * 5
    in_specs = [
        pl.BlockSpec((nyps[0], nxps[0]), zero2),
        pl.BlockSpec((nyps[0], nxps[0]), zero2),
    ]
    for i, sp in enumerate(spec.levels):
        K = len(sp.offsets)
        in_specs.append(
            pl.BlockSpec((K, d, d, nyps[i], nxps[i]), zero5)
        )
    for i in range(n_lv):
        in_specs.append(
            pl.BlockSpec((d, d, nyps[i], nxps[i]), zero4)
        )
    for b in band_args:
        in_specs.append(pl.BlockSpec(b.shape, zero2))

    call = pl.pallas_call(
        _kernel,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nyps[0], nxps[0]), zero2),
            pl.BlockSpec((nyps[0], nxps[0]), zero2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nyps[0], nxps[0]), jnp.float32),
            jax.ShapeDtypeStruct((nyps[0], nxps[0]), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_tpu_params(),
    )

    ny0, nx0 = spec.levels[0].shape

    def _pack_W(i, Wl):
        # (K, ny, nx, d, d) -> (K, d, d, nyp, nxp) zero-padded
        Wt = jnp.moveaxis(Wl.astype(jnp.float32), (3, 4), (1, 2))
        ny, nx = spec.levels[i].shape
        return jnp.pad(
            Wt,
            (
                (0, 0), (0, 0), (0, 0),
                (0, nyps[i] - ny), (0, nxps[i] - nx),
            ),
        )

    def _pack_D(i, Dl):
        Dt = jnp.moveaxis(Dl.astype(jnp.float32), (2, 3), (0, 1))
        ny, nx = spec.levels[i].shape
        return jnp.pad(
            Dt,
            ((0, 0), (0, 0), (0, nyps[i] - ny), (0, nxps[i] - nx)),
        )

    def inner(r_flat: jnp.ndarray, levels) -> jnp.ndarray:
        """levels = spec.build_levels(W0): [(W, Dinv)] traced pairs."""
        r3 = r_flat.reshape(ny0, nx0, d).astype(jnp.float32)
        pads = ((0, nyps[0] - ny0), (0, nxps[0] - nx0))
        r0 = jnp.pad(r3[:, :, 0], pads)
        r1 = jnp.pad(r3[:, :, 1], pads)
        Wargs = [_pack_W(i, Wl) for i, (Wl, _) in enumerate(levels)]
        Dargs = [_pack_D(i, Dl) for i, (_, Dl) in enumerate(levels)]
        z0, z1 = call(r0, r1, *Wargs, *Dargs, *band_args)
        z = jnp.stack([z0[:ny0, :nx0], z1[:ny0, :nx0]], axis=-1)
        return z.reshape(-1)

    return inner


# ---------------------------------------------------------------------------
# fused GMRES inner — nonsymmetric/indefinite lattices (convdiff, helmholtz)
# ---------------------------------------------------------------------------


def build_fused_inner_gmres(
    gmg,
    inner_iters: int,
    vmem_budget=24_000_000,
    interpret: bool = False,
    precond_cycles: int = 2,
    step_offsets=None,
):
    """Fused left-preconditioned Arnoldi cycle as ONE Pallas kernel —
    the GMRES analog of build_fused_inner_cg, for the nonsymmetric /
    indefinite lattice systems (SUPG convection-diffusion, Helmholtz)
    whose inner is one m-step GMRES cycle per refinement outer
    (krylov.refined_solve inner_gmres).

    TPU-shaped split: the kernel runs the launch-/HBM-bound part — m
    Arnoldi steps where each is a fine stencil apply + a chained
    `precond_cycles`-V-cycle preconditioner + MGS against the VMEM-
    resident basis — and writes out the basis V (m+1 planes) plus the
    MGS coefficients H (the TRUE Arnoldi Hessenberg entries, one
    8x128 row-block per step). The host-jitted wrapper solves the
    (m+1, m) least squares with the proven QR path (f32 lstsq crashes
    the axon XLA pipeline) and combines z = sum_i y_i V_i — small
    dense work XLA already does well. H must come from the in-kernel
    MGS coefficients, NOT a post-hoc H = <V, MAV> matmul: once f32
    MGS loses orthogonality (high-Pe SUPG operators), the recomputed
    H diverges from the recurrence actually performed and the least-
    squares update stops reducing the residual (the XLA inner_gmres,
    krylov.py:452-465, uses its MGS coefficients for exactly this
    reason). V rows are zero-initialized in-kernel so the statically-
    bounded MGS loop never multiplies uninitialized VMEM (0*NaN would
    poison the basis).

    step_offsets: offsets of a PER-CALL operator stencil (time-varying
    systems in scans — lagged Burgers convection, Newton Jacobians,
    LatticeWeightMap.offsets). The returned fn then takes the freshly
    scattered, ALREADY-CONSTRAINED fine weights as a second argument
    (fn(r_lat_flat_f32, W_op (K, ny, nx))): the Arnoldi operator apply
    uses them while the V-cycle preconditioner keeps the constant-part
    hierarchy — the fused analog of dispatch's step_weights path.

    Returns fn(r_lat_flat_f32[, W_op]) -> z_lat_flat_f32 or None if out
    of scope (non-2-D, or VMEM budget exceeded).
    """
    if not _HAS_PLTPU:
        return None
    built = _scalar_hierarchy(gmg)
    if built is None:
        return None
    lv, Bry, Brx, Bpy, Bpx, total = built

    # Mosaic's jaxpr lowering recurses ~3 Python frames per op and may
    # unroll the Arnoldi fori_loop, so depth scales with m * body_ops.
    # CPython 3.12 keeps Python-to-Python frames off the C stack, so a
    # large limit is safe (heap-allocated frames).
    import sys as _sys

    if _sys.getrecursionlimit() < 200_000:
        _sys.setrecursionlimit(200_000)

    fine = lv[0]
    plane = fine.nyp * fine.nxp * 4
    has_op = step_offsets is not None
    op_offsets = None
    if has_op:
        op_offsets = [tuple(int(v) for v in o) for o in step_offsets]
        if not op_offsets:
            return None
        if isinstance(fine, _Level3):
            # 3-D per-step offsets flatten like the hierarchy's own;
            # y-reach must fit the inter-slab margin
            if max(abs(o[1]) for o in op_offsets) > fine.pad:
                return None
            op_offsets = [
                (dz * fine.nyp_s + dy, dx) for (dz, dy, dx) in op_offsets
            ]
        pad_row = max(abs(o[0]) for o in op_offsets)
        pad_x = max(abs(o[1]) for o in op_offsets)
        # the roll taps bring only zeros across the wrap exactly when
        # the alignment margin covers the offset reach
        if (
            fine.nyp - fine.ny < pad_row
            or fine.nxp - fine.nx < pad_x
            or pad_row + pad_x == 0
        ):
            return None
        total += len(op_offsets) * plane
    # V (m+1) + ~6 work planes (H is one 8x128 block per step, noise);
    # shrink the cycle length until the basis fits — a shorter fused
    # cycle still beats the XLA cycle per outer, and the f64 refinement
    # outers absorb the difference
    m = 0
    for m_try in sorted({int(inner_iters), 16, 12, 8}, reverse=True):
        if m_try <= int(inner_iters) and (
            total + (m_try + 7) * plane <= vmem_budget
        ):
            m = m_try
            break
    if m < 4:
        return None

    n_lv = len(lv)
    meta = [
        dict(
            offsets=[tuple(int(v) for v in o) for o in l.offsets],
            pad=l.pad, nyp=l.nyp, nxp=l.nxp,
        )
        for l in lv
    ]

    def _apply_offs(offsets, nyp, nxp, W, u):
        out = None
        for k, (dy, dx) in enumerate(offsets):
            t = u
            sy = (-dy) % nyp
            if sy:
                t = pltpu.roll(t, jnp.int32(sy), axis=0)
            sx = (-dx) % nxp
            if sx:
                t = pltpu.roll(t, jnp.int32(sx), axis=1)
            contrib = W[k] * t
            out = contrib if out is None else out + contrib
        return out

    def _apply(l, W, u):
        return _apply_offs(
            meta[l]["offsets"], meta[l]["nyp"], meta[l]["nxp"], W, u
        )

    _ho = 1 if has_op else 0

    def _kernel(*refs):
        # refs: r, [W_op,] W_0.., dinv_0.., Bry.., Brx.., Bpy.., Bpx..,
        #       V_out, H_out, S_out
        r_ref = refs[0]
        Wop = refs[1][:, :, :] if has_op else None
        Ws = refs[1 + _ho : 1 + _ho + n_lv]
        Ds = refs[1 + _ho + n_lv : 1 + _ho + 2 * n_lv]
        k0 = 1 + _ho + 2 * n_lv
        nb = n_lv - 1
        By = [b[:, :] for b in refs[k0 : k0 + nb]]
        Bx = [b[:, :] for b in refs[k0 + nb : k0 + 2 * nb]]
        Py = [b[:, :] for b in refs[k0 + 2 * nb : k0 + 3 * nb]]
        Px = [b[:, :] for b in refs[k0 + 3 * nb : k0 + 4 * nb]]
        V_ref = refs[k0 + 4 * nb]
        H_ref = refs[k0 + 4 * nb + 1]
        S_ref = refs[k0 + 4 * nb + 2]

        W = [w[:, :, :] for w in Ws]
        D = [d[:, :] for d in Ds]

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

        def precond(v):
            z = vcycle(0, v)
            for _ in range(precond_cycles - 1):
                z = z + vcycle(0, v - _apply(0, W[0], z))
            return z

        eps = jnp.float32(1e-30)
        # zero the basis buffers: MGS below reads every row statically
        V_ref[:, :, :] = jnp.zeros(
            (m + 1, fine.nyp, fine.nxp), jnp.float32
        )
        H_ref[:, :, :] = jnp.zeros((m, 8, 128), jnp.float32)

        g0 = precond(r_ref[:, :])
        beta = jnp.sqrt(jnp.sum(g0 * g0))
        S_ref[:, :] = jnp.full((8, 128), beta, jnp.float32)
        V_ref[0, :, :] = g0 / jnp.maximum(beta, eps)

        def arnoldi(j, alive):
            # `alive` freezes the recurrence at happy breakdown: once
            # the orthogonalized remainder is rounding noise relative
            # to u (hn <= 1e-5*||u||), continuing would normalize f32
            # noise into non-orthogonal garbage directions that poison
            # the reconstructed H. Frozen steps write exact zeros, so
            # the XLA least squares sees a clean (k+1, k) problem.
            vj = V_ref[j, :, :]
            if has_op:
                Avj = _apply_offs(
                    op_offsets, fine.nyp, fine.nxp, Wop, vj
                )
            else:
                Avj = _apply(0, W[0], vj)
            u = alive * precond(Avj)

            # MGS unrolled at trace time: static V-row loads, and no
            # nested scan (Mosaic lowers nested fori_loops by Python
            # recursion — m*(m+1) deep blows the recursion limit)
            w = u
            # accumulate this step's Hessenberg column as an 8x128 lane
            # vector (lane i = h_{i,j}); stored row-wise per step so the
            # write is an aligned full block at a dynamic leading index
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            hrow = jnp.zeros((8, 128), jnp.float32)
            for i in range(m + 1):
                vi = V_ref[i, :, :]
                # jnp.float32(0.0), not bare 0.0: a weak-f64 branch
                # promotes hij to f64 and Mosaic's f64 convert helper
                # recurses forever (x.astype re-emits the same convert)
                hij = jnp.where(
                    jnp.int32(i) <= j,
                    jnp.sum(vi * w),
                    jnp.float32(0.0),
                )
                w = w - hij * vi
                hrow = hrow + hij * jnp.where(
                    lane == jnp.int32(i),
                    jnp.float32(1.0),
                    jnp.float32(0.0),
                )
            hn = jnp.sqrt(jnp.sum(w * w))
            unorm = jnp.sqrt(jnp.sum(u * u))
            # f32 literals only: a bare 1.0/0.0 is weak-f64 under x64,
            # and Mosaic lowers f64 converts by recursive emulation
            alive = alive * jnp.where(
                hn > jnp.float32(1e-5) * unorm,
                jnp.float32(1.0),
                jnp.float32(0.0),
            )
            # subdiagonal h_{j+1,j}: zeroed at breakdown so the least
            # squares sees an exact (k+1, k) problem
            hrow = hrow + alive * hn * jnp.where(
                lane == j + jnp.int32(1),
                jnp.float32(1.0),
                jnp.float32(0.0),
            )
            H_ref[j, :, :] = hrow
            # explicit i32: under jax_enable_x64 a bare `j + 1` widens
            # to i64 and Mosaic rejects the mixed-width index add
            V_ref[j + jnp.int32(1), :, :] = alive * w / jnp.maximum(hn, eps)
            return alive

        # i32 bounds: Python-int bounds make the loop index i64 under
        # x64, and every compare/index against it drags in i64 converts
        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(m), arnoldi, jnp.float32(1.0)
        )

    args_np = (
        [jnp.asarray(l.W) for l in lv]
        + [jnp.asarray(l.dinv) for l in lv]
        + [jnp.asarray(b) for b in Bry]
        + [jnp.asarray(b) for b in Brx]
        + [jnp.asarray(b) for b in Bpy]
        + [jnp.asarray(b) for b in Bpx]
    )
    zero2 = lambda: (jnp.int32(0), jnp.int32(0))
    zero3 = lambda: (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    in_specs = [pl.BlockSpec((fine.nyp, fine.nxp), zero2)]
    if has_op:
        in_specs.append(
            pl.BlockSpec(
                (len(op_offsets), fine.nyp, fine.nxp), zero3
            )
        )
    for a in args_np:
        in_specs.append(
            pl.BlockSpec(a.shape, zero3 if a.ndim == 3 else zero2)
        )

    call = pl.pallas_call(
        _kernel,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((m + 1, fine.nyp, fine.nxp), zero3),
            pl.BlockSpec((m, 8, 128), zero3),
            pl.BlockSpec((8, 128), zero2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m + 1, fine.nyp, fine.nxp), jnp.float32),
            jax.ShapeDtypeStruct((m, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_tpu_params(),
    )

    ny, nx = fine.ny, fine.nx

    def inner(r_flat: jnp.ndarray, W_op=None) -> jnp.ndarray:
        if isinstance(fine, _Level3):
            r2p = fine.embed3(r_flat.astype(jnp.float32))
        else:
            r2 = r_flat.reshape(ny, nx).astype(jnp.float32)
            r2p = jnp.pad(
                r2, ((0, fine.nyp - ny), (0, fine.nxp - nx))
            )
        if has_op:
            if isinstance(fine, _Level3):
                Wp = fine.embedW3(W_op.astype(jnp.float32))
            else:
                Wp = jnp.pad(
                    W_op.astype(jnp.float32),
                    ((0, 0), (0, fine.nyp - ny), (0, fine.nxp - nx)),
                )
            V, Hout, S = call(r2p, Wp, *args_np)
        else:
            V, Hout, S = call(r2p, *args_np)
        beta = S[0, 0]
        # H straight from the in-kernel MGS coefficients (step j's
        # column is row j of the 8x128 blocks): the recurrence's OWN
        # Hessenberg matrix, valid even after f32 orthogonality loss
        H = Hout[:, 0, : m + 1].T
        e1 = jnp.zeros(m + 1, jnp.float32).at[0].set(beta)
        eps32 = jnp.asarray(1e-30, jnp.float32)
        Q, R = jnp.linalg.qr(H)
        rhs_ls = Q.T @ e1
        diag_r = jnp.diagonal(R)
        Rsafe = R + jnp.diag(
            jnp.where(jnp.abs(diag_r) < eps32, eps32, 0.0)
        )
        y = jax.scipy.linalg.solve_triangular(Rsafe, rhs_ls, lower=False)
        z = jnp.einsum("i,iyx->yx", y, V[:m])
        if isinstance(fine, _Level3):
            return fine.extract3(z)
        return z[:ny, :nx].reshape(-1)

    def _debug_raw(r_flat, W_op=None):
        r2 = r_flat.reshape(ny, nx).astype(jnp.float32)
        r2p = jnp.pad(r2, ((0, fine.nyp - ny), (0, fine.nxp - nx)))
        if has_op:
            Wp = jnp.pad(
                W_op.astype(jnp.float32),
                ((0, 0), (0, fine.nyp - ny), (0, fine.nxp - nx)),
            )
            return call(r2p, Wp, *args_np)
        return call(r2p, *args_np)

    inner.debug_raw = _debug_raw
    return inner
