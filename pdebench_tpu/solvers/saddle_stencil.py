"""Gather-free Taylor-Hood saddle apply on structured meshes.

The [[A, G], [G^T, 0]] saddle matvec is the inner-loop cost of every
device Stokes/Navier-Stokes solve (MINRES-IR, FGMRES-IR Newton). The
generic cell-batched apply (mixed.saddle_apply) is gather/scatter bound
on TPU — ~20x off the stencil apply at benchmark sizes. On structured
meshes the Taylor-Hood dof sets are nested lattices:

  velocity (P2 scalar nodes): the fine (r*R+1)^dim tensor lattice
  pressure (P1 nodes):        the coarse (R+1)^dim lattice, sitting at
                              every r-th fine site (r = deg_u/deg_p)

so all three blocks are stencils (reference role: the PETSc MatMult
inside fieldsplit solves, pdebench/oracle/stokes.py:253-263):

  A   — a (d x d)-block stencil on the fine lattice
        (BlockLatticeWeightMap: per-Newton-step weights scatter in-jit)
  G   — an inter-lattice stencil: upsample p to the fine lattice
        (zeros off the coarse sites — a reshape interleave, no scatter)
        then |offsets| shifted multiply-adds per velocity component
  G^T — the transpose stencil evaluated only at coarse sites: stride-r
        lax.slice taps of the padded velocity planes (XLA lowers
        strided slices natively; no gathers anywhere)

Everything is dtype-polymorphic: the f32 twin runs the inner Krylov at
native v5e speed, the f64 twin gives the refinement outer an EXACT
operator without the cell-based gather/scatter penalty.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stencil import (
    BlockLatticeWeightMap,
    Lattice,
    _unique_offsets,
    detect_lattice,
)


def _lattice_coords(lat: Lattice, flat: np.ndarray) -> np.ndarray:
    """Flat lattice indices -> integer coordinates (…, dim)."""
    out = []
    rem = flat
    for s in reversed(lat.shape):
        out.append(rem % s)
        rem = rem // s
    return np.stack(list(reversed(out)), axis=-1)


def _upsample(p: jnp.ndarray, r: int) -> jnp.ndarray:
    """Coarse lattice array -> fine array with values at every r-th
    site and zeros elsewhere (fine_s = (coarse_s - 1) * r + 1).
    Interleave via stack+reshape — no scatter ops."""
    if r == 1:
        return p
    dim = p.ndim
    for ax in range(dim):
        parts = [p] + [jnp.zeros_like(p)] * (r - 1)
        p = jnp.stack(parts, axis=ax + 1)
        p = p.reshape(
            p.shape[:ax] + (p.shape[ax] * r,) + p.shape[ax + 2 :]
        )
    crop = tuple(slice(0, s - (r - 1)) for s in p.shape)
    return p[crop]


class SaddleStencil:
    """Stencil saddle apply for one Taylor-Hood pair (V, Q).

    Built host-side once per mesh (numpy only — eager device ops on the
    axon platform each compile remotely); `saddle_apply_w(WA)` returns
    a traceable apply on the stacked flat vector [u; p] whose A-block
    weights can be freshly scattered per Newton step via `wmapA`.
    """

    def __init__(
        self,
        lat_u: Lattice,
        lat_p: Lattice,
        ratio: int,
        ncomp: int,
        wmapA: BlockLatticeWeightMap,
        offs_g,
        WG: np.ndarray,
        offs_gt,
        WGT: np.ndarray,
    ):
        self.lat_u = lat_u
        self.lat_p = lat_p
        self.r = int(ratio)
        self.d = int(ncomp)
        self.wmapA = wmapA
        self.fine = lat_u.shape
        self.coarse = lat_p.shape
        self.offs_g = offs_g
        self.pad_g = (
            int(max(abs(o) for off in offs_g for o in off)) if offs_g else 0
        )
        self.offs_gt = offs_gt
        self.pad_gt = (
            int(max(abs(o) for off in offs_gt for o in off)) if offs_gt else 0
        )
        self.WG64 = jnp.asarray(WG)
        self.WG32 = jnp.asarray(WG, dtype=jnp.float32)
        self.WGT64 = jnp.asarray(WGT)
        self.WGT32 = jnp.asarray(WGT, dtype=jnp.float32)
        d = self.d
        # block-level (node, comp) injection for the velocity vector
        n_lat = int(np.prod(self.fine))
        n_u = lat_u.n_dof * d
        dof_nodes = np.arange(n_u) // d
        dof_comp = np.arange(n_u) % d
        lat_flat = lat_u.inv[dof_nodes] * d + dof_comp
        perm = np.full(n_lat * d, n_u, dtype=np.int64)
        perm[lat_flat] = np.arange(n_u)
        self.blat = Lattice(
            shape=self.fine + (d,),
            perm=perm,
            inv=lat_flat,
            n_dof=n_u,
            masked=lat_u.masked,
        )
        self._binv = jnp.asarray(lat_flat, dtype=jnp.int32)
        self._pinv = jnp.asarray(lat_p.inv, dtype=jnp.int32)
        self.n_u = n_u
        self.n_p = lat_p.n_dof

    # -- block applies ---------------------------------------------------

    def applyG(self, W: jnp.ndarray, p_lat: jnp.ndarray) -> jnp.ndarray:
        """(coarse,) pressure lattice -> (fine…, d) velocity lattice."""
        pf = _upsample(p_lat, self.r)
        pfp = jnp.pad(pf, self.pad_g)
        out = jnp.zeros(self.fine + (self.d,), p_lat.dtype)
        for k, off in enumerate(self.offs_g):
            start = tuple(self.pad_g + o for o in off)
            tap = jax.lax.dynamic_slice(pfp, start, self.fine)
            out = out + W[k] * tap[..., None]
        return out

    def applyGT(self, W: jnp.ndarray, u_lat: jnp.ndarray) -> jnp.ndarray:
        """(fine…, d) velocity lattice -> (coarse,) pressure lattice."""
        dim = len(self.fine)
        up = jnp.pad(u_lat, [(self.pad_gt, self.pad_gt)] * dim + [(0, 0)])
        out = jnp.zeros(self.coarse, u_lat.dtype)
        for k, off in enumerate(self.offs_gt):
            start = tuple(self.pad_gt + o for o in off) + (0,)
            limit = tuple(
                self.pad_gt + o + (cs - 1) * self.r + 1
                for o, cs in zip(off, self.coarse)
            ) + (self.d,)
            tap = jax.lax.slice(
                up, start, limit, strides=(self.r,) * dim + (1,)
            )
            out = out + jnp.einsum("...a,...a->...", W[k], tap)
        return out

    def saddle_apply_w(self, WA: jnp.ndarray) -> Callable:
        """Matrix-free [[A, G], [G^T, 0]] on the stacked flat vector,
        with explicit (possibly per-Newton-step traced) A-block weights.
        The G/G^T weights follow WA's dtype (f32 inner / f64 outer)."""
        f32 = WA.dtype == jnp.float32
        WG = self.WG32 if f32 else self.WG64
        WGT = self.WGT32 if f32 else self.WGT64
        d = self.d

        def apply(x):
            u, p = x[: self.n_u], x[self.n_u :]
            u_lat = self.blat.embed(u.astype(WA.dtype), 0).reshape(
                self.fine + (d,)
            )
            p_lat = self.lat_p.embed(p.astype(WA.dtype), 0).reshape(
                self.coarse
            )
            ru = self.wmapA.apply_grid(WA, u_lat) + self.applyG(WG, p_lat)
            rp = self.applyGT(WGT, u_lat)
            return jnp.concatenate(
                [ru.reshape(-1)[self._binv], rp.reshape(-1)[self._pinv]]
            ).astype(x.dtype)

        return apply


class LatticeSaddleVectors:
    """Lattice-layout saddle Krylov vectors: [u_lat (nf*d); p_lat (nc)].

    The flat-dof saddle iteration pays 2 embeds + 2 extracts (TPU
    gathers) per operator apply and more per preconditioner
    application; at dataset sizes those gathers dominate the
    per-Krylov-iteration cost (measured round 3: saddle apply 914 us
    flat-dof vs 632 us lattice, tri-M 905 vs 412 us —
    scripts/ns_saddle_micro.py). Keeping every Krylov vector in
    lattice layout moves the dof<->lattice permutation to one embed of
    the rhs and one extract of the solution per solve. Absent
    masked-lattice sites and zero-padded entries are constrained
    identity rows with zero data, so they stay exactly zero through
    the constrained-operator wrappers and contribute nothing to inner
    products.
    """

    def __init__(self, sst: SaddleStencil, mask_np: np.ndarray):
        self.sst = sst
        d = sst.d
        nf = int(np.prod(sst.fine))
        nc = int(np.prod(sst.coarse))
        self.n_u = nf * d
        self.n = nf * d + nc
        m = np.asarray(mask_np, dtype=bool)
        mu = sst.blat.embed_np(m[: sst.n_u], True)
        mp = sst.lat_p.embed_np(m[sst.n_u :], True)
        self.mask_lat = jnp.asarray(np.concatenate([mu, mp]))

    def embed(self, x, fill=0.0) -> jnp.ndarray:
        """[u; p] flat dof vector -> lattice-layout vector (traceable)."""
        sst = self.sst
        u = sst.blat.embed(x[: sst.n_u], fill)
        p = sst.lat_p.embed(x[sst.n_u :], fill)
        return jnp.concatenate([u, p])

    def extract(self, x_lat: jnp.ndarray) -> jnp.ndarray:
        """Lattice-layout vector -> [u; p] flat dof vector."""
        sst = self.sst
        u = sst.blat.extract(x_lat[: self.n_u])
        p = sst.lat_p.extract(x_lat[self.n_u :])
        return jnp.concatenate([u, p])

    def apply_w(self, WA: jnp.ndarray) -> Callable:
        """Saddle apply on lattice-layout vectors (no gathers)."""
        sst = self.sst
        f32 = WA.dtype == jnp.float32
        WG = sst.WG32 if f32 else sst.WG64
        WGT = sst.WGT32 if f32 else sst.WGT64
        d = sst.d

        def apply(x):
            u_lat = x[: self.n_u].astype(WA.dtype).reshape(
                sst.fine + (d,)
            )
            p_lat = x[self.n_u :].astype(WA.dtype).reshape(sst.coarse)
            ru = sst.wmapA.apply_grid(WA, u_lat) + sst.applyG(WG, p_lat)
            rp = sst.applyGT(WGT, u_lat)
            return jnp.concatenate(
                [ru.reshape(-1), rp.reshape(-1)]
            ).astype(x.dtype)

        return apply

    def block_diag_M(self, Mv_grid: Callable, schur) -> Callable:
        """Block-diagonal SPD M (MINRES) on lattice-layout vectors.
        `schur` is the lattice-shaped inv_p plane (or a callable)."""
        sst = self.sst
        d = sst.d
        mask_lat = self.mask_lat

        def M(r):
            r_u = r[: self.n_u].reshape(sst.fine + (d,))
            rp = r[self.n_u :].reshape(sst.coarse)
            zu = Mv_grid(r_u)
            zp = schur(rp) if callable(schur) else (
                schur.astype(rp.dtype) * rp
            )
            out = jnp.concatenate([zu.reshape(-1), zp.reshape(-1)])
            return jnp.where(mask_lat, r, out)

        return M

    def tri_M(self, Mv_grid: Callable, schur) -> Callable:
        """Block lower-triangular M (FGMRES): velocity solve, then
        Schur update zp = -schur (r_p - G^T zu), all on the lattice."""
        sst = self.sst
        d = sst.d
        mask_lat = self.mask_lat

        def M(r):
            r_u = r[: self.n_u].reshape(sst.fine + (d,))
            rp = r[self.n_u :].reshape(sst.coarse)
            zu = Mv_grid(r_u)
            gt = sst.applyGT(
                sst.WGT32 if r.dtype == jnp.float32 else sst.WGT64,
                zu.astype(r.dtype),
            )
            rs = rp - gt
            zp = -(schur(rs) if callable(schur) else (
                schur.astype(rs.dtype) * rs
            ))
            out = jnp.concatenate([zu.reshape(-1), zp.reshape(-1)])
            return jnp.where(mask_lat, r, out)

        return M

    def embed_plane_p(self, v_dof: np.ndarray, fill=1.0) -> jnp.ndarray:
        """Host-side: pressure dof vector -> coarse-lattice plane."""
        return jnp.asarray(
            self.sst.lat_p.embed_np(np.asarray(v_dof), fill).reshape(
                self.sst.coarse
            )
        )


def build_saddle_stencil(V, Q, G_loc_np: np.ndarray) -> Optional[SaddleStencil]:
    """SaddleStencil for a Taylor-Hood pair, or None when the dof sets
    aren't nested lattices (unstructured/complex domains, periodic)."""
    lat_u = detect_lattice(V.dof_coords)
    lat_p = detect_lattice(Q.dof_coords)
    if lat_u is None or lat_p is None:
        return None
    if len(lat_u.shape) != len(lat_p.shape):
        return None
    # nesting ratio: fine = (coarse - 1) * r + 1 on every axis, same r
    rs = set()
    for su, sp in zip(lat_u.shape, lat_p.shape):
        if sp < 2 or (su - 1) % (sp - 1) != 0:
            return None
        rs.add((su - 1) // (sp - 1))
    if len(rs) != 1:
        return None
    r = rs.pop()
    # both lattices must span the same box (same mesh => exact nesting)
    if not (
        np.allclose(V.dof_coords.min(0), Q.dof_coords.min(0), atol=1e-12)
        and np.allclose(V.dof_coords.max(0), Q.dof_coords.max(0), atol=1e-12)
    ):
        return None
    d = int(V.ncomp)
    dim = len(lat_u.shape)

    wmapA = BlockLatticeWeightMap(lat_u, V.dofmap_scalar, d)
    if wmapA.pad == 0 or wmapA.pad > 4:
        return None

    # G couplings from the cell-local batch (host bincount, like
    # LatticeOperator: np.add.at is ~100x slower at this nnz)
    G = np.asarray(G_loc_np, dtype=np.float64)  # (c, nlu_s*d, nlp)
    dm_u = np.asarray(V.dofmap)  # blocked (c, nlu_s*d)
    dm_p = np.asarray(Q.dofmap_scalar)  # (c, nlp)
    c, nlu, nlp = G.shape
    rows = np.broadcast_to(dm_u[:, :, None], (c, nlu, nlp)).reshape(-1)
    cols = np.broadcast_to(dm_p[:, None, :], (c, nlu, nlp)).reshape(-1)
    vals = G.reshape(-1)

    node = rows // d
    comp = rows % d
    fu = lat_u.inv[node]  # fine flat site per entry
    pc = lat_p.inv[cols]  # coarse flat site per entry
    rc = _lattice_coords(lat_u, fu)
    cc = _lattice_coords(lat_p, pc)
    doff = cc * r - rc  # fine-unit offsets, velocity-row-relative
    offs_g, og_idx = _unique_offsets(doff)
    pad_g = int(np.abs(offs_g).max()) if len(offs_g) else 0
    if pad_g > 2 * r + 2:  # wrap-around (periodic) — out of scope
        return None
    n_f = int(np.prod(lat_u.shape))
    n_c = int(np.prod(lat_p.shape))
    WG = np.bincount(
        (og_idx * n_f + fu) * d + comp,
        weights=vals,
        minlength=len(offs_g) * n_f * d,
    ).reshape((len(offs_g),) + lat_u.shape + (d,))

    offs_gt, ogt_idx = _unique_offsets(-doff)
    WGT = np.bincount(
        (ogt_idx * n_c + pc) * d + comp,
        weights=vals,
        minlength=len(offs_gt) * n_c * d,
    ).reshape((len(offs_gt),) + lat_p.shape + (d,))

    return SaddleStencil(
        lat_u,
        lat_p,
        r,
        d,
        wmapA,
        [tuple(int(v) for v in o) for o in offs_g],
        WG,
        [tuple(int(v) for v in o) for o in offs_gt],
        WGT,
    )
