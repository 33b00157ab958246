"""Lattice stencil operators: gather-free SpMV for structured meshes.

TPU gathers/scatters are the bottleneck of the generic cell-batched
operator apply (~300x off the HBM roofline at benchmark sizes). On the
structured unit_square / unit_cube meshes (317/645 benchmark cases) the
scalar P1/P2/P3 dof set IS a regular lattice — the (p*n+1)^d tensor
grid — so the assembled operator is a position-dependent STENCIL:

    y[p] = sum_o W_o[p] * u[p + o]

with a fixed, small offset set o (19 offsets for P2 triangles). The
apply becomes |o| shifted multiply-adds over dense planes: pure VPU
work, no gathers, no scatters. This module builds the weight planes
from any assembled CSR matrix whose dof coordinates form a full
lattice, and exposes f32/f64 applies on flat dof vectors (permutation
handled internally). A Pallas kernel (stencil_pallas.py) covers the
single-pass fused variant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps


@dataclass
class Lattice:
    """Injection of dofs onto an integer lattice.

    Full lattices (structured rectangles/boxes) have n_dof == prod(shape)
    and `perm` a permutation. Masked lattices (structured triangulations
    of rectilinear domains — l_shape/t_junction — restricted to in-domain
    cells) fill only a subset of sites: absent entries of `perm` hold the
    sentinel n_dof, and `embed` pads with a fill value. Absent sites are
    treated downstream exactly like Dirichlet-constrained points.
    """

    shape: Tuple[int, ...]  # (ny, nx) or (nz, ny, nx), row-major last-x
    perm: np.ndarray  # lattice flat site -> dof index (or n_dof sentinel)
    inv: np.ndarray  # dof index -> lattice flat site
    n_dof: int = 0
    masked: bool = False

    def embed(self, v: jnp.ndarray, fill) -> jnp.ndarray:
        """Dof vector -> flat lattice vector (absent sites = fill)."""
        perm = jnp.asarray(self.perm, dtype=jnp.int32)
        if not self.masked:
            return v[perm]
        pad = jnp.asarray([fill], dtype=v.dtype)
        return jnp.concatenate([v, pad])[perm]

    def extract(self, v_lat: jnp.ndarray) -> jnp.ndarray:
        """Flat lattice vector -> dof vector."""
        return v_lat[jnp.asarray(self.inv, dtype=jnp.int32)]

    def embed_np(self, v: np.ndarray, fill) -> np.ndarray:
        v = np.asarray(v)
        if not self.masked:
            return v[self.perm]
        return np.concatenate([v, np.asarray([fill], dtype=v.dtype)])[
            self.perm
        ]


def detect_lattice(
    dof_coords: np.ndarray, allow_masked: bool = True
) -> Optional[Lattice]:
    """Map dof coordinates onto an integer lattice.

    Full lattices are detected as before; with allow_masked, dof sets
    that injectively fill >= 40% of a lattice (masked rectilinear
    domains) are accepted too, with sentinel-padded `perm`.
    """
    x = np.asarray(dof_coords)
    n, dim = x.shape
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    span = hi - lo
    if np.any(span <= 0):
        return None
    ij = np.empty((n, dim), dtype=np.int64)
    sizes = []
    for d in range(dim):
        # infer per-axis count from unique coordinates
        uniq = np.unique(np.round((x[:, d] - lo[d]) / span[d] * (10**9)))
        m = len(uniq)
        sizes.append(m)
        step = span[d] / (m - 1)
        idx = np.round((x[:, d] - lo[d]) / step)
        if not np.allclose(idx * step + lo[d], x[:, d], atol=1e-8 * max(span)):
            return None
        ij[:, d] = idx.astype(np.int64)
    n_lat = int(np.prod(sizes))
    masked = n_lat != n
    if masked and (not allow_masked or n < 0.4 * n_lat or n_lat > 2**31):
        return None
    # flat index: x fastest (row-major with axes reversed: z, y, x)
    flat = np.zeros(n, dtype=np.int64)
    for d in reversed(range(dim)):
        flat = flat * sizes[d] + ij[:, d]
    if len(np.unique(flat)) != n:
        return None
    shape = tuple(int(s) for s in reversed(sizes))  # (…, ny, nx)
    perm = np.full(n_lat, n, dtype=np.int64)
    perm[flat] = np.arange(n)
    return Lattice(shape=shape, perm=perm, inv=flat, n_dof=n, masked=masked)


def _unique_offsets(d: np.ndarray):
    """Unique offset rows via 1-D integer keys (np.unique(axis=0) on
    10^7 rows costs minutes; this is seconds)."""
    B = int(np.abs(d).max()) + 1 if d.size else 1
    key = np.zeros(len(d), dtype=np.int64)
    for k in range(d.shape[1]):
        key = key * (2 * B + 1) + (d[:, k] + B)
    uk, o_idx = np.unique(key, return_inverse=True)
    # decode keys back to offset tuples
    offs = np.empty((len(uk), d.shape[1]), dtype=np.int64)
    rem = uk.copy()
    for k in reversed(range(d.shape[1])):
        offs[:, k] = rem % (2 * B + 1) - B
        rem = rem // (2 * B + 1)
    return offs, o_idx


class LatticeWeightMap:
    """Jittable local-matrix -> stencil-weight scatter for a fixed mesh.

    Time-varying operators inside lax.scans (lagged Burgers convection,
    per-step Newton Jacobians) share the mesh adjacency of the constant
    part, so their stencil OFFSETS are fixed; only the weights change.
    This precomputes the (cell, i, j) -> (offset_k, lattice_site) flat
    scatter indices on host once, and `weights()` turns a traced local
    batch (c, nl, nl) into stencil weights with one scatter-add — the
    whole inner Krylov stays gather-free with the TRUE per-step operator.
    """

    def __init__(self, lattice: Lattice, dofmap: np.ndarray):
        shape = lattice.shape
        dim = len(shape)
        n_lat = int(np.prod(shape))
        dm = np.asarray(dofmap)
        site = lattice.inv[dm]  # (c, nl)
        coords = []
        rem = site
        for s in reversed(shape):
            coords.append(rem % s)
            rem = rem // s
        coords = np.stack(list(reversed(coords)), axis=-1)  # (c, nl, dim)
        # offset[c, i, j] = coords(col j) - coords(row i)
        d = coords[:, None, :, :] - coords[:, :, None, :]  # (c, i, j, dim)
        offs, o_idx = _unique_offsets(d.reshape(-1, dim))
        self.offsets = [tuple(int(v) for v in o) for o in offs]
        self.pad = int(np.abs(offs).max()) if len(offs) else 0
        self.shape = shape
        rows = np.broadcast_to(site[:, :, None], d.shape[:3])
        flat = o_idx.reshape(rows.shape) * n_lat + rows
        self._flat_np = flat.reshape(-1)
        self._n = len(self.offsets) * n_lat
        # K * n_lat can exceed int32 on large 3-D P2 lattices (res >= ~150);
        # a silent int32 cast would corrupt the in-jit scatter indices.
        idx_dtype = jnp.int32 if self._n <= 2**31 - 1 else jnp.int64
        self._flat = jnp.asarray(self._flat_np, dtype=idx_dtype)

    def weights(self, A_local: jnp.ndarray) -> jnp.ndarray:
        """(c, nl, nl) local batch -> (K,) + shape stencil weights."""
        W = jnp.zeros(self._n, A_local.dtype).at[self._flat].add(
            A_local.reshape(-1)
        )
        return W.reshape((len(self.offsets),) + self.shape)

    def weights_np(self, A_local_np: np.ndarray) -> np.ndarray:
        """Host-side weights build (setup paths: avoids eager device
        scatter ops, which compile remotely on the axon platform)."""
        W = np.bincount(
            self._flat_np,
            weights=np.asarray(A_local_np, dtype=np.float64).reshape(-1),
            minlength=self._n,
        )
        return W.reshape((len(self.offsets),) + self.shape)

    def apply_grid(self, W: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        up = jnp.pad(u, self.pad)
        out = jnp.zeros_like(u)
        for k, off in enumerate(self.offsets):
            start = tuple(self.pad + o for o in off)
            out = out + W[k] * jax.lax.dynamic_slice(up, start, u.shape)
        return out


class BilinearLatticeWeightMap:
    """Scatter-free per-step stencil weights for operators LINEAR in a
    nodal coefficient field (the lagged Burgers convection).

    When the cell-local matrix is N_local[c,i,j] = sum_k T[c,i,j,k] *
    u[dofmap[c,k]], the scattered stencil weights are a fixed bilinear
    map of u that regroups into shifted multiply-adds on the lattice:

        W(u)[o, p] = sum_{o2} P[o, o2, p] * u_lat[p + o2]

    P is built host-side once (bincount over (c,i,j,k), boundary cells
    included exactly — no interior/boundary split needed), and the
    per-step build inside the scan becomes |pairs| fused FMA planes:
    pure VPU work. The in-jit LatticeWeightMap scatter it replaces
    serializes on TPU (~the dominant per-step cost at benchmark sizes).
    Bit-equivalence vs the scatter path is up to f32 reassociation of
    the same products — the same order as the accepted stencil-cast
    outer perturbation.

    `P` is exposed as an array (pass it back through `weights_w` as a
    jit ARGUMENT: large closure constants trigger XLA constant-folding
    stalls on CPU).
    """

    def __init__(
        self,
        wmap: LatticeWeightMap,
        lattice: Lattice,
        dofmap: np.ndarray,
        T_np: np.ndarray,
        dtype=jnp.float32,
    ):
        import os

        shape = wmap.shape
        K = len(wmap.offsets)
        n_lat = int(np.prod(shape))
        dm = np.asarray(dofmap)
        c, nl = dm.shape
        flat_ij = wmap._flat_np.reshape(c, nl, nl)
        self.pairs = None
        self.offsets = wmap.offsets
        self.pad = wmap.pad
        self.shape = shape
        self.K = K
        self._dtype_np = np.float32 if dtype == jnp.float32 else np.float64
        self.P_np = None
        self._compressed = None
        # tile-direct build (default): bincount only boundary strips +
        # a center probe block, verify (r, r)-periodicity on a ring,
        # and never materialize the dense (K, K, n_lat) accumulator —
        # the dense-then-compress build's bincount over (c, nl^3) keys
        # was 0.4-0.7 s/case of burgers/RD t_setup (PLAN_r4 #4).
        # PDEBENCH_TPU_PBUILD=dense restores the discovery build.
        # Masked lattices are EXCLUDED outright (ADVICE r4, medium): the
        # ring check only samples boundary strips + a center block, so a
        # mask whose zeroed rows/taps sit in the deep interior away from
        # both regions would pass verification with wrong per-step
        # weights, and a (a, b) pair nonzero only at unsampled sites
        # would be dropped. Tile-direct is for provably uniform FULL
        # lattices only; masked ones take the dense discovery build,
        # whose bincount covers every site.
        if (
            os.environ.get("PDEBENCH_TPU_PBUILD", "tile") == "tile"
            and not lattice.masked
        ):
            try:
                if self._direct_build(flat_ij, T_np, n_lat):
                    return
            except Exception as e:
                import warnings

                warnings.warn(
                    f"tile-direct P build failed ({type(e).__name__}: {e}); "
                    f"falling back to the dense discovery build"
                )
                self.pairs = None
                self._compressed = None
        o_idx = (flat_ij // n_lat).astype(np.int64)  # (c, i, j)
        site_row = (flat_ij % n_lat)[:, :, 0]  # (c, i): row site
        key = (
            o_idx[:, :, :, None] * K + o_idx[:, :, None, :]
        ) * n_lat + site_row[:, :, None, None]
        P = np.bincount(
            key.reshape(-1),
            weights=np.asarray(T_np, dtype=np.float64).reshape(-1),
            minlength=K * K * n_lat,
        ).reshape(K, K, n_lat)
        # prune structurally-zero (out-offset, tap-offset) pairs
        nz = np.abs(P).reshape(K * K, n_lat).max(axis=1) > 0.0
        pairs = [
            (a, b) for a in range(K) for b in range(K) if nz[a * K + b]
        ]
        self.pairs = pairs
        self.P_np = np.stack(
            [P[a, b].reshape(shape) for a, b in pairs]
        ).astype(self._dtype_np)
        self._compress()

    def _direct_build(self, flat_ij, T_np, n_lat) -> bool:
        """Build the COMPRESSED P representation without the dense pass.

        Only sites in four boundary strips (width pad+4) and a 6x6
        center block are accumulated; periodicity of the interior is
        verified on the strips' inner ring (depth [pad+4, pad+7)) for
        r in (1, 2, 3). The translation argument makes the ring check
        sufficient: a site's P row depends only on cells within the
        stencil reach (pad sites), so any site deeper than pad+r from
        the boundary has a cell neighborhood that is an exact translate
        of the probe block's. Graded lattices fail the ring check and
        fall back to the dense discovery build; masked lattices never
        enter (guarded in __init__ — the sampled check cannot see
        interior mask sites). The stored
        (tile, bands) reproduce P_dense()/weights_w_parts() in the same
        equivalence class as the dense compress (interior within the
        1e-6 relative tolerance, bands exact).
        """
        shape = self.shape
        if len(shape) != 2:
            return False
        ny, nx = shape
        K = self.K
        RMAX = 3
        bwf = self.pad + RMAX + 1  # stored band width (conservative)
        ver = RMAX  # verification ring beyond the bands
        blk = 2 * RMAX  # center probe block (covers r=1,2,3 twice)
        if 2 * (bwf + ver) + blk >= min(ny, nx):
            return False  # small lattice: dense build is cheap
        m = min(ny, nx) // 2
        c0 = (m // blk) * blk
        sel = np.zeros((ny, nx), dtype=bool)
        w = bwf + ver
        sel[:w, :] = True
        sel[-w:, :] = True
        sel[:, :w] = True
        sel[:, -w:] = True
        sel[c0 : c0 + blk, c0 : c0 + blk] = True
        sel_flat = sel.reshape(-1)

        site_row = (flat_ij % n_lat)[:, :, 0]  # (c, i)
        rsel = sel_flat[site_row]
        cs, is_ = np.nonzero(rsel)
        if len(cs) == 0:
            return False
        sites = np.nonzero(sel_flat)[0]
        ns = len(sites)
        compact = np.full(n_lat, -1, np.int64)
        compact[sites] = np.arange(ns)
        srow = compact[site_row[cs, is_]]  # (S,)
        oj = (flat_ij // n_lat)[cs, is_].astype(np.int64)  # (S, nl)
        key = (oj[:, :, None] * K + oj[:, None, :]) * ns + srow[
            :, None, None
        ]
        Tsel = np.asarray(T_np, dtype=np.float64)[cs, is_]  # (S, nl, nl)
        Ps = np.bincount(
            key.reshape(-1),
            weights=Tsel.reshape(-1),
            minlength=K * K * ns,
        ).reshape(K * K, ns)

        nz = np.abs(Ps).max(axis=1) > 0.0
        pairs = [(a, b) for a in range(K) for b in range(K) if nz[a * K + b]]
        # built-site planes, NaN where unbuilt (so indexing bugs surface)
        Psel = Ps[[a * K + b for a, b in pairs]].astype(np.float64)
        grid = np.full((len(pairs), ny, nx), np.nan)
        yy, xx = sites // nx, sites % nx
        grid[:, yy, xx] = Psel

        tol = 1e-6 * max(float(np.abs(Psel).max()), 1e-300)
        # verification set: built sites at depth >= bwf (the strips'
        # inner margin + the center block) — exactly where the periodic
        # extension must hold
        depth = np.minimum(
            np.minimum(np.arange(ny), ny - 1 - np.arange(ny))[:, None],
            np.minimum(np.arange(nx), nx - 1 - np.arange(nx))[None, :],
        )
        ring = sel & (depth >= bwf)
        ry, rx = np.nonzero(ring)
        for r in (1, 2, 3):
            a0 = (m // r) * r
            tile = grid[:, a0 : a0 + r, a0 : a0 + r]
            if np.isnan(tile).any():
                continue
            pred = tile[:, ry % r, rx % r]
            got = grid[:, ry, rx]
            if np.nanmax(np.abs(pred - got), initial=0.0) <= tol and not (
                np.isnan(got).any()
            ):
                bands = (
                    grid[:, :bwf, :],
                    grid[:, -bwf:, :],
                    grid[:, bwf:-bwf, :bwf],
                    grid[:, bwf:-bwf, -bwf:],
                )
                if any(np.isnan(b).any() for b in bands):
                    continue
                self.pairs = pairs
                self._periods = (r, bwf)
                self._compressed = tuple(
                    a.astype(self._dtype_np) for a in (tile,) + bands
                )
                return True
        return False

    def _compress(self) -> None:
        """Translation-invariant compression of the P plane stack.

        On a uniform lattice every interior site of a given node class
        (vertex / edge-mid / center for P2) has an identical cell
        neighborhood, so each P plane is (r, r)-periodic away from the
        boundary: store a phase-0 (r, r) tile plus four boundary bands
        instead of the dense (pairs, ny, nx) stack — ~50 MB at res-128
        P2, a measured ~1.5 s one-time transfer over the axon tunnel,
        vs ~3 MB compressed. Masked/graded lattices fail the exactness
        check and keep the dense stack.
        """
        self._compressed = None
        if self.P_np.ndim != 3:
            return
        _, ny, nx = self.P_np.shape
        # tolerance, not bit-equality: uniform-mesh coordinates round
        # differently per cell (i*h), so interior entries can differ at
        # the last ulp; <=1e-6 relative operator perturbation is the
        # same class as the accepted f32 step-weight reassociation
        tol = 1e-6 * max(float(np.abs(self.P_np).max()), 1e-300)
        for r in (1, 2, 3):
            if 4 * r >= min(ny, nx):
                continue
            # anchor the reference tile at the phase-0 site nearest the
            # lattice center, then take the smallest boundary band that
            # contains every mismatch vs the periodic extension
            a0 = (min(ny, nx) // 2 // r) * r
            tile = self.P_np[:, a0 : a0 + r, a0 : a0 + r]
            reps = (1, -(-ny // r), -(-nx // r))
            full = np.tile(tile, reps)[:, :ny, :nx]
            bad = np.argwhere(np.abs(full - self.P_np).max(axis=0) > tol)
            if len(bad):
                y, x = bad[:, 0], bad[:, 1]
                depth = np.minimum(
                    np.minimum(y, ny - 1 - y), np.minimum(x, nx - 1 - x)
                )
                bw = int(depth.max()) + 1
            else:
                bw = 1
            if 2 * bw + r >= min(ny, nx):
                continue  # band would cover the lattice: keep dense
            self._periods = (r, bw)
            self._compressed = (
                tile,
                self.P_np[:, :bw, :],
                self.P_np[:, -bw:, :],
                self.P_np[:, bw:-bw, :bw],
                self.P_np[:, bw:-bw, -bw:],
            )
            return

    def dense_np(self) -> np.ndarray:
        """Host-side dense (pairs,)+shape stack (reconstructed from the
        compressed parts when the tile-direct build skipped it)."""
        if self.P_np is not None:
            return self.P_np
        tile, top, bottom, left, right = self._compressed
        r, bw = self._periods
        ny, nx = self.shape
        reps = (1, -(-ny // r), -(-nx // r))
        P = np.tile(tile, reps)[:, :ny, :nx].astype(self._dtype_np)
        P[:, :bw, :] = top
        P[:, -bw:, :] = bottom
        P[:, bw:-bw, :bw] = left
        P[:, bw:-bw, -bw:] = right
        return P

    @property
    def P(self) -> jnp.ndarray:
        return jnp.asarray(self.dense_np())

    @property
    def P_parts(self):
        """Small-array pytree to pass as jit arguments; rebuild the
        dense stack in-trace with `P_dense` (avoids shipping the dense
        planes host->device)."""
        if self._compressed is None:
            return (jnp.asarray(self.P_np),)
        return tuple(jnp.asarray(a) for a in self._compressed)

    def P_dense(self, parts) -> jnp.ndarray:
        """Traceable (pairs, ny, nx) reconstruction from P_parts."""
        if self._compressed is None:
            return parts[0]
        tile, top, bottom, left, right = parts
        r, bw = self._periods
        ny, nx = self.shape
        reps = (1, -(-ny // r), -(-nx // r))
        P = jnp.tile(tile, reps)[:, :ny, :nx]
        P = jax.lax.dynamic_update_slice(P, top, (0, 0, 0))
        P = jax.lax.dynamic_update_slice(P, bottom, (0, ny - bw, 0))
        P = jax.lax.dynamic_update_slice(P, left, (0, bw, 0))
        P = jax.lax.dynamic_update_slice(P, right, (0, bw, nx - bw))
        return P

    def weights_w(self, P: jnp.ndarray, u_lat: jnp.ndarray) -> jnp.ndarray:
        """(pairs,)+shape plane stack + lattice-shaped u -> (K,)+shape
        stencil weights; traceable, no scatters."""
        up = jnp.pad(u_lat, self.pad)
        taps = {}
        for b in sorted({b for _, b in self.pairs}):
            start = tuple(self.pad + o for o in self.offsets[b])
            taps[b] = jax.lax.dynamic_slice(up, start, self.shape)
        acc = [None] * self.K
        for idx, (a, b) in enumerate(self.pairs):
            term = P[idx] * taps[b]
            acc[a] = term if acc[a] is None else acc[a] + term
        zero = jnp.zeros(self.shape, u_lat.dtype)
        return jnp.stack([w if w is not None else zero for w in acc])

    def weights_w_parts(self, parts, u_lat: jnp.ndarray) -> jnp.ndarray:
        """Per-step weight build straight from the compressed P_parts:
        interior coefficients come from the (r, r) phase tile via a
        blockwise broadcast (the dense (pairs,)+shape stack is never
        read from HBM inside the step), then the four boundary bands
        are overwritten with the exact stored band planes — the result
        matches weights_w(P_dense(parts), u) bit-for-bit. PLAN_r3 #2:
        the dense-P reads were the remaining HBM traffic of the
        per-step build. Falls back to weights_w when uncompressed."""
        if self._compressed is None:
            return self.weights_w(parts[0], u_lat)
        tile, top, bottom, left, right = parts
        r, bw = self._periods
        ny, nx = self.shape
        my, mx = -(-ny // r) * r, -(-nx // r) * r  # r-multiple cover
        up = jnp.pad(u_lat, self.pad)
        taps = {}
        for b in sorted({b for _, b in self.pairs}):
            start = tuple(self.pad + o for o in self.offsets[b])
            tap = jax.lax.dynamic_slice(up, start, self.shape)
            taps[b] = jnp.pad(tap, ((0, my - ny), (0, mx - nx))).reshape(
                my // r, r, mx // r, r
            )
        tile_b = tile[:, None, :, None, :]  # (pairs, 1, r, 1, r)
        # NOTE (advisor r2): the blockwise product below covers the FULL
        # grid including the boundary-band rows/cols that _band then
        # overwrites — redundant FMAs in the band region. Acceptable
        # while this path is opt-in (PDEBENCH_TPU_WBUILD=tiled, measured
        # 8% slower than the dense stack anyway); if ever promoted to
        # default, slice the product to the interior before the band
        # overwrite.
        acc = [None] * self.K
        for idx, (a, b) in enumerate(self.pairs):
            term = tile_b[idx] * taps[b]
            acc[a] = term if acc[a] is None else acc[a] + term
        zero = jnp.zeros((my // r, r, mx // r, r), u_lat.dtype)
        W = jnp.stack([w if w is not None else zero for w in acc])
        W = W.reshape(self.K, my, mx)[:, :ny, :nx]
        # exact boundary bands, same coverage order as P_dense: top and
        # bottom own the corners; left/right patch the middle rows only
        def _band(Pband, ys, xs):
            accb = [None] * self.K
            upb = up
            for idx, (a, b) in enumerate(self.pairs):
                oy, ox = self.offsets[b]
                tapb = jax.lax.dynamic_slice(
                    upb,
                    (self.pad + oy + ys.start, self.pad + ox + xs.start),
                    (ys.stop - ys.start, xs.stop - xs.start),
                )
                term = Pband[idx] * tapb
                accb[a] = term if accb[a] is None else accb[a] + term
            zb = jnp.zeros(
                (ys.stop - ys.start, xs.stop - xs.start), u_lat.dtype
            )
            return jnp.stack([w if w is not None else zb for w in accb])

        W = W.at[:, :bw, :].set(_band(top, slice(0, bw), slice(0, nx)))
        W = W.at[:, ny - bw :, :].set(
            _band(bottom, slice(ny - bw, ny), slice(0, nx))
        )
        W = W.at[:, bw : ny - bw, :bw].set(
            _band(left, slice(bw, ny - bw), slice(0, bw))
        )
        W = W.at[:, bw : ny - bw, nx - bw :].set(
            _band(right, slice(bw, ny - bw), slice(nx - bw, nx))
        )
        return W


def lattice_weight_map(
    lattice: Lattice, dofmap: np.ndarray, max_pad: int = 4
) -> Optional[LatticeWeightMap]:
    """LatticeWeightMap, or None when the adjacency isn't a compact
    stencil (periodic wrap-around offsets would need giant pads)."""
    wm = LatticeWeightMap(lattice, dofmap)
    if wm.pad == 0 or wm.pad > max_pad:
        return None
    return wm


class BlockLatticeWeightMap:
    """Jittable blocked local-matrix -> block-stencil-weight scatter.

    The vector analog of LatticeWeightMap: per-step Newton Jacobians of
    VECTOR systems (the Navier-Stokes velocity block) share the mesh
    adjacency of the constant part, so the scalar-node offsets are
    fixed and only the (d x d)-block weights change. `weights()` turns
    a traced blocked local batch (c, nl*d, nl*d) into block stencil
    weights (K, *shape, d, d) with one scatter-add.
    """

    def __init__(self, lattice: Lattice, dofmap_scalar: np.ndarray, ncomp: int):
        shape = lattice.shape
        dim = len(shape)
        d = int(ncomp)
        n_lat = int(np.prod(shape))
        dm = np.asarray(dofmap_scalar)
        site = lattice.inv[dm]  # (c, nl)
        coords = []
        rem = site
        for s in reversed(shape):
            coords.append(rem % s)
            rem = rem // s
        coords = np.stack(list(reversed(coords)), axis=-1)  # (c, nl, dim)
        doff = coords[:, None, :, :] - coords[:, :, None, :]  # (c, i, j, dim)
        offs, o_idx = _unique_offsets(doff.reshape(-1, dim))
        self.offsets = [tuple(int(v) for v in o) for o in offs]
        self.pad = int(np.abs(offs).max()) if len(offs) else 0
        self.shape = shape
        self.ncomp = d
        c, nl = site.shape
        rows = np.broadcast_to(site[:, :, None], (c, nl, nl))
        base_idx = o_idx.reshape(c, nl, nl) * n_lat + rows  # (c, i, j)
        # blocked local batch index order is [c, i*d+a, j*d+b] —
        # build flat targets in that order: (c, i, a, j, b)
        a = np.arange(d)
        flat = (
            (base_idx[:, :, None, :, None] * d + a[None, None, :, None, None])
            * d
            + a[None, None, None, None, :]
        )
        self._flat_np = flat.reshape(-1)
        self._n = len(self.offsets) * n_lat * d * d
        idx_dtype = jnp.int32 if self._n <= 2**31 - 1 else jnp.int64
        self._flat = jnp.asarray(self._flat_np, dtype=idx_dtype)

    def weights(self, A_local: jnp.ndarray) -> jnp.ndarray:
        """(c, nl*d, nl*d) blocked batch -> (K,) + shape + (d, d)."""
        W = jnp.zeros(self._n, A_local.dtype).at[self._flat].add(
            A_local.reshape(-1)
        )
        return W.reshape(
            (len(self.offsets),) + self.shape + (self.ncomp, self.ncomp)
        )

    def weights_np(self, A_local_np: np.ndarray) -> np.ndarray:
        """Host-side build (setup paths: no eager device scatters)."""
        W = np.bincount(
            self._flat_np,
            weights=np.asarray(A_local_np, dtype=np.float64).reshape(-1),
            minlength=self._n,
        )
        return W.reshape(
            (len(self.offsets),) + self.shape + (self.ncomp, self.ncomp)
        )

    def apply_grid(self, W: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """u: shape + (d,) lattice array -> same shape."""
        pad_widths = [(self.pad, self.pad)] * len(self.shape) + [(0, 0)]
        up = jnp.pad(u, pad_widths)
        out = jnp.zeros_like(u)
        for k, off in enumerate(self.offsets):
            start = tuple(self.pad + o for o in off) + (0,)
            tap = jax.lax.dynamic_slice(
                up, start, self.shape + (self.ncomp,)
            )
            out = out + jnp.einsum("...ab,...b->...a", W[k], tap)
        return out


def block_lattice_weight_map(
    lattice: Lattice, dofmap_scalar: np.ndarray, ncomp: int, max_pad: int = 4
) -> Optional[BlockLatticeWeightMap]:
    """BlockLatticeWeightMap, or None for non-compact adjacency."""
    wm = BlockLatticeWeightMap(lattice, dofmap_scalar, ncomp)
    if wm.pad == 0 or wm.pad > max_pad:
        return None
    return wm


class LatticeOperator:
    """Stencil form of a lattice-structured sparse matrix."""

    def __init__(self, A: sps.spmatrix, lattice: Lattice, dtype=jnp.float64):
        self.lattice = lattice
        shape = lattice.shape
        coo = A.tocoo()
        # lattice site of each entry's row/col dof
        lr = lattice.inv[coo.row]
        lc = lattice.inv[coo.col]

        # offsets per entry in lattice coordinates
        def unflatten(f):
            out = []
            rem = f
            for s in reversed(shape):  # x first
                out.append(rem % s)
                rem = rem // s
            return np.stack(list(reversed(out)), axis=1)  # (…, y, x)

        rc = unflatten(lr)
        cc = unflatten(lc)
        d = cc - rc  # (nnz, dim)
        offs, o_idx = _unique_offsets(d)
        self.offsets = [tuple(int(v) for v in o) for o in offs]
        self.pad = int(np.abs(offs).max()) if len(offs) else 0
        # bincount accumulation (np.add.at is ~100x slower at 10^7 nnz)
        n_lat = int(np.prod(shape))
        flat = o_idx * n_lat + lr
        W = np.bincount(
            flat, weights=coo.data, minlength=len(offs) * n_lat
        ).reshape((len(offs),) + shape)
        self.W = jnp.asarray(W).astype(dtype)
        # keep the f64 weights: mixed-precision refinement needs an
        # EXACT f64 outer operator, and the cell-based gather/scatter
        # apply is ~20x slower than this stencil on TPU
        self.W_f64 = (
            self.W if dtype == jnp.float64 else jnp.asarray(W)
        )
        self.dtype = dtype
        self.perm_j = jnp.asarray(lattice.perm, dtype=jnp.int32)
        self.inv_j = jnp.asarray(lattice.inv, dtype=jnp.int32)
        self.shape = shape
        self.grid_shape = shape

    @property
    def embedding(self) -> Lattice:
        """The dof <-> flat-grid-vector injection for this operator."""
        return self.lattice

    def astype(self, dtype) -> "LatticeOperator":
        import copy

        out = copy.copy(self)
        out.W = self.W.astype(dtype)
        out.dtype = dtype
        return out

    def apply_grid(self, u: jnp.ndarray) -> jnp.ndarray:
        """Stencil apply on the lattice-shaped array."""
        return self.apply_grid_w(self.W, u)

    def apply_grid_w(self, W: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """Stencil apply with explicit weights (e.g. W_f64)."""
        pad = self.pad
        shape = self.shape
        up = jnp.pad(u, pad)
        out = jnp.zeros_like(u)
        for k, off in enumerate(self.offsets):
            start = tuple(pad + o for o in off)
            out = out + W[k] * jax.lax.dynamic_slice(up, start, shape)
        return out

    def __call__(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        """Apply on a flat dof vector (any dof ordering handled)."""
        u_lat = (
            self.lattice.embed(u_flat.astype(self.W.dtype), 0)
            .reshape(self.shape)
        )
        y = self.apply_grid(u_lat).reshape(-1)
        return y[self.inv_j].astype(u_flat.dtype)


class BlockLatticeOperator:
    """Stencil form of a blocked-interleaved VECTOR lattice matrix.

    Dof (node, component a) sits at node*ncomp + a. The operator is a
    block stencil W[K, ..., a, b]: out[..., a] = sum_k sum_b
    W[k, ..., a, b] * shift(u[..., b], off_k) — the vector analog of
    LatticeOperator, still entirely gather-free (elasticity on
    structured meshes).
    """

    def __init__(
        self, A: sps.spmatrix, lattice: Lattice, ncomp: int,
        dtype=jnp.float64,
    ):
        self.lattice = lattice
        self.ncomp = int(ncomp)
        shape = lattice.shape
        dim = len(shape)
        d = self.ncomp

        coo = A.tocoo()
        node_r, comp_r = coo.row // d, coo.row % d
        node_c, comp_c = coo.col // d, coo.col % d
        # lattice positions of the nodes
        lr = lattice.inv[node_r]
        lc = lattice.inv[node_c]

        def unflatten(f):
            out = []
            rem = f
            for s in reversed(shape):
                out.append(rem % s)
                rem = rem // s
            return np.stack(list(reversed(out)), axis=1)

        rc = unflatten(lr)
        cc = unflatten(lc)
        doff = cc - rc
        offs, o_idx = _unique_offsets(doff)
        self.offsets = [tuple(int(v) for v in o) for o in offs]
        self.pad = int(np.abs(offs).max()) if len(offs) else 0
        # bincount accumulation (np.add.at is ~100x slower at 10^7 nnz)
        n_lat = int(np.prod(shape))
        flat = ((o_idx * n_lat + lr) * d + comp_r) * d + comp_c
        W = np.bincount(
            flat, weights=coo.data, minlength=len(offs) * n_lat * d * d
        ).reshape((len(offs),) + shape + (d, d))
        self.W = jnp.asarray(W).astype(dtype)
        # exact f64 weights for the refinement outer (see LatticeOperator)
        self.W_f64 = (
            self.W if dtype == jnp.float64 else jnp.asarray(W)
        )
        self.shape = shape
        self.dtype = dtype
        # dof <-> (lattice-major, component-minor) block-level injection
        # flat lattice-dof index = lattice_pos * d + comp; absent sites
        # of masked lattices get the n sentinel (embedded as zeros)
        n = A.shape[0]
        dof_nodes = np.arange(n) // d
        dof_comp = np.arange(n) % d
        lat_pos = lattice.inv[dof_nodes]
        lat_flat = lat_pos * d + dof_comp
        perm = np.full(n_lat * d, n, dtype=np.int64)
        perm[lat_flat] = np.arange(n)
        self.block_lattice = Lattice(
            shape=shape + (d,),
            perm=perm,
            inv=lat_flat,
            n_dof=n,
            masked=lattice.masked,
        )
        self.perm_j = jnp.asarray(perm, dtype=jnp.int32)
        self.inv_j = jnp.asarray(lat_flat, dtype=jnp.int32)
        self.grid_shape = shape + (d,)

    @property
    def embedding(self) -> Lattice:
        """The (node, comp) dof <-> flat-grid-vector injection."""
        return self.block_lattice

    def astype(self, dtype) -> "BlockLatticeOperator":
        import copy

        out = copy.copy(self)
        out.W = self.W.astype(dtype)
        out.dtype = dtype
        return out

    def apply_grid(self, u: jnp.ndarray) -> jnp.ndarray:
        """u: (..., d) lattice-shaped; returns same shape."""
        return self.apply_grid_w(self.W, u)

    def apply_grid_w(self, W: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        pad_widths = [(self.pad, self.pad)] * len(self.shape) + [(0, 0)]
        up = jnp.pad(u, pad_widths)
        out = jnp.zeros_like(u)
        for k, off in enumerate(self.offsets):
            start = tuple(self.pad + o for o in off) + (0,)
            tap = jax.lax.dynamic_slice(
                up, start, self.shape + (self.ncomp,)
            )
            out = out + jnp.einsum("...ab,...b->...a", W[k], tap)
        return out

    def __call__(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        d = self.ncomp
        u_lat = (
            self.block_lattice.embed(u_flat.astype(self.W.dtype), 0)
            .reshape(self.shape + (d,))
        )
        y = self.apply_grid(u_lat).reshape(-1)
        return y[self.inv_j].astype(u_flat.dtype)


def constrain_stencil_weights(
    W: np.ndarray, offsets, mask_lat: np.ndarray, d: int = 1
) -> np.ndarray:
    """Dirichlet-constrain stencil weights directly (no CSR round trip):
    zero rows at masked points, zero taps whose source is masked, unit
    diagonal at masked points.

    W: (K, *shape) scalar or (K, *shape, d, d) block; mask_lat: node
    mask in lattice shape.
    """
    W = np.array(W, dtype=np.float64, copy=True)
    shape = mask_lat.shape
    dim = len(shape)
    pad = int(max(abs(o) for off in offsets for o in off)) if offsets else 0
    mp = np.pad(mask_lat, pad, constant_values=True)
    diag_k = None
    for k, off in enumerate(offsets):
        if all(o == 0 for o in off):
            diag_k = k
        # source point p+off masked -> zero the tap
        sl = tuple(
            slice(pad + o, pad + o + s) for o, s in zip(off, shape)
        )
        src_masked = mp[sl]
        if d == 1:
            W[k][mask_lat] = 0.0
            W[k][src_masked] = 0.0
        else:
            W[k][mask_lat] = 0.0
            W[k][src_masked] = 0.0
    if diag_k is not None:
        if d == 1:
            W[diag_k][mask_lat] = 1.0
        else:
            W[diag_k][mask_lat] = np.eye(d)
    return W


def constrain_step_weights(
    W: jnp.ndarray, offsets, keep: jnp.ndarray
) -> jnp.ndarray:
    """Traced Dirichlet-constraining of freshly scattered stencil
    weights (per-step operators inside scans): zero rows at masked
    points, zero taps with masked sources, unit diagonal at masked
    points. `keep` is the lattice-shaped f32 free-site indicator
    (1 = free); equivalent to wrapping the raw apply in
    where(mask, v, raw(where(mask, 0, v))) but done once per step so a
    fused kernel can consume plain weight planes."""
    pad = int(max(abs(o) for off in offsets for o in off))
    kp = jnp.pad(keep, pad)
    outs = []
    for off in offsets:
        src = jax.lax.dynamic_slice(
            kp, tuple(pad + o for o in off), keep.shape
        )
        Wk = W[len(outs)] * keep * src
        if all(o == 0 for o in off):
            Wk = Wk + (1.0 - keep)
        outs.append(Wk)
    return jnp.stack(outs)


def block_lattice_operator_from_local(
    A_local, dofmap, ndof: int, scalar_dof_coords: np.ndarray, ncomp: int,
    dtype=jnp.float64,
) -> Optional[BlockLatticeOperator]:
    """BlockLatticeOperator from blocked cell-local matrices, or None."""
    lat = detect_lattice(scalar_dof_coords)
    if lat is None:
        return None
    nl = np.asarray(A_local).shape[1]
    dm = np.asarray(dofmap, dtype=np.int64)
    rows = np.repeat(dm, nl, axis=1).reshape(-1)
    cols = np.tile(dm, (1, nl)).reshape(-1)
    vals = np.asarray(A_local).reshape(-1)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(ndof, ndof)).tocsr()
    op = BlockLatticeOperator(A, lat, ncomp, dtype=dtype)
    if op.pad > 8:  # wrap-around offsets (periodic meshes)
        return None
    return op


def lattice_operator_from_local(
    A_local, dofmap: np.ndarray, ndof: int, dof_coords: np.ndarray,
    dtype=jnp.float64,
) -> Optional[LatticeOperator]:
    """Build a LatticeOperator from cell-local matrices, or None if the
    dofs don't form a full lattice (complex domains, mixed spaces)."""
    lat = detect_lattice(dof_coords)
    if lat is None:
        return None
    import numpy as _np

    nl = np.asarray(A_local).shape[1]
    dm = np.asarray(dofmap, dtype=np.int64)
    rows = np.repeat(dm, nl, axis=1).reshape(-1)
    cols = np.tile(dm, (1, nl)).reshape(-1)
    vals = np.asarray(A_local).reshape(-1)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(ndof, ndof)).tocsr()
    op = LatticeOperator(A, lat, dtype=dtype)
    # periodic identifications create wrap-around offsets (pad ~ n);
    # the stencil/GMG machinery assumes compact stencils
    if op.pad > 8:
        return None
    return op
