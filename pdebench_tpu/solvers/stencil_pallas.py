"""Pallas TPU kernel: fused multi-tap lattice stencil apply.

The XLA formulation of the stencil apply (stencil.py) materializes one
shifted slice per tap — |taps| reads of the padded field plus |taps|
multiply-adds, each potentially a separate HBM round trip. This kernel
performs ALL taps in one pass per row-tile:

    y[r, c] = sum_k W[k, r, c] * u_pad[r + p + dy_k, c + p + dx_k]

HBM traffic becomes the roofline minimum — read u once, stream the K
weight planes once, write y once.

Mosaic's alignment rules forbid the naive form (dynamic sublane slices
must be 8-aligned, lane slices 128-aligned; tap offsets are +/-1..4 by
construction). The workaround: each grid step loads an ALIGNED row
window of the padded field (row0 = i*tile is tile-aligned), then
realizes every tap with `pltpu.roll` — a circular VPU shuffle inside
VMEM, free of alignment constraints and HBM traffic — followed by
aligned static slices. Taps are grouped by dy so each row shift is
rolled once and reused across its dx taps.

Scope: 2-D stencils, f32/f64, field small enough to stage in VMEM
(lattices up to ~600^2 in f32; benchmark meshes are <= 221^2 at P1,
441^2 at P2). The XLA formulation remains the fallback for 3-D and
oversized grids.

STATUS (measured on v5e, in-jit loop, best of 3): compiles and matches
the XLA formulation bit-exactly, but at benchmark lattice sizes both
forms are LATENCY-bound, not HBM-bound — 221^2 K=9: pallas 598 us vs
XLA 320 us; 513^2 K=9: 640 vs 361 us (XLA per-apply time barely grows
with 5x the data). The per-tap VPU rolls cost more than XLA's fused
dynamic-slice FMA chain at sizes where the whole field fits in cache,
so the production stencil path keeps the XLA formulation
(stencil.py). This kernel is the building block for a future
fully-fused smoother/V-cycle kernel, where amortizing launch overhead
across a whole multigrid level — not single-apply bandwidth — is the
actual win.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable on non-TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(u_ref, w_ref, out_ref, *, groups, pad, tile, nx, wrows):
    i = pl.program_id(0)
    window = u_ref[pl.ds(i * tile, wrows), :]  # aligned: tile % 8 == 0
    acc = jnp.zeros(out_ref.shape, out_ref.dtype)
    for dy, dx_taps in groups:
        # one sublane roll per distinct dy, reused across its dx taps
        # (pltpu.roll wants non-negative shifts: -off == size - off)
        sh_y = (-(pad + dy)) % wrows
        wdy = (
            pltpu.roll(window, jnp.int32(sh_y), axis=0)
            if sh_y
            else window
        )
        for k, dx in dx_taps:
            sh_x = (-(pad + dx)) % u_ref.shape[1]
            tap = (
                pltpu.roll(wdy, jnp.int32(sh_x), axis=1)
                if sh_x
                else wdy
            )[:tile]
            acc = acc + w_ref[k] * tap
    out_ref[:, :] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "pad", "tile", "interpret")
)
def stencil_apply_2d(
    u_pad: jnp.ndarray,  # (ny + 2 pad, nx + 2 pad)
    W: jnp.ndarray,  # (K, ny, nx)
    offsets: Tuple[Tuple[int, int], ...],  # (dy, dx) per tap
    pad: int,
    tile: int = 128,
    interpret: bool = False,
):
    """Fused stencil apply; returns (ny, nx)."""
    K, ny, nx = W.shape
    # shrink the row tile until the double-buffered weight block plus
    # the VMEM-resident field fit the ~16M scoped vmem budget
    nxp0 = _round_up(nx + 2 * pad, 128)
    itemsize = jnp.dtype(W.dtype).itemsize
    field_bytes = (ny + 2 * pad + tile) * nxp0 * itemsize
    while tile > 8 and (
        2 * (K + 1) * tile * nxp0 * itemsize + field_bytes > 12_000_000
    ):
        tile //= 2
    n_tiles = -(-ny // tile)
    ny_tiles = n_tiles * tile
    wrows = _round_up(tile + 2 * pad, 8)
    nxp = _round_up(nx + 2 * pad, 128)

    # rows: last tile's window must stay in bounds; lanes: pad to the
    # lane width (the roll wraps garbage into lanes >= nx, sliced off)
    u2 = jnp.pad(
        u_pad,
        (
            (0, ny_tiles + wrows - u_pad.shape[0]),
            (0, nxp - u_pad.shape[1]),
        ),
    )
    W2 = jnp.pad(W, ((0, 0), (0, ny_tiles - ny), (0, nxp - nx)))

    # group taps by dy: one row roll per distinct dy
    by_dy = {}
    for k, (dy, dx) in enumerate(offsets):
        by_dy.setdefault(dy, []).append((k, dx))
    groups = tuple(
        (dy, tuple(taps)) for dy, taps in sorted(by_dy.items())
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, pad=pad, tile=tile, nx=nx,
            wrows=wrows,
        ),
        grid=(n_tiles,),
        in_specs=[
            # the whole padded field stays VMEM-resident across grid
            # steps; each step slices its aligned halo window
            # (int32 indices: Mosaic rejects x64-promoted i64 maps)
            pl.BlockSpec(
                u2.shape, lambda i: (jnp.int32(0), jnp.int32(0))
            ),
            pl.BlockSpec(
                (K, tile, nxp), lambda i: (jnp.int32(0), i, jnp.int32(0))
            ),
        ],
        out_specs=pl.BlockSpec((tile, nxp), lambda i: (i, jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((ny_tiles, nxp), W.dtype),
        interpret=interpret,
    )(u2, W2)
    return out[:ny, :nx]
