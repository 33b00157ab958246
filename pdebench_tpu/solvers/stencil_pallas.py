"""Pallas TPU kernel: fused multi-tap lattice stencil apply.

The XLA formulation of the stencil apply (stencil.py) materializes one
shifted slice per tap — |taps| reads of the padded field plus |taps|
multiply-adds, each a separate HBM round trip when XLA doesn't fuse
them. This kernel performs ALL taps in one pass per row-tile: the
padded field tile and the weight-plane tile are staged in VMEM once and
the accumulation runs entirely on the VPU.

    y[r, c] = sum_k W[k, r, c] * u_pad[r + p + dy_k, c + p + dx_k]

Tap offsets are compile-time constants (static slices).

STATUS: interpret-verified; the compiled TPU path currently trips a
Mosaic restriction ("index in dimension 1 must be a multiple of 8"):
the dy-shifted row taps cannot be 8-aligned for |dy| < 8 by
construction, lane-dim pre-shifting (done below) only fixes the x axis,
and fully pre-shifting both axes reduces the kernel to an elementwise
FMA whose stack materialization costs more HBM traffic than the fused
XLA fallback. The production stencil path therefore uses the XLA
formulation (stencil.py, ~0.4 ms per apply at 194k dofs), which XLA
fuses well; this kernel documents the fused single-pass design for a
future Mosaic that supports unaligned sublane reads.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable on non-TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _kernel(u_ref, w_ref, out_ref, *, taps, pad, tile, nx):
    # u_ref: (D, ny_tot, nx) lane-aligned pre-shifted stacks; taps maps
    # stencil index k -> (dx_index, dy)
    row0 = pl.program_id(0) * tile
    acc = jnp.zeros((tile, nx), dtype=out_ref.dtype)
    for k, (dxi, dy) in enumerate(taps):
        tap = u_ref[dxi, pl.ds(row0 + pad + dy, tile), :]
        acc = acc + w_ref[k] * tap
    out_ref[:, :] = acc


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit, static_argnames=("offsets", "pad", "tile", "interpret")
)
def stencil_apply_2d(
    u_pad: jnp.ndarray,  # (ny + 2 pad, nx + 2 pad)
    W: jnp.ndarray,  # (K, ny, nx)
    offsets: Tuple[Tuple[int, int], ...],
    pad: int,
    tile: int = 128,
    interpret: bool = False,
):
    """Fused stencil apply; returns (ny, nx)."""
    K, ny, nx = W.shape
    n_tiles = -(-ny // tile)  # ceil
    ny_pad = n_tiles * tile
    # over-pad rows so the last tile's halo window stays in bounds
    extra = (ny_pad + 2 * pad) - (ny + 2 * pad)
    if extra > 0:
        u_pad = jnp.pad(u_pad, ((0, extra), (0, 0)))
    if ny_pad != ny:
        W = jnp.pad(W, ((0, 0), (0, ny_pad - ny), (0, 0)))

    # pre-shift the lane (x) dimension OUTSIDE the kernel: Mosaic wants
    # lane slices aligned, so each distinct dx becomes its own
    # lane-aligned stack and in-kernel taps slice rows only
    dxs = sorted({dx for _, dx in offsets})
    dx_index = {dx: i for i, dx in enumerate(dxs)}
    u_shift = jnp.stack(
        [u_pad[:, pad + dx : pad + dx + nx] for dx in dxs], axis=0
    )  # (D, ny_tot, nx)
    taps = tuple((dx_index[dx], dy) for dy, dx in offsets)
    D, nrow_tot, _ = u_shift.shape

    out = pl.pallas_call(
        functools.partial(
            _kernel, taps=taps, pad=pad, tile=tile, nx=nx
        ),
        grid=(n_tiles,),
        in_specs=[
            # shifted stacks stay VMEM-resident across the whole grid;
            # the kernel row-slices its halo window dynamically
            pl.BlockSpec((D, nrow_tot, nx), lambda i: (0, 0, 0)),
            pl.BlockSpec((K, tile, nx), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, nx), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny_pad, nx), W.dtype),
        interpret=interpret,
    )(u_shift, W)
    return out[:ny]
