"""Traced (dynamic-weight) Galerkin block coarsening vs the comb-probed
numpy coarsener, and the per-step V-cycle as an FGMRES preconditioner."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdebench_tpu.solvers import gmg_dyn
from pdebench_tpu.solvers.gmg import (
    _apply_block_np,
    _coarsen_block_stencil,
    _prolong_block_np,
    _restrict_block_np,
)


def _random_block_stencil(shape, d, pad, seed=0):
    """Random symmetric-adjacency block stencil (weights unsymmetric,
    like a convected Jacobian)."""
    rng = np.random.default_rng(seed)
    offs = [
        o
        for o in itertools.product(range(-pad, pad + 1), repeat=len(shape))
        if max(abs(v) for v in o) <= pad
    ]
    W = rng.standard_normal((len(offs),) + shape + (d, d))
    # zero taps whose source is out of range (real stencils never
    # couple to absent sites)
    grids = np.meshgrid(*[np.arange(n) for n in shape], indexing="ij")
    for k, off in enumerate(offs):
        v = np.ones(shape, dtype=bool)
        for ax in range(len(shape)):
            c = grids[ax] + off[ax]
            v &= (c >= 0) & (c < shape[ax])
        W[k][~v] = 0.0
    # diagonal dominance so Jacobi smoothing is stable
    for k, off in enumerate(offs):
        if all(o == 0 for o in off):
            W[k] += 4 * len(offs) * np.eye(d)
    return W, offs


@pytest.mark.parametrize("shape", [(9, 9), (9, 13)])
def test_traced_coarsening_matches_comb_probing(shape):
    """Same operator ACTION as gmg._coarsen_block_stencil: both zero
    out-of-range column entries and zero-pad applies."""
    d = 2
    W, offs = _random_block_stencil(shape, d, pad=2, seed=3)
    Wc_ref, offs_ref, shape_c = _coarsen_block_stencil(W, offs, shape, d)

    offs_c, C = gmg_dyn.galerkin_coeffs(offs, len(shape))
    valid = gmg_dyn._valid_planes(offs_c, shape_c)
    Wc_np, shape_c2 = gmg_dyn.coarsen_block_np(
        W, offs, shape, offs_c, C, valid
    )
    assert shape_c2 == shape_c

    rng = np.random.default_rng(7)
    u = rng.standard_normal(shape_c + (d,))
    y_ref = _apply_block_np(Wc_ref, offs_ref, u)
    y_np = _apply_block_np(Wc_np, offs_c, u)
    np.testing.assert_allclose(y_np, y_ref, rtol=1e-12, atol=1e-12)

    # direct check vs R A P action
    y_rap = _restrict_block_np(
        _apply_block_np(W, offs, _prolong_block_np(u, shape))
    )
    np.testing.assert_allclose(y_np, y_rap, rtol=1e-12, atol=1e-12)

    # traced twin is exact vs the numpy twin
    Wc_tr = np.asarray(
        gmg_dyn.coarsen_block_traced(
            jnp.asarray(W), offs_c, C, valid, shape_c
        )
    )
    np.testing.assert_allclose(Wc_tr, Wc_np, rtol=1e-12, atol=1e-12)


def test_constrain_block_weights_traced_matches_np():
    from pdebench_tpu.solvers.stencil import constrain_stencil_weights

    shape, d = (9, 9), 2
    W, offs = _random_block_stencil(shape, d, pad=2, seed=5)
    rng = np.random.default_rng(11)
    mask = rng.random(shape) < 0.25
    W_np = constrain_stencil_weights(W, offs, mask, d=d)
    keep = jnp.asarray(1.0 - mask.astype(np.float64))
    W_tr = np.asarray(
        gmg_dyn.constrain_block_weights_traced(
            jnp.asarray(W), offs, keep, jnp.eye(d)
        )
    )
    np.testing.assert_allclose(W_tr, W_np, rtol=1e-12, atol=1e-12)


def test_dyn_vcycle_preconditions_fgmres():
    """The traced hierarchy built from a (nonsymmetric, convected)
    block operator must give mesh-independent-ish FGMRES convergence:
    a handful of refinement outers at inner=10, far better than
    unpreconditioned."""
    from pdebench_tpu.solvers.krylov import refined_solve

    shape, d = (33, 33), 2
    # anisotropic convected Laplacian-like block stencil: 5-point
    # diffusion per component + first-order coupling terms
    offs = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)]
    ny, nx = shape
    rng = np.random.default_rng(0)
    W = np.zeros((5,) + shape + (d, d))
    conv = 2.0 * rng.standard_normal(shape + (d, d)) / nx
    W[0] = 4.0 * np.eye(d)
    for k in range(1, 5):
        W[k] = -1.0 * np.eye(d) + conv
    # boundary: constrain the outer ring
    mask = np.zeros(shape, dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    from pdebench_tpu.solvers.stencil import constrain_stencil_weights

    Wc = constrain_stencil_weights(W, offs, mask, d=d)

    spec = gmg_dyn.build_dyn_block_spec(
        offs, shape, d, probe_W=Wc, coarse_size=200
    )
    assert spec is not None and len(spec.levels) >= 2

    W32 = jnp.asarray(Wc, jnp.float32)
    W64 = jnp.asarray(Wc)

    def A64(x):
        return gmg_dyn._apply_block_w(
            W64, offs, 1, shape, x.reshape(shape + (d,))
        ).reshape(-1)

    def A32(x):
        return gmg_dyn._apply_block_w(
            W32, offs, 1, shape, x.reshape(shape + (d,))
        ).reshape(-1)

    lv = spec.build_levels(W32)

    def M32(r):
        z = spec.vcycle(lv, r.reshape(shape + (d,)))
        return z.reshape(-1)

    rng2 = np.random.default_rng(1)
    b = jnp.asarray(rng2.standard_normal(ny * nx * d))
    b = jnp.where(jnp.asarray(np.repeat(mask.reshape(-1), d)), 0.0, b)
    x, info = refined_solve(
        A64, A32, b, M32=M32, rtol=1e-10, atol=1e-14,
        inner_iters=10, max_outer=20, inner="gmres",
    )
    assert bool(info.converged), (
        float(info.residual),
        int(info.iterations),
    )
    # mesh-independent contraction: well under the outer budget
    assert int(info.iterations) <= 120, int(info.iterations)


def test_dyn_spec_handles_even_axis_identity_padding():
    shape, d = (11, 11), 2  # 11 -> 6 (even) -> identity-pad path
    W, offs = _random_block_stencil(shape, d, pad=1, seed=9)
    spec = gmg_dyn.build_dyn_block_spec(
        offs, shape, d, probe_W=W, coarse_size=50
    )
    assert spec is not None
    assert any(sp.pad_to is not None for sp in spec.levels[:-1])
    lv = spec.build_levels(jnp.asarray(W, jnp.float32))
    r = jnp.ones(shape + (d,), jnp.float32)
    z = spec.vcycle(lv, r)
    assert z.shape == r.shape and bool(jnp.all(jnp.isfinite(z)))


def test_fused_dyn_block_vcycle_matches_xla():
    """The dynamic-weight fused block V-cycle kernel (interpret mode)
    must match gmg_dyn's XLA V-cycle on the same traced levels."""
    from pdebench_tpu.solvers.gmg_fused import build_fused_dyn_block_vcycle
    from pdebench_tpu.solvers.stencil import constrain_stencil_weights

    shape, d = (17, 17), 2
    W, offs = _random_block_stencil(shape, d, pad=2, seed=21)
    mask = np.zeros(shape, dtype=bool)
    mask[0] = mask[-1] = True
    mask[:, 0] = mask[:, -1] = True
    Wc = constrain_stencil_weights(W, offs, mask, d=d)
    spec = gmg_dyn.build_dyn_block_spec(
        offs, shape, d, probe_W=Wc, coarse_size=100
    )
    assert spec is not None and len(spec.levels) >= 2
    fused = build_fused_dyn_block_vcycle(spec, n_cycles=2, interpret=True)
    assert fused is not None

    W32 = jnp.asarray(Wc, jnp.float32)
    lv = spec.build_levels(W32)
    rng = np.random.default_rng(2)
    r = jnp.asarray(
        rng.standard_normal(int(np.prod(shape)) * d), jnp.float32
    )
    z_xla = spec.vcycle(lv, r.reshape(shape + (d,)))
    r3 = r.reshape(shape + (d,))
    res = r3 - gmg_dyn._apply_block_w(
        lv[0][0], offs, 2, shape, z_xla
    )
    z_xla = (z_xla + spec.vcycle(lv, res)).reshape(-1)
    z_f = fused(r, lv)
    np.testing.assert_allclose(
        np.asarray(z_f), np.asarray(z_xla), rtol=2e-5, atol=2e-5
    )
