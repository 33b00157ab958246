"""Pallas stencil kernel: interpret-mode correctness (runs everywhere).

The compiled TPU path is exercised on hardware; interpret mode checks
the kernel logic (halo windows, tap offsets, row tiling) in CI.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pdebench_tpu.solvers.stencil_pallas import stencil_apply_2d


@pytest.mark.parametrize("shape,tile", [((37, 41), 16), ((64, 30), 32)])
def test_pallas_stencil_matches_reference(shape, tile):
    rng = np.random.default_rng(0)
    ny, nx = shape
    pad = 2
    offs = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (2, 2), (-2, -1), (1, -2))
    W = rng.standard_normal((len(offs), ny, nx)).astype(np.float32)
    u = rng.standard_normal((ny, nx)).astype(np.float32)
    upn = np.pad(u, pad)
    ref = np.zeros((ny, nx), np.float32)
    for k, (dy, dx) in enumerate(offs):
        ref += W[k] * upn[pad + dy : pad + dy + ny, pad + dx : pad + dx + nx]
    y = stencil_apply_2d(
        jnp.asarray(upn), jnp.asarray(W), offs, pad, tile=tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
