"""MINRES: restart behavior under a low-precision preconditioner.

The Lanczos recurrence's residual estimate (phibar) tracks the
PRECONDITIONED residual; when M is applied in f32 (GMG V-cycles) it
drifts from the true residual and a single run exits early believing it
converged (seen on stokes_basic: exit at ||r|| 1.2e-8 vs target 1e-10).
The true-residual restarts in krylov.minres must recover full accuracy.
"""

import jax.numpy as jnp
import numpy as np

from pdebench_tpu.solvers.krylov import minres


def _spd_system(n=400, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, np.log10(cond), n)
    A = (q * eigs) @ q.T
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(q), eigs


def test_minres_converges_exact_arithmetic():
    A, b, _, _ = _spd_system()
    x, info = minres(lambda v: A @ v, b, rtol=1e-10, maxiter=4000)
    assert bool(info.converged), float(info.residual)
    r = np.linalg.norm(np.asarray(b - A @ x))
    assert r <= 1e-10 * np.linalg.norm(np.asarray(b)) + 1e-12


def test_minres_restarts_through_f32_preconditioner():
    """An f32-quantized inexact inverse as preconditioner: a single
    Lanczos run stalls near f32 resolution; restarts must reach 1e-10."""
    A, b, q, eigs = _spd_system(cond=1e6)

    # inexact inverse (perturbed spectrum), applied in f32
    inv_eigs = (1.0 / eigs) * (1.0 + 0.05 * np.sin(np.arange(len(eigs))))
    Minv = np.asarray((q * inv_eigs) @ q.T, dtype=np.float32)
    Minv_j = jnp.asarray(Minv)

    def M(r):
        return (Minv_j @ r.astype(jnp.float32)).astype(r.dtype)

    x, info = minres(
        lambda v: A @ v, b, M=M, rtol=1e-10, maxiter=4000, restarts=6
    )
    r = np.linalg.norm(np.asarray(b - A @ x))
    assert r <= 1e-10 * np.linalg.norm(np.asarray(b)) + 1e-12, (
        float(r),
        int(info.iterations),
    )


def test_minres_ir_f32_inner_reaches_f64_accuracy():
    """A32 mode: the recurrence runs in f32 (native v5e speed) and the
    f64 restarts must still reach rtol 1e-10."""
    A, b, q, eigs = _spd_system(cond=1e5, seed=2)
    A32 = jnp.asarray(np.asarray(A), dtype=jnp.float32)
    x, info = minres(
        lambda v: A @ v,
        b,
        A32=lambda v: A32 @ v,
        rtol=1e-10,
        maxiter=20000,
    )
    r = np.linalg.norm(np.asarray(b - A @ x))
    assert r <= 1e-10 * np.linalg.norm(np.asarray(b)) + 1e-12, (
        float(r),
        int(info.iterations),
    )


def test_minres_indefinite_system():
    """MINRES handles symmetric indefinite (saddle-like) systems."""
    rng = np.random.default_rng(3)
    n = 300
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.concatenate([np.linspace(1, 50, n - 40), -np.linspace(1, 10, 40)])
    A = jnp.asarray((q * eigs) @ q.T)
    b = jnp.asarray(rng.standard_normal(n))
    x, info = minres(lambda v: A @ v, b, rtol=1e-10, maxiter=4000)
    assert bool(info.converged)
