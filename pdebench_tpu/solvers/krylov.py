"""Jitted Krylov solvers: PCG, BiCGStab, restarted GMRES.

Design notes (TPU):
  - Everything is lax.while_loop-driven with static shapes; one jit
    compilation per (ndof, operator) shape bucket.
  - The operator is a closure over cell-local matrices (see assemble.py);
    each iteration is gather -> batched matvec -> segment-sum, plus a few
    vector ops: all HBM-bandwidth bound, exactly where a TPU is fastest.
  - Convergence: ||r||_2 <= max(rtol * ||b||_2, atol), matching PETSc KSP
    defaults the reference relies on (oracle_solver.rtol/atol per case;
    reference: pdebench/oracle/poisson.py:92-97).

Returns (x, info) where info carries iterations and final residual norm —
the reference's specialized metrics read solver iteration counts
(metrics/specialized/meta_reader.py), so we track them natively.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

# Arnoldi orthogonalization for the refined-solve GMRES inner:
# "cgs2" (default) = classical Gram-Schmidt applied twice, as two MXU
# matmul pairs per step; "mgs" = the sequential modified Gram-Schmidt
# fori_loop (the pre-round-3 behavior, kept for A/B).
_GMRES_ORTH = os.environ.get("PDEBENCH_TPU_GMRES_ORTH", "cgs2")


class KrylovInfo(NamedTuple):
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


def _tolerance(b, rtol, atol):
    bnorm = jnp.linalg.norm(b)
    return jnp.maximum(rtol * bnorm, atol)


def cg(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 10000,
):
    """Preconditioned conjugate gradients (SPD systems)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r
    tol = _tolerance(b, rtol, atol)

    r0 = b - A(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    # divergence guard: a bad preconditioner must not burn maxiter
    blowup = 1e6 * (jnp.linalg.norm(r0) + jnp.linalg.norm(b))

    def cond(state):
        x, r, z, p, rz, k = state
        rn = jnp.linalg.norm(r)
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, rn > tol), rn < blowup
        )

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    res = jnp.linalg.norm(r)
    return x, KrylovInfo(k, res, res <= tol)


def bicgstab(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 10000,
):
    """Preconditioned BiCGStab (nonsymmetric systems)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r
    tol = _tolerance(b, rtol, atol)

    r0 = b - A(x0)
    rhat = r0
    eps = jnp.asarray(1e-300, dtype=b.dtype)

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, stag = state
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, jnp.linalg.norm(r) > tol),
            jnp.logical_not(stag),
        )

    def body(state):
        x, r, p, v, rho, alpha, omega, k, stag = state
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(jnp.abs(rho) < eps, eps, rho)) * (
            alpha / jnp.where(jnp.abs(omega) < eps, eps, omega)
        )
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A(phat)
        denom = jnp.vdot(rhat, v)
        alpha = rho_new / jnp.where(jnp.abs(denom) < eps, eps, denom)
        s = r - alpha * v
        shat = M(s)
        t = A(shat)
        tt = jnp.vdot(t, t)
        omega_new = jnp.vdot(t, s) / jnp.where(tt < eps, eps, tt)
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        stag = jnp.logical_or(
            jnp.abs(rho_new) < eps, jnp.abs(omega_new) < eps
        )
        return (x, r, p, v, rho_new, alpha, omega_new, k + 1, stag)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype=b.dtype)
    state = (x0, r0, z, z, one, one, one, 0, jnp.asarray(False))
    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state)
    res = jnp.linalg.norm(r)
    return x, KrylovInfo(k, res, res <= tol)


def gmres(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 2000,
    restart: int = 60,
):
    """Restarted GMRES(m) with left preconditioning.

    Arnoldi basis kept as a static (restart+1, ndof) buffer; the inner
    loop runs a fori_loop over the restart length — fully jittable.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r
    n = b.shape[0]
    m = min(restart, n)
    tol = _tolerance(b, rtol, atol)
    eps = jnp.asarray(1e-300, dtype=b.dtype)

    def arnoldi_cycle(x):
        r = M(b - A(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype=b.dtype)
        H = jnp.zeros((m + 1, m), dtype=b.dtype)
        V = V.at[0].set(r / jnp.where(beta < eps, eps, beta))

        def inner(j, carry):
            V, H, brk = carry
            w = M(A(V[j]))
            if _GMRES_ORTH == "mgs":
                # modified Gram-Schmidt (sequential vdot+axpy passes)
                def mgs(i, wc):
                    w, H = wc
                    hij = jnp.vdot(V[i], w) * (i <= j)
                    H = H.at[i, j].add(hij)
                    return (w - hij * V[i], H)

                w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            else:
                # CGS2: rows of V beyond column j are exactly zero, so
                # two matmul correction passes need no masking (see
                # refined_solve.inner_gmres)
                h1 = V @ w
                w = w - V.T @ h1
                h2 = V @ w
                w = w - V.T @ h2
                H = H.at[:, j].add(h1 + h2)
            hnorm = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hnorm)
            V = V.at[j + 1].set(w / jnp.where(hnorm < eps, eps, hnorm))
            return (V, H, brk)

        V, H, _ = jax.lax.fori_loop(0, m, inner, (V, H, False))
        # solve least squares min || beta e1 - H y ||
        e1 = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x_new = x + V[:m].T @ y
        return x_new

    def cond(state):
        x, k = state
        r = b - A(x)
        return jnp.logical_and(k < maxiter, jnp.linalg.norm(r) > tol)

    def body(state):
        x, k = state
        return (arnoldi_cycle(x), k + m)

    x, k = jax.lax.while_loop(cond, body, (x0, 0))
    res = jnp.linalg.norm(b - A(x))
    return x, KrylovInfo(k, res, res <= tol)


def minres(
    A: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable] = None,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    maxiter: int = 10000,
    restarts: int = 4,
    A32: Optional[Callable] = None,
):
    """Preconditioned MINRES for symmetric (possibly indefinite) systems.

    The preconditioner M must be SPD (applied as M ~ P^{-1}). Standard
    Lanczos + Givens implementation with static shapes; this is the
    device path for the reference's minres+hypre Stokes cases
    (oracle/stokes.py:253-257).

    The recurrence's residual estimate (phibar) is on the preconditioned
    residual and drifts from the true residual when M is applied in
    lower precision (f32 V-cycles), so a run can exit early believing it
    converged. Up to `restarts` outer restarts re-seed the Lanczos
    recurrence from the true f64 residual until it actually meets tol.

    With `A32` (an f32 twin of A), each restart's Lanczos recurrence
    solves the correction equation entirely in f32 — MINRES-IR. On v5e
    (emulated f64) the per-iteration applies then run at native f32
    speed and the restarts recover f64 accuracy.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M is None:
        M = lambda r: r
    tiny = jnp.asarray(1e-300, dtype=jnp.float64)
    restarts = max(restarts, 8) if A32 is not None else restarts

    def run0(r, factor):
        """Lanczos from zero on the correction system A d = r, in
        r.dtype; stops when phibar has dropped by `factor`."""
        dt_ = r.dtype
        _A_raw = A32 if A32 is not None else A
        A_in = lambda v: _A_raw(v).astype(dt_)
        M_in = lambda v: M(v).astype(dt_)
        eps = jnp.asarray(1e-300 if dt_ == jnp.float64 else 1e-30, dt_)
        y_ = M_in(r)
        beta1_ = jnp.sqrt(jnp.maximum(jnp.vdot(r, y_), 0.0))
        tol = beta1_ * factor.astype(dt_)

        init = dict(
            x=jnp.zeros_like(r),
            r1=r,
            r2=r,
            y=y_,
            w=jnp.zeros_like(r),
            w2=jnp.zeros_like(r),
            oldb=jnp.asarray(0.0, dt_),
            beta=beta1_,
            dbar=jnp.asarray(0.0, dt_),
            epsln=jnp.asarray(0.0, dt_),
            phibar=beta1_,
            cs=jnp.asarray(-1.0, dt_),
            sn=jnp.asarray(0.0, dt_),
            k=jnp.asarray(0, jnp.int32),
        )

        def cond_fn(s):
            return jnp.logical_and(s["k"] < maxiter, s["phibar"] > tol)

        def body_fn(s):
            beta = s["beta"]
            v = s["y"] / jnp.where(beta < eps, eps, beta)
            yv = A_in(v)
            yv = yv - jnp.where(
                s["k"] >= 1, beta / jnp.where(s["oldb"] < eps, eps, s["oldb"]), 0.0
            ) * s["r1"]
            alfa = jnp.vdot(v, yv)
            yv = yv - (alfa / jnp.where(beta < eps, eps, beta)) * s["r2"]
            r1n, r2n = s["r2"], yv
            yn = M_in(yv)
            oldb = beta
            betan = jnp.sqrt(jnp.maximum(jnp.vdot(yv, yn), 0.0))

            oldeps = s["epsln"]
            delta = s["cs"] * s["dbar"] + s["sn"] * alfa
            gbar = s["sn"] * s["dbar"] - s["cs"] * alfa
            epsln = s["sn"] * betan
            dbar = -s["cs"] * betan

            gamma = jnp.sqrt(gbar * gbar + betan * betan)
            gamma = jnp.where(gamma < eps, eps, gamma)
            cs = gbar / gamma
            sn = betan / gamma
            phi = cs * s["phibar"]
            phibar = sn * s["phibar"]

            w1 = s["w2"]
            w2 = s["w"]
            wn = (v - oldeps * w1 - delta * w2) / gamma
            xn = s["x"] + phi * wn

            return dict(
                x=xn, r1=r1n, r2=r2n, y=yn, w=wn, w2=w2, oldb=oldb,
                beta=betan, dbar=dbar, epsln=epsln, phibar=phibar,
                cs=cs, sn=sn, k=s["k"] + 1,
            )

        out = jax.lax.while_loop(cond_fn, body_fn, init)
        return out["x"], out["k"]

    tol_true = jnp.linalg.norm(b) * rtol + atol
    # the f32 recurrence can't close more than ~6 digits per restart
    floor = 3e-7 if A32 is not None else 0.0

    def outer_cond(s):
        return jnp.logical_and(
            jnp.logical_and(s["res"] > tol_true, ~s["stalled"]),
            jnp.logical_and(s["rs"] < restarts, s["total"] < maxiter),
        )

    def outer_body(s):
        # relative reduction still needed, mapped into phibar's norm
        factor = jnp.maximum(
            jnp.minimum(1.0, tol_true / jnp.maximum(s["res"], tiny)),
            floor,
        )
        if A32 is not None:
            d, k = run0(s["r"].astype(jnp.float32), factor)
            d = d.astype(b.dtype)
        else:
            d, k = run0(s["r"], factor)
        x = s["x"] + d
        r_new = b - A(x)
        res = jnp.linalg.norm(r_new)
        # keep the best iterate: a stagnated restart must not regress.
        # A non-improving restart would deterministically repeat the same
        # inner solve (r/res/factor unchanged) — flag it so outer_cond
        # exits instead of burning the remaining restart budget.
        better = res < s["res"]
        return dict(
            x=jnp.where(better, x, s["x"]),
            r=jnp.where(better, r_new, s["r"]),
            res=jnp.where(better, res, s["res"]),
            total=s["total"] + k,
            rs=s["rs"] + 1,
            stalled=~better,
        )

    r0 = b - A(x0)
    out = jax.lax.while_loop(
        outer_cond,
        outer_body,
        dict(
            x=x0,
            r=r0,
            res=jnp.linalg.norm(r0),
            total=jnp.asarray(0, jnp.int32),
            rs=jnp.asarray(0, jnp.int32),
            stalled=jnp.asarray(False),
        ),
    )
    return out["x"], KrylovInfo(
        out["total"], out["res"], out["res"] <= tol_true
    )


def refined_solve(
    A64: Callable,
    A32: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M32: Optional[Callable] = None,
    rtol: float = 1e-10,
    atol: float = 1e-14,
    inner_iters: int = 30,
    max_outer: int = 60,
    inner_fwd: Optional[Callable] = None,
    inner_bwd: Optional[Callable] = None,
    inner: str = "cg",
    inner_custom: Optional[Callable] = None,
):
    """Mixed-precision iterative refinement: f32 inner Krylov, f64 outer.

    inner_custom: full replacement for the inner solver (e.g. the fused
    Pallas GMG-CG kernel, solvers/gmg_fused.py); receives/returns the
    inner_fwd-space f32 vector.

    inner: "cg" (SPD) or "gmres" (one m-step Arnoldi cycle per outer —
    the outer refinement IS the restart, i.e. FGMRES-IR; right for
    Helmholtz / convection-dominated systems).
    inner_fwd/inner_bwd: optional basis change applied once per outer
    round (e.g. dof -> lattice permutation for stencil operators, so the
    per-iteration inner work is gather-free).

    TPU v5e emulates float64 (slow); float32 runs at native speed. The
    outer loop computes exact f64 residuals r = b - A x and corrects
    x += z where z approximately solves A z = r with `inner_iters` steps
    of f32 PCG (preconditioned by M32, e.g. an f32 AMG V-cycle). Each
    outer round contracts the error by the inner solver's reduction
    factor, so f64-level accuracy (rtol 1e-10) is reached in a handful
    of rounds while >95% of the FLOPs run in f32. Survey 7.3 flagged
    exactly this hedge for the v5e f64 budget.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if M32 is None:
        M32 = lambda r: r
    tol = _tolerance(b, rtol, atol)

    def inner_cg(r32):
        z = jnp.zeros_like(r32)
        res = r32
        p = M32(res)
        rz = jnp.vdot(res, p)

        def body(i, state):
            z, res, p, rz = state
            Ap = A32(p)
            denom = jnp.vdot(p, Ap)
            alpha = rz / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
            z = z + alpha * p
            res = res - alpha * Ap
            s = M32(res)
            rz_new = jnp.vdot(res, s)
            beta = rz_new / jnp.where(jnp.abs(rz) > 0, rz, 1.0)
            return (z, res, s + beta * p, rz_new)

        z, _, _, _ = jax.lax.fori_loop(0, inner_iters, body, (z, res, p, rz))
        return z

    def inner_gmres(r32):
        """One m-step left-preconditioned Arnoldi cycle in f32.

        Orthogonalization is CGS2 (classical Gram-Schmidt, applied
        twice): h = V w, w -= V^T h, repeated. Rows of V beyond the
        current column are exactly zero, so no masking is needed, and
        the two (m+1, n) matvec pairs run as dense matmuls on the MXU —
        the MGS fori_loop they replace was m+1 SEQUENTIAL vdot+axpy
        passes over the basis per Arnoldi step (latency-bound on TPU;
        measured 1.4-2x whole-case on GMRES-heavy oracles). "Twice is
        enough" gives MGS-grade orthogonality for GMRES use.
        """
        m = inner_iters
        n = r32.shape[0]
        eps32 = jnp.asarray(1e-30, jnp.float32)
        g0 = M32(r32)
        beta = jnp.linalg.norm(g0)
        V = jnp.zeros((m + 1, n), jnp.float32)
        H = jnp.zeros((m + 1, m), jnp.float32)
        V = V.at[0].set(g0 / jnp.where(beta < eps32, eps32, beta))

        if _GMRES_ORTH == "mgs":

            def arnoldi(j, carry):
                V, H = carry
                w = M32(A32(V[j]))

                def mgs(i, wc):
                    w, H = wc
                    hij = jnp.vdot(V[i], w) * (i <= j)
                    H = H.at[i, j].add(hij)
                    return (w - hij * V[i], H)

                w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
                hn = jnp.linalg.norm(w)
                H = H.at[j + 1, j].set(hn)
                V = V.at[j + 1].set(w / jnp.where(hn < eps32, eps32, hn))
                return (V, H)

        else:

            def arnoldi(j, carry):
                V, H = carry
                w = M32(A32(V[j]))
                h1 = V @ w
                w = w - V.T @ h1
                h2 = V @ w
                w = w - V.T @ h2
                H = H.at[:, j].add(h1 + h2)
                hn = jnp.linalg.norm(w)
                H = H.at[j + 1, j].set(hn)
                V = V.at[j + 1].set(w / jnp.where(hn < eps32, eps32, hn))
                return (V, H)

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))
        e1 = jnp.zeros(m + 1, jnp.float32).at[0].set(beta)
        # least squares via QR (f32 lstsq crashes the TPU XLA pipeline)
        Q, R = jnp.linalg.qr(H)  # (m+1, m), (m, m)
        rhs_ls = Q.T @ e1
        diag_r = jnp.diagonal(R)
        Rsafe = R + jnp.diag(
            jnp.where(jnp.abs(diag_r) < eps32, eps32, 0.0)
        )
        y = jax.scipy.linalg.solve_triangular(Rsafe, rhs_ls, lower=False)
        return V[:m].T @ y

    if inner_custom is not None:
        inner_solve = inner_custom
    else:
        inner_solve = inner_cg if inner == "cg" else inner_gmres

    def cond(state):
        x, r, k, rn_prev, stag = state
        rn = jnp.linalg.norm(r)
        return jnp.logical_and(
            jnp.logical_and(k < max_outer, rn > tol),
            jnp.logical_not(stag),
        )

    def body(state):
        x, r, k, rn_prev, stag = state
        r32 = r.astype(jnp.float32)
        if inner_fwd is not None:
            z32 = inner_bwd(inner_solve(inner_fwd(r32)))
        else:
            z32 = inner_solve(r32)
        x = x + z32.astype(b.dtype)
        r = b - A64(x)
        rn = jnp.linalg.norm(r)
        # stagnation: inner precision floor reached, no further progress
        stag = rn > 0.9 * rn_prev
        return (x, r, k + 1, rn, stag)

    r0 = b - A64(x0)
    x, r, k, rn, _ = jax.lax.while_loop(
        cond, body, (x0, r0, 0, jnp.linalg.norm(r0) * 2.0, jnp.asarray(False))
    )
    res = jnp.linalg.norm(r)
    return x, KrylovInfo(k * inner_iters, res, res <= tol)


def jacobi_preconditioner(diag: jnp.ndarray) -> Callable:
    safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
    inv = 1.0 / safe
    return lambda r: inv * r


def chebyshev_inverse_coeffs(a: float, b: float, n: int):
    """Monomial coefficients (lowest degree first) of the degree-(n-1)
    Chebyshev approximation p(lam) ~ 1/lam on [a, b]: the residual
    1 - lam p(lam) equals T_n(t(lam)) / T_n(t(0)) with t the affine map
    of [a, b] onto [-1, 1], the minimax residual polynomial. p > 0 on
    [a, b], so q(A) = p(D^-1 A) D^-1 is SPD for SPD A (usable inside
    MINRES preconditioners). Max residual factor returned for logging.
    """
    import numpy as _np

    nodes = _np.cos(_np.pi * (_np.arange(n) + 0.5) / n)
    lam = (b + a) / 2 + (b - a) / 2 * nodes
    t0 = (b + a) / (b - a)
    Tn0 = _np.cosh(n * _np.arccosh(t0))
    resid = _np.cos(n * _np.arccos(nodes)) / Tn0
    pvals = (1.0 - resid) / lam
    # exact interpolation through the n nodes (p has degree n-1)
    coeffs = _np.polyfit(lam, pvals, n - 1)[::-1]
    return coeffs, float(1.0 / Tn0)


def polynomial_solver(apply_A: Callable, dinv: jnp.ndarray, coeffs):
    """z ~= A^{-1} r from the Chebyshev coefficients: Horner in the
    Jacobi-scaled operator B = dinv * A, z = p(B) (dinv r). len(coeffs)-1
    applications of A per call; symmetric in the D inner product."""
    import numpy as _np

    cs = [float(c) for c in _np.asarray(coeffs)]

    def solve(r):
        br = dinv * r
        z = cs[-1] * br
        for c in reversed(cs[:-1]):
            z = dinv * apply_A(z) + c * br
        return z

    return solve
