#!/usr/bin/env python3
"""Per-iteration cost decomposition of the NS device saddle FGMRES.

Attack (a) of PLAN_r3 proposes fusing the block-triangular saddle M
into one Pallas kernel. The decision variable is the split of the
measured ~2.8 ms/Krylov-iteration between (i) the M application
(velocity fused-Richardson V-cycles + G^T Schur update), (ii) the
saddle operator apply, and (iii) the Arnoldi/vector work. If (i)
dominates and its floor (~the fused GMG-PCG per-it cost) is low
enough, a fused saddle-M can push per-it below the ~1.0-1.2 ms needed
for whole-device Newton (~1920 its) to beat the 2.25 s host-LU path.

Builds the navier_stokes_basic Stokes-saddle machinery exactly as
oracle/navier_stokes.py does, then times each component chained inside
one jit (64 data-dependent repetitions — dispatch amortized).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _timed(fn, *args, reps=3):
    """Warm best-of-N; the result VALUE is fetched to host each pass —
    on the remote-axon backend block_until_ready alone can return
    before execution completes, and a value fetch cannot."""
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("PDEBENCH_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cache = REPO / ".jax_compile_cache"
    if cache.is_dir():
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pdebench_tpu.fem.assemble import (
        local_divergence,
        local_vector_laplacian,
    )
    from pdebench_tpu.oracle import mixed
    from pdebench_tpu.solvers.saddle_stencil import build_saddle_stencil

    cases = [
        json.loads(l)
        for l in open("/root/reference/data/benchmark_v2.jsonl")
    ]
    case = next(c for c in cases if c["id"] == "navier_stokes_basic")
    config = case["oracle_config"]
    nu = float(config["pde"].get("pde_params", {}).get("nu", 1.0))

    ctx = mixed.setup_taylor_hood(config)
    V, Q, cb = ctx.V, ctx.Q, ctx.cb
    dofmap_p = jnp.asarray(Q.dofmap_scalar)
    A1_loc = local_vector_laplacian(cb, 1.0)
    G_loc = local_divergence(cb, ctx.psi)

    parts = mixed.saddle_gmg_precond_parts(
        V, nu, cb, ctx.psi, dofmap_p, Q.ndof, ctx.mask, q_space=Q
    )
    sst = build_saddle_stencil(V, Q, np.asarray(G_loc))
    assert parts is not None and sst is not None

    inv_p32 = parts.inv_p.astype(jnp.float32)
    mask_full = parts.mask_full
    ndof = V.ndof + Q.ndof
    print(f"# ndof={ndof} fine={sst.fine} coarse={sst.coarse}", file=sys.stderr)

    WA64 = sst.wmapA.weights(nu * jnp.asarray(A1_loc))
    WA32 = WA64.astype(jnp.float32)

    def M32_tri(r32):
        ru, rp = r32[: V.ndof], r32[V.ndof :]
        zu = parts.Mv(ru)
        u_lat = sst.blat.embed(zu, 0.0).reshape(sst.fine + (sst.d,))
        gt = sst.applyGT(sst.WGT32, u_lat).reshape(-1)[sst._pinv]
        zp = -inv_p32 * (rp - gt)
        out = jnp.concatenate([zu, zp])
        return jnp.where(mask_full, r32, out)

    def Mv_only(r32):
        zu = parts.Mv(r32[: V.ndof])
        return jnp.concatenate([zu, r32[V.ndof:]])

    apply32 = sst.saddle_apply_w(WA32)

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal(ndof), dtype=jnp.float32)

    CH = 64

    def chain(f):
        @jax.jit
        def run(r):
            def body(_, v):
                return f(v) * 0.5

            return jax.lax.fori_loop(0, CH, body, r)

        return run

    # ---- LATTICE-LAYOUT variants: Krylov vectors stay on the lattice,
    # no dof<->lattice gather round trips inside the iteration --------
    d = sst.d
    nf = int(np.prod(sst.fine))
    ncoarse = int(np.prod(sst.coarse))
    n_lat = nf * d + ncoarse

    # fused per-component Richardson (the same kernels parts.Mv uses),
    # taken lattice-native
    from pdebench_tpu.solvers.gmg_fused import build_fused_richardson

    # rebuild the scalar hierarchy exactly as saddle_gmg_precond_parts
    # does, to get at the gmg for a lattice-native fused call
    fused = None
    try:
        from pdebench_tpu.fem.assemble import (
            LocalOperator,
            local_stiffness,
        )
        from pdebench_tpu.solvers.amg import constrained_csr
        from pdebench_tpu.solvers.gmg import setup_gmg
        from pdebench_tpu.solvers.stencil import (
            LatticeOperator,
            detect_lattice,
        )

        lat = detect_lattice(V.dof_coords)
        mask_np = np.asarray(ctx.mask)
        mask_u = mask_np[: V.ndof].reshape(-1, d).any(axis=1)
        Ks = local_stiffness(cb) * nu
        A_s = LocalOperator(
            np.asarray(Ks), V.dofmap_scalar, V.n_scalar_dofs
        ).to_scipy()
        A_bc = constrained_csr(A_s, mask_u)
        lat_bc = LatticeOperator(A_bc, lat, dtype=jnp.float32)
        W_bc = np.asarray(lat_bc.W, dtype=np.float64)
        gmg = setup_gmg(
            W_bc, lat_bc.offsets, lat_bc.shape, dtype=jnp.float32
        )
        if jax.devices()[0].platform in ("tpu", "axon"):
            fused = build_fused_richardson(gmg, 2)
        vcyc_xla = gmg.precond()
    except Exception as e:
        print(f"# hierarchy rebuild failed: {e}", file=sys.stderr)
        vcyc_xla = None

    inv_p_lat = jnp.asarray(
        sst.lat_p.embed_np(np.asarray(inv_p32), 1.0).reshape(sst.coarse),
        dtype=jnp.float32,
    )

    def Mv_lat(rc):  # scalar-lattice velocity V-cycle, component grid in
        if fused is not None:
            return fused(rc.reshape(-1)).reshape(sst.fine)
        return vcyc_xla(rc)

    def apply_lat(x):
        u_lat = x[: nf * d].reshape(sst.fine + (d,))
        p_lat = x[nf * d:].reshape(sst.coarse)
        ru = sst.wmapA.apply_grid(WA32, u_lat) + sst.applyG(
            sst.WG32, p_lat
        )
        rp = sst.applyGT(sst.WGT32, u_lat)
        return jnp.concatenate([ru.reshape(-1), rp.reshape(-1)])

    def M_lat(r):
        r_u = r[: nf * d].reshape(sst.fine + (d,))
        rp = r[nf * d:].reshape(sst.coarse)
        zu = jnp.stack(
            [Mv_lat(r_u[..., c]) for c in range(d)], axis=-1
        )
        gt = sst.applyGT(sst.WGT32, zu)
        zp = -inv_p_lat * (rp - gt)
        return jnp.concatenate([zu.reshape(-1), zp.reshape(-1)])

    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal(ndof), dtype=jnp.float32)
    r0_lat = jnp.asarray(rng.standard_normal(n_lat), dtype=jnp.float32)

    rows = {}
    for name, f, r in [
        ("M32_tri", M32_tri, r0),
        ("Mv_only", Mv_only, r0),
        ("saddle_apply32", apply32, r0),
        ("apply_LAT", apply_lat, r0_lat),
        ("M_LAT", M_lat, r0_lat),
    ]:
        t = _timed(chain(f), r) / CH
        rows[name] = round(t * 1e6, 1)
        print(f"# {name}: {t*1e6:.1f} us", file=sys.stderr, flush=True)

    # one full FGMRES(40) restart -> per-Krylov-it cost incl. Arnoldi,
    # flat-dof layout vs lattice layout
    from pdebench_tpu.fem.assemble import constrained_operator as _con
    from pdebench_tpu.solvers.krylov import gmres

    mask_lat = jnp.concatenate(
        [
            jnp.asarray(
                sst.blat.embed_np(
                    np.asarray(ctx.mask)[: V.ndof].astype(bool), True
                )
            ),
            jnp.asarray(
                sst.lat_p.embed_np(
                    np.asarray(ctx.mask)[V.ndof:].astype(bool), True
                )
            ),
        ]
    )

    for name, A_raw, M_use, rr, msk in [
        ("dof", apply32, M32_tri, r0, jnp.asarray(ctx.mask)),
        ("LAT", apply_lat, M_lat, r0_lat, mask_lat),
    ]:
        A32c = _con(A_raw, msk)

        @jax.jit
        def restart(r, A32c=A32c, M_use=M_use):
            x, info = gmres(
                A32c, r, M=M_use, rtol=1e-12, atol=1e-30, maxiter=40,
                restart=40,
            )
            return x

        try:
            t40 = _timed(restart, rr)
            rows[f"fgmres40_{name}_ms"] = round(t40 * 1e3, 2)
            rows[f"per_it_{name}_us"] = round(t40 * 1e6 / 40, 1)
            print(
                f"# fgmres40[{name}]: {t40*1e3:.2f} ms "
                f"({t40*1e6/40:.0f} us/it)",
                file=sys.stderr, flush=True,
            )
        except Exception as e:
            rows[f"fgmres40_{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
