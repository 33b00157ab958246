#!/usr/bin/env python3
"""Kernel-quality microbench: achieved HBM bandwidth vs the v5e roofline.

BASELINE.md's target is "assembly, SpMV, preconditioner-apply at TPU
speed-of-light on HBM bandwidth". This measures the hot kernels in
isolation and reports achieved GB/s against the v5e peak (819 GB/s),
using a speed-of-light traffic model (each operand read once from HBM,
result written once — the compulsory traffic; reuse beyond that must
come from VMEM):

  - f32/f64 stencil apply (res 150 P1, res 100 P2 unit-square poisson)
  - one fused GMG-PCG inner call (25 CG its, all levels VMEM-resident)
  - XLA (op-by-op) GMG V-cycle on the same hierarchy
  - SA-AMG V-cycle on an unstructured circle mesh (COO matvec chain)
  - device cell-batched stiffness assembly einsum (reported as GFLOP/s
    + effective GB/s; host-side numpy is the production default on
    axon per CLAUDE.md — this measures the on-device variant)

Timing: each kernel is chained inside one jit (data-dependent, so XLA
cannot elide the repeats) at two chain lengths; the per-application
cost is the DELTA (t_long - t_short) / (n_long - n_short), which
cancels the per-call dispatch/tunnel overhead exactly (both calls pay
it once). Warm best-of-3 each.

Writes a JSON table to stdout; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

HBM_PEAK_GBS = 819.0  # TPU v5e


def _timed(fn, *args, reps=3):
    """Warm best-of-N; the result VALUE is fetched to host each pass —
    on the remote-axon backend block_until_ready alone can return
    before execution completes, and a value fetch cannot."""
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _fetch(x):
    import jax

    jax.tree_util.tree_map(
        lambda v: np.asarray(v) if hasattr(v, "block_until_ready") else v, x
    )


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

    from pdebench_tpu.fem.assemble import cell_batch, local_stiffness
    from pdebench_tpu.fem.mesh import unit_square_mesh
    from pdebench_tpu.fem.spaces import FunctionSpace
    from pdebench_tpu.solvers.gmg import attach_lattice_gmg
    from pdebench_tpu.solvers.stencil import lattice_operator_from_local

    platform = jax.devices()[0].platform
    rows = []

    def record(name, t, bytes_model, extra=None):
        gbs = bytes_model / t / 1e9
        row = {
            "kernel": name,
            "t_us": round(t * 1e6, 2),
            "sol_bytes": int(bytes_model),
            "achieved_GBs": round(gbs, 1),
            "pct_hbm_peak": round(100.0 * gbs / HBM_PEAK_GBS, 1),
        }
        if extra:
            row.update(extra)
        rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr, flush=True)

    CHAIN = 64
    CHAIN_LONG = 512

    def delta_timed(make_chain, *args):
        """Per-iteration cost net of dispatch: two chain lengths."""
        t_s, _ = _timed(make_chain(CHAIN), *args)
        t_l, _ = _timed(make_chain(CHAIN_LONG), *args)
        return max(t_l - t_s, 1e-12) / (CHAIN_LONG - CHAIN)

    # res 120 P1: pure-halving hierarchy (121 -> 61 -> 31), so the fused
    # GMG-PCG kernel builds; res 150's 151 -> 76 level is identity-padded
    # and the fused builder correctly skips it
    for res, deg in [(150, 1), (120, 1), (100, 2)]:
        mesh = unit_square_mesh(res)
        space = FunctionSpace(mesh, deg)
        cb = cell_batch(mesh, deg)
        K = np.asarray(local_stiffness(cb))
        lat = lattice_operator_from_local(
            K, space.dofmap_scalar, space.ndof, space.dof_coords
        )
        assert lat is not None
        n = int(np.prod(lat.shape))
        Kn = len(lat.offsets)
        for dt, W in [("f32", lat.W.astype(jnp.float32)), ("f64", lat.W_f64)]:
            bpe = 4 if dt == "f32" else 8
            x0 = jnp.asarray(
                np.random.default_rng(0).standard_normal(lat.shape),
                dtype=W.dtype,
            )

            def make_chain(k):
                @jax.jit
                def chain(W_, x_):
                    def body(_, v):
                        return lat.apply_grid_w(W_, v) * 0.05

                    return jax.lax.fori_loop(0, k, body, x_)

                return chain

            t = delta_timed(make_chain, W, x0)
            sol = (Kn + 2) * n * bpe  # W once + x once + y once
            record(
                f"stencil_apply_res{res}_P{deg}_{dt}",
                t,
                sol,
                {"n_lattice": n, "k_offsets": Kn},
            )

        if deg == 1:
            # constrained hierarchy for the V-cycle / fused-inner benches
            mask = np.zeros(space.ndof, dtype=bool)
            mask[space.boundary_scalar_dofs] = True
            lat32 = lat.astype(jnp.float32)
            attach_lattice_gmg(lat32, mask)
            gmg = lat32.gmg
            lv_bytes = sum(int(np.prod(l.W.shape)) * 4 for l in gmg.levels)
            r0 = jnp.asarray(
                np.random.default_rng(1).standard_normal(n), dtype=jnp.float32
            )

            # parameterized V-cycle: weights/diagonals as jit ARGUMENTS —
            # closure constants would hit the remote constant-folding
            # compile stall (CLAUDE.md)
            from pdebench_tpu.solvers.gmg import (
                _device_prolong,
                _device_restrict,
            )

            lvs = gmg.levels
            n_lv = len(lvs)

            def apply_w(lv, Wl, x):
                pad = lv.pad
                xp = jnp.pad(x, pad)
                out = jnp.zeros_like(x)
                for kk, off in enumerate(lv.offsets):
                    start = tuple(pad + o for o in off)
                    out = out + Wl[kk] * jax.lax.dynamic_slice(
                        xp, start, lv.shape
                    )
                return out

            def vcyc_w(Ws_, Ds_, Ci_, r, i=0):
                if i == n_lv:
                    return (Ci_ @ r.reshape(-1)).reshape(
                        gmg.coarse_shape
                    )
                lv = lvs[i]
                x = lv.omega * Ds_[i] * r
                res = r - apply_w(lv, Ws_[i], x)
                if lv.pad_to is not None:
                    res = jnp.pad(
                        res,
                        [(0, p - s) for s, p in zip(lv.shape, lv.pad_to)],
                    )
                xc = vcyc_w(Ws_, Ds_, Ci_, _device_restrict(res), i + 1)
                xp2 = _device_prolong(xc, lv.pad_to or lv.shape)
                if lv.pad_to is not None:
                    xp2 = xp2[tuple(slice(0, s) for s in lv.shape)]
                x = x + xp2
                x = x + lv.omega * Ds_[i] * (
                    r - apply_w(lv, Ws_[i], x)
                )
                return x

            Ws_args = [l.W for l in lvs]
            Ds_args = [l.diag_inv for l in lvs]
            Ci_arg = gmg.coarse_inv

            def make_chain_v(k):
                @jax.jit
                def chain_v(r_, Ws_, Ds_, Ci_):
                    def body(_, v):
                        return vcyc_w(
                            Ws_, Ds_, Ci_, v.reshape(lat.shape)
                        ).reshape(-1) * 0.5

                    return jax.lax.fori_loop(0, k, body, r_)

                return chain_v

            t = delta_timed(make_chain_v, r0, Ws_args, Ds_args, Ci_arg)
            # per V-cycle: weights of every level + a few fine vectors
            sol = lv_bytes + 4 * n * 4
            record(
                f"gmg_vcycle_xla_res{res}_P{deg}_f32", t, sol,
                {"levels": len(gmg.levels)},
            )

            fused_t = None
            if platform in ("tpu", "axon"):
                try:
                    from pdebench_tpu.solvers.gmg_fused import (
                        build_fused_inner_cg,
                    )

                    inner = build_fused_inner_cg(gmg, 25)
                except Exception:
                    inner = None
                if inner is not None:

                    def make_chain_f(k):
                        @jax.jit
                        def chain_f(r_):
                            def body(_, v):
                                return inner(v) * 0.5

                            return jax.lax.fori_loop(0, k, body, r_)

                        return chain_f

                    t_s, _ = _timed(make_chain_f(4), r0)
                    t_l, _ = _timed(make_chain_f(16), r0)
                    t = max(t_l - t_s, 1e-12) / 12
                    # one fused call = 25 CG its; HBM traffic is one
                    # read of all level weights + r in + z out (work
                    # vectors stay VMEM-resident)
                    sol = lv_bytes + 2 * n * 4
                    record(
                        f"gmg_fused_inner25_res{res}_f32", t, sol,
                        {"per_cg_it_us": round(t * 1e6 / 25, 2)},
                    )
                    fused_t = t

    # SA-AMG V-cycle on an unstructured mesh (circle, P1)
    from pdebench_tpu.fem.assemble import LocalOperator
    from pdebench_tpu.oracle.base import build_mesh
    from pdebench_tpu.solvers.amg import masked_precond, setup_amg

    try:
        cmesh = build_mesh({"type": "circle"}, {"resolution": 80})
        cspace = FunctionSpace(cmesh, 1)
        ccb = cell_batch(cmesh, 1)
        cK = np.asarray(local_stiffness(ccb))
        cop = LocalOperator(cK, cspace.dofmap_scalar, cspace.ndof)
        cmask = np.zeros(cspace.ndof, dtype=bool)
        cmask[cspace.boundary_scalar_dofs] = True
        free = np.nonzero(~cmask)[0]
        A_ff = cop.to_scipy().tocsr()[free][:, free]
        amg32 = setup_amg(A_ff).astype(jnp.float32)
        Mamg = masked_precond(amg32, cmask)
        nnz_bytes = 0
        for l in amg32.levels:
            nnz = int(l.A.vals.shape[0])
            # COO matvec: vals + row + col + gathered x + scattered y
            nnz_bytes += nnz * (4 + 4 + 4 + 4 + 4) * 3  # ~3 matvecs/level
        rc = jnp.asarray(
            np.random.default_rng(2).standard_normal(cspace.ndof),
            dtype=jnp.float32,
        )

        def make_chain_a(k):
            @jax.jit
            def chain_a(r_):
                def body(_, v):
                    return Mamg(v) * 0.5

                return jax.lax.fori_loop(0, k, body, r_)

            return chain_a

        t_s, _ = _timed(make_chain_a(8), rc)
        t_l, _ = _timed(make_chain_a(32), rc)
        t = max(t_l - t_s, 1e-12) / 24
        record(
            "amg_vcycle_circle80_P1_f32", t, nnz_bytes,
            {"ndof": cspace.ndof, "levels": len(amg32.levels)},
        )
    except Exception as e:
        print(f"# amg bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # device cell-batched stiffness assembly (res 100 P2)
    mesh = unit_square_mesh(100)
    cb = cell_batch(mesh, 2)
    gphys = jnp.asarray(np.asarray(cb.grad_phys()), dtype=jnp.float32)
    wdetj = jnp.asarray(np.asarray(cb.wdetJ), dtype=jnp.float32)

    @jax.jit
    def assemble_chain(g_, w_):
        def body(_, acc):
            Kl = jnp.einsum("cqid,cqjd,cq->cij", g_, g_, w_)
            return acc + Kl[0, 0, 0]

        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    t, _ = _timed(assemble_chain, gphys, wdetj)
    t /= 16
    c, q, i, d = gphys.shape
    flops = 2.0 * c * q * i * i * d
    in_bytes = gphys.nbytes + wdetj.nbytes
    out_bytes = c * i * i * 4
    record(
        "assembly_stiffness_res100_P2_f32", t, in_bytes + out_bytes,
        {"gflops": round(flops / t / 1e9, 1), "cells": int(c)},
    )

    print(json.dumps({"platform": platform, "hbm_peak_GBs": HBM_PEAK_GBS,
                      "rows": rows}))


if __name__ == "__main__":
    main()
