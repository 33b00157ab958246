#!/usr/bin/env python
"""Isolate the Burgers per-step stencil weight-build cost on the live
device: jit a 10-step scan that does ONLY the bilinear weight build
(with a data dependence so nothing dead-code-eliminates), and compare
against the full-case time. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site \
  PDEBENCH_TPU_COMPILE_CACHE=/root/repo/.jax_compile_cache \
  python scripts/burgers_wprobe.py [case_id]
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
if os.environ.get("PDEBENCH_TPU_COMPILE_CACHE"):
    os.makedirs(os.environ["PDEBENCH_TPU_COMPILE_CACHE"], exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["PDEBENCH_TPU_COMPILE_CACHE"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

case_id = sys.argv[1] if len(sys.argv) > 1 else "burgers_square_v1"
case = None
for line in open("data/benchmark_v2.jsonl"):
    c = json.loads(line)
    if c["id"] == case_id:
        case = c
        break
assert case is not None

cfg = case["oracle_config"]
from pdebench_tpu.fem.assemble import local_mass, local_stiffness
from pdebench_tpu.oracle import scalar
from pdebench_tpu.solvers.stencil import (
    BilinearLatticeWeightMap,
    lattice_weight_map,
)

ctx = scalar.setup_scalar(cfg, t0=0.0)
cb, space = ctx.cb, ctx.space
nu = float(cfg["pde"].get("pde_params", {}).get("nu", 0.01))
A_const = 100.0 * local_mass(cb) + nu * local_stiffness(cb)
lattice32 = scalar.attach_gmg(
    scalar.maybe_lattice32(ctx, A_const), A_const, space, np.asarray(ctx.mask)
)
wmap = lattice_weight_map(lattice32.lattice, space.dofmap_scalar)
gph = np.asarray(cb.grad_phys())
g_sum = gph.sum(-1)
T_adv = np.einsum(
    "cq,qi,qk,cqj->cijk",
    np.asarray(cb.wdetJ),
    np.asarray(cb.phi),
    np.asarray(cb.phi),
    g_sum,
    optimize=True,
)
bwm = BilinearLatticeWeightMap(wmap, lattice32.lattice, space.dofmap_scalar, T_adv)
print(
    json.dumps(
        {
            "K": bwm.K,
            "pairs": len(bwm.pairs),
            "shape": list(bwm.shape),
            "compressed": bwm._compressed is not None,
        }
    ),
    flush=True,
)

W_c32 = jnp.asarray(wmap.weights_np(np.asarray(A_const)), dtype=jnp.float32)
u0 = jnp.asarray(
    np.random.default_rng(0).standard_normal(int(np.prod(bwm.shape))),
    dtype=jnp.float32,
)


@jax.jit
def wbuild_scan(P_parts, u0_lat, W_c):
    P = bwm.P_dense(P_parts)

    def step(u, _):
        W = W_c + bwm.weights_w(P, u.reshape(bwm.shape))
        # data dependence: contract W back to a lattice vector
        u2 = W.sum(0).reshape(-1)
        u2 = u2 / jnp.linalg.norm(u2)
        return u2, None

    u, _ = jax.lax.scan(step, u0_lat, None, length=10)
    return u


P_parts = bwm.P_parts
r = wbuild_scan(P_parts, u0, W_c32)
r.block_until_ready()
times = []
for _ in range(3):
    t0 = time.perf_counter()
    wbuild_scan(P_parts, u0, W_c32).block_until_ready()
    times.append(time.perf_counter() - t0)
print(json.dumps({"wbuild_10step_s": round(min(times), 4)}), flush=True)
