"""pdebench_tpu — a TPU-native rebuild of PDEAgent-Bench.

The package re-implements the capabilities of YusanX/pde-agent-bench
(reference: /root/reference) with a from-scratch JAX/XLA/Pallas finite
element core replacing the DOLFINx / Firedrake / deal.II oracle backends,
plus the evaluation harness (prompting, sandboxed execution, gating,
metrics) on top.

Layout
------
fem/      array-native FEM core: meshes, reference elements, dof maps,
          quadrature-batched assembly, grid sampling, symbolic (MMS) layer
ops/      Pallas TPU kernels for the hot paths (cell-batched apply, SpMV)
solvers/  jitted Krylov (CG/BiCGStab/GMRES), Newton, time integrators,
          host-callback sparse-direct fallback
oracle/   per-PDE ground-truth solvers (the reference's pdebench/oracle)
parallel/ mesh-partitioned multi-chip execution via jax.sharding/shard_map
harness/  benchmark driver: case loading, oracle cache, gating, summaries
core/     prompt builder, LLM client, feedback prompts
agents/   agent registry + wrappers
sandbox/  sandboxed execution of agent-generated solvers
metrics/  universal + specialized metrics, scoring, tier levels
analysis/ gate analyzer, error classifier
utils/    shared small utilities

FEM accuracy targets (linear-solve rtol down to 1e-10) require float64;
importing this package enables JAX x64 mode globally. Set
``PDEBENCH_TPU_X64=0`` to opt out.
"""

import os

import jax

if os.environ.get("PDEBENCH_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
