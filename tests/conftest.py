"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware.

Note: this image pre-imports jax via a sitecustomize hook (the TPU tunnel
plugin), so JAX_PLATFORMS in the environment is not sufficient — the
platform must be overridden through jax.config before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA-CPU's constant_folding pass costs 1-3s per big constant-index
# scatter-add it folds (see CLAUDE.md) — pure compile-time loss here
if "xla_disable_hlo_passes" not in flags:
    flags = (flags + " --xla_disable_hlo_passes=constant_folding").strip()
os.environ["XLA_FLAGS"] = flags

# sandbox subprocesses spawned by tests (executor runners) read this to
# apply the same override in the child
os.environ.setdefault("PDEBENCH_TPU_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
