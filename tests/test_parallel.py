"""Sharded (multi-chip) operator and solve-step tests on the virtual
8-device CPU mesh, plus the driver contract in __graft_entry__.py."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pdebench_tpu.fem.assemble import LocalOperator, cell_batch, local_stiffness
from pdebench_tpu.fem.mesh import unit_square_mesh
from pdebench_tpu.fem.spaces import FunctionSpace
from pdebench_tpu.parallel import ShardedOperator, sharded_poisson_step


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), axis_names=("cells",))


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_matvec_matches_local(n_dev):
    m = unit_square_mesh(7)
    space = FunctionSpace(m, 1)
    cb = cell_batch(m, 1)
    K = local_stiffness(cb)
    op_local = LocalOperator(K, space.dofmap_scalar, space.ndof)
    op_shard = ShardedOperator(
        np.asarray(K), space.dofmap_scalar, space.ndof, _mesh(n_dev)
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.ndof))
    np.testing.assert_allclose(
        np.asarray(op_shard(u)), np.asarray(op_local(u)), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op_shard.diagonal()),
        np.asarray(op_local.diagonal()),
        rtol=1e-12,
    )


def test_sharded_poisson_step_converges():
    step, args = sharded_poisson_step(8, _mesh(8))
    x, iters, res = jax.jit(step)(*args)
    assert float(res) < 1e-6
    assert np.all(np.isfinite(np.asarray(x)))


def test_graft_entry_contract():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert np.all(np.isfinite(np.asarray(out)))
    ge.dryrun_multichip(8)
