from .halo import (
    HaloStencilOperator,
    halo_pcg,
    sharded_elasticity_step,
)
from .sharded import (
    ShardedOperator,
    partition_cells,
    sharded_cg,
    sharded_poisson_step,
)

__all__ = [
    "HaloStencilOperator",
    "halo_pcg",
    "sharded_elasticity_step",
    "ShardedOperator",
    "partition_cells",
    "sharded_cg",
    "sharded_poisson_step",
]
