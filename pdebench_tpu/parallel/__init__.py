from .sharded import (
    ShardedOperator,
    partition_cells,
    sharded_cg,
    sharded_poisson_step,
)

__all__ = [
    "ShardedOperator",
    "partition_cells",
    "sharded_cg",
    "sharded_poisson_step",
]
