"""Device-mesh parallelism utilities."""

from artist_tpu.parallel.env import DistributedSetup, setup_distributed_environment
from artist_tpu.parallel.mesh import (
    distribute_groups_among_ranks,
    make_mesh,
    sample_sharding,
    ray_sharding,
    replicated_sharding,
)

__all__ = [
    "DistributedSetup",
    "setup_distributed_environment",
    "distribute_groups_among_ranks",
    "make_mesh",
    "sample_sharding",
    "ray_sharding",
    "replicated_sharding",
]
