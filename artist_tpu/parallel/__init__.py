"""Device-mesh parallelism utilities."""

from artist_tpu.parallel import collectives
from artist_tpu.parallel.env import DistributedSetup, setup_distributed_environment
from artist_tpu.parallel.mesh import (
    distribute_groups_among_ranks,
    make_mesh,
    put_global,
    sample_sharding,
    ray_sharding,
    replicated_sharding,
)

__all__ = [
    "DistributedSetup",
    "collectives",
    "setup_distributed_environment",
    "distribute_groups_among_ranks",
    "make_mesh",
    "put_global",
    "sample_sharding",
    "ray_sharding",
    "replicated_sharding",
]
