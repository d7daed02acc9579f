"""Device-mesh parallelism utilities."""

from artist_tpu.parallel.mesh import (
    distribute_groups_among_ranks,
    make_mesh,
    sample_sharding,
    ray_sharding,
    replicated_sharding,
)

__all__ = [
    "distribute_groups_among_ranks",
    "make_mesh",
    "sample_sharding",
    "ray_sharding",
    "replicated_sharding",
]
