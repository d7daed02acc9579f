"""Device mesh construction and sharding helpers.

TPU-native equivalent of the reference's torch.distributed setup
(reference: artist/util/env.py:14-312). The reference's two-level scheme -
data-parallel over heliostat groups plus nested sample/ray sharding inside a
group - maps onto a 2D ``jax.sharding.Mesh`` with axes
``("heliostats", "rays")``:

- the active-sample axis of all per-sample arrays is sharded over
  ``heliostats`` (the RestrictedDistributedSampler's role,
  reference: artist/raytracing/sampling.py:88-157);
- the ray axis of the distortion tensors is sharded over ``rays``;
- parameters stay replicated, so XLA inserts the gradient ``psum``
  (the nested-DDP all-reduce) and the flux ``psum`` automatically.

Heliostat *groups* remain a host-level loop: groups have different static
shapes (facet/point counts), so they pipeline through the same mesh rather
than occupying separate ranks. ``distribute_groups_among_ranks`` reproduces
the reference's round-robin mapping for multi-process deployments
(one JAX process per host over DCN).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    devices=None,
    shape: tuple[int, int] | None = None,
    axis_names: tuple[str, str] = ("heliostats", "rays"),
) -> Mesh:
    """Create a 2D device mesh.

    Parameters
    ----------
    devices : sequence | None
        Devices to use (default: all of ``jax.devices()``).
    shape : tuple[int, int] | None
        Mesh shape (heliostat shards, ray shards). Default: all devices on
        the heliostat axis - the natural layout for fields much larger than
        the chip count.
    axis_names : tuple[str, str]
        Mesh axis names.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-sample arrays: leading axis over ``heliostats``."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for distortion tensors [M, R, P]: (heliostats, rays)."""
    return NamedSharding(mesh, PartitionSpec(*mesh.axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, small scene state)."""
    return NamedSharding(mesh, PartitionSpec())


def put_global(array, sharding: NamedSharding):
    """``device_put`` that also works when the sharding spans processes.

    In nested multi-process mode every process holds the full host array
    (data loading is deterministic and replicated); each process contributes
    its addressable shards of the global array. Single-process shardings fall
    through to a plain ``device_put``.

    Axes whose size does not divide their shard count (small calibration
    batches on a wide mesh) fall back to replication instead of erroring -
    the computation stays correct, just unsharded along that batch.
    """
    try:
        sharding.shard_shape(np.shape(array))
    except Exception:
        sharding = NamedSharding(sharding.mesh, PartitionSpec())
    if sharding.is_fully_addressable:
        return jax.device_put(array, sharding)
    host = np.asarray(array)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda index: host[index]
    )


def fetch_global(array) -> np.ndarray:
    """``np.asarray`` that also works for arrays spanning processes.

    Fully-addressable and fully-replicated arrays fetch directly; arrays
    sharded across processes are gathered (``process_allgather``) first.
    """
    if getattr(array, "is_fully_addressable", True) or getattr(
        array, "is_fully_replicated", True
    ):
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def distribute_groups_among_ranks(
    number_of_heliostat_groups: int, world_size: int
) -> dict[int, list[int]]:
    """Round-robin mapping of heliostat groups to process ranks.

    reference: artist/util/env.py:231-266. When ``world_size`` exceeds the
    group count, excess ranks join existing groups ("nested" mode) - with
    JAX those ranks contribute devices to the group's mesh instead.

    Returns
    -------
    dict[int, list[int]]
        rank -> list of group indices assigned to that rank.
    """
    mapping: dict[int, list[int]] = {rank: [] for rank in range(world_size)}
    if world_size <= number_of_heliostat_groups:
        for group_index in range(number_of_heliostat_groups):
            mapping[group_index % world_size].append(group_index)
    else:
        for rank in range(world_size):
            mapping[rank].append(rank % number_of_heliostat_groups)
    return mapping
