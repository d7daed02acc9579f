"""Multi-process (multi-host) environment setup.

TPU-native equivalent of the reference's torch.distributed bootstrap
(reference: artist/util/env.py:14-228): ``jax.distributed.initialize``
replaces ``init_process_group``; JAX's single-controller-per-host model
makes the reference's subgroup machinery unnecessary - within a host's
devices the mesh shards arrays, across hosts the same mesh spans DCN.

``setup_distributed_environment`` yields a :class:`DistributedSetup` with
the reference ``DdpSetup``'s fields so user scripts port one-to-one.
"""

from __future__ import annotations

import contextlib
import logging
from dataclasses import dataclass, field

import jax

from artist_tpu.parallel.mesh import distribute_groups_among_ranks, make_mesh

log = logging.getLogger("artist_tpu.parallel")


@dataclass
class DistributedSetup:
    """Process-level distribution info (mirrors the reference's DdpSetup).

    reference: artist/util/env.py:14-27. The reference's subgroup fields
    (``heliostat_group_rank`` / ``heliostat_group_world_size`` /
    ``process_subgroup``) have no equivalent here: within a group, work
    splits across devices via the ``mesh`` axes and XLA collectives, not
    via process subgroups.
    """

    is_distributed: bool
    is_nested: bool
    rank: int
    world_size: int
    groups_to_ranks_mapping: dict[int, list[int]]
    ranks_to_groups_mapping: dict[int, list[int]] = field(default_factory=dict)
    mesh: jax.sharding.Mesh | None = None


def _invert_mapping(groups_to_ranks: dict[int, list[int]]) -> dict[int, list[int]]:
    """group index -> ranks that process it (reference: env.py ranks mapping)."""
    inverted: dict[int, list[int]] = {}
    for rank, groups in groups_to_ranks.items():
        for group in groups:
            inverted.setdefault(group, []).append(rank)
    return inverted


@contextlib.contextmanager
def setup_distributed_environment(
    number_of_heliostat_groups: int,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    mesh_shape: tuple[int, int] | None = None,
):
    """Initialize (and tear down) the multi-process JAX environment.

    reference: artist/util/env.py:157-228. Single-process usage needs no
    arguments; multi-host jobs pass the coordinator address and process
    ids (or rely on the TPU pod's automatic detection).

    Yields
    ------
    DistributedSetup
        Rank/world info, the group-to-rank round-robin mapping, and a device
        mesh over the process's addressable devices (global devices when
        distributed).
    """
    initialized_here = False
    if coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    ):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            initialized_here = True
        except Exception as error:  # pragma: no cover - depends on cluster env
            log.warning(
                "jax.distributed.initialize failed (%s); falling back to "
                "single-process mode.",
                error,
            )

    rank = jax.process_index()
    world_size = jax.process_count()
    is_distributed = world_size > 1
    is_nested = world_size > number_of_heliostat_groups
    groups_to_ranks = distribute_groups_among_ranks(
        number_of_heliostat_groups, world_size
    )
    ranks_to_groups = _invert_mapping(groups_to_ranks)

    # Non-nested mode: each process works on its own heliostat groups, so the
    # mesh spans only the process's local devices (cross-process merging is
    # host-side, parallel/collectives.py). Nested mode (more processes than
    # groups): every process runs every group with the sample/ray axes sharded
    # over a GLOBAL mesh - the reference's nested-DDP all-reduce becomes the
    # XLA psum that mesh sharding inserts (reference: env.py:231-266,
    # surface_reconstructor.py:766-777).
    mesh_devices = jax.devices() if is_nested else jax.local_devices()
    mesh = make_mesh(devices=mesh_devices, shape=mesh_shape)
    setup = DistributedSetup(
        is_distributed=is_distributed,
        is_nested=is_nested,
        rank=rank,
        world_size=world_size,
        groups_to_ranks_mapping=groups_to_ranks,
        ranks_to_groups_mapping=ranks_to_groups,
        mesh=mesh,
    )
    if rank == 0:
        log.info(
            "Distributed environment: %d process(es), %d heliostat group(s), "
            "nested=%s, mesh=%s.",
            world_size,
            number_of_heliostat_groups,
            is_nested,
            mesh.devices.shape,
        )
    try:
        yield setup
    finally:
        if initialized_here:
            try:
                jax.distributed.shutdown()
            except Exception as error:  # pragma: no cover
                log.error("Error during distributed shutdown: %s", error)
