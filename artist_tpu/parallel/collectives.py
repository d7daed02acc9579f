"""Host-side cross-process collectives for result merging.

TPU-native replacement for the reference's torch.distributed result merges
(reference: artist/optim/surface_reconstructor.py:790-840 -
``broadcast`` of reconstructed parameters, ``all_reduce(MIN)`` of losses,
``all_gather_object`` of histories). Inside a jitted step, cross-device
communication rides the mesh (XLA collectives); these helpers cover the
remaining *host-side* merges that happen once per reconstruction - small
objects, exchanged through the JAX coordination service's key-value store
rather than a device collective, so they work on any backend and cost no
device sync.

All processes must call each collective the same number of times in the
same order (SPMD on the host); a per-tag sequence counter keeps the keys
unique across repeated calls.
"""

from __future__ import annotations

import base64
import pickle
from collections import defaultdict
from typing import Any

import jax
import numpy as np

_TIMEOUT_MS = 600_000
_sequence_numbers: defaultdict[str, int] = defaultdict(int)


def _kv_client():
    """The coordination-service client, or None in single-process runs."""
    if jax.process_count() <= 1:
        return None
    from jax._src import distributed

    return distributed.global_state.client


def is_multiprocess() -> bool:
    """True when more than one JAX process participates."""
    return jax.process_count() > 1


def _encode(obj: Any) -> str:
    return base64.b64encode(pickle.dumps(obj)).decode("ascii")


def _decode(payload: str) -> Any:
    return pickle.loads(base64.b64decode(payload.encode("ascii")))


def _next_key(tag: str) -> str:
    sequence = _sequence_numbers[tag]
    _sequence_numbers[tag] += 1
    return f"artist_tpu/collectives/{tag}/{sequence}"


def all_gather_object(obj: Any, tag: str = "gather") -> list[Any]:
    """Gather one Python object per process, ordered by rank.

    reference: torch.distributed.all_gather_object in
    artist/optim/surface_reconstructor.py:832-836.
    """
    client = _kv_client()
    if client is None:
        return [obj]
    key = _next_key(tag)
    rank = jax.process_index()
    client.key_value_set(f"{key}/{rank}", _encode(obj))
    gathered = [
        _decode(client.blocking_key_value_get(f"{key}/{source}", _TIMEOUT_MS))
        for source in range(jax.process_count())
    ]
    # The coordination service holds keys until deleted; long optimizations
    # gather bitmap-sized payloads every epoch, so reclaim each slot once
    # every rank has read it (the barrier guarantees that).
    client.wait_at_barrier(f"{key}/read", _TIMEOUT_MS)
    client.key_value_delete(f"{key}/{rank}")
    return gathered


def broadcast_object(obj: Any, source_rank: int, tag: str = "bcast") -> Any:
    """Broadcast one Python object from ``source_rank`` to every process.

    reference: torch.distributed.broadcast in
    artist/optim/surface_reconstructor.py:820-826 (per-group parameter
    broadcast from the group's first owning rank).
    """
    client = _kv_client()
    if client is None:
        return obj
    key = _next_key(tag)
    if jax.process_index() == source_rank:
        client.key_value_set(key, _encode(obj))
        result = obj
    else:
        result = _decode(client.blocking_key_value_get(key, _TIMEOUT_MS))
    # Reclaim the key once every rank has read it (see all_gather_object).
    client.wait_at_barrier(f"{key}/read", _TIMEOUT_MS)
    if jax.process_index() == source_rank:
        client.key_value_delete(key)
    return result


def all_reduce_min(values: np.ndarray, tag: str = "min") -> np.ndarray:
    """Elementwise minimum across processes.

    reference: torch.distributed.all_reduce(ReduceOp.MIN) in
    artist/optim/surface_reconstructor.py:827-829.
    """
    gathered = all_gather_object(np.asarray(values), tag)
    return np.minimum.reduce(gathered)


def all_reduce_sum(values: np.ndarray, tag: str = "sum") -> np.ndarray:
    """Elementwise sum across processes (host-side, non-differentiable)."""
    gathered = all_gather_object(np.asarray(values), tag)
    return np.add.reduce(gathered)


def synchronize_group_results(
    distributed_setup,
    final_loss: np.ndarray,
    results: list,
    group_payloads: dict[int, Any],
    tag: str,
):
    """Merge per-heliostat-group reconstruction outcomes across processes.

    The TPU-native composite of the reference's three merge collectives
    (reference: artist/optim/surface_reconstructor.py:790-840): each group's
    reconstructed parameters (``group_payloads``) propagate from the first
    rank that owns the group (the reference's ``broadcast`` source), the
    per-heliostat losses reduce to their minimum across ranks
    (``all_reduce(MIN)``), and every rank's result list is gathered
    (``all_gather_object``) and deduplicated by group index.

    Parameters
    ----------
    distributed_setup : DistributedSetup | None
        Setup from ``setup_distributed_environment``; ``None`` or
        single-process setups return the inputs unchanged.
    final_loss : np.ndarray
        Per-heliostat final losses over the whole field, ``inf`` for
        heliostats this rank did not process. Shape ``[H_total]``.
    results : list
        This rank's per-group result records (must carry ``group_index``).
    group_payloads : dict[int, Any]
        ``group_index -> reconstructed parameters`` for locally processed
        groups.

    Returns
    -------
    tuple
        ``(final_loss, results, group_payloads)`` merged over all ranks;
        results ordered by group index.
    """
    if distributed_setup is None or not distributed_setup.is_distributed:
        return final_loss, results, group_payloads
    gathered = all_gather_object((final_loss, results, group_payloads), tag)
    merged_loss = np.minimum.reduce([rank_data[0] for rank_data in gathered])

    def owner_of(group_index: int) -> int:
        """First rank owning the group - the reference's broadcast source
        (surface_reconstructor.py:820-826, indices.first_rank_from_group)."""
        owners = distributed_setup.ranks_to_groups_mapping.get(group_index)
        return owners[0] if owners else 0

    merged_results: dict[int, Any] = {}
    merged_payloads: dict[int, Any] = {}
    for source_rank, (_, rank_results, rank_payloads) in enumerate(gathered):
        for result in rank_results:
            if source_rank == owner_of(result.group_index):
                merged_results[result.group_index] = result
            else:
                merged_results.setdefault(result.group_index, result)
        for group_index, payload in rank_payloads.items():
            if source_rank == owner_of(group_index):
                merged_payloads[group_index] = payload
            else:
                merged_payloads.setdefault(group_index, payload)
    ordered = [merged_results[index] for index in sorted(merged_results)]
    return merged_loss, ordered, merged_payloads


def barrier(tag: str = "barrier") -> None:
    """Block until every process reaches this point."""
    client = _kv_client()
    if client is None:
        return
    key = _next_key(tag)
    client.wait_at_barrier(key, _TIMEOUT_MS)
