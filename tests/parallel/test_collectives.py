"""Unit tests for the host-side result-merge logic.

The 2-process tests (test_distributed.py) prove the real transport; here
the merge semantics are pinned down in isolation by faking the gather.
reference: artist/optim/surface_reconstructor.py:790-840.
"""

from dataclasses import dataclass

import numpy as np

from artist_tpu.parallel import collectives
from artist_tpu.parallel.env import DistributedSetup


@dataclass
class _Result:
    group_index: int
    payload: str


def _setup(world_size: int, groups_to_ranks, ranks_to_groups) -> DistributedSetup:
    return DistributedSetup(
        is_distributed=world_size > 1,
        is_nested=False,
        rank=0,
        world_size=world_size,
        groups_to_ranks_mapping=groups_to_ranks,
        ranks_to_groups_mapping=ranks_to_groups,
    )


def test_single_process_is_identity():
    final_loss = np.array([1.0, 2.0])
    results = [_Result(0, "a")]
    payloads = {0: "cp"}
    merged = collectives.synchronize_group_results(
        _setup(1, {0: [0]}, {0: [0]}), final_loss, results, payloads, "t"
    )
    assert merged == (final_loss, results, payloads)


def test_merge_prefers_owning_rank_and_min_reduces(monkeypatch):
    """Rank 1 owns group 1; its payload wins even though rank 0's copy
    arrives first, and the loss reduces elementwise to the minimum."""
    gathered = [
        (
            np.array([0.5, np.inf, 3.0]),
            [_Result(0, "rank0-g0"), _Result(1, "rank0-g1-stale")],
            {0: "cp0-rank0", 1: "cp1-stale"},
        ),
        (
            np.array([np.inf, 2.0, 4.0]),
            [_Result(1, "rank1-g1")],
            {1: "cp1-owner"},
        ),
    ]
    monkeypatch.setattr(
        collectives, "all_gather_object", lambda obj, tag="": gathered
    )
    setup = _setup(2, {0: [0], 1: [1]}, {0: [0], 1: [1]})
    final_loss, results, payloads = collectives.synchronize_group_results(
        setup, gathered[0][0], gathered[0][1], gathered[0][2], "t"
    )
    np.testing.assert_array_equal(final_loss, [0.5, 2.0, 3.0])
    assert [r.group_index for r in results] == [0, 1]
    assert results[1].payload == "rank1-g1"  # the owner's result won
    assert payloads == {0: "cp0-rank0", 1: "cp1-owner"}
