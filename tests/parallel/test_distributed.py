"""Multi-process distribution tests (real 2-process ``jax.distributed``).

reference: tests/util/test_env.py:15-120 mocks its torch.distributed
bootstrap; here two real CPU processes run the group-parallel
reconstruction path end to end and the merged results must match a
single-process run.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as probe:
        probe.bind(("localhost", 0))
        return probe.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return env


def _run_world(
    tmp_path, world_size: int, nested: bool = False, checkpoint_dir=None
) -> list[dict]:
    """Launch ``world_size`` workers; return their result dicts by rank."""
    outputs = [tmp_path / f"w{world_size}_r{rank}.npz" for rank in range(world_size)]
    commands = []
    coordinator = f"localhost:{_free_port()}"
    for rank in range(world_size):
        command = [
            sys.executable,
            str(WORKER),
            "--output",
            str(outputs[rank]),
        ]
        if world_size > 1:
            command += [
                "--coordinator",
                coordinator,
                "--num-processes",
                str(world_size),
                "--process-id",
                str(rank),
            ]
        if nested:
            command.append("--nested")
        if checkpoint_dir is not None:
            command += ["--checkpoint-dir", str(checkpoint_dir)]
        commands.append(command)
    processes = [
        subprocess.Popen(
            command,
            env=_worker_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for command in commands
    ]
    logs = [process.communicate(timeout=900)[0] for process in processes]
    for rank, (process, log_text) in enumerate(zip(processes, logs)):
        assert process.returncode == 0, (
            f"worker rank {rank} (world {world_size}) failed:\n{log_text[-4000:]}"
        )
    return [dict(np.load(path)) for path in outputs]


@pytest.mark.slow
def test_two_process_group_parallel_matches_single_process(tmp_path):
    """Each rank reconstructs only its round-robin groups; after the merge
    every rank holds the full field and matches the single-process result."""
    single = _run_world(tmp_path, 1)[0]
    pair = _run_world(tmp_path, 2)

    assert single["world_size"] == 1
    assert all(result["world_size"] == 2 for result in pair)
    assert not pair[0]["is_nested"]

    for result in pair:
        # Group results were merged: both ranks report BOTH groups.
        assert int(result["surface_group_count"]) == 2
        assert int(result["kinematics_group_count"]) == 2
        np.testing.assert_allclose(
            result["surface_final_loss"], single["surface_final_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(
            result["kinematics_final_loss"],
            single["kinematics_final_loss"],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            result["aim_final_loss"], single["aim_final_loss"], rtol=1e-4
        )
        for name in ("aim_intercepts", "aim_on_targets", "aim_blockings"):
            np.testing.assert_allclose(result[name], single[name], atol=1e-5)
        for group in range(2):
            np.testing.assert_allclose(
                result[f"control_points_{group}"],
                single[f"control_points_{group}"],
                atol=1e-6,
            )
            np.testing.assert_allclose(
                result[f"rotation_deviations_{group}"],
                single[f"rotation_deviations_{group}"],
                atol=1e-6,
            )
            np.testing.assert_allclose(
                result[f"motor_positions_{group}"],
                single[f"motor_positions_{group}"],
                atol=1e-3,
            )

    # The two ranks agree with each other exactly (same merged state).
    for key in pair[0]:
        if key == "rank":
            continue
        np.testing.assert_array_equal(pair[0][key], pair[1][key])


@pytest.mark.slow
def test_two_process_nested_global_mesh_matches_single_process(tmp_path):
    """world_size > groups: every process runs every group with samples
    sharded over the GLOBAL mesh (XLA cross-process collectives replace the
    reference's nested-DDP all-reduce)."""
    single = _run_world(tmp_path, 1, nested=True)[0]
    pair = _run_world(tmp_path, 2, nested=True)

    assert all(result["is_nested"] for result in pair)
    for result in pair:
        np.testing.assert_allclose(
            result["surface_final_loss"], single["surface_final_loss"], rtol=1e-4
        )
        np.testing.assert_allclose(
            result["kinematics_final_loss"],
            single["kinematics_final_loss"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            result["control_points_0"], single["control_points_0"], atol=1e-5
        )
        np.testing.assert_allclose(
            result["rotation_deviations_0"],
            single["rotation_deviations_0"],
            atol=1e-5,
        )


@pytest.mark.slow
def test_two_process_checkpoints_commit_on_every_rank(tmp_path):
    """Per-rank checkpointing in the 2-process group-parallel mode: EVERY
    rank's group checkpoints must actually commit (orbax's default manager
    is collective - host 0 commits behind cross-process barriers - so
    without the per_process option non-zero ranks' state would never land;
    advisor finding, round 4)."""
    checkpoint_dir = tmp_path / "ckpt"
    _run_world(tmp_path, world_size=2, checkpoint_dir=checkpoint_dir)

    from artist_tpu.io.checkpoint import CheckpointManager

    expected = [
        "surface_group_0",
        "surface_group_1",
        "kinematics_group_0",
        "kinematics_group_1",
        "aim_point_rank0",
        "aim_point_rank1",
    ]
    for label in expected:
        directory = checkpoint_dir / label
        assert directory.is_dir(), f"no checkpoint directory for {label}"
        manager = CheckpointManager(directory)
        latest = manager.latest_step
        manager.close()
        assert latest is not None, f"{label}: no committed checkpoint step"
        restored = CheckpointManager(directory).restore()
        assert restored is not None and "epoch" in restored, (
            f"{label}: committed step {latest} does not restore"
        )
