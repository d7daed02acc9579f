"""Tutorial 06: multi-process (multi-host) reconstruction.

Beyond the reference's six tutorials: how the process-level distribution
works. One JAX process runs per host; `setup_distributed_environment`
initializes `jax.distributed`, maps heliostat groups round-robin onto
ranks, and builds the device mesh. Passing the resulting setup to any
optimizer makes each rank reconstruct only its share; results merge
automatically, so every rank finishes with the full reconstructed field
(reference semantics: artist/optim/surface_reconstructor.py:790-840).

Single process (this also works with no arguments at all):

    python tutorials/06_multi_process_reconstruction.py

Two processes on one machine (run in two shells, or let the script fork):

    python tutorials/06_multi_process_reconstruction.py fork

On a real multi-host TPU pod, drop the coordinator arguments entirely -
`jax.distributed.initialize()` auto-detects the pod topology.
"""

import os
import pathlib
import subprocess
import sys

# Multi-process CPU demo: 2 virtual devices per process.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def run(coordinator: str | None, num_processes: int, process_id: int) -> None:
    # IMPORTANT: nothing may touch JAX before jax.distributed.initialize -
    # the setup context must therefore run before scenario construction.
    from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
    from artist_tpu.parallel import setup_distributed_environment
    from artist_tpu.scenario.synthetic import (
        SyntheticCalibrationParser,
        make_synthetic_scenario,
        split_into_groups,
    )
    from artist_tpu.util import constants

    number_of_groups = 2
    with setup_distributed_environment(
        number_of_heliostat_groups=number_of_groups,
        coordinator_address=coordinator,
        num_processes=num_processes if num_processes > 1 else None,
        process_id=process_id,
    ) as setup:
        scenario = split_into_groups(
            make_synthetic_scenario(
                number_of_heliostats=4,
                number_of_control_points_per_facet=(6, 6),
                number_of_surface_points_per_facet=(4, 4),
                number_of_rays=4,
            ),
            number_of_groups,
        )
        reconstructor = SurfaceReconstructor(
            scenario=scenario,
            data={
                constants.data_parser: SyntheticCalibrationParser(),
                constants.heliostat_data_mapping: [],
            },
            optimization_configuration={
                constants.optimization: {
                    constants.initial_learning_rate: 1e-4,
                    constants.tolerance: 1e-9,
                    constants.max_epoch: 3,
                    constants.batch_size: 8,
                    constants.log_step: 0,
                    constants.early_stopping_delta: 1.0,
                    constants.early_stopping_patience: 5,
                    constants.early_stopping_window: 40,
                },
                constants.scheduler: {
                    constants.scheduler_type: constants.exponential,
                    constants.gamma: 0.99,
                },
                constants.constraints: {
                    constants.rho_flux_integral: 1.0,
                    constants.energy_tolerance: 0.01,
                    constants.weight_smoothness: 0.005,
                    constants.weight_ideal_surface: 0.005,
                },
            },
            number_of_surface_points=(4, 4),
            bitmap_resolution=(32, 32),
            distributed_setup=setup,
        )
        final_loss, results = reconstructor.reconstruct_surfaces("kl_divergence")
        print(
            f"rank {setup.rank}/{setup.world_size}: groups merged = "
            f"{[r.group_index for r in results]}, "
            f"final loss per heliostat = {final_loss.round(4).tolist()}"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fork":
        # Demo launcher: two local processes over a loopback coordinator.
        workers = [
            subprocess.Popen(
                [sys.executable, __file__, "worker", str(rank)],
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            for rank in range(2)
        ]
        for worker in workers:
            worker.wait()
        sys.exit(max(worker.returncode for worker in workers))
    elif len(sys.argv) > 2 and sys.argv[1] == "worker":
        run("localhost:39987", 2, int(sys.argv[2]))
    else:
        run(None, 1, 0)
