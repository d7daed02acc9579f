"""Subprocess worker for the multi-process CPU ``jax.distributed`` tests.

Runs a tiny two-group surface + kinematics reconstruction under a given
world size and dumps the merged results to ``.npz`` so the parent test can
compare world_size=1 against world_size=2 (reference mocks its bootstrap in
tests/util/test_env.py:15-120; here the real multi-process path runs).

Invoked as:
    python distributed_worker.py --output OUT.npz [--coordinator HOST:PORT
        --num-processes N --process-id I] [--nested]
"""

import argparse
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--nested",
        action="store_true",
        help="use one heliostat group so world_size > groups (global mesh)",
    )
    parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="exercise per-rank checkpointing (checkpoint_every=1)",
    )
    args = parser.parse_args()

    import numpy as np

    from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
    from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
    from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
    from artist_tpu.parallel import setup_distributed_environment
    from artist_tpu.scenario.synthetic import (
        SyntheticCalibrationParser,
        make_synthetic_scenario,
        split_into_groups,
    )
    from artist_tpu.util import constants

    number_of_groups = 1 if args.nested else 2
    data = {
        constants.data_parser: SyntheticCalibrationParser(samples_per_heliostat=2),
        constants.heliostat_data_mapping: [],
    }
    surface_configuration = {
        constants.optimization: {
            constants.initial_learning_rate: 1e-4,
            constants.tolerance: 1e-9,
            constants.max_epoch: 2,
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
    }
    kinematics_configuration = {
        constants.optimization: {
            constants.initial_learning_rate_rotation_deviation: 1e-4,
            constants.tolerance: 1e-9,
            constants.max_epoch: 2,
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
    }

    with setup_distributed_environment(
        number_of_heliostat_groups=number_of_groups,
        coordinator_address=args.coordinator,
        num_processes=args.num_processes if args.num_processes > 1 else None,
        process_id=args.process_id,
    ) as setup:
        # Scenario construction touches JAX and must come AFTER
        # jax.distributed.initialize (inside the setup context).
        scenario = make_synthetic_scenario(
            number_of_heliostats=4,
            number_of_control_points_per_facet=(6, 6),
            number_of_surface_points_per_facet=(4, 4),
            number_of_rays=4,
        )
        if number_of_groups > 1:
            scenario = split_into_groups(scenario, number_of_groups)

        checkpoint_kwargs = (
            dict(checkpoint_dir=args.checkpoint_dir, checkpoint_every=1)
            if args.checkpoint_dir
            else {}
        )
        surface_reconstructor = SurfaceReconstructor(
            scenario=scenario,
            data=data,
            optimization_configuration=surface_configuration,
            number_of_surface_points=(4, 4),
            bitmap_resolution=(32, 32),
            distributed_setup=setup,
            **checkpoint_kwargs,
        )
        surface_loss, surface_results = surface_reconstructor.reconstruct_surfaces(
            "kl_divergence"
        )

        kinematics_reconstructor = KinematicsReconstructor(
            scenario=scenario,
            data=data,
            optimization_configuration=kinematics_configuration,
            reconstruction_method=constants.kinematics_reconstruction_raytracing,
            bitmap_resolution=(32, 32),
            distributed_setup=setup,
            **checkpoint_kwargs,
        )
        kinematics_loss, kinematics_results = (
            kinematics_reconstructor.reconstruct_kinematics("focal_spot")
        )

        aim_point_configuration = {
            constants.optimization: {
                constants.initial_learning_rate: 1e-3,
                constants.tolerance: 1e-9,
                constants.max_epoch: 2,
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
                constants.rho_intercept: 1.0,
                constants.rho_local_flux: 1.0,
                constants.max_flux_density: 1e6,
            },
        }
        aim_point_optimizer = AimPointOptimizer(
            scenario=scenario,
            optimization_configuration=aim_point_configuration,
            incident_ray_direction=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
            target_area_index=0,
            ground_truth=np.ones((32, 32), np.float32),
            dni=1000.0,
            bitmap_resolution=(32, 32),
            distributed_setup=setup,
            **checkpoint_kwargs,
        )
        aim_loss, _, aim_intercepts, aim_on_targets, aim_blockings = (
            aim_point_optimizer.optimize("kl_divergence")
        )

        payload = {
            "aim_final_loss": np.float32(aim_loss),
            "aim_intercepts": np.asarray(aim_intercepts),
            "aim_on_targets": np.asarray(aim_on_targets),
            "aim_blockings": np.asarray(aim_blockings),
            "world_size": np.int32(setup.world_size),
            "rank": np.int32(setup.rank),
            "is_nested": np.bool_(setup.is_nested),
            "surface_final_loss": surface_loss,
            "kinematics_final_loss": kinematics_loss,
            "surface_group_count": np.int32(len(surface_results)),
            "kinematics_group_count": np.int32(len(kinematics_results)),
        }
        for index, group in enumerate(scenario.heliostat_groups):
            payload[f"control_points_{index}"] = np.asarray(
                group.nurbs_control_points
            )
            payload[f"rotation_deviations_{index}"] = np.asarray(
                group.rotation_deviations
            )
            payload[f"motor_positions_{index}"] = np.asarray(group.motor_positions)
        np.savez(args.output, **payload)
    print(f"worker rank={args.process_id} done", flush=True)


if __name__ == "__main__":
    main()
