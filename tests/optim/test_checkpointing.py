"""Checkpoint/resume of the three optimizers.

The reference has no training checkpoints (SURVEY section 5); the TPU build
saves full resume state through orbax (artist_tpu/optim/checkpointing.py).
The contract tested here: an optimization interrupted after a checkpoint
and resumed from it reaches the SAME final state as an uninterrupted run -
the checkpoint carries parameters, optax state, AL multipliers/references,
scheduler and early-stopping state, histories, and the epoch counter.
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
from artist_tpu.flux.bitmap import trapezoid_distribution
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

REFERENCE_ROOT = pathlib.Path("/root/reference")
SCENARIO_IDEAL = (
    REFERENCE_ROOT / "tests/data/scenarios/test_scenario_paint_four_heliostats_ideal.h5"
)
SCENARIO_PAINT = (
    REFERENCE_ROOT / "tests/data/scenarios/test_scenario_paint_four_heliostats.h5"
)
FIELD_DATA = REFERENCE_ROOT / "tests/data/field_data"


def _data():
    return {
        constants.data_parser: PaintCalibrationDataParser(),
        constants.heliostat_data_mapping: [
            (
                "AA39",
                [
                    FIELD_DATA / f"AA39-calibration-properties_{i}.json"
                    for i in (1, 2, 3)
                ],
                [FIELD_DATA / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
            ),
        ],
    }


def _surface_configuration(max_epoch: int) -> dict:
    return {
        constants.optimization: {
            constants.initial_learning_rate: 1e-4,
            constants.tolerance: 5e-4,
            constants.max_epoch: max_epoch,
            constants.batch_size: 30,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 2,
            constants.early_stopping_window: 40,
        },
        constants.scheduler: {
            constants.scheduler_type: constants.reduce_on_plateau,
            constants.lr_min: 1e-6,
            constants.reduce_factor: 0.8,
            constants.patience: 10,
            constants.threshold: 1e-4,
            constants.cooldown: 5,
        },
        constants.constraints: {
            constants.rho_flux_integral: 1.0,
            constants.energy_tolerance: 0.01,
            constants.weight_smoothness: 0.005,
            constants.weight_ideal_surface: 0.005,
        },
    }


def _surface_reconstructor(scenario, checkpoint_dir, max_epoch):
    return SurfaceReconstructor(
        scenario=scenario,
        data=_data(),
        optimization_configuration=_surface_configuration(max_epoch),
        bitmap_resolution=(64, 64),
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=2,
    )


def _load_ideal():
    return load_scenario_from_hdf5(
        SCENARIO_IDEAL,
        number_of_surface_points_per_facet=(8, 8),
        change_number_of_control_points_per_facet=(7, 7),
    )


def test_surface_reconstruction_resumes_identically(tmp_path):
    if not SCENARIO_IDEAL.exists():
        pytest.skip("reference scenario data not available")

    # Uninterrupted run: epochs 0..5.
    full_scenario = _load_ideal()
    _, full_results = _surface_reconstructor(
        full_scenario, tmp_path / "full", max_epoch=5
    ).reconstruct_surfaces("kl_divergence")
    group_index = full_results[0].group_index
    full_cp = np.asarray(
        full_scenario.heliostat_groups[group_index].nurbs_control_points
    )
    full_history = full_results[0].loss_history["total_loss"]

    # Interrupted run: killed after epoch 3 (latest checkpoint at epoch 2).
    resume_dir = tmp_path / "resume"
    interrupted = _load_ideal()
    _surface_reconstructor(interrupted, resume_dir, max_epoch=3).reconstruct_surfaces(
        "kl_divergence"
    )
    assert (resume_dir / f"surface_group_{group_index}" / "2").exists()

    # Resumed run: restores epoch-2 state, replays epochs 3..5.
    resumed_scenario = _load_ideal()
    _, resumed_results = _surface_reconstructor(
        resumed_scenario, resume_dir, max_epoch=5
    ).reconstruct_surfaces("kl_divergence")
    resumed_cp = np.asarray(
        resumed_scenario.heliostat_groups[group_index].nurbs_control_points
    )
    resumed_history = resumed_results[0].loss_history["total_loss"]

    # Same trajectory: histories agree epoch by epoch and the final control
    # points match the uninterrupted run's.
    np.testing.assert_allclose(resumed_history, full_history, rtol=1e-5)
    np.testing.assert_allclose(resumed_cp, full_cp, rtol=1e-5, atol=1e-7)


def test_kinematics_reconstruction_resumes_identically(tmp_path):
    if not SCENARIO_IDEAL.exists():
        pytest.skip("reference scenario data not available")

    configuration = {
        constants.optimization: {
            constants.initial_learning_rate_rotation_deviation: 1e-4,
            constants.tolerance: 0.0,
            constants.max_epoch: 5,
            constants.batch_size: 30,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 5,
            constants.early_stopping_window: 40,
        },
        constants.scheduler: {
            constants.scheduler_type: constants.reduce_on_plateau,
            constants.lr_min: 1e-6,
            constants.reduce_factor: 0.8,
            constants.patience: 10,
            constants.threshold: 1e-4,
            constants.cooldown: 5,
        },
    }

    def run(checkpoint_dir, max_epoch):
        scenario = load_scenario_from_hdf5(
            SCENARIO_IDEAL, number_of_surface_points_per_facet=(8, 8)
        )
        config = {
            **configuration,
            constants.optimization: {
                **configuration[constants.optimization],
                constants.max_epoch: max_epoch,
            },
        }
        reconstructor = KinematicsReconstructor(
            scenario=scenario,
            data=_data(),
            optimization_configuration=config,
            reconstruction_method=constants.kinematics_reconstruction_alignment,
            bitmap_resolution=(64, 64),
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=2,
        )
        _, results = reconstructor.reconstruct_kinematics("angle")
        group_index = results[0].group_index
        return (
            np.asarray(
                scenario.heliostat_groups[group_index].rotation_deviations
            ),
            results[0].loss_history,
        )

    full_deviations, full_history = run(tmp_path / "full", max_epoch=5)
    run(tmp_path / "resume", max_epoch=3)
    resumed_deviations, resumed_history = run(tmp_path / "resume", max_epoch=5)

    np.testing.assert_allclose(resumed_history, full_history, rtol=1e-5)
    np.testing.assert_allclose(
        resumed_deviations, full_deviations, rtol=1e-5, atol=1e-9
    )


def test_aim_point_optimization_resumes_identically(tmp_path):
    if not SCENARIO_PAINT.exists():
        pytest.skip("reference scenario data not available")

    resolution = (64, 64)
    horizontal = np.asarray(trapezoid_distribution(resolution[0], 10, 20))
    vertical = np.asarray(trapezoid_distribution(resolution[1], 10, 20))
    ground_truth = np.outer(vertical, horizontal)

    def run(checkpoint_dir, max_epoch):
        scenario = load_scenario_from_hdf5(
            SCENARIO_PAINT, number_of_surface_points_per_facet=(8, 8)
        )
        optimizer = AimPointOptimizer(
            scenario=scenario,
            optimization_configuration={
                constants.optimization: {
                    constants.initial_learning_rate: 1e-3,
                    constants.tolerance: 0.0,
                    constants.max_epoch: max_epoch,
                    constants.batch_size: 50,
                    constants.log_step: 10,
                    constants.early_stopping_delta: 1.0,
                    constants.early_stopping_patience: 2,
                    constants.early_stopping_window: 40,
                },
                constants.scheduler: {
                    constants.scheduler_type: constants.reduce_on_plateau,
                    constants.lr_min: 1e-3,
                    constants.reduce_factor: 0.9,
                    constants.patience: 100,
                    constants.threshold: 1e-3,
                    constants.cooldown: 20,
                },
                constants.constraints: {
                    constants.rho_flux_integral: 1.0,
                    constants.rho_local_flux: 1.0,
                    constants.rho_intercept: 1.0,
                    constants.max_flux_density: 1000000,
                },
            },
            incident_ray_direction=[0.0, 1.0, 0.0, 0.0],
            target_area_index=0,
            ground_truth=ground_truth,
            dni=800,
            bitmap_resolution=resolution,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=2,
        )
        _, history, _, _, _ = optimizer.optimize("kl_divergence")
        motors = [
            np.asarray(g.motor_positions) for g in scenario.heliostat_groups
        ]
        return motors, history["total_loss"]

    full_motors, full_history = run(tmp_path / "full", max_epoch=5)
    run(tmp_path / "resume", max_epoch=3)
    resumed_motors, resumed_history = run(tmp_path / "resume", max_epoch=5)

    np.testing.assert_allclose(resumed_history, full_history, rtol=1e-5)
    for resumed, full in zip(resumed_motors, full_motors):
        np.testing.assert_allclose(resumed, full, rtol=1e-5)
