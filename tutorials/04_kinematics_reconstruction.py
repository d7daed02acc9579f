"""Tutorial 04: kinematics calibration from calibration measurements.

reference: tutorials/04_kinematics_reconstruction_tutorial.py. Two methods:
"alignment" (fast, no ray tracing) and "raytracing" (flux-driven).
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
)

set_logger_config()
enable_compilation_cache()  # reruns skip the remote TPU compiles

scenario_path = pathlib.Path(
    "/root/reference/tests/data/scenarios/test_scenario_paint_four_heliostats_ideal.h5"
)
field_data = pathlib.Path("/root/reference/tests/data/field_data")

scenario = load_scenario_from_hdf5(
    scenario_path, number_of_surface_points_per_facet=(25, 25)
)

data = {
    constants.data_parser: PaintCalibrationDataParser(),
    constants.heliostat_data_mapping: [
        (
            "AA39",
            [field_data / f"AA39-calibration-properties_{i}.json" for i in (1, 2, 3)],
            [field_data / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
        ),
    ],
}

optimization_configuration = {
    constants.optimization: {
        constants.initial_learning_rate_rotation_deviation: 1e-4,
        constants.tolerance: 0.0005,
        constants.max_epoch: 100,
        constants.batch_size: 30,
        constants.log_step: 20,
        constants.early_stopping_delta: 1.0,
        constants.early_stopping_patience: 10,
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

reconstructor = KinematicsReconstructor(
    scenario=scenario,
    data=data,
    optimization_configuration=optimization_configuration,
    reconstruction_method=constants.kinematics_reconstruction_alignment,
    bitmap_resolution=(64, 64),
)
final_loss, results = reconstructor.reconstruct_kinematics("angle")

for result in results:
    print(
        f"Group {result.group_index}: alignment loss "
        f"{result.loss_history[0]:.6f} -> {result.loss_history[-1]:.6f}; "
        f"test focal spot loss {result.test_loss['focal_spot_loss']}"
    )
