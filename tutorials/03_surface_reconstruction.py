"""Tutorial 03: NURBS surface reconstruction from measured flux images.

reference: tutorials/03_nurbs_surface_reconstruction_tutorial.py.
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
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
    scenario_path,
    number_of_surface_points_per_facet=(50, 50),
    change_number_of_control_points_per_facet=(7, 7),
)

# PAINT calibration data: per heliostat, properties JSONs + measured flux PNGs.
heliostat_data_mapping = [
    (
        "AA39",
        [field_data / f"AA39-calibration-properties_{i}.json" for i in (1, 2, 3)],
        [field_data / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
    ),
]

optimization_configuration = {
    constants.optimization: {
        constants.initial_learning_rate: 1e-4,
        constants.tolerance: 5e-4,
        constants.max_epoch: 50,
        constants.batch_size: 30,
        constants.log_step: 10,
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
    constants.constraints: {
        constants.rho_flux_integral: 1.0,
        constants.energy_tolerance: 0.01,
        constants.weight_smoothness: 0.005,
        constants.weight_ideal_surface: 0.005,
    },
}

reconstructor = SurfaceReconstructor(
    scenario=scenario,
    data={
        constants.data_parser: PaintCalibrationDataParser(),
        constants.heliostat_data_mapping: heliostat_data_mapping,
    },
    optimization_configuration=optimization_configuration,
    bitmap_resolution=(256, 256),
)
final_loss, results = reconstructor.reconstruct_surfaces("kl_divergence")

for result in results:
    history = result.loss_history["total_loss"]
    print(
        f"Group {result.group_index}: loss {history[0]:.4f} -> {history[-1]:.4f} "
        f"over {len(history)} epochs; test pixel loss "
        f"{result.test_loss['test_loss_pixel']}"
    )
