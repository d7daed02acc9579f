"""Tutorial 05: field-level flux shaping via motor-position optimization.

reference: tutorials/05_motor_positions_optimizer_tutorial.py. A trapezoid
target distribution is imposed on the receiver; all heliostats' motor
positions are optimized jointly with blocking active.
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

import numpy as np

from artist_tpu.flux.bitmap import trapezoid_distribution
from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
)

set_logger_config()
enable_compilation_cache()  # reruns skip the remote TPU compiles

scenario_path = pathlib.Path(
    "/root/reference/tests/data/scenarios/test_scenario_paint_four_heliostats.h5"
)
scenario = load_scenario_from_hdf5(
    scenario_path, number_of_surface_points_per_facet=(25, 25)
)

resolution = (256, 256)
horizontal = np.asarray(trapezoid_distribution(resolution[0], 40, 80))
vertical = np.asarray(trapezoid_distribution(resolution[1], 40, 80))
ground_truth = np.outer(vertical, horizontal)

optimization_configuration = {
    constants.optimization: {
        constants.initial_learning_rate: 1e-3,
        constants.tolerance: 0.0005,
        constants.max_epoch: 40,
        constants.batch_size: 50,
        constants.log_step: 10,
        constants.early_stopping_delta: 1.0,
        constants.early_stopping_patience: 10,
        constants.early_stopping_window: 40,
    },
    constants.scheduler: {
        constants.scheduler_type: constants.reduce_on_plateau,
        constants.lr_min: 1e-4,
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
}

optimizer = AimPointOptimizer(
    scenario=scenario,
    optimization_configuration=optimization_configuration,
    incident_ray_direction=[0.0, 1.0, 0.0, 0.0],
    target_area_index=0,
    ground_truth=ground_truth,
    dni=800,
    bitmap_resolution=resolution,
)
final_loss, history, intercepts, on_targets, blockings = optimizer.optimize(
    "kl_divergence"
)
print(
    f"KL loss {history['total_loss'][0]:.4f} -> {history['total_loss'][-1]:.4f} "
    f"over {len(history['total_loss'])} epochs"
)
print(f"Mean intercept factor: {intercepts.mean():.3f}")
for group in scenario.heliostat_groups:
    print(f"Optimized motor positions:\n{np.asarray(group.motor_positions)}")
