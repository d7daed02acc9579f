"""Run the three field optimizations (kinematics -> surfaces -> aim points)
end-to-end from ``config.yaml`` and save results.

reference: examples/field_optimizations/generate_results.py (1800 LoC,
download/DDP-coupled). This build drives the TPU-native optimizers; results
(loss histories, reconstructed parameters, final flux) land as ``.npz`` +
``.json`` files under ``results_dir``.

Usage:
    python examples/field_optimizations/generate_results.py [config.yaml] \
        [kinematics|surface|aim_point|all]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import json
import os
import pathlib
import sys

# The container's sitecustomize may force-select a TPU backend in-config,
# overriding the JAX_PLATFORMS env var; honor an explicit CPU request.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from artist_tpu.flux.bitmap import trapezoid_distribution
from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
from artist_tpu.optim.surface_reconstructor import SurfaceReconstructor
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
    set_runtime_logger,
    track_runtime,
)

from generate_scenarios import generate_scenario, load_config


def build_heliostat_data_mapping(config: dict) -> list:
    """Resolve calibration jsons + flux pngs for each heliostat by naming
    convention (<name>-calibration-properties_<i>.json / <name>-flux-centered_<i>.png)."""
    data_dir = pathlib.Path(config["data_dir"])
    limit = int(config["maximum_number_of_measurements"])
    mapping = []
    for name in config["heliostats"]:
        properties = sorted(
            data_dir.glob(f"{name}-calibration-properties_*.json")
        )[:limit]
        fluxes = [
            data_dir / f"{name}-flux-centered_{p.stem.rsplit('_', 1)[-1]}.png"
            for p in properties
        ]
        pairs = [(p, f) for p, f in zip(properties, fluxes) if f.exists()]
        if pairs:
            mapping.append((name, [p for p, _ in pairs], [f for _, f in pairs]))
    return mapping


def _optimization_block(cfg: dict, keys: list[str]) -> dict:
    return {getattr(constants, k): cfg[k] for k in keys if k in cfg}


@track_runtime
def kinematics_evaluation(scenario, config, results_dir, distributed_setup=None) -> None:
    cfg = config["kinematics_reconstruction_optimization_configuration"]
    optimization_configuration = {
        constants.optimization: _optimization_block(
            cfg,
            [
                "initial_learning_rate_rotation_deviation",
                "tolerance",
                "max_epoch",
                "batch_size",
                "log_step",
                "early_stopping_delta",
                "early_stopping_patience",
                "early_stopping_window",
            ],
        ),
        constants.scheduler: _optimization_block(
            cfg,
            [
                "scheduler_type",
                "lr_min",
                "lr_max",
                "step_size_up",
                "reduce_factor",
                "patience",
                "threshold",
                "cooldown",
                "gamma",
            ],
        ),
    }
    reconstructor = KinematicsReconstructor(
        scenario=scenario,
        data={
            constants.data_parser: PaintCalibrationDataParser(),
            constants.heliostat_data_mapping: build_heliostat_data_mapping(config),
        },
        optimization_configuration=optimization_configuration,
        reconstruction_method=cfg.get(
            "method", constants.kinematics_reconstruction_alignment
        ),
        distributed_setup=distributed_setup,
    )
    final_loss, results = reconstructor.reconstruct_kinematics()
    np.savez(
        results_dir / "kinematics_reconstruction.npz",
        final_loss=np.asarray(final_loss),
        **{
            f"group_{i}_rotation_deviations": np.asarray(g.rotation_deviations)
            for i, g in enumerate(scenario.heliostat_groups)
        },
    )
    histories = {
        f"group_{r.group_index}": [float(v) for v in r.loss_history]
        for r in results
    }
    with open(results_dir / "kinematics_loss_history.json", "w") as handle:
        json.dump(histories, handle, indent=2)


@track_runtime
def surface_evaluation(scenario, config, results_dir, distributed_setup=None) -> None:
    cfg = config["surface_reconstruction_optimization_configuration"]
    optimization_configuration = {
        constants.optimization: _optimization_block(
            cfg,
            [
                "initial_learning_rate",
                "tolerance",
                "max_epoch",
                "batch_size",
                "log_step",
                "early_stopping_delta",
                "early_stopping_patience",
                "early_stopping_window",
            ],
        ),
        constants.scheduler: _optimization_block(
            cfg,
            [
                "scheduler_type",
                "lr_min",
                "lr_max",
                "step_size_up",
                "reduce_factor",
                "patience",
                "threshold",
                "cooldown",
                "gamma",
            ],
        ),
        constants.constraints: _optimization_block(
            cfg,
            [
                "rho_flux_integral",
                "energy_tolerance",
                "weight_smoothness",
                "weight_ideal_surface",
            ],
        ),
    }
    reconstructor = SurfaceReconstructor(
        scenario=scenario,
        data={
            constants.data_parser: PaintCalibrationDataParser(),
            constants.heliostat_data_mapping: build_heliostat_data_mapping(config),
        },
        optimization_configuration=optimization_configuration,
        distributed_setup=distributed_setup,
    )
    final_loss, results = reconstructor.reconstruct_surfaces("kl_divergence")
    np.savez(
        results_dir / "surface_reconstruction.npz",
        final_loss=np.asarray(final_loss),
        **{
            f"group_{i}_control_points": np.asarray(g.nurbs_control_points)
            for i, g in enumerate(scenario.heliostat_groups)
        },
    )
    _save_histories(results_dir / "surface_loss_history.json", results)


@track_runtime
def aim_point_evaluation(scenario, config, results_dir, distributed_setup=None) -> None:
    cfg = config["aim_point_optimization_configuration"]
    resolution = (256, 256)
    horizontal = np.asarray(
        trapezoid_distribution(
            resolution[0], cfg["trapezoid_plateau"], cfg["trapezoid_slope"]
        )
    )
    vertical = np.asarray(
        trapezoid_distribution(
            resolution[1], cfg["trapezoid_plateau"], cfg["trapezoid_slope"]
        )
    )
    optimization_configuration = {
        constants.optimization: _optimization_block(
            cfg,
            [
                "initial_learning_rate",
                "tolerance",
                "max_epoch",
                "batch_size",
                "log_step",
                "early_stopping_delta",
                "early_stopping_patience",
                "early_stopping_window",
            ],
        ),
        constants.scheduler: _optimization_block(
            cfg,
            [
                "scheduler_type",
                "lr_min",
                "reduce_factor",
                "patience",
                "threshold",
                "cooldown",
            ],
        ),
        constants.constraints: _optimization_block(
            cfg,
            [
                "rho_flux_integral",
                "rho_local_flux",
                "rho_intercept",
                "max_flux_density",
            ],
        ),
    }
    optimizer = AimPointOptimizer(
        scenario=scenario,
        optimization_configuration=optimization_configuration,
        incident_ray_direction=[0.0, 1.0, 0.0, 0.0],
        target_area_index=0,
        ground_truth=np.outer(vertical, horizontal),
        dni=float(cfg.get("dni", 800.0)),
        bitmap_resolution=resolution,
        distributed_setup=distributed_setup,
    )
    final_loss, history, intercepts, on_targets, blockings = optimizer.optimize(
        "kl_divergence"
    )
    np.savez(
        results_dir / "aim_point_optimization.npz",
        final_loss=np.asarray(final_loss),
        intercepts=np.asarray(intercepts, dtype=np.float64),
        on_targets=np.asarray(on_targets, dtype=np.float64),
        blockings=np.asarray(blockings, dtype=np.float64),
        **{
            f"group_{i}_motor_positions": np.asarray(g.motor_positions)
            for i, g in enumerate(scenario.heliostat_groups)
        },
    )
    if isinstance(history, dict):
        payload = {
            key: [float(v) for v in values] for key, values in history.items()
        }
    else:
        payload = {"total_loss": [float(v) for v in history]}
    with open(results_dir / "aim_point_loss_history.json", "w") as handle:
        json.dump(payload, handle, indent=2)


def _save_histories(path: pathlib.Path, results) -> None:
    histories = {
        f"group_{r.group_index}": {
            key: [float(v) for v in values]
            for key, values in r.loss_history.items()
        }
        for r in results
    }
    with open(path, "w") as handle:
        json.dump(histories, handle, indent=2)


def main() -> None:
    set_logger_config()
    enable_compilation_cache()  # reruns skip the remote TPU compiles
    config = load_config(sys.argv)
    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    results_dir = pathlib.Path(config["results_dir"])
    results_dir.mkdir(parents=True, exist_ok=True)
    set_runtime_logger(results_dir / "runtime_log.txt")

    scenario_path = pathlib.Path(config["scenarios_dir"]) / (
        "field_optimization_scenario.h5"
    )
    if not scenario_path.exists():
        scenario_path = generate_scenario(config)

    surface_cfg = config["surface_reconstruction_optimization_configuration"]
    points = int(surface_cfg["number_of_surface_points"])
    scenario = load_scenario_from_hdf5(
        scenario_path, number_of_surface_points_per_facet=(points, points)
    )

    # Multi-process deployments (one JAX process per host) distribute the
    # heliostat groups round-robin and merge results automatically; on a
    # single process this is a no-op wrapper.
    from artist_tpu.parallel import setup_distributed_environment

    with setup_distributed_environment(
        number_of_heliostat_groups=len(scenario.heliostat_groups)
    ) as distributed_setup:
        if which in ("kinematics", "all"):
            kinematics_evaluation(scenario, config, results_dir, distributed_setup)
        if which in ("surface", "all"):
            surface_evaluation(scenario, config, results_dir, distributed_setup)
        if which in ("aim_point", "all"):
            aim_point_evaluation(scenario, config, results_dir, distributed_setup)
    print(f"results written to {results_dir}")


if __name__ == "__main__":
    main()
