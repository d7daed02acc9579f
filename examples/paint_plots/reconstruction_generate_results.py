"""Run kinematics reconstruction twice (UTIS vs HeliOS centroids), save results.

For each centroid-extraction method the raytracing-method kinematics
reconstruction runs on a fresh copy of the scenario; the per-heliostat
focal-spot losses (meters on the target) plus each heliostat's position are
saved to ``results_dir/kinematics_reconstruction_results.json`` for
``reconstruction_plot.py``.

reference: examples/paint_plots/reconstruction_generate_results.py (results
persist as JSON instead of a torch pickle; one jitted train step per group
replaces the eager epoch body).

Usage:
    python reconstruction_generate_results.py [--config C]
        [--results_dir R] [--scenarios_dir S]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

import numpy as np  # noqa: E402

from artist_tpu.io.calibration import PaintCalibrationDataParser  # noqa: E402
from artist_tpu.optim.kinematics_reconstructor import (  # noqa: E402
    KinematicsReconstructor,
)
from artist_tpu.parallel import setup_distributed_environment  # noqa: E402
from artist_tpu.scenario import load_scenario_from_hdf5  # noqa: E402
from artist_tpu.util import constants  # noqa: E402
from artist_tpu.util.logging_utils import set_logger_config  # noqa: E402

set_logger_config()

UTIS_KEY = "UTIS"
HELIOS_KEY = "HeliOS"

# reference: reconstruction_generate_results.py:100-127.
OPTIMIZATION_CONFIGURATION = {
    constants.optimization: {
        constants.initial_learning_rate_rotation_deviation: 1e-4,
        constants.tolerance: 0.0,
        constants.max_epoch: 1000,
        constants.batch_size: 500,
        constants.log_step: 50,
        constants.early_stopping_delta: 1e-6,
        constants.early_stopping_patience: 4000,
        constants.early_stopping_window: 1000,
    },
    constants.scheduler: {
        constants.scheduler_type: constants.exponential,
        constants.gamma: 0.999,
    },
}


def generate_reconstruction_results(
    scenario_path: pathlib.Path,
    heliostat_data_mapping: list,
    max_epoch: int | None = None,
) -> dict[str, dict]:
    """Reconstruct kinematics per centroid method; return losses + positions."""
    if max_epoch is not None:
        OPTIMIZATION_CONFIGURATION[constants.optimization][
            constants.max_epoch
        ] = int(max_epoch)
    results: dict[str, dict] = {}
    number_of_groups = 0

    for centroid in (UTIS_KEY, HELIOS_KEY):
        # Fresh scenario per run so results are comparable across methods.
        scenario = load_scenario_from_hdf5(
            scenario_path, number_of_surface_points_per_facet=(5, 5)
        )
        number_of_groups = len(scenario.heliostat_groups)
        with setup_distributed_environment(
            number_of_heliostat_groups=number_of_groups
        ) as setup:
            reconstructor = KinematicsReconstructor(
                scenario=scenario,
                data={
                    constants.data_parser: PaintCalibrationDataParser(
                        sample_limit=3, centroid_extraction_method=centroid
                    ),
                    constants.heliostat_data_mapping: heliostat_data_mapping,
                },
                optimization_configuration=OPTIMIZATION_CONFIGURATION,
                reconstruction_method=(
                    constants.kinematics_reconstruction_raytracing
                ),
                distributed_setup=setup,
            )
            per_heliostat_losses, _ = reconstructor.reconstruct_kinematics(
                "focal_spot"
            )

        offset = 0
        for group in scenario.heliostat_groups:
            for index, name in enumerate(group.names):
                results.setdefault(name, {})
                results[name][centroid] = float(per_heliostat_losses[offset + index])
            offset += group.number_of_heliostats

        for group in scenario.heliostat_groups:
            for name, position in zip(group.names, np.asarray(group.positions)):
                results[name]["Position"] = position.tolist()
    return results


def main() -> None:
    import argparse

    epoch_parser = argparse.ArgumentParser(add_help=False)
    epoch_parser.add_argument("--max_epoch", type=int, default=None)
    epoch_args, remaining = epoch_parser.parse_known_args()
    sys.argv = [sys.argv[0]] + remaining
    args = load_config(
        ["results_dir", "scenarios_dir"], description=__doc__.splitlines()[0]
    )
    viable_path = args.results_dir / "viable_heliostats.json"
    if not viable_path.exists():
        raise FileNotFoundError(
            f"The viable heliostat list at {viable_path} was not found; run "
            f"reconstruction_generate_viable_heliostats_list.py first."
        )
    scenario_path = args.scenarios_dir / "reconstruction.h5"
    if not scenario_path.exists():
        raise FileNotFoundError(
            f"The reconstruction scenario at {scenario_path} was not found; "
            f"run reconstruction_scenario.py first."
        )
    with open(viable_path) as f:
        viable = json.load(f)
    heliostat_data_mapping = [
        (
            item["name"],
            [pathlib.Path(p) for p in item["calibrations"]],
            [pathlib.Path(p) for p in item["flux_images"]],
        )
        for item in viable
    ]
    results = generate_reconstruction_results(
        scenario_path, heliostat_data_mapping, max_epoch=epoch_args.max_epoch
    )
    args.results_dir.mkdir(parents=True, exist_ok=True)
    output = args.results_dir / "kinematics_reconstruction_results.json"
    with open(output, "w") as f:
        json.dump(results, f, indent=1)
    print(f"Reconstruction results saved to {output}")


if __name__ == "__main__":
    main()
