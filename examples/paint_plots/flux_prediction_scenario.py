"""Generate the two flux-prediction scenarios (ideal + deflectometry-fitted).

For each heliostat in ``heliostats_for_raytracing`` this builds
``flux_prediction_ideal.h5`` (planar NURBS surfaces) and
``flux_prediction_fitted.h5`` (NURBS fitted to the latest deflectometry
measurement) under ``scenarios_dir``.

reference: examples/paint_plots/flux_prediction_scenario.py.

Usage:
    python flux_prediction_scenario.py [--config C] [--data_dir D]
        [--tower_file_name T] [--scenarios_dir S]
"""

from __future__ import annotations

import os
import pathlib
import sys

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

from artist_tpu.io.paint_scenario_parser import (  # noqa: E402
    extract_paint_heliostats_fitted_surface,
    extract_paint_heliostats_ideal_surface,
    extract_paint_tower_measurements,
)
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator  # noqa: E402
from artist_tpu.util import constants  # noqa: E402
from artist_tpu.util.config import (  # noqa: E402
    LightSourceConfig,
    LightSourceListConfig,
)
from artist_tpu.util.logging_utils import set_logger_config  # noqa: E402

set_logger_config()


def find_latest_deflectometry_file(
    heliostat_name: str, data_directory: pathlib.Path
) -> pathlib.Path:
    """Latest (lexicographically: timestamped names) deflectometry HDF5.

    reference: flux_prediction_scenario.py:46-77.
    """
    search_path = data_directory / heliostat_name / "Deflectometry"
    candidates = sorted(search_path.glob(f"{heliostat_name}-filled-*.h5"))
    if not candidates:
        raise FileNotFoundError(
            f"No deflectometry file found for {heliostat_name} in {search_path}."
        )
    return candidates[-1]


def generate_flux_prediction_scenario(
    scenario_path: pathlib.Path,
    tower_file: pathlib.Path,
    data_directory: pathlib.Path,
    heliostat_names: list[str],
    use_deflectometry: bool,
) -> None:
    """One scenario with either fitted or ideal surfaces for the heliostats."""
    (
        power_plant_config,
        target_area_list_planar_config,
        target_area_list_cylindrical_config,
    ) = extract_paint_tower_measurements(tower_measurements_path=tower_file)

    light_source_list_config = LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(
                light_source_key="sun",
                light_source_type=constants.sun_key,
                number_of_rays=10,
                distribution_type=constants.light_source_distribution_is_normal,
                mean=0.0,
                covariance=4.3681e-06,
            )
        ]
    )

    def properties_path(name: str) -> pathlib.Path:
        return (
            data_directory / name / "Properties" / f"{name}-heliostat-properties.json"
        )

    if use_deflectometry:
        heliostat_files_list = [
            (
                name,
                properties_path(name),
                find_latest_deflectometry_file(name, data_directory),
            )
            for name in heliostat_names
        ]
        heliostat_list_config, prototype_config = (
            extract_paint_heliostats_fitted_surface(
                paths=heliostat_files_list,
                power_plant_position=power_plant_config.power_plant_position,
                number_of_nurbs_control_points=(20, 20),
                deflectometry_step_size=100,
                nurbs_fit_method=constants.fit_nurbs_from_normals,
                nurbs_fit_tolerance=1e-10,
                nurbs_fit_max_epoch=400,
            )
        )
    else:
        heliostat_list_config, prototype_config = (
            extract_paint_heliostats_ideal_surface(
                paths=[(name, properties_path(name)) for name in heliostat_names],
                power_plant_position=power_plant_config.power_plant_position,
                number_of_nurbs_control_points=(20, 20),
            )
        )

    H5ScenarioGenerator(
        file_path=scenario_path,
        power_plant_config=power_plant_config,
        target_area_list_planar_config=target_area_list_planar_config,
        target_area_list_cylindrical_config=target_area_list_cylindrical_config,
        light_source_list_config=light_source_list_config,
        prototype_config=prototype_config,
        heliostat_list_config=heliostat_list_config,
    ).generate_scenario()
    print(f"Scenario saved to {scenario_path}")


def main() -> None:
    args = load_config(
        ["data_dir", "tower_file_name", "scenarios_dir", "heliostats_for_raytracing"],
        description=__doc__.splitlines()[0],
    )
    heliostat_names = sorted((args.heliostats_for_raytracing or {}).keys())
    if not heliostat_names:
        raise ValueError(
            "heliostats_for_raytracing is empty; configure at least one "
            "heliostat -> calibration-measurement mapping."
        )
    args.scenarios_dir.mkdir(parents=True, exist_ok=True)
    tower_file = args.data_dir / args.tower_file_name
    for use_deflectometry, stem in ((False, "ideal"), (True, "fitted")):
        try:
            generate_flux_prediction_scenario(
                scenario_path=args.scenarios_dir / f"flux_prediction_{stem}.h5",
                tower_file=tower_file,
                data_directory=args.data_dir,
                heliostat_names=heliostat_names,
                use_deflectometry=use_deflectometry,
            )
        except FileNotFoundError as error:
            if not use_deflectometry:
                raise
            print(f"Skipping fitted scenario: {error}")


if __name__ == "__main__":
    main()
