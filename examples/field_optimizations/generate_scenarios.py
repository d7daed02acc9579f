"""Generate scenario HDF5 files for the field-optimization example.

Builds one ideal-surface scenario per configured heliostat list from PAINT
tower measurements and heliostat-properties files.

reference: examples/field_optimizations/generate_scenarios.py (413 LoC,
download-coupled); this build reads everything from ``config.yaml`` paths.

Usage:
    python examples/field_optimizations/generate_scenarios.py [config.yaml]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import pathlib
import sys

import yaml

from artist_tpu.io.paint_scenario_parser import (
    extract_paint_heliostats_ideal_surface,
    extract_paint_tower_measurements,
)
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator
from artist_tpu.util.config import LightSourceConfig, LightSourceListConfig
from artist_tpu.util.logging_utils import (
    enable_compilation_cache,
    set_logger_config,
)


def load_config(argv: list[str]) -> dict:
    config_path = pathlib.Path(
        argv[1] if len(argv) > 1 else pathlib.Path(__file__).parent / "config.yaml"
    )
    with open(config_path) as handle:
        return yaml.safe_load(handle)


def generate_scenario(config: dict) -> pathlib.Path:
    """Write the example scenario file and return its path."""
    data_dir = pathlib.Path(config["data_dir"])
    scenarios_dir = pathlib.Path(config["scenarios_dir"])
    scenarios_dir.mkdir(parents=True, exist_ok=True)

    tower_file = data_dir / config["tower_file_name"]
    power_plant, planar_targets, cylindrical_targets = (
        extract_paint_tower_measurements(tower_file)
    )

    heliostat_files = [
        (name, data_dir / f"{name}-heliostat-properties.json")
        for name in config["heliostats"]
    ]
    number_of_control_points = int(
        config["surface_reconstruction_optimization_configuration"][
            "number_of_control_points"
        ]
    )
    heliostats, prototype = extract_paint_heliostats_ideal_surface(
        paths=heliostat_files,
        power_plant_position=power_plant.power_plant_position,
        number_of_nurbs_control_points=(
            number_of_control_points,
            number_of_control_points,
        ),
    )

    number_of_rays = int(
        config["surface_reconstruction_optimization_configuration"]["number_of_rays"]
    )
    light_sources = LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(light_source_key="sun_1", number_of_rays=number_of_rays)
        ]
    )

    scenario_path = scenarios_dir / "field_optimization_scenario.h5"
    H5ScenarioGenerator(
        file_path=scenario_path,
        power_plant_config=power_plant,
        target_area_list_planar_config=planar_targets,
        target_area_list_cylindrical_config=cylindrical_targets,
        light_source_list_config=light_sources,
        heliostat_list_config=heliostats,
        prototype_config=prototype,
    ).generate_scenario()
    return scenario_path


if __name__ == "__main__":
    set_logger_config()
    enable_compilation_cache()  # reruns skip the remote TPU compiles
    path = generate_scenario(load_config(sys.argv))
    print(f"scenario written to {path}")
