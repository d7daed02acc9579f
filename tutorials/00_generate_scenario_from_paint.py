"""Tutorial 00a: generate a scenario HDF5 file from PAINT database files.

reference: tutorials/00_generate_scenario_from_paint_tutorial.py. Point the
paths at PAINT tower-measurement and heliostat-properties JSON files (the
reference's test fixtures work out of the box).
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

from artist_tpu.io.paint_scenario_parser import (
    extract_paint_heliostats_ideal_surface,
    extract_paint_tower_measurements,
)
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator
from artist_tpu.util.config import LightSourceConfig, LightSourceListConfig
from artist_tpu.util.logging_utils import set_logger_config

set_logger_config()

# Input PAINT files (replace with your own measurements).
data_dir = pathlib.Path("/root/reference/tests/data/field_data")
tower_file = data_dir / "tower-measurements.json"
heliostat_files = [("AA39", data_dir / "AA39-heliostat-properties.json")]

# Output location.
scenario_path = pathlib.Path("/tmp/artist_tpu_tutorials/paint_scenario.h5")
scenario_path.parent.mkdir(parents=True, exist_ok=True)

# Extract the power plant and target geometry from the tower measurements.
power_plant, planar_targets, cylindrical_targets = (
    extract_paint_tower_measurements(tower_file)
)

# Extract the heliostats with ideal (planar NURBS) surfaces.
heliostats, prototype = extract_paint_heliostats_ideal_surface(
    paths=heliostat_files,
    power_plant_position=power_plant.power_plant_position,
    number_of_nurbs_control_points=(7, 7),
)

# Define the sun.
light_sources = LightSourceListConfig(
    light_source_list=[LightSourceConfig(light_source_key="sun_1", number_of_rays=100)]
)

# Write the scenario file.
generator = H5ScenarioGenerator(
    file_path=scenario_path,
    power_plant_config=power_plant,
    target_area_list_planar_config=planar_targets,
    target_area_list_cylindrical_config=cylindrical_targets,
    light_source_list_config=light_sources,
    heliostat_list_config=heliostats,
    prototype_config=prototype,
)
generator.generate_scenario()
print(f"Scenario written to {scenario_path}.")
