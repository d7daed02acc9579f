"""Tutorial 00b: generate a scenario HDF5 file from STRAL deflectometry data.

reference: tutorials/00_generate_scenario_from_stral_tutorial.py. Point
``stral_file`` at a STRAL ``.binp`` export; the NURBS surfaces are fitted to
the measured normal clouds.
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import pathlib

import numpy as np

from artist_tpu.io.stral import extract_stral_deflectometry_data
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator
from artist_tpu.scenario.surface_generator import SurfaceGenerator
from artist_tpu.util import constants
from artist_tpu.util.config import (
    ActuatorConfig,
    ActuatorListConfig,
    ActuatorParameters,
    HeliostatConfig,
    HeliostatListConfig,
    KinematicsConfig,
    LightSourceConfig,
    LightSourceListConfig,
    PowerPlantConfig,
    PrototypeConfig,
    TargetAreaPlanarConfig,
)
from artist_tpu.util.logging_utils import set_logger_config

set_logger_config()

stral_file = pathlib.Path("please/insert/the/path/to/your/stral_data.binp")
scenario_path = pathlib.Path("/tmp/artist_tpu_tutorials/stral_scenario.h5")
scenario_path.parent.mkdir(parents=True, exist_ok=True)

# Read the binary deflectometry export: facet geometry + point/normal clouds.
facet_translations, canting, points, normals = extract_stral_deflectometry_data(
    stral_file
)

# Fit NURBS control points to the measured surface normals.
surface_generator = SurfaceGenerator(number_of_control_points=(10, 10))
surface_config = surface_generator.generate_fitted_surface_config(
    heliostat_name="heliostat_1",
    facet_translation_vectors=facet_translations,
    canting=canting,
    surface_points_with_facets_list=points,
    surface_normals_with_facets_list=normals,
    deflectometry_step_size=100,
    fit_method=constants.fit_nurbs_from_normals,
)

actuators = ActuatorListConfig(
    actuator_list=[
        ActuatorConfig(
            actuator_key=f"actuator_{i}",
            actuator_type=constants.linear_actuator_key,
            clockwise_axis_movement=bool(i),
            min_max_motor_positions=np.array([0, 70000]),
            parameters=ActuatorParameters(
                increment=154166.67,
                initial_stroke_length=0.075,
                offset=0.34,
                pivot_radius=0.32,
                initial_angle=0.5,
            ),
        )
        for i in range(2)
    ]
)
generator = H5ScenarioGenerator(
    file_path=scenario_path,
    power_plant_config=PowerPlantConfig(
        power_plant_position=np.array([50.91342, 6.38782, 87.0])
    ),
    target_area_list_planar_config=[
        TargetAreaPlanarConfig(
            target_area_key="receiver",
            center=np.array([0.0, -3.0, 45.0, 1.0]),
            normal_vector=np.array([0.0, 1.0, 0.0, 0.0]),
            plane_e=8.0,
            plane_u=7.0,
        )
    ],
    target_area_list_cylindrical_config=[],
    light_source_list_config=LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(light_source_key="sun_1", number_of_rays=100)
        ]
    ),
    heliostat_list_config=HeliostatListConfig(
        heliostat_list=[
            HeliostatConfig(
                name="heliostat_1",
                heliostat_id=1,
                position=np.array([10.0, 30.0, 1.7, 1.0]),
            )
        ]
    ),
    prototype_config=PrototypeConfig(
        surface_prototype=surface_config,
        kinematics_prototype=KinematicsConfig(),
        actuators_prototype=actuators,
    ),
)
generator.generate_scenario()
print(f"Scenario written to {scenario_path}.")
