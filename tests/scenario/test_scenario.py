"""Scenario loading and index_mapping behavior.

reference: tests/scenario/test_scenario.py and
artist/scenario/scenario.py:261-419.
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.scenario.scenario import get_number_of_heliostat_groups_from_hdf5

SCENARIO_DIR = pathlib.Path("/root/reference/tests/data/scenarios")
FOUR = SCENARIO_DIR / "test_scenario_paint_four_heliostats.h5"


@pytest.fixture(scope="module")
def scenario():
    if not FOUR.exists():
        pytest.skip("reference scenario data not available")
    return load_scenario_from_hdf5(FOUR, number_of_surface_points_per_facet=(4, 4))


def test_group_count_matches_hdf5_attribute(scenario):
    assert (
        get_number_of_heliostat_groups_from_hdf5(FOUR)
        == scenario.number_of_heliostat_groups
    )


def test_default_index_mapping(scenario):
    group = scenario.heliostat_groups[0]
    mask, targets, incident = scenario.index_mapping(group)
    assert mask.tolist() == [1] * group.number_of_heliostats
    assert (targets == 0).all()
    np.testing.assert_allclose(incident, [[0.0, 1.0, 0.0, 0.0]] * len(mask))


def test_string_mapping_with_multiplicity(scenario):
    group = scenario.heliostat_groups[0]
    name = group.names[0]
    direction = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    target_name = scenario.solar_tower.names[1]
    mapping = [
        (name, target_name, direction),
        (name, scenario.solar_tower.names[0], direction),
        ("NOT_IN_GROUP", target_name, direction),
    ]
    mask, targets, incident = scenario.index_mapping(group, string_mapping=mapping)
    assert mask.sum() == 2
    assert mask[list(group.names).index(name)] == 2
    assert set(targets.tolist()) == {0, 1}
    assert incident.shape == (2, 4)


def test_invalid_target_name_raises(scenario):
    group = scenario.heliostat_groups[0]
    direction = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    with pytest.raises(ValueError, match="Invalid target"):
        scenario.index_mapping(
            group, string_mapping=[(group.names[0], "nonexistent", direction)]
        )


def test_invalid_direction_raises(scenario):
    group = scenario.heliostat_groups[0]
    with pytest.raises(ValueError, match="Invalid incident ray direction"):
        scenario.index_mapping(
            group,
            string_mapping=[
                (
                    group.names[0],
                    scenario.solar_tower.names[0],
                    np.array([0.0, 5.0, 0.0, 0.0], np.float32),
                )
            ],
        )


def test_invalid_single_direction_raises(scenario):
    group = scenario.heliostat_groups[0]
    with pytest.raises(ValueError, match="single incident ray direction"):
        scenario.index_mapping(
            group, single_incident_ray_direction=np.array([0.0, 1.0, 0.0, 1.0])
        )


def test_invalid_single_target_raises(scenario):
    group = scenario.heliostat_groups[0]
    with pytest.raises(ValueError, match="single target area index"):
        scenario.index_mapping(
            group,
            single_target_area_index=scenario.solar_tower.number_of_target_areas,
        )


def test_prototype_fallback_diagnostics(tmp_path, caplog):
    """Per-key and per-section fallback diagnostics mirror the reference.

    reference: artist/io/h5_scenario_parser.py:79-371 (per missing deviation
    or actuator-parameter key) and artist/field/heliostat_field.py:154-195
    (whole-section prototype fallback).
    """
    import logging

    import h5py

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

    canting = np.zeros((4, 2, 4), np.float32)
    canting[:, 0, 0] = 0.8
    canting[:, 1, 1] = 0.64
    translations = np.zeros((4, 4), np.float32)
    surface = SurfaceGenerator(
        number_of_control_points=(4, 4)
    ).generate_ideal_surface_config(translations, canting)
    generator = H5ScenarioGenerator(
        file_path=tmp_path / "diag_scenario.h5",
        power_plant_config=PowerPlantConfig(
            power_plant_position=np.array([50.9, 6.4, 87.0])
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
                LightSourceConfig(light_source_key="sun_1", number_of_rays=4)
            ]
        ),
        heliostat_list_config=HeliostatListConfig(
            heliostat_list=[
                HeliostatConfig(
                    name="HELIO_DIAG",
                    heliostat_id=1,
                    position=np.array([10.0, 30.0, 1.7, 1.0]),
                )
            ]
        ),
        prototype_config=PrototypeConfig(
            surface_prototype=surface,
            kinematics_prototype=KinematicsConfig(),
            actuators_prototype=ActuatorListConfig(
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
            ),
        ),
    )
    path = generator.generate_scenario()

    # Remove one deviation key and one actuator parameter from the prototype
    # so the per-key default warnings fire.
    with h5py.File(path, "r+") as f:
        prototypes = f[constants.prototype_key]
        del prototypes[constants.kinematics_prototype_key][
            constants.kinematics_deviations
        ][constants.first_joint_tilt_n]
        del prototypes[constants.actuators_prototype_key]["actuator_0"][
            constants.actuator_parameters_key
        ][constants.actuator_pivot_radius]

    with caplog.at_level(logging.INFO, logger="artist_tpu"):
        load_scenario_from_hdf5(path, number_of_surface_points_per_facet=(4, 4))
    messages = [record.getMessage() for record in caplog.records]
    assert any(
        constants.first_joint_tilt_n in m and "prototype" in m and "default 0" in m
        for m in messages
    ), messages
    assert any(
        constants.actuator_pivot_radius in m and "actuator_0" in m for m in messages
    ), messages
    # Whole-section fallback names the heliostat (log.info, reference:
    # artist/field/heliostat_field.py:159-193).
    for section in ("surface", "kinematics", "actuator"):
        assert any(
            section in m and "HELIO_DIAG" in m and "prototype" in m for m in messages
        ), (section, messages)


def test_broken_actuator_scenarios_raise():
    # Mixed actuator types within one heliostat are invalid for rigid-body
    # kinematics, whether they come from an individual config or the
    # prototype (reference: artist/io/h5_scenario_parser.py).
    for name in (
        "test_broken_scenario_actuator_individual.h5",
        "test_broken_scenario_actuator_prototype.h5",
    ):
        path = SCENARIO_DIR / name
        if not path.exists():
            pytest.skip("broken scenario fixtures not available")
        with pytest.raises(ValueError, match="same type"):
            load_scenario_from_hdf5(path, number_of_surface_points_per_facet=(4, 4))
