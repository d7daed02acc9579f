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
