"""Broken-scenario error paths.

reference: tests/scenario/test_scenario.py:40-84 with the reference's
test_broken_scenario_actuator_*.h5 fixtures.
"""

import pathlib

import pytest

from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIOS = pathlib.Path("/root/reference/tests/data/scenarios")


def test_broken_prototype_actuators_raise():
    with pytest.raises(ValueError) as exc_info:
        load_scenario_from_hdf5(
            SCENARIOS / "test_broken_scenario_actuator_prototype.h5",
            number_of_surface_points_per_facet=(10, 10),
        )
    assert "Prototype actuators must all have the same type." in str(exc_info.value)


def test_broken_individual_actuators_raise():
    with pytest.raises(ValueError) as exc_info:
        load_scenario_from_hdf5(
            SCENARIOS / "test_broken_scenario_actuator_individual.h5",
            number_of_surface_points_per_facet=(10, 10),
        )
    assert (
        "When using the rigid body kinematics, all actuators for a given "
        "heliostat must have the same type." in str(exc_info.value)
    )
