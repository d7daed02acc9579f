"""Broken-scenario and invalid-input error paths.

reference: tests/scenario/test_scenario.py:40-84 with the
test_broken_scenario_actuator_*.h5 fixtures, plus the loader/validator
error paths scattered through the reference's field/scene/optim tests.
The reference ships pre-broken .h5 files; here a valid scenario is
generated once and each test corrupts a copy - same coverage, fixtures
owned by this repo.
"""

import pathlib
import shutil

import h5py
import numpy as np
import pytest

from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

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


# --------------------------------------------------------------------- #
# Generated-and-corrupted fixtures for the remaining loader error paths.


@pytest.fixture(scope="module")
def valid_scenario_path(tmp_path_factory):
    """A tiny valid scenario written by our own generator."""
    from artist_tpu.scenario.h5_generator import H5ScenarioGenerator
    from artist_tpu.scenario.surface_generator import SurfaceGenerator
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
    surface = SurfaceGenerator(
        number_of_control_points=(4, 4)
    ).generate_ideal_surface_config(np.zeros((4, 4), np.float32), canting)
    generator = H5ScenarioGenerator(
        file_path=tmp_path_factory.mktemp("broken") / "valid.h5",
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
                    name="HELIO_1",
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
    return generator.generate_scenario()


@pytest.fixture
def corrupt(valid_scenario_path, tmp_path):
    """Copy the valid scenario and hand the copy to a mutator."""

    def _corrupt(mutator):
        path = tmp_path / "corrupted.h5"
        shutil.copy(valid_scenario_path, path)
        with h5py.File(path, "r+") as f:
            mutator(f)
        return path

    return _corrupt


def _load(path):
    return load_scenario_from_hdf5(path, number_of_surface_points_per_facet=(4, 4))


def test_unknown_kinematics_type_raises(corrupt):
    def mutate(f):
        kinematics = f[constants.prototype_key][constants.kinematics_prototype_key]
        del kinematics[constants.kinematics_type]
        kinematics[constants.kinematics_type] = "hexapod"

    with pytest.raises(ValueError, match="kinematics type: hexapod is not yet"):
        _load(corrupt(mutate))


def test_unknown_actuator_type_raises(corrupt):
    def mutate(f):
        actuators = f[constants.prototype_key][constants.actuators_prototype_key]
        for name in actuators:
            del actuators[name][constants.actuator_type_key]
            actuators[name][constants.actuator_type_key] = "hydraulic"

    with pytest.raises(ValueError, match="actuator type: hydraulic is not yet"):
        _load(corrupt(mutate))


def test_wrong_actuator_count_raises(corrupt):
    def mutate(f):
        actuators = f[constants.prototype_key][constants.actuators_prototype_key]
        del actuators["actuator_1"]

    with pytest.raises(ValueError, match="wrong amount of actuators"):
        _load(corrupt(mutate))


def test_unknown_light_source_type_raises(corrupt):
    def mutate(f):
        lights = f[constants.light_source_key]
        for name in lights:
            del lights[name][constants.light_source_type]
            lights[name][constants.light_source_type] = "laser"

    with pytest.raises(ValueError, match="light source type: laser"):
        _load(corrupt(mutate))


def test_unknown_sun_distribution_raises(corrupt):
    def mutate(f):
        lights = f[constants.light_source_key]
        for name in lights:
            params = lights[name][constants.light_source_distribution_parameters]
            del params[constants.light_source_distribution_type]
            params[constants.light_source_distribution_type] = "uniform"

    with pytest.raises(ValueError, match="sun distribution type"):
        _load(corrupt(mutate))


# --------------------------------------------------------------------- #
# Invalid-input paths outside the loader (reference: scene/optim tests).


def test_rays_shape_validation():
    import jax.numpy as jnp

    from artist_tpu.scene.rays import Rays

    with pytest.raises(ValueError, match="shape"):
        Rays(
            ray_directions=jnp.zeros((2, 3, 5, 4)),
            ray_magnitudes=jnp.zeros((2, 3, 4)),
        )


def test_unknown_reduction_raises():
    import jax.numpy as jnp

    from artist_tpu.optim import losses

    padded = jnp.zeros((1, 1), jnp.int32)
    valid = jnp.ones((1, 1), bool)
    with pytest.raises(ValueError, match="Unknown reduction"):
        losses.reduce_loss_per_heliostat(jnp.zeros(1), padded, valid, "geometric")


def test_unknown_scheduler_type_raises():
    from artist_tpu.optim import training

    with pytest.raises(ValueError, match="Unknown scheduler type"):
        training.make_scheduler(1e-3, {constants.scheduler_type: "warm_restart"})
