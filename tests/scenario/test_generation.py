"""Scenario generation: H5 writer round-trip, surface generator, STRAL ingest.

reference: tests/scenario/ and artist/scenario/h5_scenario_generator.py.
The strongest check: a scenario written by our generator loads in BOTH
frameworks with matching surface geometry.
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.io.stral import extract_stral_deflectometry_data
from artist_tpu.scenario import load_scenario_from_hdf5
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

# The reference's STRAL fixture (tests/data/field_data/test_stral_data.binp)
# is absent from the snapshot; synthesize a binary with the same layout
# (reference: artist/io/stral_scenario_parser.py:15-132) instead.


def _write_synthetic_stral(path: pathlib.Path) -> pathlib.Path:
    import struct

    header = struct.Struct("=5f2I2f")
    facet_header = struct.Struct("=i9fI")
    rng = np.random.RandomState(7)
    with open(path, "wb") as f:
        f.write(header.pack(1.0, 2.0, 3.0, 4.0, 5.0, 2, 2, 0.1, 0.2))
        for i, (sign_e, sign_n) in enumerate([(-1, 1), (1, 1), (-1, -1), (1, -1)]):
            translation = (sign_e * 0.8075, sign_n * 0.6425, 0.0402)
            canting_e = (0.8025, 0.0, -sign_e * 4.98e-3)
            canting_n = (0.0, 0.6375, -sign_n * 3.15e-3)
            n_points = 20000 + 500 * i  # deliberately unequal per facet
            f.write(
                facet_header.pack(i, *translation, *canting_e, *canting_n, n_points)
            )
            e = rng.uniform(-0.8, 0.8, n_points).astype(np.float32)
            n = rng.uniform(-0.64, 0.64, n_points).astype(np.float32)
            # Gentle paraboloid: z = (e^2 + n^2) / (4 * focal_length).
            z = ((e**2 + n**2) / (4 * 50.0)).astype(np.float32)
            nx, ny = -e / (2 * 50.0), -n / (2 * 50.0)
            norm = np.sqrt(nx**2 + ny**2 + 1.0)
            records = np.stack(
                [e, n, z, nx / norm, ny / norm, 1.0 / norm, np.zeros_like(e)],
                axis=1,
            ).astype(np.float32)
            f.write(records.tobytes())
    return path


def _make_generator(tmp_path, surface_config):
    power_plant = PowerPlantConfig(
        power_plant_position=np.array([50.91342, 6.38782, 87.0])
    )
    target = TargetAreaPlanarConfig(
        target_area_key="receiver",
        center=np.array([0.0, -3.0, 45.0, 1.0]),
        normal_vector=np.array([0.0, 1.0, 0.0, 0.0]),
        plane_e=8.0,
        plane_u=7.0,
    )
    light = LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(light_source_key="sun_1", number_of_rays=10)
        ]
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
    prototype = PrototypeConfig(
        surface_prototype=surface_config,
        kinematics_prototype=KinematicsConfig(),
        actuators_prototype=actuators,
    )
    heliostats = HeliostatListConfig(
        heliostat_list=[
            HeliostatConfig(
                name="HELIO_1",
                heliostat_id=1,
                position=np.array([10.0, 30.0, 1.7, 1.0]),
            )
        ]
    )
    return H5ScenarioGenerator(
        file_path=tmp_path / "generated_scenario.h5",
        power_plant_config=power_plant,
        target_area_list_planar_config=[target],
        target_area_list_cylindrical_config=[],
        light_source_list_config=light,
        heliostat_list_config=heliostats,
        prototype_config=prototype,
    )


@pytest.fixture(scope="module")
def stral_file(tmp_path_factory):
    return _write_synthetic_stral(
        tmp_path_factory.mktemp("stral") / "synthetic_stral.binp"
    )


@pytest.fixture(scope="module")
def stral_surface_config(stral_file):
    translations, canting, points, normals = extract_stral_deflectometry_data(
        stral_file
    )
    generator = SurfaceGenerator(number_of_control_points=(6, 6))
    return generator.generate_fitted_surface_config(
        heliostat_name="HELIO_1",
        facet_translation_vectors=translations,
        canting=canting,
        surface_points_with_facets_list=points,
        surface_normals_with_facets_list=normals,
        deflectometry_step_size=500,
        max_epoch=40,
    )


def test_stral_parser_shapes(stral_file):
    translations, canting, points, normals = extract_stral_deflectometry_data(
        stral_file
    )
    num_facets = translations.shape[0]
    assert num_facets >= 1
    assert canting.shape == (num_facets, 2, 4)
    assert len(points) == num_facets
    for p, n in zip(points, normals):
        assert p.shape == n.shape
        assert p.shape[1] == 3
        # Normals should be approximately unit length and mostly upward.
        lengths = np.linalg.norm(n, axis=1)
        np.testing.assert_allclose(lengths, 1.0, atol=1e-2)
        assert (n[:, 2] > 0.9).mean() > 0.99


def test_generated_scenario_roundtrip(tmp_path, stral_surface_config):
    generator = _make_generator(tmp_path, stral_surface_config)
    path = generator.generate_scenario()
    scenario = load_scenario_from_hdf5(path, number_of_surface_points_per_facet=(6, 6))
    assert scenario.number_of_heliostat_groups == 1
    group = scenario.heliostat_groups[0]
    assert group.names == ("HELIO_1",)
    assert group.number_of_facets_per_heliostat == len(
        stral_surface_config.facet_list
    )
    assert np.isfinite(np.asarray(group.surface_points)).all()
    assert scenario.solar_tower.planar_names == ("receiver",)
    assert scenario.light_sources[0].number_of_rays == 10


def test_generated_scenario_loads_in_reference(
    tmp_path, stral_surface_config, reference_artist
):
    """Cross-framework schema compatibility: our .h5 loads in torch ARTIST."""
    import h5py
    import torch
    from artist.scenario import Scenario

    generator = _make_generator(tmp_path, stral_surface_config)
    path = generator.generate_scenario()
    with h5py.File(path) as f:
        reference_scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([6, 6]),
            device=torch.device("cpu"),
        )
    ours = load_scenario_from_hdf5(path, number_of_surface_points_per_facet=(6, 6))
    ref_group = reference_scenario.heliostat_field.heliostat_groups[0]
    our_group = ours.heliostat_groups[0]
    np.testing.assert_allclose(
        np.asarray(our_group.surface_points),
        ref_group.surface_points.detach().numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(our_group.nurbs_control_points),
        ref_group.nurbs_control_points.detach().numpy(),
        atol=1e-6,
    )


def test_fitted_surface_approximates_deflectometry(stral_surface_config, stral_file):
    """The fitted NURBS should reproduce the measured normals closely."""
    _, _, points, normals = extract_stral_deflectometry_data(stral_file)
    from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces

    control_points = np.stack(
        [f.control_points for f in stral_surface_config.facet_list]
    )
    translations = np.stack(
        [f.translation_vector for f in stral_surface_config.facet_list]
    )
    # Remove the facet translation again: the fit itself was centered.
    control_points = control_points - translations[:, None, None, :3]
    _, fitted_normals = evaluate_nurbs_surfaces(
        jnp.asarray(control_points[None]),
        (3, 3),
        create_nurbs_evaluation_grid((12, 12)),
    )
    mean_measured = np.stack([n.mean(axis=0) for n in normals])
    mean_fitted = np.asarray(fitted_normals[0]).mean(axis=1)[:, :3]
    # Mean normals agree to ~1e-3 per component after a short fit.
    np.testing.assert_allclose(mean_fitted, mean_measured, atol=5e-3)


def test_unequal_facet_numbers_rejected(tmp_path, stral_surface_config):
    from artist_tpu.util.config import SurfaceConfig

    generator_config = _make_generator(tmp_path, stral_surface_config)
    heliostat = generator_config.heliostat_list_config.heliostat_list[0]
    heliostat.surface = SurfaceConfig(
        facet_list=stral_surface_config.facet_list[:1]
    )
    with pytest.raises(ValueError, match="same number of facets"):
        H5ScenarioGenerator(
            file_path=tmp_path / "bad.h5",
            power_plant_config=generator_config.power_plant_config,
            target_area_list_planar_config=generator_config.target_area_list_planar_config,
            target_area_list_cylindrical_config=[],
            light_source_list_config=generator_config.light_source_list_config,
            heliostat_list_config=generator_config.heliostat_list_config,
            prototype_config=generator_config.prototype_config,
        )
