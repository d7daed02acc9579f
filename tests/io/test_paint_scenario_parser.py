"""PAINT scenario parser vs the torch reference parser (oracle).

reference: tests/io/test_paint_scenario_parser.py. The torch reference's
parsers run on the same PAINT JSON fixtures; outputs must agree.
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.io import paint_scenario_parser as ours

FIELD_DATA = pathlib.Path("/root/reference/tests/data/field_data")
TOWER_FILE = FIELD_DATA / "tower-measurements.json"
HELIOSTAT_FILE = FIELD_DATA / "AA39-heliostat-properties.json"


@pytest.fixture(scope="module")
def reference_parsers(reference_artist):
    from artist.io import paint_scenario_parser

    return paint_scenario_parser


def test_tower_measurements_match_reference(reference_parsers):
    if not TOWER_FILE.exists():
        pytest.skip("tower measurement data not available")
    import torch

    power_plant, planar, cylindrical = ours.extract_paint_tower_measurements(
        TOWER_FILE
    )
    ref_power_plant, ref_planar, ref_cylindrical = (
        reference_parsers.extract_paint_tower_measurements(
            TOWER_FILE, device=torch.device("cpu")
        )
    )
    np.testing.assert_allclose(
        power_plant.power_plant_position,
        ref_power_plant.power_plant_position.numpy(),
    )
    ref_planar_list = ref_planar.target_area_list
    assert len(planar) == len(ref_planar_list)
    for config, reference in zip(planar, ref_planar_list):
        assert config.target_area_key == reference.target_area_key
        np.testing.assert_allclose(
            config.center, reference.center.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.ravel(config.normal_vector),
            np.ravel(reference.normal_vector.numpy()),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            config.plane_e, float(reference.plane_e), rtol=1e-5
        )
        np.testing.assert_allclose(
            config.plane_u, float(reference.plane_u), rtol=1e-5
        )
    ref_cyl_list = ref_cylindrical.target_area_list
    assert len(cylindrical) == len(ref_cyl_list)
    for config, reference in zip(cylindrical, ref_cyl_list):
        np.testing.assert_allclose(
            config.center, reference.center.numpy(), atol=1e-3
        )
        np.testing.assert_allclose(
            config.axis, reference.axis.numpy(), atol=1e-6
        )
        np.testing.assert_allclose(config.radius, float(reference.radius))
        np.testing.assert_allclose(
            config.height, float(reference.height), rtol=1e-4
        )
        np.testing.assert_allclose(
            config.opening_angle, float(reference.opening_angle), rtol=1e-6
        )


def test_heliostat_properties_match_reference(reference_parsers):
    if not HELIOSTAT_FILE.exists():
        pytest.skip("heliostat properties data not available")
    import torch

    power_plant_position = np.asarray(
        [50.913421122592574, 6.387824755874856, 87.0]
    )
    (
        position,
        translations,
        canting,
        deviations,
        initial_orientation,
        actuators,
    ) = ours.extract_paint_heliostat_properties(HELIOSTAT_FILE, power_plant_position)
    (
        ref_position,
        ref_translations,
        ref_canting,
        ref_deviations,
        ref_initial_orientation,
        ref_actuators,
    ) = reference_parsers.extract_paint_heliostat_properties(
        heliostat_properties_path=HELIOSTAT_FILE,
        power_plant_position=torch.tensor(power_plant_position),
        device=torch.device("cpu"),
    )
    np.testing.assert_allclose(position, ref_position.numpy(), atol=1e-4)
    np.testing.assert_allclose(translations, ref_translations.numpy(), atol=1e-6)
    np.testing.assert_allclose(canting, ref_canting.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        initial_orientation, ref_initial_orientation.numpy(), atol=1e-6
    )
    assert deviations.concentrator_translation_n == pytest.approx(
        float(ref_deviations.concentrator_translation_n)
    )
    assert len(actuators) == len(ref_actuators)
    for (a_type, clockwise, min_max, params), reference in zip(
        actuators, ref_actuators
    ):
        assert a_type == reference[0]
        assert clockwise == bool(reference[1])
        np.testing.assert_allclose(min_max, np.asarray(reference[2]))
        np.testing.assert_allclose(
            params.increment, float(reference[3].increment), rtol=1e-6
        )
        np.testing.assert_allclose(
            params.initial_angle, float(reference[3].initial_angle), rtol=1e-6
        )


def test_ideal_surface_heliostats_build():
    if not HELIOSTAT_FILE.exists():
        pytest.skip("heliostat properties data not available")
    power_plant_position = np.asarray(
        [50.913421122592574, 6.387824755874856, 87.0]
    )
    heliostats, prototype = ours.extract_paint_heliostats_ideal_surface(
        [("AA39", HELIOSTAT_FILE)],
        power_plant_position,
        number_of_nurbs_control_points=(6, 6),
    )
    assert len(heliostats.heliostat_list) == 1
    config = heliostats.heliostat_list[0]
    assert config.name == "AA39"
    assert len(config.surface.facet_list) == 4
    for facet in config.surface.facet_list:
        assert facet.control_points.shape == (6, 6, 3)
        np.testing.assert_allclose(facet.control_points[..., 2], 0.0)
    assert len(prototype.actuators_prototype.actuator_list) == 2


def test_build_heliostat_data_mapping(tmp_path):
    calibration_dir = tmp_path / "AA39" / "Calibration"
    calibration_dir.mkdir(parents=True)
    for i in range(3):
        (calibration_dir / f"{i}-calibration-properties.json").write_text("{}")
        (calibration_dir / f"{i}-flux-centered.png").write_bytes(b"")
    mapping = ours.build_heliostat_data_mapping(
        tmp_path, ["AA39", "MISSING"], 2, "flux-centered", randomize=False
    )
    assert len(mapping) == 1
    name, properties, images = mapping[0]
    assert name == "AA39"
    assert len(properties) == 2
    assert len(images) == 2
    assert all(p.name.endswith("calibration-properties.json") for p in properties)
