"""PAINT calibration-parser unit + parity tests on real field data.

reference: artist/io/paint_calibration_parser.py:43-313 (the reference has
no dedicated parser unit test; here every parsed field compares against the
torch reference as an oracle, plus analytic checks against the raw JSON).
"""

import json

import numpy as np
import pytest

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = "test_scenario_paint_four_heliostats_ideal.h5"


def _mapping(field_data_dir):
    return [
        (
            "AA39",
            [
                field_data_dir / f"AA39-calibration-properties_{i}.json"
                for i in (1, 2, 3)
            ],
            [field_data_dir / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
        ),
    ]


@pytest.fixture(scope="module")
def parsed(reference_scenario_dir, reference_field_data_dir):
    scenario = load_scenario_from_hdf5(
        reference_scenario_dir / SCENARIO, number_of_surface_points_per_facet=(4, 4)
    )
    group = next(
        g for g in scenario.heliostat_groups if "AA39" in g.names
    )
    parser = PaintCalibrationDataParser()
    data = parser.parse_data_for_reconstruction(
        heliostat_data_mapping=_mapping(reference_field_data_dir),
        heliostat_names=group.names,
        target_name_to_index=scenario.solar_tower.target_name_to_index,
        power_plant_position=scenario.power_plant_position,
        bitmap_resolution=(64, 64),
    )
    return scenario, group, data


class TestAnalytic:
    def test_motor_positions_match_raw_json(self, parsed, reference_field_data_dir):
        _, _, data = parsed
        expected = []
        for i in (1, 2, 3):
            with open(
                reference_field_data_dir / f"AA39-calibration-properties_{i}.json"
            ) as f:
                raw = json.load(f)
            expected.append(
                [
                    raw["motor_position"]["axis_1_motor_position"],
                    raw["motor_position"]["axis_2_motor_position"],
                ]
            )
        np.testing.assert_array_equal(data.motor_positions, np.asarray(expected))

    def test_incident_ray_directions_are_unit_down_range(self, parsed):
        _, _, data = parsed
        norms = np.linalg.norm(data.incident_ray_directions[:, :3], axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        np.testing.assert_array_equal(data.incident_ray_directions[:, 3], 0.0)
        # The sun is above the horizon: incident rays point downward.
        assert np.all(data.incident_ray_directions[:, 2] < 0)

    def test_mask_counts_and_target_indices(
        self, parsed, reference_field_data_dir
    ):
        scenario, group, data = parsed
        index = group.names.index("AA39")
        expected_mask = np.zeros(len(group.names), np.int32)
        expected_mask[index] = 3
        np.testing.assert_array_equal(data.active_heliostats_mask, expected_mask)
        expected_targets = []
        for i in (1, 2, 3):
            with open(
                reference_field_data_dir / f"AA39-calibration-properties_{i}.json"
            ) as f:
                raw = json.load(f)
            expected_targets.append(
                scenario.solar_tower.target_name_to_index[raw["target_name"]]
            )
        np.testing.assert_array_equal(data.target_area_indices, expected_targets)

    def test_flux_bitmaps_loaded_and_nonnegative(self, parsed):
        _, _, data = parsed
        assert data.flux_measured.shape == (3, 64, 64)
        assert np.all(data.flux_measured >= 0)
        assert data.flux_measured.sum() > 0


class TestOracleParity:
    def test_all_fields_match_reference_parser(
        self, reference_artist, reference_scenario_dir, reference_field_data_dir, parsed
    ):
        import h5py
        import torch
        from artist.io import PaintCalibrationDataParser as OracleParser
        from artist.scenario import Scenario as OracleScenario

        with h5py.File(reference_scenario_dir / SCENARIO) as f:
            oracle_scenario = OracleScenario.load_scenario_from_hdf5(
                scenario_file=f,
                number_of_surface_points_per_facet=torch.tensor([4, 4]),
                device=torch.device("cpu"),
            )
        oracle_group = next(
            g
            for g in oracle_scenario.heliostat_field.heliostat_groups
            if "AA39" in g.names
        )
        (
            oracle_flux,
            oracle_focal_spots,
            oracle_incident,
            oracle_motors,
            oracle_mask,
            oracle_targets,
        ) = OracleParser().parse_data_for_reconstruction(
            heliostat_data_mapping=_mapping(reference_field_data_dir),
            heliostat_group=oracle_group,
            scenario=oracle_scenario,
            bitmap_resolution=torch.tensor([64, 64]),
            device=torch.device("cpu"),
        )
        _, _, data = parsed
        np.testing.assert_array_equal(
            data.active_heliostats_mask, oracle_mask.numpy()
        )
        np.testing.assert_array_equal(
            data.target_area_indices, oracle_targets.numpy()
        )
        np.testing.assert_allclose(
            data.motor_positions, oracle_motors.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            data.focal_spots, oracle_focal_spots.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            data.incident_ray_directions, oracle_incident.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            data.flux_measured, oracle_flux.numpy(), atol=1e-5
        )
