"""Tower target-area unit tests.

reference: tests/field/test_tower_target_areas_planar.py,
tests/field/test_tower_target_areas_cylindrical.py (the reference mocks its
HDF5; here real scenario files load and the parsed arrays compare against
the torch reference as an oracle), plus analytic center-offset checks.
"""

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from artist_tpu.field.solar_tower import SolarTower, get_centers_of_target_areas
from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = "test_scenario_paint_four_heliostats.h5"


@pytest.fixture
def synthetic_tower() -> SolarTower:
    return SolarTower(
        planar_centers=jnp.asarray([[1.0, -3.0, 45.0, 1.0]], jnp.float32),
        planar_normals=jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
        planar_dimensions=jnp.asarray([[8.0, 6.0]], jnp.float32),
        cylindrical_centers=jnp.asarray([[0.0, 0.0, 30.0, 1.0]], jnp.float32),
        cylindrical_axes=jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32),
        cylindrical_normals=jnp.asarray([[0.0, -1.0, 0.0, 0.0]], jnp.float32),
        cylindrical_radii=jnp.asarray([4.0], jnp.float32),
        cylindrical_heights=jnp.asarray([6.0], jnp.float32),
        cylindrical_opening_angles=jnp.asarray([np.pi], jnp.float32),
        planar_names=("receiver",),
        cylindrical_names=("cylinder",),
    )


class TestSyntheticTower:
    def test_counts_and_name_index(self, synthetic_tower):
        assert synthetic_tower.number_of_planar_target_areas == 1
        assert synthetic_tower.number_of_cylindrical_target_areas == 1
        assert synthetic_tower.number_of_target_areas == 2
        # Planar-first global indexing (reference: solar_tower.py:115-130).
        assert synthetic_tower.target_name_to_index == {"receiver": 0, "cylinder": 1}

    def test_planar_center_is_returned_directly(self, synthetic_tower):
        centers = get_centers_of_target_areas(
            synthetic_tower, jnp.asarray([0], jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(centers), [[1.0, -3.0, 45.0, 1.0]], atol=1e-6
        )

    def test_cylindrical_center_offsets_by_radius_along_normal(self, synthetic_tower):
        """Aim point sits ON the curved surface facing the field
        (reference: artist/field/solar_tower.py:129-188)."""
        centers = get_centers_of_target_areas(
            synthetic_tower, jnp.asarray([1], jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(centers), [[0.0, -4.0, 30.0, 1.0]], atol=1e-6
        )

    def test_mixed_index_batch(self, synthetic_tower):
        centers = get_centers_of_target_areas(
            synthetic_tower, jnp.asarray([1, 0, 1], jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(centers),
            [[0.0, -4.0, 30.0, 1.0], [1.0, -3.0, 45.0, 1.0], [0.0, -4.0, 30.0, 1.0]],
            atol=1e-6,
        )


class TestScenarioTowerParity:
    """Parsed tower arrays match the torch reference loader on real files."""

    def test_planar_target_areas_match_oracle(
        self, reference_artist, reference_scenario_dir
    ):
        import torch

        with h5py.File(reference_scenario_dir / SCENARIO) as f:
            oracle = reference_artist.scenario.Scenario.load_scenario_from_hdf5(
                scenario_file=f,
                number_of_surface_points_per_facet=torch.tensor([4, 4]),
                device=torch.device("cpu"),
            )
        scenario = load_scenario_from_hdf5(
            reference_scenario_dir / SCENARIO,
            number_of_surface_points_per_facet=(4, 4),
        )
        tower = scenario.solar_tower
        oracle_tower = oracle.solar_tower

        assert tower.target_name_to_index == oracle_tower.target_name_to_index
        oracle_planar = next(
            areas
            for areas in oracle_tower.target_areas
            if type(areas).__name__ == "TowerTargetAreasPlanar"
        )
        assert list(tower.planar_names) == list(oracle_planar.names)
        np.testing.assert_allclose(
            np.asarray(tower.planar_centers),
            oracle_planar.centers.detach().numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(tower.planar_normals),
            oracle_planar.normals.detach().numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(tower.planar_dimensions),
            oracle_planar.dimensions.detach().numpy(),
            atol=1e-5,
        )

    def test_aim_point_centers_match_oracle(
        self, reference_artist, reference_scenario_dir
    ):
        import torch

        with h5py.File(reference_scenario_dir / SCENARIO) as f:
            oracle = reference_artist.scenario.Scenario.load_scenario_from_hdf5(
                scenario_file=f,
                number_of_surface_points_per_facet=torch.tensor([4, 4]),
                device=torch.device("cpu"),
            )
        scenario = load_scenario_from_hdf5(
            reference_scenario_dir / SCENARIO,
            number_of_surface_points_per_facet=(4, 4),
        )
        n = scenario.solar_tower.number_of_target_areas
        indices_all = jnp.arange(n, dtype=jnp.int32)
        centers = get_centers_of_target_areas(scenario.solar_tower, indices_all)
        oracle_centers = oracle.solar_tower.get_centers_of_target_areas(
            target_area_indices=torch.arange(n), device=torch.device("cpu")
        )
        np.testing.assert_allclose(
            np.asarray(centers), oracle_centers.detach().numpy(), atol=1e-5
        )
