"""Coordinate conversion parity vs the torch reference.

reference: tests/geometry/ and artist/geometry/coordinates.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.geometry import coordinates as ours


@pytest.fixture(scope="module")
def torch_coordinates(reference_artist):
    from artist.geometry import coordinates

    return coordinates


def test_wgs84_to_enu_matches(torch_coordinates):
    import torch

    reference_point = np.array([50.913421122592574, 6.387824755874856, 87.0])
    coords = np.array(
        [
            [50.913643297719794, 6.3880132701249455, 88.68894196],
            [50.91339203683997, 6.387824563513243, 130.09766666666667],
            [50.92, 6.39, 95.0],
        ]
    )
    theirs = torch_coordinates.convert_wgs84_coordinates_to_local_enu(
        torch.tensor(coords, dtype=torch.float64),
        torch.tensor(reference_point, dtype=torch.float64),
        device=torch.device("cpu"),
    ).numpy()
    mine = ours.convert_wgs84_coordinates_to_local_enu(coords, reference_point)
    np.testing.assert_allclose(mine, theirs, atol=1e-3)


def test_azimuth_elevation_to_enu_matches(torch_coordinates):
    import torch

    azimuth = np.array([0.0, 45.0, 90.0, 180.0, 270.0])
    elevation = np.array([10.0, 30.0, 45.0, 60.0, 89.0])
    theirs = torch_coordinates.azimuth_elevation_to_enu(
        azimuth=torch.tensor(azimuth),
        elevation=torch.tensor(elevation),
        degree=True,
        device=torch.device("cpu"),
    ).numpy()
    mine = np.asarray(ours.azimuth_elevation_to_enu(azimuth, elevation, degree=True))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_3d_to_4d_conversions(torch_coordinates):
    import torch

    points = np.random.RandomState(0).rand(5, 3).astype(np.float32)
    theirs_points = torch_coordinates.convert_3d_points_to_4d_format(
        torch.from_numpy(points), device=torch.device("cpu")
    ).numpy()
    theirs_dirs = torch_coordinates.convert_3d_directions_to_4d_format(
        torch.from_numpy(points), device=torch.device("cpu")
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(ours.convert_3d_points_to_4d_format(jnp.asarray(points))),
        theirs_points,
    )
    np.testing.assert_allclose(
        np.asarray(ours.convert_3d_directions_to_4d_format(jnp.asarray(points))),
        theirs_dirs,
    )


def test_normalize_points_matches(torch_coordinates):
    import torch

    points = np.random.RandomState(1).randn(20, 2).astype(np.float32) * 3
    theirs = torch_coordinates.normalize_points(torch.from_numpy(points)).numpy()
    mine = np.asarray(ours.normalize_points(jnp.asarray(points)))
    np.testing.assert_allclose(mine, theirs, atol=1e-6)
    assert (mine > 0).all() and (mine < 1).all()


def test_bitmap_to_target_coordinates_matches(torch_coordinates, reference_artist):
    import h5py
    import torch
    from artist.field.solar_tower import SolarTower as RefTower

    from artist_tpu.scenario.scenario import _load_solar_tower

    scenario_path = (
        "/root/reference/tests/data/scenarios/test_scenario_paint_single_heliostat.h5"
    )
    with h5py.File(scenario_path) as f:
        ref_tower = RefTower.from_hdf5(config_file=f, device=torch.device("cpu"))
        tower = _load_solar_tower(f)

    resolution = (64, 64)
    bitmap_coords = np.array(
        [[10.0, 20.0], [31.5, 31.5], [5.25, 60.75], [40.0, 12.0]], np.float32
    )
    target_indices = np.array([0, 1, 3, 2], dtype=np.int32)
    theirs = torch_coordinates.bitmap_coordinates_to_target_coordinates(
        bitmap_coordinates=torch.from_numpy(bitmap_coords),
        bitmap_resolution=torch.tensor(list(resolution)),
        solar_tower=ref_tower,
        target_area_indices=torch.from_numpy(target_indices).long(),
        device=torch.device("cpu"),
    ).numpy()
    mine = np.asarray(
        ours.bitmap_coordinates_to_target_coordinates(
            jnp.asarray(bitmap_coords), resolution, tower, jnp.asarray(target_indices)
        )
    )
    np.testing.assert_allclose(mine, theirs, atol=1e-4)
