"""Flux bitmap post-processing parity vs the torch reference.

reference: tests/flux/ and artist/flux/bitmap.py:12-246.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.flux import bitmap as ours


@pytest.fixture(scope="module")
def torch_bitmap(reference_artist):
    from artist.flux import bitmap

    return bitmap


def _random_bitmaps(num=3, height=32, width=40):
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:height, 0:width]
    centers = rng.uniform(0.2, 0.8, size=(num, 2))
    return np.exp(
        -(
            (xx[None] / width - centers[:, :1, None]) ** 2
            + (yy[None] / height - centers[:, 1:, None]) ** 2
        )
        / 0.01
    ).astype(np.float32)


def test_center_of_mass_matches(torch_bitmap):
    import torch

    flux = _random_bitmaps()
    theirs = torch_bitmap.get_center_of_mass(
        torch.from_numpy(flux), device=torch.device("cpu")
    ).numpy()
    mine = np.asarray(ours.get_center_of_mass(jnp.asarray(flux)))
    np.testing.assert_allclose(mine, theirs, atol=1e-4)


def test_trapezoid_distribution_matches(torch_bitmap):
    import torch

    for total, slope, plateau in [(64, 10, 20), (33, 0, 11), (16, 4, 4)]:
        theirs = torch_bitmap.trapezoid_distribution(
            total_width=total,
            slope_width=slope,
            plateau_width=plateau,
            device=torch.device("cpu"),
        ).numpy()
        mine = np.asarray(ours.trapezoid_distribution(total, slope, plateau))
        np.testing.assert_allclose(mine, theirs, atol=1e-6)


def test_crop_matches_reference(torch_bitmap, reference_artist):
    """Differentiable affine crop vs torch grid_sample on a real tower."""
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

    flux = _random_bitmaps(num=4, height=48, width=48)
    target_indices = np.array([0, 1, 2, 3], dtype=np.int32)
    theirs = torch_bitmap.crop_flux_distributions_around_center(
        flux_distributions=torch.from_numpy(flux),
        solar_tower=ref_tower,
        target_area_indices=torch.from_numpy(target_indices).long(),
        device=torch.device("cpu"),
    ).numpy()
    mine = np.asarray(
        ours.crop_flux_distributions_around_center(
            jnp.asarray(flux), tower, jnp.asarray(target_indices)
        )
    )
    atol = max(1e-4, 0.01 * float(np.abs(theirs).mean()))
    np.testing.assert_allclose(mine, theirs, rtol=0.01, atol=atol)
