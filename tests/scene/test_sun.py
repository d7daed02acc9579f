"""Sun light-source model: distribution statistics and HDF5 load parity.

reference: artist/scene/sun.py:41-234.
"""

import pathlib

import numpy as np
import pytest

import jax

from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

SCENARIO = pathlib.Path(
    "/root/reference/tests/data/scenarios/test_scenario_paint_single_heliostat.h5"
)


@pytest.fixture(scope="module")
def sun():
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=(4, 4)
    )
    return scenario.light_sources[0]


def test_distortion_shapes(sun):
    du, de = sun.get_distortions(jax.random.PRNGKey(7), 16, 3)
    assert du.shape == (3, sun.number_of_rays, 16)
    assert de.shape == du.shape


def test_distortion_statistics_match_distribution(sun):
    """Samples must follow the configured Gaussian (cov 4.3681e-06 rad^2,
    reference: artist/scene/sun.py:43)."""
    du, de = sun.get_distortions(jax.random.PRNGKey(0), 2000, 4)
    samples = np.concatenate([np.asarray(du).ravel(), np.asarray(de).ravel()])
    expected_var = float(
        np.asarray(
            sun.distribution_parameters[constants.light_source_covariance]
        ).ravel()[0]
    )
    assert abs(samples.mean()) < 3 * np.sqrt(expected_var / samples.size) * 2
    np.testing.assert_allclose(samples.var(), expected_var, rtol=0.05)


def test_distortions_are_deterministic(sun):
    a = sun.get_distortions(jax.random.PRNGKey(7), 8, 2)
    b = sun.get_distortions(jax.random.PRNGKey(7), 8, 2)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = sun.get_distortions(jax.random.PRNGKey(8), 8, 2)
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_distribution_parameters_match_reference(reference_artist):
    import h5py
    import torch
    from artist.scenario import Scenario

    with h5py.File(SCENARIO) as f:
        ref_scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([4, 4]),
            device=torch.device("cpu"),
        )
    ref_sun = ref_scenario.light_sources.light_source_list[0]

    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=(4, 4)
    )
    sun = scenario.light_sources[0]
    assert sun.number_of_rays == ref_sun.number_of_rays
    ref_cov = ref_sun.distribution_parameters["covariance"]
    cov = np.asarray(sun.distribution_parameters[constants.light_source_covariance])
    np.testing.assert_allclose(
        np.unique(np.round(cov.ravel(), 12)).max(),
        float(np.asarray(ref_cov).ravel().max()) if hasattr(ref_cov, "ravel")
        else float(ref_cov),
        rtol=1e-6,
    )
