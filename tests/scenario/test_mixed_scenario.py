"""Mixed individual/prototype, multi-group scenario loading parity.

The mix scenario combines ideal- and deflectometry-surface heliostats with
individual and prototype kinematics/actuators, producing TWO heliostat
groups (rigid_body x {ideal, linear}).
reference: artist/field/heliostat_field.py:80-435 (prototype fallback and
grouping), artist/io/h5_scenario_parser.py:79-723.
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = pathlib.Path(
    "/root/reference/tests/data/scenarios/"
    "test_scenario_paint_mix_ideal_prototype_deflectometry.h5"
)
POINTS = (8, 8)


@pytest.fixture(scope="module")
def scenarios(reference_artist):
    import h5py
    import torch
    from artist.scenario import Scenario

    ours = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=POINTS
    )
    with h5py.File(SCENARIO) as f:
        theirs = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(list(POINTS)),
            device=torch.device("cpu"),
        )
    return ours, theirs


def test_group_structure_matches(scenarios):
    ours, theirs = scenarios
    assert len(ours.heliostat_groups) == len(theirs.heliostat_field.heliostat_groups)
    for mine, ref in zip(ours.heliostat_groups, theirs.heliostat_field.heliostat_groups):
        assert list(mine.names) == list(ref.names)
        assert mine.surface_points.shape == tuple(ref.surface_points.shape)


def test_group_tensors_match(scenarios):
    ours, theirs = scenarios
    for mine, ref in zip(ours.heliostat_groups, theirs.heliostat_field.heliostat_groups):
        np.testing.assert_allclose(
            np.asarray(mine.positions), ref.positions.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mine.surface_points), ref.surface_points.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mine.surface_normals), ref.surface_normals.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(mine.translation_deviations),
            ref.kinematics.translation_deviation_parameters.numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mine.rotation_deviations),
            ref.kinematics.rotation_deviation_parameters.numpy(),
            atol=1e-6,
        )
