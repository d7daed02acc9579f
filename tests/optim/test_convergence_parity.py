"""Two-framework optimizer-convergence parity (BASELINE.md fidelity gate:
"optimizers converge to matching solutions").

The torch reference runs as an oracle on the SAME PAINT calibration data
with the same Adam/scheduler settings; after a fixed number of epochs the
reconstructed parameters must match within tolerance. The alignment-method
kinematics reconstruction is fully deterministic (no ray sampling), so the
trajectories are comparable epoch by epoch.

reference driver: tests/optim/test_kinematics_reconstructor.py and
tests/optim/test_surface_reconstructor.py:219-255.
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

SCENARIO = "test_scenario_paint_four_heliostats_ideal.h5"
MAX_EPOCH = 15
LEARNING_RATE = 2e-4


def _heliostat_data_mapping(field_data_dir) -> list:
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


def _run_tpu(reference_scenario_dir, reference_field_data_dir):
    scenario = load_scenario_from_hdf5(
        reference_scenario_dir / SCENARIO, number_of_surface_points_per_facet=(8, 8)
    )
    configuration = {
        constants.optimization: {
            constants.initial_learning_rate_rotation_deviation: LEARNING_RATE,
            constants.tolerance: 0.0,
            constants.max_epoch: MAX_EPOCH,
            constants.batch_size: 30,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 500,
            constants.early_stopping_window: 500,
        },
        constants.scheduler: {
            constants.scheduler_type: constants.exponential,
            constants.gamma: 0.99,
        },
    }
    reconstructor = KinematicsReconstructor(
        scenario=scenario,
        data={
            constants.data_parser: PaintCalibrationDataParser(),
            constants.heliostat_data_mapping: _heliostat_data_mapping(
                reference_field_data_dir
            ),
        },
        optimization_configuration=configuration,
        reconstruction_method=constants.kinematics_reconstruction_alignment,
        bitmap_resolution=(64, 64),
    )
    _, results = reconstructor.reconstruct_kinematics("angle")
    group_index = next(
        i for i, g in enumerate(scenario.heliostat_groups) if "AA39" in g.names
    )
    heliostat_index = scenario.heliostat_groups[group_index].names.index("AA39")
    deviations = np.asarray(
        scenario.heliostat_groups[group_index].rotation_deviations
    )[heliostat_index]
    history = next(r for r in results if r.group_index == group_index).loss_history
    return deviations, history


def _run_oracle(reference_artist, reference_scenario_dir, reference_field_data_dir):
    import h5py
    import torch
    from artist.io import PaintCalibrationDataParser as OracleParser
    from artist.optim import KinematicsReconstructor as OracleReconstructor
    from artist.optim.loss import AngleLoss
    from artist.scenario import Scenario
    from artist.util import constants as oracle_constants
    from artist.util.env import DdpSetup

    with h5py.File(reference_scenario_dir / SCENARIO) as f:
        scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([8, 8]),
            device=torch.device("cpu"),
        )
    number_of_groups = len(scenario.heliostat_field.heliostat_groups)
    ddp_setup = DdpSetup(
        device=torch.device("cpu"),
        is_distributed=False,
        is_nested=False,
        rank=0,
        world_size=1,
        process_subgroup=None,
        groups_to_ranks_mapping={0: list(range(number_of_groups))},
        heliostat_group_rank=0,
        heliostat_group_world_size=1,
        ranks_to_groups_mapping={g: [0] for g in range(number_of_groups)},
    )
    configuration = {
        oracle_constants.optimization: {
            oracle_constants.initial_learning_rate_rotation_deviation: LEARNING_RATE,
            oracle_constants.tolerance: 0.0,
            oracle_constants.max_epoch: MAX_EPOCH,
            oracle_constants.batch_size: 30,
            oracle_constants.log_step: 0,
            oracle_constants.early_stopping_delta: 1.0,
            oracle_constants.early_stopping_patience: 500,
            oracle_constants.early_stopping_window: 500,
        },
        oracle_constants.scheduler: {
            oracle_constants.scheduler_type: oracle_constants.exponential,
            oracle_constants.gamma: 0.99,
        },
    }
    reconstructor = OracleReconstructor(
        ddp_setup=ddp_setup,
        scenario=scenario,
        data={
            oracle_constants.data_parser: OracleParser(),
            oracle_constants.heliostat_data_mapping: _heliostat_data_mapping(
                reference_field_data_dir
            ),
        },
        optimization_configuration=configuration,
        reconstruction_method=oracle_constants.kinematics_reconstruction_alignment,
        bitmap_resolution=torch.tensor([64, 64]),
    )
    reconstructor.reconstruct_kinematics(
        loss_definition=AngleLoss(), device=torch.device("cpu")
    )
    group = next(
        g
        for g in scenario.heliostat_field.heliostat_groups
        if "AA39" in g.names
    )
    heliostat_index = group.names.index("AA39")
    return group.kinematics.rotation_deviation_parameters.detach().numpy()[
        heliostat_index
    ]


@pytest.mark.slow
def test_kinematics_alignment_convergence_matches_oracle(
    reference_artist, reference_scenario_dir, reference_field_data_dir
):
    """Both frameworks' alignment-method reconstructions converge to the
    same rotation deviations from the same data and hyperparameters."""
    tpu_deviations, history = _run_tpu(
        reference_scenario_dir, reference_field_data_dir
    )
    oracle_deviations = _run_oracle(
        reference_artist, reference_scenario_dir, reference_field_data_dir
    )
    # The optimization moved (otherwise the comparison is vacuous) ...
    assert history[0] > history[-1]
    assert np.abs(tpu_deviations).max() > 0
    # ... and both frameworks agree on the solution.
    np.testing.assert_allclose(tpu_deviations, oracle_deviations, atol=5e-5)
