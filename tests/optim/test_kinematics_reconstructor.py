"""Kinematics reconstruction on real PAINT calibration data.

reference: tests/optim/test_kinematics_reconstructor.py (the golden tensors
are absent from the snapshot; assertions check loss decrease, parameter
movement, and validation-loss production for both methods).
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.kinematics_reconstructor import KinematicsReconstructor
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

REFERENCE_ROOT = pathlib.Path("/root/reference")
SCENARIO = (
    REFERENCE_ROOT / "tests/data/scenarios/test_scenario_paint_four_heliostats_ideal.h5"
)
FIELD_DATA = REFERENCE_ROOT / "tests/data/field_data"


def _configuration(max_epoch: int) -> dict:
    return {
        constants.optimization: {
            constants.initial_learning_rate_rotation_deviation: 1e-4,
            constants.tolerance: 0.0005,
            constants.max_epoch: max_epoch,
            constants.batch_size: 30,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 5,
            constants.early_stopping_window: 40,
        },
        constants.scheduler: {
            constants.scheduler_type: constants.reduce_on_plateau,
            constants.lr_min: 1e-6,
            constants.reduce_factor: 0.8,
            constants.patience: 10,
            constants.threshold: 1e-4,
            constants.cooldown: 5,
        },
    }


def _data():
    return {
        constants.data_parser: PaintCalibrationDataParser(),
        constants.heliostat_data_mapping: [
            (
                "AA39",
                [
                    FIELD_DATA / f"AA39-calibration-properties_{i}.json"
                    for i in (1, 2, 3)
                ],
                [FIELD_DATA / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
            ),
        ],
    }


def test_kinematics_reconstruction_ragged_sample_counts():
    """Unequal per-heliostat calibration counts must not cross block
    boundaries: each heliostat's loss reduction only sees its own samples.

    AA39 gets 3 samples and AA31 (same rigid_body_linear group) 2 (re-using AA39's measurement files - the
    parser binds files by mapping, not content), so the sample blocks are
    ragged ([0,3) vs [3,5))."""
    if not SCENARIO.exists():
        pytest.skip("reference scenario data not available")
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=(8, 8)
    )
    props = [
        FIELD_DATA / f"AA39-calibration-properties_{i}.json" for i in (1, 2, 3)
    ]
    pngs = [FIELD_DATA / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)]
    data = {
        constants.data_parser: PaintCalibrationDataParser(),
        constants.heliostat_data_mapping: [
            ("AA39", props, pngs),
            ("AA31", props[:2], pngs[:2]),
        ],
    }
    reconstructor = KinematicsReconstructor(
        scenario=scenario,
        data=data,
        optimization_configuration=_configuration(12),
        reconstruction_method=constants.kinematics_reconstruction_alignment,
        bitmap_resolution=(64, 64),
    )
    final_loss, results = reconstructor.reconstruct_kinematics("angle")

    assert len(results) == 1
    active = results[0].active_heliostat_indices
    assert active.shape[0] == 2  # AA39 and AA31 both calibrated
    history = results[0].loss_history
    assert history[-1] < history[0]
    # Identical measurements for both heliostats except the extra AA39 sample:
    # per-heliostat losses must be finite and per-heliostat, not pooled.
    per_heliostat = results[0].final_loss_per_heliostat
    assert per_heliostat.shape == (2,)
    assert np.isfinite(per_heliostat).all()


def test_invalid_method_raises():
    with pytest.raises(ValueError, match="unknown"):
        KinematicsReconstructor(
            scenario=None,
            data={},
            optimization_configuration={
                constants.optimization: {},
                constants.scheduler: {},
            },
            reconstruction_method="invalid",
        )


@pytest.mark.parametrize(
    "method,loss_name,max_epoch",
    [
        (constants.kinematics_reconstruction_alignment, "angle", 25),
        (constants.kinematics_reconstruction_raytracing, "focal_spot", 8),
    ],
)
def test_kinematics_reconstruction(method, loss_name, max_epoch):
    if not SCENARIO.exists():
        pytest.skip("reference scenario data not available")
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=(8, 8)
    )
    originals = [
        np.asarray(g.rotation_deviations).copy() for g in scenario.heliostat_groups
    ]
    reconstructor = KinematicsReconstructor(
        scenario=scenario,
        data=_data(),
        optimization_configuration=_configuration(max_epoch),
        reconstruction_method=method,
        bitmap_resolution=(64, 64),
    )
    final_loss, results = reconstructor.reconstruct_kinematics(loss_name)

    assert len(results) == 1
    history = results[0].loss_history
    assert len(history) >= 2
    assert history[-1] < history[0], f"loss did not decrease: {history}"
    assert set(results[0].test_loss) == {"pixel_loss", "kl_div", "focal_spot_loss"}
    for value in results[0].test_loss.values():
        assert np.isfinite(value).all()

    group_index = results[0].group_index
    updated = np.asarray(
        scenario.heliostat_groups[group_index].rotation_deviations
    )
    active = results[0].active_heliostat_indices
    assert not np.allclose(updated[active], originals[group_index][active])
    inactive = np.setdiff1d(np.arange(updated.shape[0]), active)
    np.testing.assert_allclose(
        updated[inactive], originals[group_index][inactive], atol=1e-7
    )
