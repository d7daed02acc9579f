"""Surface reconstruction on real PAINT calibration data.

The reference's golden tensors (tests/data/expected_test_data.pt) are absent
from the snapshot, so assertions follow the reference's secondary checks
(reference: tests/optim/test_surface_reconstructor.py:219-255): the loss
decreases over epochs, validation losses are produced, and the outer-edge
control points keep their u/v coordinates (rectangularity lock).
"""

import pathlib

import numpy as np
import pytest

from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.optim.surface_reconstructor import (
    SurfaceReconstructor,
    lock_control_points_on_outer_edges,
)
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.util import constants

REFERENCE_ROOT = pathlib.Path("/root/reference")
SCENARIO = (
    REFERENCE_ROOT / "tests/data/scenarios/test_scenario_paint_four_heliostats_ideal.h5"
)
FIELD_DATA = REFERENCE_ROOT / "tests/data/field_data"


def _optimization_configuration(
    scheduler: str, max_epoch: int = 6, step_size_up: int = 500
) -> dict:
    return {
        constants.optimization: {
            constants.initial_learning_rate: 1e-4,
            constants.tolerance: 5e-4,
            constants.max_epoch: max_epoch,
            constants.batch_size: 30,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 2,
            constants.early_stopping_window: 40,
        },
        constants.scheduler: {
            constants.scheduler_type: scheduler,
            constants.lr_min: 1e-6,
            constants.lr_max: 1e-3,
            constants.step_size_up: step_size_up,
            constants.reduce_factor: 0.8,
            constants.patience: 10,
            constants.threshold: 1e-4,
            constants.cooldown: 5,
        },
        constants.constraints: {
            constants.rho_flux_integral: 1.0,
            constants.energy_tolerance: 0.01,
            constants.weight_smoothness: 0.005,
            constants.weight_ideal_surface: 0.005,
        },
    }


def _heliostat_data_mapping():
    return [
        (
            "AA39",
            [FIELD_DATA / f"AA39-calibration-properties_{i}.json" for i in (1, 2, 3)],
            [FIELD_DATA / f"AA39-flux-centered_{i}.png" for i in (1, 2, 3)],
        ),
    ]


@pytest.mark.parametrize(
    "loss_name,scheduler",
    [("kl_divergence", constants.reduce_on_plateau), ("pixel", constants.cyclic)],
)
def test_surface_reconstructor_decreases_loss(loss_name, scheduler):
    if not SCENARIO.exists():
        pytest.skip("reference scenario data not available")
    scenario = load_scenario_from_hdf5(
        SCENARIO,
        number_of_surface_points_per_facet=(8, 8),
        change_number_of_control_points_per_facet=(7, 7),
    )
    # The cyclic schedule starts at lr_min; a short ramp makes 10 epochs
    # enough to observe a loss decrease.
    max_epoch, step_size_up = (12, 4) if scheduler == constants.cyclic else (6, 500)
    originals = [
        np.asarray(g.nurbs_control_points).copy() for g in scenario.heliostat_groups
    ]
    reconstructor = SurfaceReconstructor(
        scenario=scenario,
        data={
            constants.data_parser: PaintCalibrationDataParser(),
            constants.heliostat_data_mapping: _heliostat_data_mapping(),
        },
        optimization_configuration=_optimization_configuration(
            scheduler, max_epoch=max_epoch, step_size_up=step_size_up
        ),
        bitmap_resolution=(64, 64),
    )
    final_loss, results = reconstructor.reconstruct_surfaces(loss_name)

    assert len(results) == 1
    history = results[0].loss_history["total_loss"]
    assert len(history) >= 2
    assert history[-1] < history[0], f"loss did not decrease: {history}"
    assert "test_loss_pixel" in results[0].test_loss
    assert np.isfinite(results[0].test_loss["test_loss_pixel"]).all()

    group_index = results[0].group_index
    updated = np.asarray(scenario.heliostat_groups[group_index].nurbs_control_points)
    original = originals[group_index]
    active = results[0].active_heliostat_indices
    # Reconstruction moved interior control points of the active heliostat...
    assert not np.allclose(updated[active], original[active])
    # ...but outer-edge u/v coordinates stayed locked (rectangularity).
    for edge in (updated[:, :, 0, :, :2] - original[:, :, 0, :, :2],
                 updated[:, :, -1, :, :2] - original[:, :, -1, :, :2],
                 updated[:, :, :, 0, :2] - original[:, :, :, 0, :2],
                 updated[:, :, :, -1, :2] - original[:, :, :, -1, :2]):
        np.testing.assert_allclose(edge, 0.0, atol=1e-7)
    # Inactive heliostats untouched.
    inactive = np.setdiff1d(np.arange(updated.shape[0]), active)
    np.testing.assert_allclose(updated[inactive], original[inactive], atol=1e-7)
    # Final per-heliostat loss wired into the field-level vector (offset by
    # the heliostat counts of preceding groups).
    offset = sum(
        g.number_of_heliostats for g in scenario.heliostat_groups[:group_index]
    )
    assert np.isfinite(final_loss[offset + active]).all()
    assert np.isfinite(final_loss).sum() == len(active)


def test_lock_control_points_on_outer_edges():
    rng = np.random.RandomState(0)
    grads = rng.randn(2, 4, 6, 7, 3).astype(np.float32)
    locked = np.asarray(lock_control_points_on_outer_edges(grads))
    assert (locked[:, :, 0, :, :2] == 0).all()
    assert (locked[:, :, -1, :, :2] == 0).all()
    assert (locked[:, :, :, 0, :2] == 0).all()
    assert (locked[:, :, :, -1, :2] == 0).all()
    np.testing.assert_array_equal(locked[:, :, :, :, 2], grads[:, :, :, :, 2])
    np.testing.assert_array_equal(
        locked[:, :, 1:-1, 1:-1, :], grads[:, :, 1:-1, 1:-1, :]
    )


def test_surface_reconstructor_ray_chunk_matches_unchunked():
    """ray_chunk (memory-bounding remat scan) must not change the
    optimization trajectory: two epochs chunked vs unchunked agree."""
    if not SCENARIO.exists():
        pytest.skip("reference scenario data not available")

    histories = {}
    for ray_chunk in (None, 2):
        scenario = load_scenario_from_hdf5(
            SCENARIO,
            number_of_surface_points_per_facet=(8, 8),
            change_number_of_control_points_per_facet=(7, 7),
        )
        reconstructor = SurfaceReconstructor(
            scenario=scenario,
            data={
                constants.data_parser: PaintCalibrationDataParser(),
                constants.heliostat_data_mapping: _heliostat_data_mapping(),
            },
            optimization_configuration=_optimization_configuration(
                constants.cyclic, max_epoch=2, step_size_up=4
            ),
            bitmap_resolution=(64, 64),
            ray_chunk=ray_chunk,
        )
        _, results = reconstructor.reconstruct_surfaces("kl_divergence")
        histories[ray_chunk] = results[0].loss_history["total_loss"]

    np.testing.assert_allclose(
        histories[2],
        histories[None],
        rtol=2e-4,
        err_msg="ray_chunk changed the optimization trajectory",
    )
