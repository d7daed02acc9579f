"""Loss zoo parity vs the torch reference.

reference: tests/optim/test_loss_functions.py and artist/optim/loss.py:60-549.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.optim import losses as ours


@pytest.fixture(scope="module")
def torch_losses(reference_artist):
    from artist.optim import loss

    return loss


def _random(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_vector_loss_matches(torch_losses):
    import torch

    prediction, ground_truth = _random((5, 4), 1), _random((5, 4), 2)
    theirs = (
        torch_losses.VectorLoss()(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(ground_truth),
            reduction_dimensions=(1,),
        )
        .numpy()
    )
    mine = np.asarray(
        ours.vector_loss(jnp.asarray(prediction), jnp.asarray(ground_truth))
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-5)


def test_pixel_loss_matches(torch_losses):
    import torch

    prediction, ground_truth = _random((3, 8, 8), 3), _random((3, 8, 8), 4)
    theirs = (
        torch_losses.PixelLoss()(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(ground_truth),
            reduction_dimensions=(1, 2),
        )
        .numpy()
    )
    mine = np.asarray(
        ours.pixel_loss(jnp.asarray(prediction), jnp.asarray(ground_truth))
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-5)


def test_kl_divergence_loss_matches(torch_losses):
    import torch

    prediction, ground_truth = _random((3, 8, 8), 5), _random((3, 8, 8), 6)
    theirs = (
        torch_losses.KLDivergenceLoss()(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(ground_truth),
            reduction_dimensions=(1, 2),
        )
        .numpy()
    )
    mine = np.asarray(
        ours.kl_divergence_loss(jnp.asarray(prediction), jnp.asarray(ground_truth))
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-4, atol=1e-6)


def test_angle_loss_matches(torch_losses):
    import torch

    prediction = _random((6, 4), 7) - 0.5
    ground_truth = _random((6, 4), 8) - 0.5
    prediction[:, 3] = 0
    ground_truth[:, 3] = 0
    theirs = (
        torch_losses.AngleLoss()(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(ground_truth),
        )
        .numpy()
    )
    mine = np.asarray(
        ours.angle_loss(jnp.asarray(prediction), jnp.asarray(ground_truth))
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-4, atol=1e-5)


def test_cosine_similarity_loss_matches(torch_losses):
    import torch

    prediction = _random((6, 4), 9) - 0.5
    ground_truth = _random((6, 4), 10) - 0.5
    theirs = (
        torch_losses.CosineSimilarityLoss()(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(ground_truth),
        )
        .numpy()
    )
    mine = np.asarray(
        ours.cosine_similarity_loss(
            jnp.asarray(prediction), jnp.asarray(ground_truth)
        )
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-6)


def test_reduce_loss_per_sample_matches(torch_losses):
    import torch
    from functools import partial

    per_sample = _random((12,), 11)
    theirs_mean = torch_losses.reduce_loss_per_sample(
        loss_per_sample=torch.from_numpy(per_sample),
        number_of_samples_per_heliostat=4,
        reduction=partial(torch.mean, dim=-1),
    ).numpy()
    mine_mean = np.asarray(ours.reduce_loss_per_sample(jnp.asarray(per_sample), 4, "mean"))
    np.testing.assert_allclose(mine_mean, theirs_mean, rtol=1e-6)

    theirs_median = (
        torch_losses.reduce_loss_per_sample(
            loss_per_sample=torch.from_numpy(per_sample),
            number_of_samples_per_heliostat=4,
            reduction=partial(torch.median, dim=1),
        )
    )
    # torch.median with dim returns (values, indices) namedtuple.
    theirs_median = theirs_median.numpy()
    mine_median = np.asarray(
        ours.reduce_loss_per_sample(jnp.asarray(per_sample), 4, "median")
    )
    np.testing.assert_allclose(mine_median, theirs_median, rtol=1e-6)


def test_focal_spot_loss_from_bitmaps_matches(reference_artist, reference_scenario_dir):
    """FocalSpotLoss with ground-truth BITMAPS: the measured center of mass
    is recomputed and mapped to world coordinates like the reference
    (artist/optim/loss.py:124-248)."""
    import h5py
    import torch
    from artist.optim.loss import FocalSpotLoss
    from artist.scenario import Scenario

    from artist_tpu.scenario import load_scenario_from_hdf5

    scenario_path = reference_scenario_dir / "test_scenario_paint_single_heliostat.h5"
    with h5py.File(scenario_path) as f:
        ref_scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([4, 4]),
            device=torch.device("cpu"),
        )
    tpu_scenario = load_scenario_from_hdf5(
        scenario_path, number_of_surface_points_per_facet=(4, 4)
    )

    rng = np.random.RandomState(12)
    prediction = rng.rand(3, 16, 16).astype(np.float32)
    measured = rng.rand(3, 16, 16).astype(np.float32)
    target_indices = np.zeros(3, dtype=np.int64)

    theirs = (
        FocalSpotLoss(scenario=ref_scenario)(
            prediction=torch.from_numpy(prediction),
            ground_truth=torch.from_numpy(measured),
            target_area_indices=torch.from_numpy(target_indices),
            device=torch.device("cpu"),
        )
        .detach()
        .numpy()
    )
    mine = np.asarray(
        ours.focal_spot_loss(
            jnp.asarray(prediction),
            jnp.asarray(measured),
            tpu_scenario.solar_tower,
            jnp.asarray(target_indices),
        )
    )
    np.testing.assert_allclose(mine, theirs, rtol=1e-4, atol=1e-5)
