"""Training utilities parity vs the torch reference.

reference: artist/optim/training.py (train_test_split :268-367,
EarlyStopping :93-185).
"""

import numpy as np
import pytest

from artist_tpu.optim.training import EarlyStopping, train_test_split


def _fake_calibration_data(rng, heliostats=3, samples_per=4, resolution=8):
    mask = np.full(heliostats, samples_per, np.int32)
    total = heliostats * samples_per
    return {
        "active_heliostats_mask": mask,
        "flux_measured": rng.rand(total, resolution, resolution).astype(np.float32),
        "focal_spots_measured": rng.rand(total, 4).astype(np.float32),
        "incident_ray_directions": rng.rand(total, 4).astype(np.float32),
        "motor_positions": rng.rand(total, 2).astype(np.float32),
        "target_area_indices": rng.randint(0, 3, total),
    }


@pytest.mark.parametrize("test_fraction", [0.25, 0.5])
def test_train_test_split_matches_reference(reference_artist, test_fraction):
    import torch
    from artist.optim.training import train_test_split as ref_split

    rng = np.random.RandomState(2)
    data = _fake_calibration_data(rng)

    ours = train_test_split(
        active_heliostats_mask=data["active_heliostats_mask"],
        flux_measured=data["flux_measured"],
        focal_spots_measured=data["focal_spots_measured"],
        incident_ray_directions=data["incident_ray_directions"],
        motor_positions=data["motor_positions"],
        target_area_indices=data["target_area_indices"],
        test_fraction=test_fraction,
    )
    theirs = ref_split(
        active_heliostats_mask=torch.tensor(data["active_heliostats_mask"]),
        flux_measured=torch.tensor(data["flux_measured"]),
        focal_spots_measured=torch.tensor(data["focal_spots_measured"]),
        incident_ray_directions=torch.tensor(data["incident_ray_directions"]),
        motor_positions=torch.tensor(data["motor_positions"]),
        target_area_indices=torch.tensor(data["target_area_indices"]),
        test_fraction=test_fraction,
        device=torch.device("cpu"),
    )

    np.testing.assert_array_equal(ours.train_indices, theirs.train_indices.numpy())
    np.testing.assert_array_equal(ours.test_indices, theirs.test_indices.numpy())
    np.testing.assert_array_equal(
        ours.active_heliostats_mask_train,
        theirs.active_heliostats_mask_train.numpy(),
    )
    np.testing.assert_array_equal(
        ours.active_heliostats_mask_test,
        theirs.active_heliostats_mask_test.numpy(),
    )
    np.testing.assert_allclose(
        ours.flux_measured_train, theirs.flux_measured_train.numpy()
    )
    np.testing.assert_allclose(
        ours.motor_positions_test, theirs.motor_positions_test.numpy()
    )
    assert ours.number_of_train_samples == theirs.number_of_train_samples
    assert ours.number_of_test_samples == theirs.number_of_test_samples


def test_train_test_split_ragged_counts():
    """Per-heliostat sample counts that differ must split along the TRUE
    block boundaries (the reference's uniform-stride split mis-assigns
    samples here; reference: artist/optim/training.py:268-367)."""
    rng = np.random.RandomState(3)
    counts = np.array([5, 2, 0, 7], np.int32)
    total = int(counts.sum())
    split = train_test_split(
        active_heliostats_mask=counts,
        flux_measured=rng.rand(total, 4, 4).astype(np.float32),
        focal_spots_measured=rng.rand(total, 4).astype(np.float32),
        incident_ray_directions=rng.rand(total, 4).astype(np.float32),
        motor_positions=rng.rand(total, 2).astype(np.float32),
        target_area_indices=np.arange(total),
        test_fraction=0.25,
    )
    # test counts: max(1, int(c * 0.25)) per active heliostat.
    np.testing.assert_array_equal(split.active_heliostats_mask_test, [1, 1, 0, 1])
    np.testing.assert_array_equal(split.active_heliostats_mask_train, [4, 1, 0, 6])
    # Block boundaries: heliostat 0 owns samples 0..4, 1 owns 5..6, 3 owns 7..13.
    np.testing.assert_array_equal(
        split.train_indices, [0, 1, 2, 3, 5, 7, 8, 9, 10, 11, 12]
    )
    np.testing.assert_array_equal(split.test_indices, [4, 6, 13])
    # target_area_indices here are the identity, so gathered == indices.
    np.testing.assert_array_equal(split.target_area_indices_test, [4, 6, 13])
    # Train and test sets partition every heliostat's block.
    assert set(split.train_indices) | set(split.test_indices) == set(range(total))


def test_reduce_loss_per_heliostat_ragged():
    """Ragged mean/median reduction vs a per-block numpy oracle."""
    import jax.numpy as jnp

    from artist_tpu.optim import losses

    rng = np.random.RandomState(5)
    counts = np.array([4, 1, 3, 0], np.int64)
    loss = rng.rand(int(counts.sum())).astype(np.float32)
    padded, valid = losses.build_sample_index_matrix(counts)
    mean = np.asarray(
        losses.reduce_loss_per_heliostat(jnp.asarray(loss), padded, valid, "mean")
    )
    median = np.asarray(
        losses.reduce_loss_per_heliostat(jnp.asarray(loss), padded, valid, "median")
    )
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for h, (start, count) in enumerate(zip(starts, counts)):
        block = loss[start : start + count]
        if count == 0:
            assert mean[h] == 0.0 and median[h] == 0.0
            continue
        np.testing.assert_allclose(mean[h], block.mean(), rtol=1e-6)
        # torch.median: lower of the two middle elements.
        np.testing.assert_allclose(
            median[h], np.sort(block)[(count - 1) // 2], rtol=1e-6
        )


def test_reduce_loss_per_heliostat_uniform_matches_reduce_loss_per_sample():
    import jax.numpy as jnp

    from artist_tpu.optim import losses

    rng = np.random.RandomState(6)
    loss = rng.rand(12).astype(np.float32)
    padded, valid = losses.build_sample_index_matrix(np.full(3, 4))
    for reduction in ("mean", "median"):
        ragged = losses.reduce_loss_per_heliostat(
            jnp.asarray(loss), padded, valid, reduction
        )
        uniform = losses.reduce_loss_per_sample(jnp.asarray(loss), 4, reduction)
        np.testing.assert_allclose(np.asarray(ragged), np.asarray(uniform), rtol=1e-6)


def test_early_stopping_matches_reference(reference_artist):
    from artist.optim.training import EarlyStopping as RefEarlyStopping

    # A loss curve that improves, then plateaus flat (guaranteed stop).
    losses = np.concatenate(
        [
            1.0 / (1.0 + 0.2 * np.arange(20)),
            np.full(60, 0.1),
        ]
    )
    ours = EarlyStopping(window_size=8, patience=5, min_improvement=1e-3)
    theirs = RefEarlyStopping(window_size=8, patience=5, min_improvement=1e-3)
    stopped_ours = stopped_theirs = None
    for epoch, loss in enumerate(losses):
        if stopped_ours is None and ours.step(float(loss)):
            stopped_ours = epoch
        if stopped_theirs is None and theirs.step(float(loss)):
            stopped_theirs = epoch
    assert stopped_ours == stopped_theirs
    assert stopped_ours is not None
