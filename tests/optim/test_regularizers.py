"""Regularizer parity vs the torch reference.

reference: artist/optim/regularizers.py:60-186.
"""

import numpy as np

import jax.numpy as jnp

from artist_tpu.optim.regularizers import (
    ideal_surface_regularizer,
    smoothness_regularizer,
)


def _control_points(rng, heliostats=2, facets=4, cu=6, cv=7):
    original = rng.rand(heliostats, facets, cu, cv, 3).astype(np.float32)
    current = original + 0.05 * rng.randn(heliostats, facets, cu, cv, 3).astype(
        np.float32
    )
    return current, original


def test_smoothness_regularizer_matches_reference(reference_artist):
    import torch
    from artist.optim.regularizers import SmoothnessRegularizer

    rng = np.random.RandomState(6)
    current, original = _control_points(rng)

    ours = np.asarray(
        smoothness_regularizer(jnp.asarray(current), jnp.asarray(original))
    )
    theirs = (
        SmoothnessRegularizer(reduction_dimensions=(1,))(
            current_control_points=torch.tensor(current),
            original_control_points=torch.tensor(original),
            device=torch.device("cpu"),
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_ideal_surface_regularizer_matches_reference(reference_artist):
    import torch
    from artist.optim.regularizers import IdealSurfaceRegularizer

    rng = np.random.RandomState(8)
    current, original = _control_points(rng)

    ours = np.asarray(
        ideal_surface_regularizer(jnp.asarray(current), jnp.asarray(original))
    )
    theirs = (
        IdealSurfaceRegularizer(reduction_dimensions=(1,))(
            current_control_points=torch.tensor(current),
            original_control_points=torch.tensor(original),
            device=torch.device("cpu"),
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_smoothness_zero_for_uniform_displacement():
    rng = np.random.RandomState(9)
    _, original = _control_points(rng)
    shifted = original + 0.3  # constant shift has zero Laplacian
    loss = np.asarray(
        smoothness_regularizer(jnp.asarray(shifted), jnp.asarray(original))
    )
    np.testing.assert_allclose(loss, 0.0, atol=1e-10)
