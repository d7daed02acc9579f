"""Rotation decomposition parity vs the torch reference.

reference: artist/geometry/rotations.py:7-119.
"""

import numpy as np

import jax.numpy as jnp

from artist_tpu.geometry.rotations import decompose_rotations, rotation_angle_and_axis


def _random_directions(rng, n=32):
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return np.concatenate([v, np.zeros((n, 1), np.float32)], axis=-1)


def test_decompose_rotations_matches_reference(reference_artist):
    import torch
    from artist.geometry.rotations import decompose_rotations as ref_decompose

    rng = np.random.RandomState(12)
    initial = _random_directions(rng)
    target = np.asarray([0.0, 0.0, 1.0, 0.0], np.float32)

    ours = decompose_rotations(jnp.asarray(initial), jnp.asarray(target))
    theirs = ref_decompose(
        initial_vector=torch.tensor(initial), target_vector=torch.tensor(target)
    )
    for mine, ref, name in zip(ours, theirs, "enu"):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy(), atol=1e-5, err_msg=f"component {name}"
        )


def test_rotation_angle_and_axis_edge_cases(reference_artist):
    import torch
    from artist.geometry.rotations import rotation_angle_and_axis as ref_raa

    target = np.asarray([0.0, 0.0, 1.0, 0.0], np.float32)
    cases = np.asarray(
        [
            [0.0, 0.0, 1.0, 0.0],  # parallel
            [0.0, 0.0, -1.0, 0.0],  # antiparallel
            [1.0, 0.0, 0.0, 0.0],  # orthogonal
            [0.6, 0.8, 0.0, 0.0],
        ],
        np.float32,
    )
    for initial in cases:
        axis, angle = rotation_angle_and_axis(initial, target)
        ref_axis, ref_angle = ref_raa(
            from_orientation=torch.tensor(initial),
            to_orientation=torch.tensor(target),
            device=torch.device("cpu"),
        )
        np.testing.assert_allclose(angle, float(ref_angle), atol=1e-6)
        np.testing.assert_allclose(axis, ref_axis.numpy(), atol=1e-6)
