"""Hand-derived alignment cases: analytic ground truth, no oracle.

reference: tests/field/test_kinematics_rigid_body.py:480-760 (the
reference pins expected orientation matrices; here the expectations are
derived from first principles - the law of reflection and rigid-body
structure - so they are independent of BOTH frameworks).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from artist_tpu.field import kinematics_rigid_body as rigid_body
from artist_tpu.util import constants


def _ideal_actuator_parameters(num: int):
    non_optimizable = np.zeros((num, 4, 2), np.float32)
    non_optimizable[:, 0] = constants.ideal_actuator_int
    non_optimizable[:, 2] = -2.0 * np.pi
    non_optimizable[:, 3] = 2.0 * np.pi
    return jnp.asarray(non_optimizable), jnp.zeros((0, 0), jnp.float32)


def _align(positions, aim_points, incident):
    num = positions.shape[0]
    non_optimizable, optimizable = _ideal_actuator_parameters(num)
    orientations, motor_positions = (
        rigid_body.incident_ray_directions_to_orientations(
            incident_ray_directions=jnp.asarray(incident, jnp.float32),
            aim_points=jnp.asarray(aim_points, jnp.float32),
            heliostat_positions=jnp.asarray(positions, jnp.float32),
            translation_deviations=jnp.zeros((num, 9), jnp.float32),
            rotation_deviations=jnp.zeros((num, 4), jnp.float32),
            actuator_type=constants.ideal_actuator_key,
            actuator_non_optimizable=non_optimizable,
            actuator_optimizable=optimizable,
            warn_invalid=False,
        )
    )
    return np.asarray(orientations), np.asarray(motor_positions)


CASES = [
    # (heliostat position, aim point, incident ray direction). The incident
    # direction is the light's propagation direction; the returned
    # orientation maps the canonical up-facing surface frame to world, so
    # the aligned concentrator normal is ``orientation @ z_hat``.
    ([0.0, 0.0, 0.0, 1.0], [0.0, 50.0, 0.0, 1.0], [0.0, 0.0, -1.0, 0.0]),
    ([0.0, 0.0, 0.0, 1.0], [0.0, 50.0, 50.0, 1.0], [0.0, 1.0, 0.0, 0.0]),
    ([0.0, 0.0, 0.0, 1.0], [0.0, 50.0, 25.0, 1.0], [0.0, 0.6, -0.8, 0.0]),
    ([5.0, -3.0, 2.0, 1.0], [0.0, 40.0, 30.0, 1.0], [0.3, 0.5, -0.8, 0.0]),
    ([0.0, 0.0, 0.0, 1.0], [-30.0, 30.0, 0.0, 1.0], [0.0, 0.6, -0.8, 0.0]),
]


@pytest.mark.parametrize("position, aim, incident", CASES)
def test_alignment_satisfies_law_of_reflection(position, aim, incident):
    """The aligned concentrator normal bisects incident and desired
    reflection directions (reference semantics:
    artist/field/kinematics_rigid_body.py:540-634)."""
    incident = np.asarray(incident, np.float64)
    incident[:3] /= np.linalg.norm(incident[:3])
    orientations, _ = _align(
        np.asarray([position], np.float32),
        np.asarray([aim], np.float32),
        np.asarray([incident], np.float32),
    )
    normal = orientations[0] @ np.array([0.0, 0.0, 1.0, 0.0])
    desired_direction = np.asarray(aim[:3]) - np.asarray(position[:3])
    desired_direction /= np.linalg.norm(desired_direction)
    expected_normal = desired_direction - incident[:3]
    expected_normal /= np.linalg.norm(expected_normal)
    np.testing.assert_allclose(normal[:3], expected_normal, atol=5e-4)
    # Reflecting the incident ray off that normal recovers the aim direction.
    reflected = incident[:3] - 2.0 * np.dot(incident[:3], normal[:3]) * normal[:3]
    np.testing.assert_allclose(reflected, desired_direction, atol=1e-3)


@pytest.mark.parametrize("position, aim, incident", CASES[:3])
def test_orientation_is_rigid_transform(position, aim, incident):
    """Rotation block orthonormal with determinant +1; translation column is
    the heliostat position (zero deviations)."""
    orientations, _ = _align(
        np.asarray([position], np.float32),
        np.asarray([aim], np.float32),
        np.asarray([incident], np.float32),
    )
    rotation = orientations[0][:3, :3]
    np.testing.assert_allclose(rotation @ rotation.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rotation), 1.0, atol=1e-5)
    np.testing.assert_allclose(orientations[0][:3, 3], position[:3], atol=1e-5)
    np.testing.assert_allclose(orientations[0][3], [0.0, 0.0, 0.0, 1.0], atol=1e-6)


def test_retroreflection_case_solves_to_zero_motors():
    """Aim straight south with light arriving northward: the desired normal
    is exactly south, reached at motor position zero (the kinematics rest
    pose) - the inverse solve must return zeros, and the surface normal
    (``orientation @ z_hat``) must be exactly south."""
    orientations, motor_positions = _align(
        np.asarray([[0.0, 0.0, 0.0, 1.0]], np.float32),
        np.asarray([[0.0, -50.0, 0.0, 1.0]], np.float32),
        np.asarray([[0.0, 1.0, 0.0, 0.0]], np.float32),
    )
    np.testing.assert_allclose(motor_positions[0], [0.0, 0.0], atol=1e-5)
    normal = orientations[0] @ np.array([0.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(normal[:3], [0.0, -1.0, 0.0], atol=1e-5)


def test_batch_alignment_matches_individual():
    """Batched solves equal per-heliostat solves (no cross-talk)."""
    positions = np.asarray([case[0] for case in CASES], np.float32)
    aims = np.asarray([case[1] for case in CASES], np.float32)
    incidents = np.asarray(
        [np.asarray(c[2]) / max(np.linalg.norm(np.asarray(c[2][:3])), 1e-9) for c in CASES],
        np.float32,
    )
    batched, _ = _align(positions, aims, incidents)
    for index, (position, aim, incident) in enumerate(
        itertools.islice(zip(positions, aims, incidents), len(CASES))
    ):
        single, _ = _align(position[None], aim[None], incident[None])
        np.testing.assert_allclose(batched[index], single[0], atol=1e-5)
