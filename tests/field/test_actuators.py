"""Actuator unit tests with hand-derived expected values.

reference: tests/field/test_actuators.py:8-91 (the expected angle values are
the reference's published test vectors - data, not code).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from artist_tpu.field import actuators
from artist_tpu.util import constants

# AA39-like linear actuator parameters (packed layout [H, 7, 2]):
# rows [type, clockwise, min_pos, max_pos, increment, offset, pivot_radius].
LINEAR_NON_OPTIMIZABLE = np.array(
    [
        [
            [0.0, 0.0],
            [0.0, 1.0],
            [0.0, 0.0],
            [60000.0, 80000.0],
            [1.5417e05, 1.5417e05],
            [3.3531e-01, 3.4077e-01],
            [3.3810e-01, 3.1910e-01],
        ]
    ],
    np.float32,
)
# rows [initial_angle, initial_stroke_length].
LINEAR_OPTIMIZABLE = np.array(
    [[[-1.5318, 0.94392], [0.077413, 0.077522]]], np.float32
)


def test_linear_motor_positions_to_angles_hand_derived():
    """Motor steps [28061, 47874] map to the reference's published angles
    (reference: tests/field/test_actuators.py:33 expected tensor)."""
    motor_positions = jnp.asarray([[28061.0, 47874.0]], jnp.float32)
    angles = actuators.motor_positions_to_angles(
        constants.linear_actuator_key,
        jnp.asarray(LINEAR_NON_OPTIMIZABLE),
        jnp.asarray(LINEAR_OPTIMIZABLE),
        motor_positions,
    )
    np.testing.assert_allclose(
        np.asarray(angles),
        np.array([[-0.971173584461, -0.085735797882]]),
        atol=2e-4,
    )


def test_linear_angles_to_motor_positions_roundtrip():
    """angle -> motor -> angle is the identity inside the feasible range."""
    motor_positions = jnp.asarray(
        [[10000.0, 20000.0], [30000.0, 50000.0], [5000.0, 70000.0]], jnp.float32
    )
    non_optimizable = jnp.asarray(np.repeat(LINEAR_NON_OPTIMIZABLE, 3, axis=0))
    optimizable = jnp.asarray(np.repeat(LINEAR_OPTIMIZABLE, 3, axis=0))
    angles = actuators.motor_positions_to_angles(
        constants.linear_actuator_key, non_optimizable, optimizable, motor_positions
    )
    recovered = actuators.angles_to_motor_positions(
        constants.linear_actuator_key, non_optimizable, optimizable, angles
    )
    np.testing.assert_allclose(
        np.asarray(recovered), np.asarray(motor_positions), rtol=2e-3
    )


def test_ideal_motor_positions_identity():
    """Ideal actuators are the identity map both ways
    (reference: artist/field/actuators_ideal.py:66-111, test vector
    tests/field/test_actuators.py:36-48)."""
    motor_positions = jnp.asarray([[28061.0, 47874.0]], jnp.float32)
    non_optimizable = jnp.zeros((1, 4, 2), jnp.float32)
    angles = actuators.motor_positions_to_angles(
        constants.ideal_actuator_key,
        non_optimizable,
        jnp.zeros((0, 0)),
        motor_positions,
    )
    np.testing.assert_array_equal(np.asarray(angles), np.asarray(motor_positions))
    back = actuators.angles_to_motor_positions(
        constants.ideal_actuator_key, non_optimizable, jnp.zeros((0, 0)), angles
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(motor_positions))


def test_unknown_actuator_type_raises():
    """Static dispatch rejects unknown types loudly
    (reference: the abstract-actuator NotImplementedError,
    tests/field/test_actuators.py:93-120)."""
    with pytest.raises(KeyError):
        actuators.motor_positions_to_angles(
            "hydraulic",
            jnp.zeros((1, 7, 2)),
            jnp.zeros((1, 2, 2)),
            jnp.zeros((1, 2)),
        )


def test_physics_informed_parameters_strictly_positive():
    """Softplus clamping keeps increment/offset/pivot-radius/stroke positive
    even for adversarial negative inputs
    (reference: artist/field/actuators_linear.py:79-178)."""
    bad = jnp.asarray(LINEAR_NON_OPTIMIZABLE).at[:, 4:].set(-1.0)
    bad_opt = jnp.asarray(LINEAR_OPTIMIZABLE).at[:, 1].set(-0.5)
    phys_non_opt, phys_opt = actuators.physics_informed_linear_parameters(bad, bad_opt)
    assert np.all(np.asarray(phys_non_opt[:, 4:]) > 0)
    assert np.all(np.asarray(phys_opt[:, 1]) > 0)
