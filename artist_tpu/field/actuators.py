"""Actuator models: motor positions <-> joint angles, pure functions.

TPU-native re-design of the reference's Actuators class hierarchy
(reference: artist/field/actuators.py:6-152,
artist/field/actuators_linear.py:8-370,
artist/field/actuators_ideal.py:66-111): instead of stateful modules, the
conversions are pure functions over packed parameter tensors, statically
dispatched on the actuator type string so each heliostat group jit-compiles
a branch-free kernel.

Packed layout (shared with the scenario HDF5 schema):
- non-optimizable ``[H, 7, 2]`` (linear) rows:
  [type, clockwise, min_pos, max_pos, increment, offset, pivot_radius]
- non-optimizable ``[H, 4, 2]`` (ideal) rows: [type, clockwise, min, max]
- optimizable ``[H, 2, 2]`` (linear) rows: [initial_angle, initial_stroke_length]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_tpu.util import constants, indices

EPSILON = 1e-6


def _softplus_beta100(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable softplus with beta=100 (torch semantics).

    torch.nn.functional.softplus(x, beta) = log(1 + exp(beta x)) / beta, with
    a linear passthrough for beta*x > threshold (20).
    """
    scaled = 100.0 * x
    return jnp.where(scaled > 20.0, x, jax.nn.softplus(scaled) / 100.0)


def physics_informed_linear_parameters(
    non_optimizable: jnp.ndarray, optimizable: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp strictly-positive linear-actuator parameters via softplus.

    reference: artist/field/actuators_linear.py:79-178.

    Parameters
    ----------
    non_optimizable : jnp.ndarray
        Shape ``[H, 7, 2]``.
    optimizable : jnp.ndarray
        Shape ``[H, 2, 2]``.
    """
    rows = [
        non_optimizable[:, indices.actuator_type],
        non_optimizable[:, indices.actuator_clockwise_movement],
        non_optimizable[:, indices.actuator_min_motor_position],
        non_optimizable[:, indices.actuator_max_motor_position],
        _softplus_beta100(non_optimizable[:, indices.actuator_increment]) + EPSILON,
        _softplus_beta100(non_optimizable[:, indices.actuator_offset]) + EPSILON,
        _softplus_beta100(non_optimizable[:, indices.actuator_pivot_radius]) + EPSILON,
    ]
    opt_rows = [
        optimizable[:, indices.actuator_initial_angle],
        _softplus_beta100(optimizable[:, indices.actuator_initial_stroke_length])
        + EPSILON,
    ]
    return jnp.stack(rows, axis=1), jnp.stack(opt_rows, axis=1)


def _linear_motor_positions_to_absolute_angles(
    motor_positions: jnp.ndarray,
    increment: jnp.ndarray,
    offsets: jnp.ndarray,
    pivot_radii: jnp.ndarray,
    initial_stroke_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Law-of-cosines arccos: motor steps -> absolute actuator angles.

    reference: artist/field/actuators_linear.py:180-233.
    """
    stroke_lengths = motor_positions / increment + initial_stroke_lengths
    min_stroke = jnp.abs(offsets - pivot_radii) + EPSILON
    max_stroke = offsets + pivot_radii - EPSILON
    stroke_lengths = jnp.clip(stroke_lengths, min_stroke, max_stroke)

    numerator = offsets**2 + pivot_radii**2 - stroke_lengths**2
    denominator = 2.0 * offsets * pivot_radii
    return jnp.arccos(jnp.clip(numerator / denominator, -1.0 + 1e-6, 1.0 - 1e-6))


def linear_motor_positions_to_angles(
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    motor_positions: jnp.ndarray,
) -> jnp.ndarray:
    """Joint angles from motor positions (linear / lead-screw actuators).

    reference: artist/field/actuators_linear.py:235-291.

    Parameters
    ----------
    non_optimizable : jnp.ndarray
        Shape ``[H, 7, 2]``.
    optimizable : jnp.ndarray
        Shape ``[H, 2, 2]``.
    motor_positions : jnp.ndarray
        Shape ``[H, 2]``.
    """
    phys_non_opt, phys_opt = physics_informed_linear_parameters(
        non_optimizable, optimizable
    )
    increment = phys_non_opt[:, indices.actuator_increment]
    offsets = phys_non_opt[:, indices.actuator_offset]
    pivot_radii = phys_non_opt[:, indices.actuator_pivot_radius]
    initial_angles = phys_opt[:, indices.actuator_initial_angle]
    initial_strokes = phys_opt[:, indices.actuator_initial_stroke_length]

    absolute_angles = _linear_motor_positions_to_absolute_angles(
        motor_positions, increment, offsets, pivot_radii, initial_strokes
    )
    absolute_initial_angles = _linear_motor_positions_to_absolute_angles(
        jnp.zeros_like(motor_positions), increment, offsets, pivot_radii, initial_strokes
    )
    delta_angles = absolute_initial_angles - absolute_angles

    clockwise = non_optimizable[:, indices.actuator_clockwise_movement] == 1
    return initial_angles + jnp.where(clockwise, delta_angles, -delta_angles)


def linear_angles_to_motor_positions(
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    angles: jnp.ndarray,
) -> jnp.ndarray:
    """Motor positions from joint angles (inverse of the above).

    reference: artist/field/actuators_linear.py:293-370.
    """
    phys_non_opt, phys_opt = physics_informed_linear_parameters(
        non_optimizable, optimizable
    )
    increment = phys_non_opt[:, indices.actuator_increment]
    offsets = phys_non_opt[:, indices.actuator_offset]
    pivot_radii = phys_non_opt[:, indices.actuator_pivot_radius]
    initial_delta_angles = phys_opt[:, indices.actuator_initial_angle]
    initial_strokes = phys_opt[:, indices.actuator_initial_stroke_length]

    clockwise = non_optimizable[:, indices.actuator_clockwise_movement] == 1
    delta_angles = jnp.where(
        clockwise, angles - initial_delta_angles, initial_delta_angles - angles
    )

    absolute_initial_angles = _linear_motor_positions_to_absolute_angles(
        jnp.zeros_like(angles), increment, offsets, pivot_radii, initial_strokes
    )
    initial_angles = absolute_initial_angles - delta_angles
    cos_initial = jnp.clip(jnp.cos(initial_angles), -1.0 + 1e-6, 1.0 - 1e-6)

    stroke_lengths = jnp.sqrt(
        offsets**2 + pivot_radii**2 - 2.0 * offsets * pivot_radii * cos_initial
    )
    min_stroke = jnp.abs(offsets - pivot_radii) + EPSILON
    max_stroke = offsets + pivot_radii - EPSILON
    stroke_lengths = jnp.clip(stroke_lengths, min_stroke, max_stroke)

    return (stroke_lengths - initial_strokes) * increment


def ideal_motor_positions_to_angles(
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    motor_positions: jnp.ndarray,
) -> jnp.ndarray:
    """Identity motor -> angle mapping (ideal actuators).

    reference: artist/field/actuators_ideal.py:66-88.
    """
    del non_optimizable, optimizable
    return motor_positions


def ideal_angles_to_motor_positions(
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    angles: jnp.ndarray,
) -> jnp.ndarray:
    """Identity angle -> motor mapping (ideal actuators).

    reference: artist/field/actuators_ideal.py:90-111.
    """
    del non_optimizable, optimizable
    return angles


_MOTOR_TO_ANGLES = {
    constants.linear_actuator_key: linear_motor_positions_to_angles,
    constants.ideal_actuator_key: ideal_motor_positions_to_angles,
}
_ANGLES_TO_MOTOR = {
    constants.linear_actuator_key: linear_angles_to_motor_positions,
    constants.ideal_actuator_key: ideal_angles_to_motor_positions,
}


def motor_positions_to_angles(
    actuator_type: str,
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    motor_positions: jnp.ndarray,
) -> jnp.ndarray:
    """Static dispatch on actuator type (string -> function).

    Replaces the reference's runtime class registry
    (reference: artist/util/type_registry.py:7-20) with compile-time
    branch selection.
    """
    return _MOTOR_TO_ANGLES[actuator_type](non_optimizable, optimizable, motor_positions)


def angles_to_motor_positions(
    actuator_type: str,
    non_optimizable: jnp.ndarray,
    optimizable: jnp.ndarray,
    angles: jnp.ndarray,
) -> jnp.ndarray:
    """Static dispatch on actuator type (string -> function)."""
    return _ANGLES_TO_MOTOR[actuator_type](non_optimizable, optimizable, angles)
