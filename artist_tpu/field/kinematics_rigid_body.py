"""Rigid-body two-joint heliostat kinematics, pure-functional.

TPU-native re-design of the reference RigidBody kinematics
(reference: artist/field/kinematics_rigid_body.py:15-634):

- pure functions over packed deviation/actuator tensors (no module state),
- the aim-point fixed-point iteration is statically unrolled to its maximum
  4 iterations with a traced global "done" freeze instead of a Python
  ``break`` - this reproduces the reference's early-exit semantics exactly
  (once converged, motor positions stop updating, so further forward passes
  return identical orientations) while remaining jit-compatible.

Conventions: the kinematics reference orientation is south (0, -1, 0, 0) in
ENU; sampled surfaces face up (0, 0, 1, 0), compensated by a constant
initial-orientation offset rotation (reference:
artist/field/kinematics_rigid_body.py:174-192).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from artist_tpu.field import actuators
from artist_tpu.geometry import transforms
from artist_tpu.geometry.transforms import _normalize
from artist_tpu.util import indices

log = logging.getLogger("artist_tpu.field")

# numpy (not jnp) so importing this module never initializes the XLA
# backend - jax.distributed.initialize must precede any backend touch.
KINEMATICS_STANDARD_ORIENTATION = np.array([0.0, -1.0, 0.0, 0.0], dtype=np.float32)
HOMOGENEOUS_ORIGIN = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)

_P = jax.lax.Precision.HIGHEST


def _mm(*mats: jnp.ndarray) -> jnp.ndarray:
    """Chain batched 4x4 matmuls in true f32."""
    out = mats[0]
    for m in mats[1:]:
        out = jnp.matmul(out, m, precision=_P)
    return out


def initial_orientation_offset() -> jnp.ndarray:
    """Rotation from the flat sampled-surface frame (+U) to the kinematics
    reference frame (south).

    Computed generically via axis-angle decomposition like the reference
    (artist/field/kinematics_rigid_body.py:174-192); evaluates to
    ``rotate_e(pi/2)``.
    """
    from artist_tpu.geometry.rotations import decompose_rotations

    sampled = jnp.array([[0.0, 0.0, 1.0, 0.0]], dtype=jnp.float32)
    east, north, up = decompose_rotations(sampled, KINEMATICS_STANDARD_ORIENTATION)
    return _mm(
        transforms.rotate_e(east), transforms.rotate_n(north), transforms.rotate_u(up)
    )  # [1, 4, 4]


def orientations_from_motor_positions(
    motor_positions: jnp.ndarray,
    heliostat_positions: jnp.ndarray,
    translation_deviations: jnp.ndarray,
    rotation_deviations: jnp.ndarray,
    actuator_type: str,
    actuator_non_optimizable: jnp.ndarray,
    actuator_optimizable: jnp.ndarray,
) -> jnp.ndarray:
    """Forward kinematics: motor positions -> orientation matrices (no offset).

    Composition (reference: artist/field/kinematics_rigid_body.py:194-324):
    translate(position) @ J1 @ J2 @ translate(concentrator deviation), where
    J1 = R_n(tilt) R_u(tilt) T(dev) R_e(theta1) and
    J2 = R_e(tilt) R_n(tilt) T(dev) R_u(theta2).

    Parameters
    ----------
    motor_positions : jnp.ndarray
        Shape ``[M, 2]``.
    heliostat_positions : jnp.ndarray
        Shape ``[M, 4]``.
    translation_deviations : jnp.ndarray
        Shape ``[M, 9]``.
    rotation_deviations : jnp.ndarray
        Shape ``[M, 4]``.

    Returns
    -------
    jnp.ndarray
        Orientation matrices. Shape ``[M, 4, 4]``.
    """
    joint_angles = actuators.motor_positions_to_angles(
        actuator_type, actuator_non_optimizable, actuator_optimizable, motor_positions
    )

    position_translation = transforms.translate_enu(
        e=heliostat_positions[:, indices.e],
        n=heliostat_positions[:, indices.n],
        u=heliostat_positions[:, indices.u],
    )

    joint_1 = _mm(
        transforms.rotate_n(rotation_deviations[:, indices.first_joint_tilt_n]),
        transforms.rotate_u(rotation_deviations[:, indices.first_joint_tilt_u]),
        transforms.translate_enu(
            e=translation_deviations[:, indices.first_joint_translation_e],
            n=translation_deviations[:, indices.first_joint_translation_n],
            u=translation_deviations[:, indices.first_joint_translation_u],
        ),
        transforms.rotate_e(joint_angles[:, indices.joint_angles_e]),
    )
    joint_2 = _mm(
        transforms.rotate_e(rotation_deviations[:, indices.second_joint_tilt_e]),
        transforms.rotate_n(rotation_deviations[:, indices.second_joint_tilt_n]),
        transforms.translate_enu(
            e=translation_deviations[:, indices.second_joint_translation_e],
            n=translation_deviations[:, indices.second_joint_translation_n],
            u=translation_deviations[:, indices.second_joint_translation_u],
        ),
        transforms.rotate_u(joint_angles[:, indices.joint_angles_u]),
    )
    concentrator_translation = transforms.translate_enu(
        e=translation_deviations[:, indices.concentrator_translation_e],
        n=translation_deviations[:, indices.concentrator_translation_n],
        u=translation_deviations[:, indices.concentrator_translation_u],
    )
    return _mm(position_translation, joint_1, joint_2, concentrator_translation)


def motor_positions_from_normals(
    normals: jnp.ndarray,
    rotation_deviations: jnp.ndarray,
    actuator_type: str,
    actuator_non_optimizable: jnp.ndarray,
    actuator_optimizable: jnp.ndarray,
    epsilon: float = 1e-8,
    return_validity: bool = False,
) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse kinematics: desired concentrator normal -> motor positions.

    Closed-form two-solution phase-shifted-sinusoid solve for (theta1,
    theta2) after factoring out the joint rotation deviations; the solution
    whose motor positions lie inside the actuator limits is selected
    (solution 1 preferred, solution 2 otherwise - including when neither is
    valid, matching the reference's fallback). reference:
    artist/field/kinematics_rigid_body.py:326-508.

    Parameters
    ----------
    normals : jnp.ndarray
        Desired concentrator normals. Shape ``[M, 4]``.
    return_validity : bool
        When True, additionally return a boolean mask ``[M]`` that is False
        for heliostats where NEITHER solution lies inside the motor limits
        (the reference warns "No valid motor position combination",
        artist/field/kinematics_rigid_body.py:493-500).

    Returns
    -------
    jnp.ndarray | tuple
        Motor positions ``[M, 2]``; with ``return_validity`` also the
        validity mask ``[M]``.
    """
    first_dev = _mm(
        transforms.rotate_n(rotation_deviations[:, indices.first_joint_tilt_n]),
        transforms.rotate_u(rotation_deviations[:, indices.first_joint_tilt_u]),
    )
    second_dev = _mm(
        transforms.rotate_e(rotation_deviations[:, indices.second_joint_tilt_e]),
        transforms.rotate_n(rotation_deviations[:, indices.second_joint_tilt_n]),
    )

    # n' = F1^T n: remove first-joint rotation deviations.
    normal_after_first = jnp.einsum(
        "mji,mj->mi", first_dev, normals, precision=_P
    )

    # n'_e = A sin(theta2) + B cos(theta2) with A = F2_00, B = -F2_01.
    f2_00 = second_dev[:, indices.e, indices.e]
    f2_01 = second_dev[:, indices.e, indices.n]
    denominator = jnp.sqrt(f2_00**2 + f2_01**2)
    phi = jnp.arctan2(-f2_01, f2_00)
    ratio = jnp.clip(
        normal_after_first[:, indices.e] / (denominator + epsilon),
        -1.0 + epsilon,
        1.0 - epsilon,
    )
    theta2_1 = jnp.arcsin(ratio) - phi
    theta2_2 = jnp.pi - jnp.arcsin(ratio) - phi
    # Wrap into [-pi, pi].
    theta2_1 = jnp.arctan2(jnp.sin(theta2_1), jnp.cos(theta2_1))
    theta2_2 = jnp.arctan2(jnp.sin(theta2_2), jnp.cos(theta2_2))

    def theta1_for(theta2: jnp.ndarray) -> jnp.ndarray:
        v = jnp.einsum(
            "mij,mj->mi",
            _mm(second_dev, transforms.rotate_u(theta2)),
            jnp.broadcast_to(KINEMATICS_STANDARD_ORIENTATION, normals.shape),
            precision=_P,
        )
        theta1 = jnp.arctan2(
            v[:, indices.n] * normal_after_first[:, indices.u]
            - v[:, indices.u] * normal_after_first[:, indices.n],
            v[:, indices.n] * normal_after_first[:, indices.n]
            + v[:, indices.u] * normal_after_first[:, indices.u],
        )
        return jnp.arctan2(jnp.sin(theta1), jnp.cos(theta1))

    theta1_1 = theta1_for(theta2_1)
    theta1_2 = theta1_for(theta2_2)

    motor_1 = actuators.angles_to_motor_positions(
        actuator_type,
        actuator_non_optimizable,
        actuator_optimizable,
        jnp.stack([theta1_1, theta2_1], axis=-1),
    )
    motor_2 = actuators.angles_to_motor_positions(
        actuator_type,
        actuator_non_optimizable,
        actuator_optimizable,
        jnp.stack([theta1_2, theta2_2], axis=-1),
    )

    min_pos = actuator_non_optimizable[:, indices.actuator_min_motor_position]
    max_pos = actuator_non_optimizable[:, indices.actuator_max_motor_position]
    solution_1_valid = jnp.all((motor_1 >= min_pos) & (motor_1 <= max_pos), axis=1)
    motor_positions = jnp.where(solution_1_valid[:, None], motor_1, motor_2)
    if not return_validity:
        return motor_positions
    solution_2_valid = jnp.all((motor_2 >= min_pos) & (motor_2 <= max_pos), axis=1)
    return motor_positions, solution_1_valid | solution_2_valid


@functools.cache
def _host_callbacks_supported() -> bool:
    """Probe whether the default backend supports jitted host callbacks.

    Some PJRT plugins (e.g. the tunneled ``axon`` TPU backend) raise
    UNIMPLEMENTED for host send/recv; the probe compiles one trivial
    program once and caches the answer.
    """
    try:
        # ensure_compile_time_eval: the probe usually runs while an outer
        # train step is being traced; without it the probe's program would
        # INLINE into the outer trace and stage the callback into the very
        # computation this function is deciding to protect.
        with jax.ensure_compile_time_eval():
            jax.jit(lambda x: jax.debug.callback(lambda _: None, x) or x)(
                jnp.zeros((), jnp.int32)
            ).block_until_ready()
        return True
    except Exception:  # noqa: BLE001 - any backend failure means "no"
        log.info(
            "Backend %s does not support host callbacks; invalid-motor-"
            "position warnings are disabled under jit.",
            jax.default_backend(),
        )
        return False


def _warn_invalid_motor_positions(
    valid: jnp.ndarray, replicate_sharding=None
) -> None:
    """Host-side warning for heliostats where no motor solution is valid.

    The jit-compatible analogue of the reference's eager warning
    (artist/field/kinematics_rigid_body.py:493-500): the validity mask is
    shipped to the host via ``jax.debug.callback`` and logged there, so the
    traced computation itself stays pure. No-op on backends without host
    callback support.

    ``replicate_sharding``: when the surrounding step runs over a device
    mesh, the callback demands its operand on one device (maximal
    sharding), and the SPMD partitioner can only satisfy sharded->maximal
    by an involuntary full rematerialization (a forced replicate+slice
    round-trip it warns about on every step). Passing the mesh's fully
    replicated ``NamedSharding`` constrains the mask to replicated first -
    one clean all-gather - making the maximal hand-off free.
    """
    def callback(valid_host) -> None:
        invalid = np.nonzero(~np.asarray(valid_host))[0]
        if invalid.size:
            log.warning(
                "No valid motor position combination for active heliostat "
                "number(s): %s.",
                invalid.tolist(),
            )

    if not isinstance(valid, jax.core.Tracer):
        # Eager call (e.g. the aim-point initial alignment): log directly.
        # fetch_global handles masks sharded over a multi-process mesh,
        # which jax.debug.callback cannot fetch.
        from artist_tpu.parallel.mesh import fetch_global

        callback(fetch_global(valid))
        return
    if not _host_callbacks_supported():
        return
    if replicate_sharding is not None:
        valid = jax.lax.with_sharding_constraint(valid, replicate_sharding)
    jax.debug.callback(callback, valid)


def motor_positions_to_orientations(
    motor_positions: jnp.ndarray,
    heliostat_positions: jnp.ndarray,
    translation_deviations: jnp.ndarray,
    rotation_deviations: jnp.ndarray,
    actuator_type: str,
    actuator_non_optimizable: jnp.ndarray,
    actuator_optimizable: jnp.ndarray,
) -> jnp.ndarray:
    """Orientations including the initial-orientation offset.

    reference: artist/field/kinematics_rigid_body.py:510-538.
    """
    orientations = orientations_from_motor_positions(
        motor_positions,
        heliostat_positions,
        translation_deviations,
        rotation_deviations,
        actuator_type,
        actuator_non_optimizable,
        actuator_optimizable,
    )
    return _mm(orientations, initial_orientation_offset())


def incident_ray_directions_to_orientations(
    incident_ray_directions: jnp.ndarray,
    aim_points: jnp.ndarray,
    heliostat_positions: jnp.ndarray,
    translation_deviations: jnp.ndarray,
    rotation_deviations: jnp.ndarray,
    actuator_type: str,
    actuator_non_optimizable: jnp.ndarray,
    actuator_optimizable: jnp.ndarray,
    max_num_iterations: int = 4,
    min_eps: float = 0.0001,
    warn_invalid: bool = True,
    warn_sharding=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aim-point alignment: fixed-point iteration of forward/inverse kinematics.

    reference: artist/field/kinematics_rigid_body.py:540-634. The loop is
    statically unrolled; a traced scalar ``done`` gate freezes the motor
    update once the global normal-residual change drops below ``min_eps``,
    which is bit-equivalent to the reference's early ``break``.

    ``warn_invalid`` ships the per-solve validity mask to the host via an
    async ``jax.debug.callback`` and logs a warning for heliostats where
    neither motor solution respects the limits (reference:
    artist/field/kinematics_rigid_body.py:493-500); pass False in
    latency-critical inner loops.

    Returns
    -------
    tuple of jnp.ndarray
        Orientation matrices ``[M, 4, 4]`` (offset applied) and the final
        motor positions ``[M, 2]``.
    """
    num_active = incident_ray_directions.shape[0]
    motor_positions = jnp.zeros((num_active, 2), dtype=jnp.float32)
    done = jnp.asarray(False)
    last_loss = jnp.zeros((num_active,), dtype=jnp.float32)
    orientations = jnp.zeros((num_active, 4, 4), dtype=jnp.float32)

    for iteration in range(max_num_iterations):
        orientations = orientations_from_motor_positions(
            motor_positions,
            heliostat_positions,
            translation_deviations,
            rotation_deviations,
            actuator_type,
            actuator_non_optimizable,
            actuator_optimizable,
        )
        concentrator_normals = jnp.einsum(
            "mij,j->mi", orientations, KINEMATICS_STANDARD_ORIENTATION, precision=_P
        )
        concentrator_origins = jnp.einsum(
            "mij,j->mi", orientations, HOMOGENEOUS_ORIGIN, precision=_P
        )

        desired_reflection = _normalize(
            aim_points[:, :3] - concentrator_origins[:, :3], eps=1e-8
        )
        desired_normals3 = _normalize(
            -incident_ray_directions[:, :3] + desired_reflection, eps=1e-8
        )
        desired_normals = jnp.concatenate(
            [desired_normals3, jnp.zeros((num_active, 1), dtype=jnp.float32)], axis=-1
        )
        loss = jnp.abs(desired_normals - concentrator_normals).mean(axis=-1)

        if iteration > 0:
            done = done | jnp.all(jnp.abs(last_loss - loss) <= min_eps)
        last_loss = loss

        new_motor, motor_valid = motor_positions_from_normals(
            desired_normals,
            rotation_deviations,
            actuator_type,
            actuator_non_optimizable,
            actuator_optimizable,
            return_validity=True,
        )
        if warn_invalid:
            _warn_invalid_motor_positions(motor_valid, warn_sharding)
        motor_positions = jnp.where(done, motor_positions, new_motor)

    return _mm(orientations, initial_orientation_offset()), motor_positions
