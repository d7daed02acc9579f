"""Heliostat group: Structure-of-Arrays scene state + alignment, functional.

TPU-native re-design of the reference HeliostatGroup /
HeliostatGroupRigidBody classes (reference:
artist/field/heliostat_group.py:1-316,
artist/field/heliostat_group_rigid_body.py:1-271):

- State is an immutable flax.struct pytree; nothing is mutated in place.
- "Activation" (the reference's ``repeat_interleave`` with multiplicity,
  artist/field/heliostat_group.py:225-316) becomes a **gather by a
  sample->heliostat index map** computed host-side: jit sees only static
  shapes, and activating k calibration samples of one heliostat is the
  gather index appearing k times.
- Alignment returns new active points/normals instead of mutating module
  attributes.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from artist_tpu.field import kinematics_rigid_body as rigid_body
from artist_tpu.util import constants

_P = jax.lax.Precision.HIGHEST


@flax.struct.dataclass
class HeliostatGroupState:
    """SoA tensors for all heliostats sharing one kinematics/actuator type.

    Shapes: H = heliostats, F = facets/heliostat, P = surface points
    (combined over facets), Cu/Cv = control points per direction.
    """

    positions: jnp.ndarray  # [H, 4]
    surface_points: jnp.ndarray  # [H, P, 4] (heliostat frame)
    surface_normals: jnp.ndarray  # [H, P, 4]
    canting: jnp.ndarray  # [H, F, 2, 4]
    facet_translations: jnp.ndarray  # [H, F, 4]
    nurbs_control_points: jnp.ndarray  # [H, F, Cu, Cv, 3]
    initial_orientations: jnp.ndarray  # [H, 4]
    translation_deviations: jnp.ndarray  # [H, 9]
    rotation_deviations: jnp.ndarray  # [H, 4]
    actuator_non_optimizable: jnp.ndarray  # [H, 7, 2] linear / [H, 4, 2] ideal
    actuator_optimizable: jnp.ndarray  # [H, 2, 2] linear / [H, 0, 0] ideal
    motor_positions: jnp.ndarray  # [H, 2]

    # Static metadata (not traced).
    names: tuple = flax.struct.field(pytree_node=False, default=())
    kinematics_type: str = flax.struct.field(
        pytree_node=False, default=constants.rigid_body_key
    )
    actuator_type: str = flax.struct.field(
        pytree_node=False, default=constants.linear_actuator_key
    )
    nurbs_degrees: tuple = flax.struct.field(pytree_node=False, default=(3, 3))

    @property
    def number_of_heliostats(self) -> int:
        return self.positions.shape[0]

    @property
    def number_of_facets_per_heliostat(self) -> int:
        return self.canting.shape[1]


def active_indices_from_mask(active_heliostats_mask: np.ndarray) -> np.ndarray:
    """Host-side sample->heliostat index map from a multiplicity mask.

    ``mask = [2, 0, 1]`` -> ``[0, 0, 2]``: heliostat 0 twice, heliostat 2
    once. This is the static-shape equivalent of the reference's
    ``repeat_interleave`` activation.
    """
    mask = np.asarray(active_heliostats_mask)
    return np.repeat(np.arange(mask.shape[0], dtype=np.int32), mask)


def gather_active(state: HeliostatGroupState, active_indices: jnp.ndarray):
    """Gather per-sample copies of all SoA tensors (the 'activated' view).

    Returns a new HeliostatGroupState whose leading axis is the number of
    active samples M (static). reference:
    artist/field/heliostat_group.py:225-316.
    """
    idx = jnp.asarray(active_indices)

    def take(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(x, idx, axis=0)

    return state.replace(
        positions=take(state.positions),
        surface_points=take(state.surface_points),
        surface_normals=take(state.surface_normals),
        canting=take(state.canting),
        facet_translations=take(state.facet_translations),
        nurbs_control_points=take(state.nurbs_control_points),
        initial_orientations=take(state.initial_orientations),
        translation_deviations=take(state.translation_deviations),
        rotation_deviations=take(state.rotation_deviations),
        actuator_non_optimizable=take(state.actuator_non_optimizable),
        actuator_optimizable=(
            take(state.actuator_optimizable)
            if state.actuator_optimizable.size
            else state.actuator_optimizable
        ),
        motor_positions=take(state.motor_positions),
    )


def _apply_orientations(
    points: jnp.ndarray, normals: jnp.ndarray, orientations: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """points/normals [M, P, 4] x orientations [M, 4, 4] -> world frame.

    Row-vector convention: ``x @ O^T``
    (reference: artist/field/heliostat_group_rigid_body.py:217-222).
    """
    o_t = jnp.swapaxes(orientations, -1, -2)
    return (
        jnp.matmul(points, o_t, precision=_P),
        jnp.matmul(normals, o_t, precision=_P),
    )


def align_surfaces_with_incident_ray_directions(
    active: HeliostatGroupState,
    aim_points: jnp.ndarray,
    incident_ray_directions: jnp.ndarray,
    warn_sharding=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Align active surfaces so reflections hit the aim points.

    reference: artist/field/heliostat_group_rigid_body.py:169-222.

    Parameters
    ----------
    active : HeliostatGroupState
        Activated (gathered) group state with leading axis M.
    aim_points, incident_ray_directions : jnp.ndarray
        Shape ``[M, 4]`` each.
    warn_sharding : jax.sharding.NamedSharding | None
        Replicated sharding of the step's mesh; forwarded to the
        invalid-motor warning so its host callback never forces an SPMD
        involuntary rematerialization (see kinematics_rigid_body).

    Returns
    -------
    tuple
        (aligned_points [M, P, 4], aligned_normals [M, P, 4],
        orientations [M, 4, 4], motor_positions [M, 2]).
    """
    orientations, motor_positions = rigid_body.incident_ray_directions_to_orientations(
        incident_ray_directions=incident_ray_directions,
        aim_points=aim_points,
        heliostat_positions=active.positions,
        translation_deviations=active.translation_deviations,
        rotation_deviations=active.rotation_deviations,
        actuator_type=active.actuator_type,
        actuator_non_optimizable=active.actuator_non_optimizable,
        actuator_optimizable=active.actuator_optimizable,
        warn_sharding=warn_sharding,
    )
    points, normals = _apply_orientations(
        active.surface_points, active.surface_normals, orientations
    )
    return points, normals, orientations, motor_positions


def align_surfaces_with_motor_positions(
    active: HeliostatGroupState,
    motor_positions: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Align active surfaces for given motor positions.

    reference: artist/field/heliostat_group_rigid_body.py:224-270.
    """
    orientations = rigid_body.motor_positions_to_orientations(
        motor_positions=motor_positions,
        heliostat_positions=active.positions,
        translation_deviations=active.translation_deviations,
        rotation_deviations=active.rotation_deviations,
        actuator_type=active.actuator_type,
        actuator_non_optimizable=active.actuator_non_optimizable,
        actuator_optimizable=active.actuator_optimizable,
    )
    points, normals = _apply_orientations(
        active.surface_points, active.surface_normals, orientations
    )
    return points, normals, orientations
