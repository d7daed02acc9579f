"""Axis-angle rotation decomposition helpers.

reference: artist/geometry/rotations.py:7-119.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from artist_tpu.geometry.transforms import _normalize


def decompose_rotations(
    initial_vectors: jnp.ndarray, target_vector: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ENU components of the axis-angle vector rotating initial -> target.

    Computes the rotation axis (cross product), the rotation angle (arccos of
    the dot product), and returns the components of ``theta * axis``.
    reference: artist/geometry/rotations.py:7-66.

    Parameters
    ----------
    initial_vectors : jnp.ndarray
        Homogeneous initial vectors. Shape ``[N, 4]`` (first 3 comps used).
    target_vector : jnp.ndarray
        Homogeneous target vector. Shape ``[4]``.

    Returns
    -------
    tuple of jnp.ndarray
        (east, north, up) components of the axis-angle vector, each ``[N]``.
    """
    v0 = _normalize(initial_vectors[:, :3])
    t = _normalize(target_vector[:3])
    axis = jnp.cross(v0, t[None, :])
    axis_normalized = _normalize(axis)
    theta = jnp.arccos(jnp.clip(v0 @ t, -1.0, 1.0))[:, None]
    components = theta * axis_normalized
    return components[:, 0], components[:, 1], components[:, 2]


def rotation_angle_and_axis(
    from_orientation: np.ndarray, to_orientation: np.ndarray
) -> tuple[np.ndarray, float]:
    """Rotation axis and angle between two orientations (host-side numpy).

    Handles the parallel and antiparallel edge cases explicitly; used in
    data loading (initial-angle compensation), so it runs on host.
    reference: artist/geometry/rotations.py:69-119.
    """
    f = np.asarray(from_orientation, dtype=np.float64)[:3]
    t = np.asarray(to_orientation, dtype=np.float64)[:3]
    f = f / np.linalg.norm(f)
    t = t / np.linalg.norm(t)
    dot = float(np.clip(np.dot(f, t), -1.0, 1.0))
    angle = float(np.arccos(dot))
    axis = np.cross(f, t)
    axis_norm = float(np.linalg.norm(axis))
    epsilon = 1e-6
    if axis_norm < epsilon and dot > 0:
        return np.array([1.0, 0.0, 0.0]), 0.0
    if axis_norm < epsilon and dot < 0:
        if abs(f[0]) < abs(f[1]):
            orthogonal = np.array([1.0, 0.0, 0.0])
        else:
            orthogonal = np.array([0.0, 1.0, 0.0])
        axis = np.cross(f, orthogonal)
        return axis / np.linalg.norm(axis), float(np.pi)
    return axis / axis_norm, angle
