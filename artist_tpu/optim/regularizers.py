"""Control-point regularizers for surface reconstruction.

reference: artist/optim/regularizers.py:60-186.
"""

from __future__ import annotations

import jax.numpy as jnp


def smoothness_regularizer(
    current_control_points: jnp.ndarray,
    original_control_points: jnp.ndarray,
    reduction_dimensions: tuple[int, ...] = (1,),
) -> jnp.ndarray:
    """Discrete Laplacian on control-point displacements (replicate-padded).

    Penalizes each displacement's deviation from the mean of its four grid
    neighbors. reference: artist/optim/regularizers.py:60-131.

    Parameters
    ----------
    current_control_points, original_control_points : jnp.ndarray
        Shape ``[H, F, Cu, Cv, 3]``.

    Returns
    -------
    jnp.ndarray
        Per-surface loss (facet mean, summed over ``reduction_dimensions``).
    """
    delta = current_control_points - original_control_points
    padded = jnp.pad(delta, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    laplace = (
        4 * delta
        - padded[:, :, :-2, 1:-1, :]
        - padded[:, :, 2:, 1:-1, :]
        - padded[:, :, 1:-1, :-2, :]
        - padded[:, :, 1:-1, 2:, :]
    )
    per_facet = jnp.mean(laplace**2, axis=(2, 3, 4))
    return jnp.sum(per_facet, axis=reduction_dimensions)


def ideal_surface_regularizer(
    current_control_points: jnp.ndarray,
    original_control_points: jnp.ndarray,
    reduction_dimensions: tuple[int, ...] = (1,),
) -> jnp.ndarray:
    """L2 pull toward the original control points.

    reference: artist/optim/regularizers.py:134-186.
    """
    delta_squared = (current_control_points - original_control_points) ** 2
    per_facet = jnp.mean(delta_squared, axis=(2, 3, 4))
    return jnp.sum(per_facet, axis=reduction_dimensions)
