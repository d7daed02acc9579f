"""NURBS grid and control-point helpers.

reference: artist/nurbs/utils.py:7-121.
"""

from __future__ import annotations

import jax.numpy as jnp

from artist_tpu.util import indices


def create_nurbs_evaluation_grid(
    number_of_evaluation_points: tuple[int, int], epsilon: float = 1e-7
) -> jnp.ndarray:
    """Cartesian grid of NURBS evaluation points in (eps, 1 - eps).

    The epsilon offset guards against parameter-endpoint instabilities.
    reference: artist/nurbs/utils.py:7-49.

    Parameters
    ----------
    number_of_evaluation_points : tuple[int, int]
        Points in (e, n) direction - static.
    epsilon : float
        Endpoint offset (default 1e-7).

    Returns
    -------
    jnp.ndarray
        Evaluation points. Shape ``[n_e * n_n, 2]``.
    """
    n_e, n_n = int(number_of_evaluation_points[0]), int(number_of_evaluation_points[1])
    pts_e = jnp.linspace(epsilon, 1 - epsilon, n_e, dtype=jnp.float32)
    pts_n = jnp.linspace(epsilon, 1 - epsilon, n_n, dtype=jnp.float32)
    # cartesian product with e varying slowest (torch.cartesian_prod order).
    ee = jnp.repeat(pts_e, n_n)
    nn = jnp.tile(pts_n, n_e)
    return jnp.stack([ee, nn], axis=-1)


def create_planar_nurbs_control_points(
    number_of_control_points: tuple[int, int], canting: jnp.ndarray
) -> jnp.ndarray:
    """Flat, equidistant control-point grids sized by the canting-vector norms.

    reference: artist/nurbs/utils.py:52-121.

    Parameters
    ----------
    number_of_control_points : tuple[int, int]
        Control points in (u, v) direction - static.
    canting : jnp.ndarray
        Canting vectors per facet. Shape ``[..., number_of_facets, 2, 4]``.

    Returns
    -------
    jnp.ndarray
        Planar control points. Shape ``[..., number_of_facets, n_u, n_v, 3]``.
    """
    n_u = int(number_of_control_points[indices.nurbs_u])
    n_v = int(number_of_control_points[indices.nurbs_v])

    u_lin = jnp.linspace(0.0, 1.0, n_u, dtype=canting.dtype)
    v_lin = jnp.linspace(0.0, 1.0, n_v, dtype=canting.dtype)

    # Per-facet extents in local in-plane directions (norm over the 4-vector).
    facet_dimensions = jnp.linalg.norm(canting, axis=-1)  # [..., F, 2]
    half_e = facet_dimensions[..., indices.e]  # [..., F]
    half_n = facet_dimensions[..., indices.n]

    u_coords = -half_e[..., None] + 2 * half_e[..., None] * u_lin  # [..., F, n_u]
    v_coords = -half_n[..., None] + 2 * half_n[..., None] * v_lin  # [..., F, n_v]

    batch = facet_dimensions.shape[:-1]
    out = jnp.zeros(batch + (n_u, n_v, 3), dtype=canting.dtype)
    out = out.at[..., indices.nurbs_u].set(u_coords[..., :, None])
    out = out.at[..., indices.nurbs_v].set(v_coords[..., None, :])
    return out
