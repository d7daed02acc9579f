"""Flux bitmap post-processing: center of mass, trapezoid target, crop.

reference: artist/flux/bitmap.py:12-246. The differentiable affine crop
(torch ``affine_grid`` + ``grid_sample``) is re-implemented as an explicit
bilinear resample - same align_corners=True semantics and zero padding.
"""

from __future__ import annotations

import jax.numpy as jnp

from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.util import constants, indices


def get_center_of_mass(bitmaps: jnp.ndarray) -> jnp.ndarray:
    """Center of mass of flux bitmaps in (e, u) pixel coordinates.

    Returns (0, 0)-ish for empty fluxes thanks to the epsilon denominator.
    reference: artist/flux/bitmap.py:12-71.

    Parameters
    ----------
    bitmaps : jnp.ndarray
        Shape ``[M, height_u, width_e]``.

    Returns
    -------
    jnp.ndarray
        (e, u) pixel coordinates of the centers. Shape ``[M, 2]``.
    """
    _, height_u, width_e = bitmaps.shape
    normalized = bitmaps / (bitmaps.sum(axis=(1, 2), keepdims=True) + 1e-8)
    e_coords = jnp.linspace(0.0, width_e - 1, width_e)
    u_coords = jnp.linspace(0.0, height_u - 1, height_u)
    e_center = jnp.sum(normalized * e_coords[None, None, :], axis=(1, 2))
    u_center = jnp.sum(normalized * u_coords[None, :, None], axis=(1, 2))
    return jnp.stack([e_center, u_center], axis=1)


def trapezoid_distribution(
    total_width: int, slope_width: int, plateau_width: int
) -> jnp.ndarray:
    """One-dimensional trapezoid target distribution.

    reference: artist/flux/bitmap.py:74-118.
    """
    index_range = jnp.arange(total_width, dtype=jnp.float32)
    center = (total_width - 1) / 2.0
    half_plateau = plateau_width / 2.0
    distances = jnp.abs(index_range - center) - half_plateau
    if slope_width == 0:
        return (distances <= 0).astype(jnp.float32)
    return 1.0 - jnp.clip(distances / slope_width, 0.0, 1.0)


def _grid_sample_bilinear_zeros(
    images: jnp.ndarray, grid_x: jnp.ndarray, grid_y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sampling with zeros padding, align_corners=True semantics.

    ``grid_x/grid_y`` in [-1, 1] map to pixel [0, W-1]/[0, H-1].
    Matches torch.nn.functional.grid_sample for the crop use-case.
    """
    _, height, width = images.shape
    x = (grid_x + 1.0) * (width - 1) / 2.0
    y = (grid_y + 1.0) * (height - 1) / 2.0

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def sample(ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
        inside = (0 <= ix) & (ix < width) & (0 <= iy) & (iy < height)
        ix_c = jnp.clip(ix, 0, width - 1)
        iy_c = jnp.clip(iy, 0, height - 1)
        vals = jnp.take_along_axis(
            images.reshape(images.shape[0], -1),
            (iy_c * width + ix_c).reshape(images.shape[0], -1),
            axis=1,
        ).reshape(ix.shape)
        return vals * inside

    return (
        sample(x0, y0) * wx0 * wy0
        + sample(x1, y0) * wx1 * wy0
        + sample(x0, y1) * wx0 * wy1
        + sample(x1, y1) * wx1 * wy1
    )


def crop_flux_distributions_around_center(
    flux_distributions: jnp.ndarray,
    tower: SolarTower,
    target_area_indices: jnp.ndarray,
    crop_width: float = constants.utis_crop_width,
    crop_height: float = constants.utis_crop_height,
) -> jnp.ndarray:
    """Differentiable affine crop of a physical window around the center of mass.

    Used to compare predictions with UTIS-centered PAINT flux images.
    reference: artist/flux/bitmap.py:121-246.

    Parameters
    ----------
    flux_distributions : jnp.ndarray
        Shape ``[M, H, W]``.
    tower : SolarTower
        Physical target dimensions.
    target_area_indices : jnp.ndarray
        Global target index per bitmap. Shape ``[M]``.
    crop_width, crop_height : float
        Physical crop size in meters (default 6 x 6).
    """
    num, height, width = flux_distributions.shape

    normalized = flux_distributions / (
        flux_distributions.sum(axis=(1, 2), keepdims=True) + 1e-8
    )
    x_lin = jnp.linspace(-1.0, 1.0, width)
    y_lin = jnp.linspace(-1.0, 1.0, height)
    x_com = jnp.sum(normalized * x_lin[None, None, :], axis=(1, 2))
    y_com = jnp.sum(normalized * y_lin[None, :, None], axis=(1, 2))

    n_planar = tower.number_of_planar_target_areas
    n_cyl = tower.number_of_cylindrical_target_areas
    planar_mask = target_area_indices < n_planar
    dims = jnp.zeros((num, 2), dtype=jnp.float32)
    if n_planar > 0:
        p_idx = jnp.clip(target_area_indices, 0, n_planar - 1)
        dims = jnp.where(planar_mask[:, None], tower.planar_dimensions[p_idx], dims)
    if n_cyl > 0:
        c_idx = jnp.clip(target_area_indices - n_planar, 0, n_cyl - 1)
        cyl_dims = jnp.stack(
            [
                tower.cylindrical_radii[c_idx] * tower.cylindrical_opening_angles[c_idx],
                tower.cylindrical_heights[c_idx],
            ],
            axis=1,
        )
        dims = jnp.where(planar_mask[:, None], dims, cyl_dims)

    epsilon = 1e-8
    target_width = jnp.clip(dims[:, indices.target_dimensions_width], epsilon, None)
    target_height = jnp.clip(dims[:, indices.target_dimensions_height], epsilon, None)
    scale_x = crop_width / target_width
    scale_y = crop_height / target_height

    # Output sampling grid in normalized [-1, 1] coordinates:
    # grid = scale * base + center (the affine matrix of the reference).
    base_x = jnp.linspace(-1.0, 1.0, width)
    base_y = jnp.linspace(-1.0, 1.0, height)
    grid_x = scale_x[:, None, None] * base_x[None, None, :] + x_com[:, None, None]
    grid_y = scale_y[:, None, None] * base_y[None, :, None] + y_com[:, None, None]
    grid_x = jnp.broadcast_to(grid_x, (num, height, width))
    grid_y = jnp.broadcast_to(grid_y, (num, height, width))

    return _grid_sample_bilinear_zeros(flux_distributions, grid_x, grid_y)
