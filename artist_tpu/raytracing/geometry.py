"""Ray-target intersection geometry: reflection, plane and cylinder hits.

reference: artist/raytracing/geometry.py:11-445. Branch-free functional
versions: the reference's data-dependent early returns ("no intersections")
become mask algebra, and every division that can hit a masked-out zero is
guarded with the where-before-divide pattern so gradients stay finite under
jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.util import indices


def reflect(
    incident_ray_directions: jnp.ndarray, reflection_surface_normals: jnp.ndarray
) -> jnp.ndarray:
    """Mirror reflection: d - 2 (d.n) n.

    reference: artist/raytracing/geometry.py:11-41.
    """
    return (
        incident_ray_directions
        - 2.0
        * jnp.sum(
            incident_ray_directions * reflection_surface_normals, axis=-1, keepdims=True
        )
        * reflection_surface_normals
    )


def line_plane_intersections(
    ray_directions: jnp.ndarray,
    ray_magnitudes: jnp.ndarray,
    points_at_ray_origins: jnp.ndarray,
    tower: SolarTower,
    target_area_indices: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray/planar-target intersections in continuous bitmap coordinates.

    Lambert cosine intensities, front-face masking, in-bounds masking, and
    the e-axis flip ("viewed from the field" convention).
    reference: artist/raytracing/geometry.py:44-204.

    Parameters
    ----------
    ray_directions : jnp.ndarray
        Normalized ray directions. Shape ``[M, R, P, 4]``.
    ray_magnitudes : jnp.ndarray
        Shape ``[M, R, P]``.
    points_at_ray_origins : jnp.ndarray
        Ray origins (= aligned surface points). Shape ``[M, P, 4]``.
    tower : SolarTower
        Target-area arrays.
    target_area_indices : jnp.ndarray
        Planar target index per heliostat (already planar-local). Shape ``[M]``.
    bitmap_resolution : tuple[int, int]
        (width_e, height_u), static.

    Returns
    -------
    tuple of jnp.ndarray
        (bitmap_e, bitmap_u, intersection_distances, intensities), each
        ``[M, R, P]``; invalid rays are zeroed.
    """
    directions = ray_directions[..., :3]
    origins = points_at_ray_origins[..., :3]
    plane_normals = tower.planar_normals[target_area_indices][..., :3]
    plane_centers3 = tower.planar_centers[target_area_indices][..., :3]

    # Lambert cosine: rays hit the front face when the dot product with the
    # outward plane normal is negative.
    angle_based_intensities = jnp.sum(
        directions * plane_normals[:, None, None, :], axis=-1
    )
    front_facing = angle_based_intensities < 0.0

    numerator = jnp.sum(
        (plane_centers3[:, None, :] - origins) * plane_normals[:, None, :], axis=-1
    )[:, None, :]
    safe_denominator = jnp.where(front_facing, angle_based_intensities, 1.0)
    intersection_distances = (numerator / safe_denominator) * front_facing

    intersections = (
        origins[:, None, :, :] + directions * intersection_distances[..., None]
    )

    intensities = ray_magnitudes * -angle_based_intensities

    plane_dimensions = tower.planar_dimensions[target_area_indices]
    plane_centers = tower.planar_centers[target_area_indices]
    width = plane_dimensions[:, indices.target_dimensions_width]
    height = plane_dimensions[:, indices.target_dimensions_height]

    target_e = (
        intersections[..., indices.e]
        + (width / 2)[:, None, None]
        - plane_centers[:, indices.e][:, None, None]
    )
    target_u = (
        intersections[..., indices.u]
        + (height / 2)[:, None, None]
        - plane_centers[:, indices.u][:, None, None]
    )

    res_e, res_u = bitmap_resolution
    bitmap_e = target_e / width[:, None, None] * (res_e - 1)
    bitmap_u = target_u / height[:, None, None] * (res_u - 1)

    valid = (
        (0 <= bitmap_e)
        & (bitmap_e <= res_e - 1)
        & (0 <= bitmap_u)
        & (bitmap_u <= res_u - 1)
        & front_facing
    )
    bitmap_e = bitmap_e * valid
    bitmap_u = bitmap_u * valid
    intersection_distances = intersection_distances * valid
    intensities = intensities * valid

    # Flip left-right: flux bitmaps are viewed from the heliostat field.
    bitmap_e = (res_e - 1) - bitmap_e

    return bitmap_e, bitmap_u, intersection_distances, intensities


def line_cylinder_intersections(
    ray_directions: jnp.ndarray,
    ray_magnitudes: jnp.ndarray,
    points_at_ray_origins: jnp.ndarray,
    tower: SolarTower,
    target_area_indices: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray/cylindrical-receiver intersections in bitmap coordinates.

    Local cylinder frame, quadratic solve, min-positive-root selection,
    finite-patch (height x opening angle) filter, Lambert intensity.
    reference: artist/raytracing/geometry.py:207-445.

    Parameters as :func:`line_plane_intersections` but with cylinder-local
    target indices. Returns the same quadruple.
    """
    origins = points_at_ray_origins[:, :, :3]
    directions = ray_directions[..., :3]

    cylinder_axes = tower.cylindrical_axes[target_area_indices][:, :3]
    cylinder_normals = tower.cylindrical_normals[target_area_indices][:, :3]
    cylinder_centers = tower.cylindrical_centers[target_area_indices][:, :3]
    radii = tower.cylindrical_radii[target_area_indices]
    heights = tower.cylindrical_heights[target_area_indices]
    opening_angles = tower.cylindrical_opening_angles[target_area_indices]

    # Local frame rows: (u = normal x axis is the reference's torch.cross
    # order (normals, axes)), stacked as rows of the rotation.
    u_axis = jnp.cross(cylinder_normals, cylinder_axes)
    rotations = jnp.stack([u_axis, cylinder_normals, cylinder_axes], axis=1)  # [M,3,3]

    # True-f32 frame change: the quadratic solve below cancels ~b^2 against
    # 4ac, so bf16 matmul passes here would corrupt intersection distances.
    origins_local = jnp.einsum(
        "mpj,mkj->mpk",
        origins - cylinder_centers[:, None, :],
        rotations,
        precision=jax.lax.Precision.HIGHEST,
    )[:, None, :, :]
    directions_local = jnp.einsum(
        "mrpj,mkj->mrpk", directions, rotations, precision=jax.lax.Precision.HIGHEST
    )

    ox = origins_local[..., 0]
    oy = origins_local[..., 1]
    dx = directions_local[..., 0]
    dy = directions_local[..., 1]

    a = dx**2 + dy**2
    b = 2.0 * (ox * dx + oy * dy)
    c = ox**2 + oy**2 - (radii**2)[:, None, None]

    discriminant = b**2 - 4.0 * a * c
    hits_infinite = (discriminant >= 0) & (jnp.abs(a) > 1e-8)

    sqrt_disc = jnp.sqrt(discriminant * hits_infinite + 1e-12)
    safe_a = jnp.where(jnp.abs(a) > 1e-8, a, 1.0)

    near = (-b - sqrt_disc) / (2.0 * safe_a)
    far = (-b + sqrt_disc) / (2.0 * safe_a)
    near = jnp.where(near > 0, near, jnp.inf)
    far = jnp.where(far > 0, far, jnp.inf)
    intersection_distances = jnp.minimum(near, far)
    valid = jnp.isfinite(intersection_distances) & hits_infinite
    intersection_distances = jnp.where(valid, intersection_distances, 0.0)

    intersections = origins_local + intersection_distances[..., None] * directions_local
    x = intersections[..., 0]
    y = intersections[..., 1]
    z = intersections[..., 2]

    normal_norm = jnp.sqrt(x**2 + y**2)
    safe_norm = jnp.where(normal_norm > 0, normal_norm, 1.0)
    # Lambert: -(d . n_local) with n_local = (x, y, 0)/|..|
    angle_based = jnp.clip(-(dx * x + dy * y) / safe_norm, 0.0, None)

    z = z + (heights / 2)[:, None, None]
    normal_angle = jnp.arctan2(cylinder_normals[:, 1], cylinder_normals[:, 0])
    angles = jnp.arctan2(y, x) - (
        normal_angle[:, None, None] - (opening_angles / 2)[:, None, None]
    )

    on_patch = (
        (z >= 0)
        & (z <= heights[:, None, None])
        & (angles >= 0)
        & (angles <= opening_angles[:, None, None])
    )

    res_e, res_u = bitmap_resolution
    bitmap_u = z / heights[:, None, None] * (res_u - 1)
    bitmap_e = angles / opening_angles[:, None, None] * (res_e - 1)

    mask = on_patch & valid
    bitmap_e = bitmap_e * mask
    bitmap_u = bitmap_u * mask
    intersection_distances = intersection_distances * mask
    intensities = ray_magnitudes * angle_based * mask

    return bitmap_e, bitmap_u, intersection_distances, intensities
