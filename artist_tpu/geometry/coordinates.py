"""Coordinate conversions: 3D/4D homogeneous, az/el, WGS84, bitmap<->world.

reference: artist/geometry/coordinates.py:12-391.

WGS84 conversions run host-side in float64 numpy (JAX stays in float32 on
device; geodetic linearization needs double precision).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from artist_tpu.util import indices

# WGS84 ellipsoid constants (reference: artist/geometry/coordinates.py:360-363).
WGS84_A = 6378137.0
WGS84_B = 6356752.314245
WGS84_E2 = (WGS84_A**2 - WGS84_B**2) / WGS84_A**2


def convert_3d_points_to_4d_format(points: jnp.ndarray) -> jnp.ndarray:
    """Append homogeneous ones. reference: artist/geometry/coordinates.py:12-50."""
    if points.shape[-1] != 3:
        raise ValueError(f"Expected 3D points but got points of shape {points.shape}!")
    return jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)], axis=-1
    )


def convert_3d_directions_to_4d_format(directions: jnp.ndarray) -> jnp.ndarray:
    """Append homogeneous zeros. reference: artist/geometry/coordinates.py:53-93."""
    if directions.shape[-1] != 3:
        raise ValueError(
            f"Expected 3D directions but got directions of shape {directions.shape}!"
        )
    return jnp.concatenate(
        [directions, jnp.zeros(directions.shape[:-1] + (1,), dtype=directions.dtype)],
        axis=-1,
    )


def normalize_points(points: jnp.ndarray) -> jnp.ndarray:
    """Normalize each column of a 2D array to the open interval (0, 1).

    reference: artist/geometry/coordinates.py:96-117.
    """
    min_vals = jnp.min(points, axis=0)
    point_range = points - min_vals
    max_vals = jnp.max(point_range + 2e-5, axis=0)
    return (point_range + 1e-5) / max_vals


def azimuth_elevation_to_enu(
    azimuth: jnp.ndarray,
    elevation: jnp.ndarray,
    slant_range: float = 1.0,
    degree: bool = True,
) -> jnp.ndarray:
    """South-oriented azimuth/elevation to ENU coordinates.

    reference: artist/geometry/coordinates.py:252-312.
    """
    azimuth = jnp.asarray(azimuth, dtype=jnp.float32)
    elevation = jnp.asarray(elevation, dtype=jnp.float32)
    if azimuth.shape != elevation.shape:
        raise ValueError("``azimuth`` and ``elevation`` must have identical shapes.")
    if degree:
        azimuth = jnp.deg2rad(azimuth)
        elevation = jnp.deg2rad(elevation)
    azimuth = jnp.remainder(azimuth, 2 * jnp.pi)
    r = slant_range * jnp.cos(elevation)
    return jnp.stack(
        [
            r * jnp.sin(azimuth),
            -r * jnp.cos(azimuth),  # south-oriented azimuth convention
            slant_range * jnp.sin(elevation),
        ],
        axis=-1,
    )


def convert_wgs84_coordinates_to_local_enu(
    coordinates_to_transform: np.ndarray, reference_point: np.ndarray
) -> np.ndarray:
    """WGS84 (lat, lon, alt) to local ENU offsets in meters (host, float64).

    Small-distance linearization around the reference point, matching the
    reference's differential approximation.
    reference: artist/geometry/coordinates.py:315-390.

    Parameters
    ----------
    coordinates_to_transform : np.ndarray
        Shape ``[N, 3]`` (latitude, longitude, altitude).
    reference_point : np.ndarray
        Shape ``[3]``.

    Returns
    -------
    np.ndarray
        ENU offsets, shape ``[N, 3]`` float32.
    """
    coords = np.asarray(coordinates_to_transform, dtype=np.float64)
    ref = np.asarray(reference_point, dtype=np.float64)

    latitudes = np.deg2rad(coords[:, indices.latitude])
    longitudes = np.deg2rad(coords[:, indices.longitude])
    lat_ref = np.deg2rad(ref[indices.latitude])
    lon_ref = np.deg2rad(ref[indices.longitude])

    sin_lat = np.sin(latitudes)
    # Transverse (rn) and meridional (rm) radii of curvature at each latitude.
    rn = WGS84_A / np.sqrt(1 - WGS84_E2 * sin_lat**2)
    rm = (WGS84_A * (1 - WGS84_E2)) / ((1 - WGS84_E2 * sin_lat**2) ** 1.5)

    dlat = lat_ref - latitudes
    dlon = lon_ref - longitudes

    out = np.zeros_like(coords, dtype=np.float64)
    out[:, indices.e] = -(dlon * rn * np.cos(latitudes))
    out[:, indices.n] = -(dlat * rm)
    out[:, indices.u] = coords[:, indices.altitude] - ref[indices.altitude]
    return out.astype(np.float32)


def bitmap_coordinates_to_target_coordinates(
    bitmap_coordinates: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
    tower,
    target_area_indices: jnp.ndarray,
) -> jnp.ndarray:
    """Convert bitmap pixel coordinates to homogeneous world coordinates.

    Pixels are treated as cell centers ((p + 0.5) / res); the e-axis is
    flipped to match the "viewed from the field" bitmap orientation. Planar
    and cylindrical targets are both computed and selected per heliostat by
    the global target index (planar indices first) - branch-free for jit.
    reference: artist/geometry/coordinates.py:119-249.

    Parameters
    ----------
    bitmap_coordinates : jnp.ndarray
        (e, u) pixel coordinates. Shape ``[M, 2]``.
    bitmap_resolution : tuple[int, int]
        (width, height) in pixels - static.
    tower : artist_tpu.field.solar_tower.SolarTower
        Tower pytree with planar/cylindrical target-area arrays.
    target_area_indices : jnp.ndarray
        Global target index per heliostat. Shape ``[M]``.

    Returns
    -------
    jnp.ndarray
        World coordinates, homogeneous. Shape ``[M, 4]``.
    """
    width, height = bitmap_resolution
    e_norm = (bitmap_coordinates[:, indices.unbatched_bitmap_e] + 0.5) / width
    u_norm = (bitmap_coordinates[:, indices.unbatched_bitmap_u] + 0.5) / height

    n_planar = tower.number_of_planar_target_areas
    planar_mask = target_area_indices < n_planar

    coords3 = jnp.zeros((target_area_indices.shape[0], 3), dtype=e_norm.dtype)

    if n_planar > 0:
        p_idx = jnp.clip(target_area_indices, 0, n_planar - 1)
        centers = tower.planar_centers[p_idx][:, :3]
        dims = tower.planar_dimensions[p_idx]
        e_local = (0.5 - e_norm) * dims[:, indices.target_dimensions_width]
        u_local = (0.5 - u_norm) * dims[:, indices.target_dimensions_height]
        planar_coords = centers.at[:, indices.e].add(e_local)
        planar_coords = planar_coords.at[:, indices.u].add(u_local)
        coords3 = jnp.where(planar_mask[:, None], planar_coords, coords3)

    if tower.number_of_cylindrical_target_areas > 0:
        c_idx = jnp.clip(
            target_area_indices - n_planar,
            0,
            tower.number_of_cylindrical_target_areas - 1,
        )
        centers = tower.cylindrical_centers[c_idx][:, :3]
        axes = tower.cylindrical_axes[c_idx][:, :3]
        normals = tower.cylindrical_normals[c_idx][:, :3]
        radii = tower.cylindrical_radii[c_idx]
        heights = tower.cylindrical_heights[c_idx]
        opening_angles = tower.cylindrical_opening_angles[c_idx]

        v = jnp.cross(axes, normals)
        theta = (e_norm - 0.5) * opening_angles
        z = (0.5 - u_norm) * heights
        cyl_coords = (
            centers
            + radii[:, None] * jnp.cos(theta)[:, None] * normals
            + radii[:, None] * jnp.sin(theta)[:, None] * v
            + z[:, None] * axes
        )
        coords3 = jnp.where(planar_mask[:, None], coords3, cyl_coords)

    return convert_3d_points_to_4d_format(coords3)
