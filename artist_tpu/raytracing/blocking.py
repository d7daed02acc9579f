"""Heliostat-on-heliostat blocking: soft differentiable mask, TPU-native.

reference: artist/raytracing/blocking.py:123-354 (primitive construction +
soft mask) and :513-995 (LBVH cull).

TPU design choice (SURVEY.md section 7): the reference culls candidate
blockers with a per-ray stack-based LBVH traversal - extremely irregular
control flow that maps poorly onto the TPU. Heliostat fields have at most a
few thousand rectangle primitives, so the O(rays x primitives) soft mask is
evaluated **brute force** as dense vectorized math (VPU-friendly), with the
LBVH's only semantic contribution - "blockers beyond the ray's target hit do
not block" - reproduced as a hard (stop-gradient) distance gate. This is
correctness-equivalent to LBVH-cull + soft mask and removes the irregular
traversal entirely. A primitive-tiling Pallas kernel slots in here when
fields grow beyond VMEM-friendly sizes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from artist_tpu.geometry.transforms import _normalize


def create_blocking_primitives_rectangle(
    surface_points: jnp.ndarray,
    active_surface_points: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduce each heliostat to a rectangle by nearest-corner search.

    Corner indices come from the UNALIGNED surface points (heliostats at
    rest lie flat, so the bounding rectangle lives in the EN plane); corner
    positions are then read from the ALIGNED points. Corner order is
    counter-clockwise from the lower left: ``(min_e,min_n)``, ``(min_e,max_n)``,
    ``(max_e,max_n)``, ``(max_e,min_n)``.
    reference: artist/raytracing/blocking.py:13-120.

    Parameters
    ----------
    surface_points : jnp.ndarray
        Unaligned (flat) surface points. Shape ``[H, P, 4]``.
    active_surface_points : jnp.ndarray
        Aligned surface points. Shape ``[H, P, 4]``.

    Returns
    -------
    tuple of jnp.ndarray
        corners ``[H, 4, 4]``, spans ``[H, 2, 4]`` (u = c1 - c0,
        v = c3 - c0), unit normals ``[H, 4]``.
    """
    min_e = jnp.min(surface_points[:, :, 0], axis=1)
    max_e = jnp.max(surface_points[:, :, 0], axis=1)
    min_n = jnp.min(surface_points[:, :, 1], axis=1)
    max_n = jnp.max(surface_points[:, :, 1], axis=1)

    expected_corners = jnp.stack(
        [
            jnp.stack([min_e, min_n], axis=1),
            jnp.stack([min_e, max_n], axis=1),
            jnp.stack([max_e, max_n], axis=1),
            jnp.stack([max_e, min_n], axis=1),
        ],
        axis=1,
    )  # [H, 4, 2]

    distances = jnp.linalg.norm(
        surface_points[:, :, None, :2] - expected_corners[:, None, :, :], axis=-1
    )  # [H, P, 4]
    corner_indices = jnp.argmin(distances, axis=1)  # [H, 4]
    corners = jnp.take_along_axis(
        active_surface_points, corner_indices[..., None], axis=1
    )  # [H, 4, 4]

    spans = jnp.stack(
        [corners[:, 1] - corners[:, 0], corners[:, 3] - corners[:, 0]], axis=1
    )
    normals3 = _normalize(jnp.cross(spans[:, 0, :3], spans[:, 1, :3]))
    normals = jnp.concatenate(
        [normals3, jnp.zeros((surface_points.shape[0], 1), surface_points.dtype)],
        axis=-1,
    )
    return corners, spans, normals


def create_blocking_primitives_rectangles_by_index(
    surface_points: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduce each heliostat to a 4-corner rectangle + spans + normal.

    Assumes the reference's canonical 4-facet 2x2 layout with row-major
    per-facet point grids (reference:
    artist/raytracing/blocking.py:123-209); corners are picked by fixed
    index.

    Parameters
    ----------
    surface_points : jnp.ndarray
        World-frame surface points of all potential blockers.
        Shape ``[H, P, 4]``.

    Returns
    -------
    tuple of jnp.ndarray
        corners ``[H, 4, 4]`` (lower-left, upper-left, upper-right,
        lower-right), spans ``[H, 2, 4]`` (u = ul - ll, v = lr - ll),
        unit normals ``[H, 4]``.
    """
    number_of_surface_points = surface_points.shape[1]
    side = int(math.sqrt(number_of_surface_points / 4))

    lower_left = surface_points[:, number_of_surface_points // 2]
    lower_right = surface_points[:, number_of_surface_points - side]
    upper_right = surface_points[:, number_of_surface_points // 2 - 1]
    upper_left = surface_points[:, side - 1]

    corners = jnp.stack([lower_left, upper_left, upper_right, lower_right], axis=1)
    spans = jnp.stack(
        [corners[:, 1] - corners[:, 0], corners[:, 3] - corners[:, 0]], axis=1
    )
    normals3 = _normalize(jnp.cross(spans[:, 0, :3], spans[:, 1, :3]))
    normals = jnp.concatenate(
        [normals3, jnp.zeros((surface_points.shape[0], 1), surface_points.dtype)],
        axis=-1,
    )
    return corners, spans, normals


def _global_primitive_cull(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    blocking_primitives_corners: jnp.ndarray,
    intersection_distances_target: jnp.ndarray,
    ray_primitive_indices: jnp.ndarray | None,
) -> jnp.ndarray:
    """Non-differentiable candidate cull with the reference's LBVH semantics.

    A primitive stays when at least one ray (not originating from that
    primitive's own heliostat) enters its AABB before reaching its target
    hit (reference: artist/raytracing/blocking.py:912-943: ``mask_hit`` and
    the non-self marking). The reference computes this via per-ray LBVH
    traversal; fields have at most a few thousand primitives so the dense
    [rays x primitives] slab test vectorizes better on the TPU (SURVEY.md
    section 7) and yields the identical keep set.

    Returns
    -------
    jnp.ndarray
        Boolean keep flags. Shape ``[B]``.
    """
    aabb_min = jnp.min(blocking_primitives_corners[:, :, :3], axis=1)  # [B, 3]
    aabb_max = jnp.max(blocking_primitives_corners[:, :, :3], axis=1)

    origins = ray_origins[:, None, :, None, :3]  # [M, 1, P, 1, 3]
    directions = ray_directions[:, :, :, None, :3]  # [M, R, P, 1, 3]
    inverse_directions = 1.0 / (directions + 1e-12)

    t_low = (aabb_min[None, None, None] - origins) * inverse_directions
    t_high = (aabb_max[None, None, None] - origins) * inverse_directions
    entry = jnp.max(jnp.minimum(t_low, t_high), axis=-1)  # [M, R, P, B]
    exit_ = jnp.min(jnp.maximum(t_low, t_high), axis=-1)

    hit = (
        (exit_ >= entry)
        & (exit_ > 1e-6)
        & (entry <= intersection_distances_target[..., None])
    )
    if ray_primitive_indices is not None:
        own = (
            ray_primitive_indices[:, None, None, None]
            == jnp.arange(aabb_min.shape[0])[None, None, None, :]
        )
        hit = hit & ~own
    return jnp.any(hit, axis=(0, 1, 2))  # [B]


def soft_ray_blocking_mask(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    blocking_primitives_corners: jnp.ndarray,
    blocking_primitives_spans: jnp.ndarray,
    blocking_primitives_normals: jnp.ndarray,
    intersection_distances_target: jnp.ndarray | None = None,
    ray_primitive_indices: jnp.ndarray | None = None,
    epsilon: float = 1e-12,
    softness: float = 1000.0,
    alpha: float = 100.0,
    ray_origin_offset: float = 0.05,
    cull_method: str = "dense",
) -> jnp.ndarray:
    """Soft differentiable blocking mask with Beer-Lambert accumulation.

    Per (ray, primitive): solve the ray-plane intersection, sigmoid-gate
    "in front of the origin" (offset 5 cm kills self-intersections) and
    "inside the parallelogram" (local (u, v) via the 2x2 Gram solve), then
    accumulate optical depth exp(-alpha * sum(sigma)).
    reference: artist/raytracing/blocking.py:212-354.

    Parameters
    ----------
    ray_origins : jnp.ndarray
        Shape ``[M, P, 4]``.
    ray_directions : jnp.ndarray
        Shape ``[M, R, P, 4]``.
    blocking_primitives_* : jnp.ndarray
        ``[B, 4, 4]`` corners, ``[B, 2, 4]`` spans, ``[B, 4]`` normals.
    intersection_distances_target : jnp.ndarray | None
        Per-ray distance to the target hit, ``[M, R, P]``. When given, the
        global AABB candidate cull reproduces the LBVH filter's semantics
        (reference: artist/raytracing/blocking.py:831-995); the gate is
        non-differentiable like the reference's no-grad cull.
    ray_primitive_indices : jnp.ndarray | None
        Global primitive index owned by each ray-emitting heliostat,
        ``[M]``; used for the cull's non-self marking.
    cull_method : str
        ``"dense"`` (default): vectorized ray x primitive slab test -
        fastest for fields up to thousands of primitives. ``"lbvh"``: the
        Karras radix-tree traversal from :mod:`artist_tpu.raytracing.lbvh`
        (identical keep-set; wins only for very large fields).

    Returns
    -------
    jnp.ndarray
        blocked in [0, 1]. Shape ``[M, R, P]``.
    """
    origins = ray_origins[:, None, :, None, :3]  # [M, 1, P, 1, 3]
    directions = ray_directions[:, :, :, None, :3]  # [M, R, P, 1, 3]

    corner_0 = blocking_primitives_corners[None, None, None, :, 0, :3]
    span_u = blocking_primitives_spans[None, None, None, :, 0, :3]
    span_v = blocking_primitives_spans[None, None, None, :, 1, :3]
    normals = blocking_primitives_normals[None, None, None, :, :3]

    denominator = jnp.sum(directions * normals, axis=-1)
    denominator_safe = jnp.where(
        jnp.abs(denominator) < epsilon,
        jnp.where(denominator >= 0, epsilon, -epsilon),
        denominator,
    )
    distances = (
        jnp.sum((corner_0 - origins) * normals, axis=-1) / denominator_safe
    )  # [M, R, P, B]
    in_front = jax.nn.sigmoid(softness * (distances - ray_origin_offset))

    intersection_points = origins + distances[..., None] * directions
    offset_from_corner = intersection_points - corner_0

    span_u_sq = jnp.sum(span_u * span_u, axis=-1)
    span_v_sq = jnp.sum(span_v * span_v, axis=-1)
    span_uv = jnp.sum(span_u * span_v, axis=-1)
    proj_u = jnp.sum(offset_from_corner * span_u, axis=-1)
    proj_v = jnp.sum(offset_from_corner * span_v, axis=-1)
    det = span_u_sq * span_v_sq - span_uv * span_uv
    det_safe = jnp.where(jnp.abs(det) < epsilon, jnp.sign(det) * epsilon, det)
    u_coord = (proj_u * span_v_sq - proj_v * span_uv) / det_safe
    v_coord = (proj_v * span_u_sq - proj_u * span_uv) / det_safe

    inside_u = jax.nn.sigmoid(softness * u_coord) * jax.nn.sigmoid(
        softness * (1 - u_coord)
    )
    inside_v = jax.nn.sigmoid(softness * v_coord) * jax.nn.sigmoid(
        softness * (1 - v_coord)
    )
    sigma = jnp.clip(inside_u * inside_v * in_front, 0.0, 1.0)

    if intersection_distances_target is not None:
        if cull_method == "lbvh":
            from artist_tpu.raytracing.lbvh import lbvh_filter_blocking_planes

            keep = jax.lax.stop_gradient(
                lbvh_filter_blocking_planes(
                    ray_origins,
                    ray_directions,
                    blocking_primitives_corners,
                    ray_primitive_indices
                    if ray_primitive_indices is not None
                    else jnp.full((ray_origins.shape[0],), -1, jnp.int32),
                    intersection_distances_target,
                )
            )
        else:
            keep = jax.lax.stop_gradient(
                _global_primitive_cull(
                    ray_origins,
                    ray_directions,
                    blocking_primitives_corners,
                    intersection_distances_target,
                    ray_primitive_indices,
                )
            )
        sigma = sigma * keep[None, None, None, :]

    optical_depth = alpha * jnp.sum(sigma, axis=-1)
    return 1.0 - jnp.exp(-optical_depth)
