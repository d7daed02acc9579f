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
traversal entirely. On TPU the pair math runs in the fused Pallas kernels
of :mod:`artist_tpu.kernels.blocking_pallas` (``method="auto"``); the XLA
formulation below is the CPU default, the parity anchor against the torch
reference, and the fallback for ``cull_method="lbvh"``.
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


def select_blocking_candidates(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    blocking_primitives_corners: jnp.ndarray,
    ray_primitive_indices: jnp.ndarray | None,
    intersection_distances_target: jnp.ndarray,
    max_candidates: int,
    margin: float = 0.25,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative per-heliostat top-K candidate blocker selection.

    Replaces the reference's per-ray LBVH traversal
    (artist/raytracing/blocking.py:831-995) with a TPU-friendly two-level
    scheme: this O(M x B) corridor test picks each heliostat's K most
    plausible blockers; the exact per-ray behind-the-target gate then runs
    inside the Pallas pair kernels over those K only. The test is
    conservative: heliostat m's rays all start within its bounding sphere
    (radius ``r_m``) and deviate from the mean reflected direction by at
    most ``tan_dev_m``, so any primitive whose bounding sphere lies outside
    the corridor ``r_m + r_b + t * tan_dev_m + margin`` cannot receive
    non-negligible soft-mask weight (the sigmoid gates decay in
    centimeters at softness 1000; ``margin`` covers their width).

    Entirely non-differentiable (stop-gradient), like the reference cull.

    Returns
    -------
    tuple of jnp.ndarray
        Candidate primitive indices ``[M, K]`` int32 and validity
        ``[M, K]`` bool, K = ``max_candidates`` (clamped to B).
    """
    origins = jax.lax.stop_gradient(ray_origins[..., :3])  # [M, P, 3]
    directions = jax.lax.stop_gradient(ray_directions[..., :3])  # [M, R, P, 3]
    corners = jax.lax.stop_gradient(blocking_primitives_corners[:, :, :3])
    t_target = jax.lax.stop_gradient(intersection_distances_target)

    number_of_heliostats = origins.shape[0]
    number_of_primitives = corners.shape[0]
    k = min(max_candidates, number_of_primitives)

    center_m = jnp.mean(origins, axis=1)  # [M, 3]
    radius_m = jnp.sqrt(
        jnp.max(jnp.sum((origins - center_m[:, None]) ** 2, axis=-1), axis=1)
    )  # [M]
    mean_direction = _normalize(jnp.mean(directions, axis=(1, 2)), eps=1e-9)
    cos_dev = jnp.min(
        jnp.einsum("mrpk,mk->mrp", directions, mean_direction), axis=(1, 2)
    )
    cos_dev = jnp.clip(cos_dev, 0.05, 1.0)
    tan_dev = jnp.sqrt(jnp.clip(1.0 - cos_dev**2, 0.0, None)) / cos_dev  # [M]
    t_max = jnp.max(t_target, axis=(1, 2))  # [M]

    center_b = jnp.mean(corners, axis=1)  # [B, 3]
    radius_b = jnp.sqrt(
        jnp.max(jnp.sum((corners - center_b[:, None]) ** 2, axis=-1), axis=1)
    )  # [B]

    relative = center_b[None] - center_m[:, None]  # [M, B, 3]
    t_b = jnp.einsum("mbk,mk->mb", relative, mean_direction)  # [M, B]
    lateral_sq = jnp.sum(relative * relative, axis=-1) - t_b * t_b
    reach = (
        radius_m[:, None]
        + radius_b[None]
        + tan_dev[:, None] * jnp.clip(t_b, 0.0, None)
        + margin
    )
    passes = (
        (t_b > -radius_b[None])
        & (t_b - radius_b[None] < t_max[:, None])
        & (lateral_sq < reach * reach)
    )
    if ray_primitive_indices is not None:
        passes = passes & (
            ray_primitive_indices[:, None]
            != jnp.arange(number_of_primitives)[None, :]
        )

    # Most-inside-the-corridor first; failed slots rank last.
    score = jnp.where(passes, lateral_sq - reach * reach, jnp.inf)
    _, candidate_indices = jax.lax.top_k(-score, k)
    candidate_valid = jnp.take_along_axis(passes, candidate_indices, axis=1)
    return candidate_indices.astype(jnp.int32), candidate_valid


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


def _chunk_optical_depth(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    corners: jnp.ndarray,
    spans: jnp.ndarray,
    normals: jnp.ndarray,
    primitive_valid: jnp.ndarray,
    intersection_distances_target: jnp.ndarray | None,
    own_primitive_mask: jnp.ndarray | None,
    epsilon: float,
    softness: float,
    ray_origin_offset: float,
) -> jnp.ndarray:
    """Summed soft occlusion sigma over one chunk of primitives.

    All ray-primitive interactions are expanded into dot products against
    per-primitive vectors (``(o + t d - c0) . s = o.s + t (d.s) - c0.s``), so
    the largest temporaries are ``[M, R, P, B_chunk]`` - the naive
    formulation's ``[M, R, P, B, 3]`` intersection-point tensor never exists.

    Parameters: primitives of this chunk (``corners [b, 4, 4]``,
    ``spans [b, 2, 4]``, ``normals [b, 4]``), ``primitive_valid [b]`` masking
    padded slots, optional ``own_primitive_mask [M, b]`` (True = the ray's
    own heliostat). Returns summed sigma ``[M, R, P]``.
    """
    origins = ray_origins[..., :3]  # [M, P, 3]
    directions = ray_directions[..., :3]  # [M, R, P, 3]

    corner_0 = corners[:, 0, :3]  # [b, 3]
    span_u = spans[:, 0, :3]
    span_v = spans[:, 1, :3]
    normals3 = normals[:, :3]

    # Per-primitive scalars.
    span_u_sq = jnp.sum(span_u * span_u, axis=-1)  # [b]
    span_v_sq = jnp.sum(span_v * span_v, axis=-1)
    span_uv = jnp.sum(span_u * span_v, axis=-1)
    c0_dot_n = jnp.sum(corner_0 * normals3, axis=-1)
    c0_dot_u = jnp.sum(corner_0 * span_u, axis=-1)
    c0_dot_v = jnp.sum(corner_0 * span_v, axis=-1)
    det = span_u_sq * span_v_sq - span_uv * span_uv
    # sign(0) is 0: degenerate (e.g. zero-padded) primitives must still get a
    # nonzero safe denominator.
    det_safe = jnp.where(
        jnp.abs(det) < epsilon, jnp.where(det >= 0, epsilon, -epsilon), det
    )

    # Ray-primitive dot products (contractions over the 3-axis). Keep these
    # as einsums: XLA lowers the k=3 contraction well, and hand-unrolled
    # broadcast multiply-adds measured 2.4x SLOWER end-to-end on v5e.
    _hi = jax.lax.Precision.HIGHEST  # meters-scale dot products; bf16 would
    # destroy the softness-1000 sigmoid gates.
    o_dot_n = jnp.einsum("mpk,bk->mpb", origins, normals3, precision=_hi)
    o_dot_u = jnp.einsum("mpk,bk->mpb", origins, span_u, precision=_hi)
    o_dot_v = jnp.einsum("mpk,bk->mpb", origins, span_v, precision=_hi)
    d_dot_n = jnp.einsum("mrpk,bk->mrpb", directions, normals3, precision=_hi)
    d_dot_u = jnp.einsum("mrpk,bk->mrpb", directions, span_u, precision=_hi)
    d_dot_v = jnp.einsum("mrpk,bk->mrpb", directions, span_v, precision=_hi)

    denominator_safe = jnp.where(
        jnp.abs(d_dot_n) < epsilon,
        jnp.where(d_dot_n >= 0, epsilon, -epsilon),
        d_dot_n,
    )
    distances = (c0_dot_n - o_dot_n)[:, None] / denominator_safe  # [M, R, P, b]
    in_front = jax.nn.sigmoid(softness * (distances - ray_origin_offset))

    proj_u = o_dot_u[:, None] + distances * d_dot_u - c0_dot_u
    proj_v = o_dot_v[:, None] + distances * d_dot_v - c0_dot_v
    u_coord = (proj_u * span_v_sq - proj_v * span_uv) / det_safe
    v_coord = (proj_v * span_u_sq - proj_u * span_uv) / det_safe

    inside_u = jax.nn.sigmoid(softness * u_coord) * jax.nn.sigmoid(
        softness * (1 - u_coord)
    )
    inside_v = jax.nn.sigmoid(softness * v_coord) * jax.nn.sigmoid(
        softness * (1 - v_coord)
    )
    sigma = jnp.clip(inside_u * inside_v * in_front, 0.0, 1.0)

    keep = primitive_valid
    if intersection_distances_target is not None:
        # AABB slab cull with the reference LBVH filter's semantics: a
        # primitive participates when ANY (non-self) ray enters its AABB
        # before reaching the target (artist/raytracing/blocking.py:912-943).
        # Axis-by-axis accumulation avoids any [.., b, 3] tensor.
        aabb_min = jnp.min(corners[:, :, :3], axis=1)  # [b, 3]
        aabb_max = jnp.max(corners[:, :, :3], axis=1)
        entry = jnp.full_like(distances, -jnp.inf)
        exit_ = jnp.full_like(distances, jnp.inf)
        for axis in range(3):
            inverse_direction = 1.0 / (directions[..., axis, None] + 1e-12)
            t_low = (
                aabb_min[:, axis] - origins[:, None, :, None, axis]
            ) * inverse_direction
            t_high = (
                aabb_max[:, axis] - origins[:, None, :, None, axis]
            ) * inverse_direction
            entry = jnp.maximum(entry, jnp.minimum(t_low, t_high))
            exit_ = jnp.minimum(exit_, jnp.maximum(t_low, t_high))
        hit = (
            (exit_ >= entry)
            & (exit_ > 1e-6)
            & (entry <= intersection_distances_target[..., None])
        )
        if own_primitive_mask is not None:
            hit = hit & ~own_primitive_mask[:, None, None, :]
        keep = keep & jax.lax.stop_gradient(jnp.any(hit, axis=(0, 1, 2)))

    return jnp.sum(sigma * keep, axis=-1)


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
    primitive_chunk: int | None = None,
    method: str = "auto",
    max_candidates: int | None = None,
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
        AABB candidate cull reproduces the LBVH filter's semantics
        (reference: artist/raytracing/blocking.py:831-995); the gate is
        non-differentiable like the reference's no-grad cull.
    ray_primitive_indices : jnp.ndarray | None
        Global primitive index owned by each ray-emitting heliostat,
        ``[M]``; used for the cull's non-self marking.
    cull_method : str
        ``"dense"`` (default): vectorized ray x primitive slab test, fused
        into the per-chunk soft mask. ``"lbvh"``: the Karras radix-tree
        traversal from :mod:`artist_tpu.raytracing.lbvh` evaluated once up
        front (identical keep-set; wins only for very large fields).
    primitive_chunk : int | None
        Evaluate primitives in chunks of this size under a rematerialized
        ``lax.scan``; peak memory drops from ``O(M R P B)`` to
        ``O(M R P chunk)`` in forward AND backward. None = single pass.
        XLA path only.
    method : str
        ``"pallas"``: fused TPU kernels - every pair interaction stays in
        VMEM (kernels/blocking_pallas.py), hand-derived VJP, identical
        semantics. ``"xla"``: the chunked dense formulation. ``"auto"``
        (default): pallas on TPU, xla elsewhere.
    max_candidates : int | None
        With the pallas method and target distances given: preselect at most
        this many candidate blockers per ray-owning heliostat
        (:func:`select_blocking_candidates`) and run the pair kernels over
        the compacted ``[M, K]`` set - O(rays x K) instead of
        O(rays x field). The behind-target cull then applies PER RAY inside
        the kernel (physically tighter than the reference's
        any-ray-keeps-the-primitive cull). None = all primitives.

    Returns
    -------
    jnp.ndarray
        blocked in [0, 1]. Shape ``[M, R, P]``.
    """
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "xla"
    if (
        method == "pallas"
        and cull_method == "dense"
        and max_candidates is not None
        and intersection_distances_target is not None
    ):
        from artist_tpu.kernels.blocking_pallas import (
            PRIM_TILE,
            soft_ray_blocking_mask_pallas_compact,
        )

        candidate_indices, candidate_valid = select_blocking_candidates(
            ray_origins,
            ray_directions,
            blocking_primitives_corners,
            ray_primitive_indices,
            intersection_distances_target,
            max_candidates,
        )
        k = candidate_indices.shape[1]
        k_pad = -(-k // PRIM_TILE) * PRIM_TILE
        if k_pad != k:
            pad = ((0, 0), (0, k_pad - k))
            candidate_indices = jnp.pad(candidate_indices, pad)
            candidate_valid = jnp.pad(candidate_valid, pad)
        return soft_ray_blocking_mask_pallas_compact(
            ray_origins,
            ray_directions,
            blocking_primitives_corners,
            blocking_primitives_spans,
            blocking_primitives_normals,
            candidate_indices,
            candidate_valid,
            intersection_distances_target,
            epsilon=epsilon,
            softness=softness,
            alpha=alpha,
            ray_origin_offset=ray_origin_offset,
        )
    if method == "pallas" and cull_method == "dense":
        from artist_tpu.kernels.blocking_pallas import soft_ray_blocking_mask_pallas

        return soft_ray_blocking_mask_pallas(
            ray_origins,
            ray_directions,
            blocking_primitives_corners,
            blocking_primitives_spans,
            blocking_primitives_normals,
            intersection_distances_target=intersection_distances_target,
            ray_primitive_indices=ray_primitive_indices,
            epsilon=epsilon,
            softness=softness,
            alpha=alpha,
            ray_origin_offset=ray_origin_offset,
        )

    number_of_primitives = blocking_primitives_corners.shape[0]
    number_of_heliostats = ray_origins.shape[0]

    own_mask = None
    if ray_primitive_indices is not None:
        own_mask = (
            ray_primitive_indices[:, None]
            == jnp.arange(number_of_primitives)[None, :]
        )  # [M, B]

    primitive_valid = jnp.ones((number_of_primitives,), dtype=bool)
    distances_for_cull = intersection_distances_target
    if cull_method == "lbvh" and intersection_distances_target is not None:
        from artist_tpu.raytracing.lbvh import lbvh_filter_blocking_planes

        primitive_valid = jax.lax.stop_gradient(
            lbvh_filter_blocking_planes(
                ray_origins,
                ray_directions,
                blocking_primitives_corners,
                ray_primitive_indices
                if ray_primitive_indices is not None
                else jnp.full((number_of_heliostats,), -1, jnp.int32),
                intersection_distances_target,
            )
        )
        distances_for_cull = None  # cull already applied

    if primitive_chunk is None or primitive_chunk >= number_of_primitives:
        sigma_sum = _chunk_optical_depth(
            ray_origins,
            ray_directions,
            blocking_primitives_corners,
            blocking_primitives_spans,
            blocking_primitives_normals,
            primitive_valid,
            distances_for_cull,
            own_mask,
            epsilon,
            softness,
            ray_origin_offset,
        )
    else:
        chunk = primitive_chunk
        num_chunks = -(-number_of_primitives // chunk)
        pad = num_chunks * chunk - number_of_primitives

        def pad_primitives(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)]
            ).reshape(num_chunks, chunk, *x.shape[1:])

        corners_c = pad_primitives(blocking_primitives_corners)
        spans_c = pad_primitives(blocking_primitives_spans)
        normals_c = pad_primitives(blocking_primitives_normals)
        valid_c = jnp.concatenate(
            [primitive_valid, jnp.zeros((pad,), bool)]
        ).reshape(num_chunks, chunk)
        own_c = (
            jnp.concatenate(
                [own_mask, jnp.zeros((number_of_heliostats, pad), bool)], axis=1
            )
            .reshape(number_of_heliostats, num_chunks, chunk)
            .swapaxes(0, 1)
            if own_mask is not None
            else jnp.zeros((num_chunks, number_of_heliostats, chunk), bool)
        )

        @jax.checkpoint
        def chunk_body(carry, chunk_data):
            corners_i, spans_i, normals_i, valid_i, own_i = chunk_data
            partial = _chunk_optical_depth(
                ray_origins,
                ray_directions,
                corners_i,
                spans_i,
                normals_i,
                valid_i,
                distances_for_cull,
                own_i if ray_primitive_indices is not None else None,
                epsilon,
                softness,
                ray_origin_offset,
            )
            return carry + partial, None

        init = jnp.zeros(ray_directions.shape[:3], dtype=jnp.float32)
        sigma_sum, _ = jax.lax.scan(
            chunk_body, init, (corners_c, spans_c, normals_c, valid_c, own_c)
        )

    optical_depth = alpha * sigma_sum
    return 1.0 - jnp.exp(-optical_depth)
