"""Fused differentiable render: scatter -> intersect -> block -> splat.

TPU-native re-design of the reference HeliostatRayTracer.trace_rays
(reference: artist/raytracing/heliostat_ray_tracer.py:220-508):

- One jitted function instead of a DataLoader batch loop; memory is bounded
  by an optional ``lax.scan`` over ray chunks (the reference batches over
  heliostats; chunking over the ray axis keeps every heliostat's bitmap
  accumulating on-chip and preserves static shapes).
- Distortion scatter uses the fused component-wise rotation
  (:func:`artist_tpu.geometry.transforms.apply_distortion_rotation`), never
  materializing ``[M, R, P, 4, 4]`` rotation tensors.
- Planar vs cylindrical targets: both intersection kernels run under a
  static guard on the scenario's target-type counts; per-heliostat selection
  is a branch-free where.
- Blocking is the brute-force soft mask (:mod:`artist_tpu.raytracing.blocking`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.geometry.transforms import apply_distortion_rotation
from artist_tpu.raytracing import blocking as blocking_mod
from artist_tpu.raytracing import geometry
from artist_tpu.raytracing.splatting import bilinear_splat

DEFAULT_MIRROR_REFLECTIVITY = 0.935  # reference: heliostat_ray_tracer.py:226


@dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable; becomes part of the jit key)."""

    bitmap_resolution: tuple[int, int] = (256, 256)  # (width_e, height_u)
    mirror_reflectivity: float = DEFAULT_MIRROR_REFLECTIVITY
    ray_extinction_factor: float = 0.0
    ray_chunk: int | None = None  # chunk size along the ray axis (None = all)
    splat_method: str = "auto"  # pallas on TPU, XLA scatter on CPU
    # Per-heliostat splat window (pixels, pallas path): compact-spot
    # workloads pay window^2-wide matmuls instead of bitmap-wide ones.
    # None (default) = exact full-bitmap splat.
    splat_window: int | None = None
    # EXACT per-ray-block dynamic row window (pixels, pallas path): each ray
    # block's splat matmul spans this many rows at the block's own deposit
    # offset; blocks exceeding it fall back to full height in-kernel. Rays
    # are re-ordered point-major over spatial point tiles so blocks have
    # compact spans. None = full-bitmap splat.
    splat_block_window: int | None = None
    # Spatial tile edge for the point reorder (splat_block_window only).
    splat_point_tile: int = 10
    # Surface-point grid layout (points_u, points_v, facets) for the tile
    # reorder; None skips the permutation (plain point-major transpose).
    splat_point_layout: tuple[int, int, int] | None = None
    blocking_active: bool = False
    # Chunk size along the blocking-primitive axis: bounds blocking memory to
    # O(M R P chunk) for fields with many blockers (None = single pass).
    # Applies to the XLA blocking path only.
    primitive_chunk: int | None = None
    # "pallas" (fused VMEM kernels), "xla", or "auto" (pallas on TPU).
    blocking_method: str = "auto"
    # Per-heliostat candidate-blocker budget for the pallas path: the pair
    # kernels run over K preselected candidates (O(rays x K)) instead of the
    # whole field (O(rays x B)). None = no compaction. 16 covers every
    # geometrically plausible neighborhood in grid fields; raise for very
    # dense/low-aim layouts.
    blocking_candidates: int | None = 16
    # Rematerialize each ray chunk in the backward pass instead of storing
    # its residuals: trades recompute FLOPs for O(chunk) instead of O(rays)
    # activation memory - the standard TPU HBM trade for scan bodies.
    remat_chunks: bool = True


def trace_rays(
    tower: SolarTower,
    aligned_surface_points: jnp.ndarray,
    aligned_surface_normals: jnp.ndarray,
    incident_ray_directions: jnp.ndarray,
    target_area_indices: jnp.ndarray,
    distortions_u: jnp.ndarray,
    distortions_e: jnp.ndarray,
    ray_magnitude: float | jnp.ndarray = 1.0,
    blocking_primitives: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    ray_primitive_indices: jnp.ndarray | None = None,
    config: RenderConfig = RenderConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace heliostat rays onto tower targets and splat flux bitmaps.

    reference: artist/raytracing/heliostat_ray_tracer.py:220-508.

    Parameters
    ----------
    tower : SolarTower
        Target-area arrays.
    aligned_surface_points, aligned_surface_normals : jnp.ndarray
        World-frame aligned surfaces. Shape ``[M, P, 4]``.
    incident_ray_directions : jnp.ndarray
        Shape ``[M, 4]``.
    target_area_indices : jnp.ndarray
        Global target index per active heliostat. Shape ``[M]``.
    distortions_u, distortions_e : jnp.ndarray
        Sun scatter angles. Shape ``[M, R, P]``.
    ray_magnitude : float | jnp.ndarray
        Per-ray power (DNI-derived) or 1.0.
    blocking_primitives : tuple | None
        (corners [B, 4, 4], spans [B, 2, 4], normals [B, 4]) of potential
        blockers; required when ``config.blocking_active``.
    ray_primitive_indices : jnp.ndarray | None
        Global primitive index owned by each active heliostat ``[M]``
        (non-self marking in the blocking candidate cull).
    config : RenderConfig
        Static options.

    Returns
    -------
    tuple of jnp.ndarray
        flux bitmaps ``[M, height_u, width_e]``, intercept factor ``[M]``,
        on-target factor ``[M]``, (non-)blocking factor ``[M]``.
    """
    num_active, num_rays, num_points = distortions_u.shape
    resolution = config.bitmap_resolution

    # Preferred reflection directions: one per surface point.
    preferred = geometry.reflect(
        incident_ray_directions[:, None, :], aligned_surface_normals
    )  # [M, P, 4]

    n_planar = tower.number_of_planar_target_areas
    n_cyl = tower.number_of_cylindrical_target_areas
    planar_mask = target_area_indices < n_planar  # [M]

    def trace_chunk(du: jnp.ndarray, de: jnp.ndarray):
        """Process one chunk of rays: [M, r, P] distortions -> partial sums."""
        ray_directions = apply_distortion_rotation(
            e=de, u=du, directions=preferred[:, None, :, :]
        )  # [M, r, P, 4]
        magnitudes = jnp.asarray(ray_magnitude, dtype=jnp.float32)

        if n_cyl == 0:
            bitmap_e, bitmap_u, distances, intensities = (
                geometry.line_plane_intersections(
                    ray_directions,
                    magnitudes,
                    aligned_surface_points,
                    tower,
                    target_area_indices,
                    resolution,
                )
            )
        elif n_planar == 0:
            bitmap_e, bitmap_u, distances, intensities = (
                geometry.line_cylinder_intersections(
                    ray_directions,
                    magnitudes,
                    aligned_surface_points,
                    tower,
                    target_area_indices - n_planar,
                    resolution,
                )
            )
        else:
            p_idx = jnp.clip(target_area_indices, 0, n_planar - 1)
            c_idx = jnp.clip(target_area_indices - n_planar, 0, n_cyl - 1)
            plane = geometry.line_plane_intersections(
                ray_directions, magnitudes, aligned_surface_points, tower, p_idx,
                resolution,
            )
            cylinder = geometry.line_cylinder_intersections(
                ray_directions, magnitudes, aligned_surface_points, tower, c_idx,
                resolution,
            )
            select = planar_mask[:, None, None]
            bitmap_e, bitmap_u, distances, intensities = (
                jnp.where(select, a, b) for a, b in zip(plane, cylinder)
            )

        if config.blocking_active:
            corners, spans, normals = blocking_primitives
            blocked = blocking_mod.soft_ray_blocking_mask(
                ray_origins=aligned_surface_points,
                ray_directions=ray_directions,
                blocking_primitives_corners=corners,
                blocking_primitives_spans=spans,
                blocking_primitives_normals=normals,
                intersection_distances_target=distances,
                ray_primitive_indices=ray_primitive_indices,
                primitive_chunk=config.primitive_chunk,
                method=config.blocking_method,
                max_candidates=config.blocking_candidates,
            )
        else:
            blocked = jnp.zeros_like(intensities)

        final_intensities = (
            intensities
            * (1.0 - blocked)
            * (1.0 - config.ray_extinction_factor)
            * config.mirror_reflectivity
        )

        if config.splat_block_window is not None:
            # Dynamic-window splat wants point-major, spatially tiled ray
            # order: consecutive rays then share compact deposit spans
            # (sun-cone spread per point is ~15 px p50 vs the ~185 px whole
            # spot). The permutation is static; gradients flow through the
            # gather/transpose unchanged.
            from artist_tpu.raytracing.splatting import point_tile_order

            if config.splat_point_layout is not None:
                pu, pv, facets = config.splat_point_layout
                perm = jnp.asarray(
                    point_tile_order(pu, pv, facets, config.splat_point_tile),
                    jnp.int32,
                )
            else:
                perm = None

            def point_major(x: jnp.ndarray) -> jnp.ndarray:
                x = jnp.swapaxes(x, 1, 2)  # [M, P, r]
                if perm is not None:
                    x = jnp.take(x, perm, axis=1)
                return x

            partial_flux = bilinear_splat(
                point_major(bitmap_e),
                point_major(bitmap_u),
                point_major(final_intensities),
                resolution,
                flip_up_down=False,
                method=config.splat_method,
                block_window=config.splat_block_window,
            )
        else:
            partial_flux = bilinear_splat(
                bitmap_e,
                bitmap_u,
                final_intensities,
                resolution,
                flip_up_down=False,
                method=config.splat_method,
                window=config.splat_window,
            )
        on_target_count = jnp.sum(intensities > 0, axis=(1, 2))
        unblocked_count = jnp.sum(blocked < 1e-3, axis=(1, 2))
        intercept_count = jnp.sum(final_intensities > 0, axis=(1, 2))
        return partial_flux, on_target_count, unblocked_count, intercept_count

    chunk = config.ray_chunk
    if chunk is None or chunk >= num_rays:
        flux, on_target_count, unblocked_count, intercept_count = trace_chunk(
            distortions_u, distortions_e
        )
    else:
        if num_rays % chunk != 0:
            raise ValueError(
                f"ray_chunk ({chunk}) must divide the number of rays ({num_rays})."
            )
        num_chunks = num_rays // chunk
        du = distortions_u.reshape(num_active, num_chunks, chunk, num_points)
        de = distortions_e.reshape(num_active, num_chunks, chunk, num_points)

        # Remat each chunk, but SAVE the blocking pair kernel's summed sigma
        # (named inside the Pallas mask paths): the cotangent of the
        # Beer-Lambert mask needs sigma's value, so a plain remat re-runs
        # the whole forward pair kernel in the backward. Saving it costs
        # O(rays) fp32 per chunk and removes one of the three pair-kernel
        # passes. With blocking off nothing is named and this is identical
        # to jax.checkpoint's default full remat.
        chunk_fn = (
            jax.checkpoint(
                trace_chunk,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "blocking_sigma"
                ),
            )
            if config.remat_chunks
            else trace_chunk
        )

        def body(carry, chunk_slices):
            du_c, de_c = chunk_slices
            partial = chunk_fn(du_c, de_c)
            return jax.tree.map(jnp.add, carry, partial), None

        init = (
            jnp.zeros(
                (num_active, resolution[1], resolution[0]), dtype=jnp.float32
            ),
            jnp.zeros((num_active,), dtype=jnp.int32),
            jnp.zeros((num_active,), dtype=jnp.int32),
            jnp.zeros((num_active,), dtype=jnp.int32),
        )
        (flux, on_target_count, unblocked_count, intercept_count), _ = jax.lax.scan(
            body,
            init,
            (jnp.moveaxis(du, 1, 0), jnp.moveaxis(de, 1, 0)),
        )

    # Bitmap origin is bottom-left: flip rows once at the end
    # (reference: heliostat_ray_tracer.py:778).
    flux = jnp.flip(flux, axis=1)

    rays_per_heliostat = num_rays * num_points
    intercept_factor = intercept_count / rays_per_heliostat
    on_target_factor = on_target_count / rays_per_heliostat
    blocking_factor = unblocked_count / rays_per_heliostat
    return flux, intercept_factor, on_target_factor, blocking_factor


def get_bitmaps_per_target(
    bitmaps_per_heliostat: jnp.ndarray,
    target_area_indices: jnp.ndarray,
    number_of_target_areas: int,
) -> jnp.ndarray:
    """Sum per-heliostat bitmaps into per-target bitmaps (segment sum).

    reference: artist/raytracing/heliostat_ray_tracer.py:563-608 (a Python
    loop over targets there; one segment_sum here).
    """
    return jax.ops.segment_sum(
        bitmaps_per_heliostat,
        target_area_indices,
        num_segments=number_of_target_areas,
    )


def compute_ray_magnitude(
    dni: float,
    canting: jnp.ndarray,
    number_of_surface_points: int,
    number_of_rays: int,
) -> float:
    """Per-ray power from direct normal irradiance and heliostat area.

    Heliostat dimensions are derived from the canting-vector norms of the
    first heliostat (facet half-extents x 4 + 2 cm gap), as in the reference
    (artist/raytracing/heliostat_ray_tracer.py:185-203).
    """
    canting_norm = jnp.linalg.norm(canting[0], axis=-1)[0][:2]
    dimensions = canting_norm * 4 + 0.02
    area = float(dimensions[0] * dimensions[1])
    power = dni * area
    return power / (number_of_surface_points * number_of_rays)
