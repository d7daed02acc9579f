"""LBVH parity vs the torch reference (Morton codes, tree, cull set).

reference: artist/raytracing/blocking.py:357-995.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.raytracing import lbvh as jlbvh
from artist_tpu.raytracing.blocking import (
    _global_primitive_cull,
    create_blocking_primitives_rectangle,
)


def _random_field(num_heliostats: int, seed: int = 3):
    """Random upright rectangle primitives scattered over a field."""
    rng = np.random.RandomState(seed)
    centers = np.zeros((num_heliostats, 3))
    centers[:, 0] = rng.uniform(-60, 60, num_heliostats)
    centers[:, 1] = rng.uniform(10, 180, num_heliostats)
    centers[:, 2] = rng.uniform(1.5, 2.5, num_heliostats)
    width, height = 3.2, 2.5
    corners = np.zeros((num_heliostats, 4, 4), np.float32)
    for i, c in enumerate(centers):
        corners[i, 0, :3] = c + [-width / 2, 0, -height / 2]
        corners[i, 1, :3] = c + [-width / 2, 0, height / 2]
        corners[i, 2, :3] = c + [width / 2, 0, height / 2]
        corners[i, 3, :3] = c + [width / 2, 0, -height / 2]
    corners[..., 3] = 1.0
    return corners


@pytest.mark.parametrize("num", [2, 5, 33])
def test_morton_codes_match_reference(reference_artist, num):
    import torch
    from artist.raytracing import blocking as ref_blocking

    rng = np.random.RandomState(0)
    points = rng.uniform(-100, 100, (num, 3)).astype(np.float32)
    ours = np.asarray(jlbvh.morton_codes(jnp.asarray(points)))
    theirs = ref_blocking.morton_codes(
        coordinates=torch.tensor(points), epsilon=1e-6
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_expand_bits_matches_reference(reference_artist):
    import torch
    from artist.raytracing import blocking as ref_blocking

    values = np.arange(0, 1024, 7, dtype=np.int32)
    ours = np.asarray(jlbvh.expand_bits(jnp.asarray(values)))
    theirs = ref_blocking.expand_bits(torch.tensor(values, dtype=torch.int32)).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("num", [2, 7, 64])
def test_tree_structure_matches_reference(reference_artist, num):
    import torch
    from artist.raytracing import blocking as ref_blocking

    corners = _random_field(num)
    ours = jlbvh.build_linear_bounding_volume_hierarchies(jnp.asarray(corners))
    theirs = ref_blocking.build_linear_bounding_volume_hierarchies(
        blocking_primitives_corners=torch.tensor(corners),
        device=torch.device("cpu"),
    )
    from artist.util import constants as ref_constants

    np.testing.assert_array_equal(
        np.asarray(ours.left), theirs[ref_constants.left_node].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.right), theirs[ref_constants.right_node].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.is_leaf), theirs[ref_constants.is_leaf].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.primitive_index),
        theirs[ref_constants.primitive_index].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(ours.aabb_min), theirs[ref_constants.aabb_min].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.aabb_max), theirs[ref_constants.aabb_max].numpy(), atol=1e-6
    )


def _rays_towards_north(corners, num_heliostats, num_points=5, num_rays=3, seed=1):
    """Rays from each primitive's face, roughly north (through the field)."""
    rng = np.random.RandomState(seed)
    centers = corners[:, :, :3].mean(axis=1)
    origins = np.repeat(centers[:, None, :], num_points, axis=1)
    origins += rng.uniform(-1, 1, origins.shape) * 0.3
    directions = np.zeros((num_heliostats, num_rays, num_points, 3))
    directions[..., 1] = 1.0
    directions[..., 0] = rng.uniform(-0.2, 0.2, directions[..., 0].shape)
    directions[..., 2] = rng.uniform(-0.05, 0.05, directions[..., 2].shape)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    origins4 = np.concatenate([origins, np.ones(origins.shape[:-1] + (1,))], -1)
    directions4 = np.concatenate(
        [directions, np.zeros(directions.shape[:-1] + (1,))], -1
    )
    t_target = np.full((num_heliostats, num_rays, num_points), 250.0)
    return (
        origins4.astype(np.float32),
        directions4.astype(np.float32),
        t_target.astype(np.float32),
    )


@pytest.mark.parametrize("num", [4, 16])
def test_cull_set_matches_reference_and_dense(reference_artist, num):
    import torch
    from artist.raytracing import blocking as ref_blocking

    corners = _random_field(num)
    origins, directions, t_target = _rays_towards_north(corners, num)
    owners = np.arange(num, dtype=np.int32)

    keep_lbvh = np.asarray(
        jlbvh.lbvh_filter_blocking_planes(
            jnp.asarray(origins),
            jnp.asarray(directions),
            jnp.asarray(corners),
            jnp.asarray(owners),
            jnp.asarray(t_target),
        )
    )
    keep_dense = np.asarray(
        _global_primitive_cull(
            jnp.asarray(origins),
            jnp.asarray(directions),
            jnp.asarray(corners),
            jnp.asarray(t_target),
            jnp.asarray(owners),
        )
    )

    num_rays = directions.shape[1]
    ray_owner = torch.tensor(
        np.repeat(owners, num_rays * origins.shape[1]), dtype=torch.int64
    )
    hit_indices = ref_blocking.lbvh_filter_blocking_planes(
        points_at_ray_origins=torch.tensor(origins),
        ray_directions=torch.tensor(directions),
        blocking_primitives_corners=torch.tensor(corners),
        ray_to_heliostat_mapping=ray_owner,
        intersection_distances_target=torch.tensor(t_target),
        device=torch.device("cpu"),
    ).numpy()
    keep_reference = np.zeros(num, bool)
    keep_reference[hit_indices] = True

    np.testing.assert_array_equal(keep_lbvh, keep_reference)
    np.testing.assert_array_equal(keep_dense, keep_reference)


def test_nearest_corner_primitives_match_reference(reference_artist):
    import torch
    from artist.raytracing import blocking as ref_blocking

    rng = np.random.RandomState(5)
    num, side = 3, 6
    e, n = np.meshgrid(
        np.linspace(-1.6, 1.6, side), np.linspace(-1.25, 1.25, side)
    )
    flat = np.stack(
        [e.ravel(), n.ravel(), np.zeros(side * side), np.ones(side * side)], -1
    )
    flat = np.repeat(flat[None], num, axis=0).astype(np.float32)
    flat[:, :, :2] += rng.uniform(-0.01, 0.01, (num, side * side, 2)).astype(
        np.float32
    )
    # "Aligned" points: arbitrary rigid motion per heliostat.
    aligned = flat.copy()
    aligned[:, :, 2] = 0.3 * aligned[:, :, 0] + 1.8
    aligned[:, :, 1] += np.arange(num, dtype=np.float32)[:, None] * 10

    ours = create_blocking_primitives_rectangle(
        jnp.asarray(flat), jnp.asarray(aligned)
    )
    theirs = ref_blocking.create_blocking_primitives_rectangle(
        blocking_heliostats_surface_points=torch.tensor(flat),
        blocking_heliostats_active_surface_points=torch.tensor(aligned),
        device=torch.device("cpu"),
    )
    for mine, ref in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-6)


def test_lbvh_is_jittable():
    corners = _random_field(8)
    origins, directions, t_target = _rays_towards_north(corners, 8)
    owners = jnp.arange(8, dtype=jnp.int32)
    fn = jax.jit(jlbvh.lbvh_filter_blocking_planes)
    keep = fn(
        jnp.asarray(origins),
        jnp.asarray(directions),
        jnp.asarray(corners),
        owners,
        jnp.asarray(t_target),
    )
    assert keep.shape == (8,)
