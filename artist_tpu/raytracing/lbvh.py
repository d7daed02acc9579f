"""Linear bounding volume hierarchy (Karras, HPG 2012) - TPU-native build.

reference: artist/raytracing/blocking.py:357-995 (Morton codes, vectorized
longest-common-prefix, batched radix-tree construction, iterative AABB DAG
propagation, slab-method ray/AABB test, per-ray stack traversal).

TPU design notes
----------------
- The reference's build already is data-parallel; here every data-dependent
  ``while`` becomes either a statically-unrolled loop (iteration counts are
  functions of the STATIC primitive count, so XLA sees fixed trip counts) or
  a ``lax.while_loop`` (AABB propagation, trip count = tree depth).
- The per-ray stack traversal is the one genuinely irregular piece. It is
  kept as a ``vmap``-ed ``lax.while_loop`` over a fixed-size stack for API
  parity and for very large fields; the DEFAULT cull in
  :mod:`artist_tpu.raytracing.blocking` is the dense ray x primitive slab
  test, which computes the identical keep-set with MXU/VPU-friendly dense
  math and is faster for fields up to thousands of primitives.
- Everything here is non-differentiable by construction (the reference wraps
  it in ``@torch.no_grad``); gradients flow only through the soft mask.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

_MORTON_BITS = 30


def expand_bits(integers: jnp.ndarray) -> jnp.ndarray:
    """Expand the lower 10 bits by inserting two zero bits between each bit.

    Standard Morton bit-spreading (public-domain magic constants).
    reference: artist/raytracing/blocking.py:357-389.
    """
    expanded = integers.astype(jnp.int32) & 0x000003FF
    for shift, mask in ((16, 0x030000FF), (8, 0x0300F00F), (4, 0x030C30C3), (2, 0x09249249)):
        expanded = (expanded | (expanded << shift)) & mask
    return expanded


def morton_codes(coordinates: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Map 3D points to 30-bit Morton codes with (n, e, u) bit priority.

    North gets the highest interleave priority, then east, then up: heliostat
    fields are laid out in the EN plane and blocking is decided there.
    reference: artist/raytracing/blocking.py:392-445.

    Parameters
    ----------
    coordinates : jnp.ndarray
        Shape ``[B, 3]`` (e, n, u).
    """
    bits = 10
    mins = jnp.min(coordinates, axis=0)
    maxs = jnp.max(coordinates, axis=0)
    scale = (1 << bits) - 1
    scaled = (
        (coordinates - mins) * (scale / (jnp.max(maxs - mins) + epsilon))
    ).astype(jnp.int32)

    u = expand_bits(scaled[:, 2])
    e = expand_bits(scaled[:, 0]) << 1
    n = expand_bits(scaled[:, 1]) << 2
    return n | e | u


def _leading_zeros32(values: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of 32-bit values (valid for values != 0)."""
    values = values.astype(jnp.int32)
    zeros = jnp.zeros_like(values)
    for shift in (16, 8, 4, 2, 1):
        mask = (values >> (32 - shift)) == 0
        zeros = zeros + shift * mask.astype(jnp.int32)
        values = jnp.where(mask, values << shift, values)
    return zeros


def longest_common_prefix(
    codes: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray
) -> jnp.ndarray:
    """LCP (in bits, out of 30) between sorted Morton codes ``codes[i]``, ``codes[j]``.

    Out-of-range ``j`` yields -1. Equal codes are tie-broken by the index LCP
    (Karras section 4: conceptually augment the code with its index), which
    keeps the radix tree well-formed even with duplicate centroids - the one
    deliberate hardening over the reference, which returns a flat 30.
    reference: artist/raytracing/blocking.py:448-510.
    """
    n = codes.shape[0]
    valid = (j >= 0) & (j < n)
    j_safe = jnp.clip(j, 0, n - 1)
    differing = codes[i] ^ codes[j_safe]
    msb = 31 - _leading_zeros32(differing)
    lcp = (_MORTON_BITS - 1) - msb
    index_differing = (i ^ j_safe).astype(jnp.int32)
    tie_broken = _MORTON_BITS + _leading_zeros32(index_differing)
    lcp = jnp.where(differing == 0, tie_broken, lcp)
    return jnp.where(valid, lcp, -1)


@flax.struct.dataclass
class LBVH:
    """Flat radix-tree arrays; leaves stored after the B-1 internal nodes."""

    left: jnp.ndarray  # [2B-1] child index, -1 if leaf
    right: jnp.ndarray  # [2B-1]
    aabb_min: jnp.ndarray  # [2B-1, 3]
    aabb_max: jnp.ndarray  # [2B-1, 3]
    is_leaf: jnp.ndarray  # [2B-1] bool
    primitive_index: jnp.ndarray  # [2B-1] original primitive, -1 internal


def build_linear_bounding_volume_hierarchies(
    blocking_primitives_corners: jnp.ndarray,
) -> LBVH:
    """Build the LBVH over rectangle primitives (fully batched, jittable).

    reference: artist/raytracing/blocking.py:513-749.

    Parameters
    ----------
    blocking_primitives_corners : jnp.ndarray
        Shape ``[B, 4, 4]``.
    """
    corners = blocking_primitives_corners[..., :3]
    number_of_primitives = corners.shape[0]
    primitive_mins = jnp.min(corners, axis=1)
    primitive_maxs = jnp.max(corners, axis=1)

    if number_of_primitives == 0:
        empty_i = jnp.empty((0,), jnp.int32)
        empty_f = jnp.empty((0, 3), corners.dtype)
        return LBVH(empty_i, empty_i, empty_f, empty_f,
                    jnp.empty((0,), bool), empty_i)
    if number_of_primitives == 1:
        return LBVH(
            left=jnp.full((1,), -1, jnp.int32),
            right=jnp.full((1,), -1, jnp.int32),
            aabb_min=primitive_mins,
            aabb_max=primitive_maxs,
            is_leaf=jnp.ones((1,), bool),
            primitive_index=jnp.zeros((1,), jnp.int32),
        )

    centroids = jnp.mean(corners, axis=1)
    codes = morton_codes(centroids)
    order = jnp.argsort(codes)
    sorted_codes = codes[order]

    ids = jnp.arange(number_of_primitives, dtype=jnp.int32)
    lcp_right = longest_common_prefix(sorted_codes, ids, ids + 1)
    lcp_left = longest_common_prefix(sorted_codes, ids, ids - 1)
    direction = (lcp_right > lcp_left).astype(jnp.int32) * 2 - 1
    delta_min = jnp.minimum(lcp_left, lcp_right)

    # Upper bound on the range length: double l_max until the LCP drops to
    # delta_min. l_max <= 2 * B, so ceil(log2(2B)) unrolled steps suffice -
    # the trip count is static because B is static under jit.
    doubling_steps = max(1, math.ceil(math.log2(2 * number_of_primitives)) + 1)
    l_max = jnp.full((number_of_primitives,), 2, jnp.int32)
    for _ in range(doubling_steps):
        candidate = longest_common_prefix(sorted_codes, ids, ids + l_max * direction)
        l_max = jnp.where(candidate > delta_min, l_max * 2, l_max)

    # Binary-search the exact range end (per-element step sizes).
    length = jnp.zeros((number_of_primitives,), jnp.int32)
    t = l_max // 2
    for _ in range(doubling_steps + 1):
        candidate = longest_common_prefix(
            sorted_codes, ids, ids + (length + t) * direction
        )
        length = jnp.where((t >= 1) & (candidate > delta_min), length + t, length)
        t = t // 2
    farthest = ids + length * direction

    # Split position: highest LCP inside [i, farthest]. Same floor-halving
    # step schedule as the reference so trees match node-for-node.
    delta_node = longest_common_prefix(sorted_codes, ids, farthest)
    split = jnp.zeros((number_of_primitives,), jnp.int32)
    t = (length + 1) // 2
    for _ in range(doubling_steps + 1):
        candidate = longest_common_prefix(
            sorted_codes, ids, ids + (split + t) * direction
        )
        split = jnp.where((t >= 1) & (candidate > delta_node), split + t, split)
        t = t // 2

    gamma = ids + split * direction + jnp.minimum(direction, 0)

    internal_count = number_of_primitives - 1
    leaf_offset = internal_count
    total_nodes = 2 * number_of_primitives - 1

    min_index = jnp.minimum(ids, farthest)
    max_index = jnp.maximum(ids, farthest)
    left_internal = jnp.where(
        min_index[:internal_count] == gamma[:internal_count],
        leaf_offset + gamma[:internal_count],
        gamma[:internal_count],
    ).astype(jnp.int32)
    right_internal = jnp.where(
        max_index[:internal_count] == gamma[:internal_count] + 1,
        leaf_offset + gamma[:internal_count] + 1,
        gamma[:internal_count] + 1,
    ).astype(jnp.int32)

    left = jnp.concatenate(
        [left_internal, jnp.full((number_of_primitives,), -1, jnp.int32)]
    )
    right = jnp.concatenate(
        [right_internal, jnp.full((number_of_primitives,), -1, jnp.int32)]
    )
    is_leaf = jnp.arange(total_nodes) >= leaf_offset
    primitive_index = jnp.concatenate(
        [jnp.full((internal_count,), -1, jnp.int32), order.astype(jnp.int32)]
    )

    # Bottom-up AABB propagation: internal node i is ready once both children
    # are; iterate until converged (trip count = tree depth).
    aabb_min = jnp.concatenate(
        [jnp.zeros((internal_count, 3), corners.dtype), primitive_mins[order]]
    )
    aabb_max = jnp.concatenate(
        [jnp.zeros((internal_count, 3), corners.dtype), primitive_maxs[order]]
    )
    done = is_leaf

    # Round bound mirrors the reference's `rounds < internal_count * 2` guard
    # against malformed trees.
    def cond(state):
        _mins, _maxs, done, rounds = state
        return ~jnp.all(done) & (rounds < 2 * internal_count)

    def body(state):
        mins, maxs, done, rounds = state
        left_done = done[left_internal]
        right_done = done[right_internal]
        ready = ~done[:internal_count] & left_done & right_done
        new_min = jnp.minimum(mins[left_internal], mins[right_internal])
        new_max = jnp.maximum(maxs[left_internal], maxs[right_internal])
        pad = jnp.zeros((number_of_primitives,), bool)
        ready_full = jnp.concatenate([ready, pad])
        mins = jnp.where(
            ready_full[:, None],
            jnp.concatenate([new_min, mins[leaf_offset:]]),
            mins,
        )
        maxs = jnp.where(
            ready_full[:, None],
            jnp.concatenate([new_max, maxs[leaf_offset:]]),
            maxs,
        )
        return mins, maxs, done | ready_full, rounds + 1

    aabb_min, aabb_max, _, _ = jax.lax.while_loop(
        cond, body, (aabb_min, aabb_max, done, jnp.int32(0))
    )

    return LBVH(left, right, aabb_min, aabb_max, is_leaf, primitive_index)


def ray_aabb_intersect(
    ray_origins: jnp.ndarray,
    inverse_ray_directions: jnp.ndarray,
    aabb_min: jnp.ndarray,
    aabb_max: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method entry/exit distances (broadcasting over leading dims).

    reference: artist/raytracing/blocking.py:752-791.
    """
    low = (aabb_min - ray_origins) * inverse_ray_directions
    high = (aabb_max - ray_origins) * inverse_ray_directions
    entry = jnp.max(jnp.minimum(low, high), axis=-1)
    exit_ = jnp.min(jnp.maximum(low, high), axis=-1)
    return entry, exit_


def lbvh_filter_blocking_planes(
    points_at_ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    blocking_primitives_corners: jnp.ndarray,
    ray_to_heliostat_mapping: jnp.ndarray,
    intersection_distances_target: jnp.ndarray,
    stack_size: int = 64,
) -> jnp.ndarray:
    """Cull blocking primitives via per-ray LBVH traversal.

    Returns a boolean keep-flag per primitive: True when at least one ray
    (not originating from that primitive's own heliostat) enters its AABB
    before reaching its target hit. Semantics identical to the dense cull in
    :func:`artist_tpu.raytracing.blocking.soft_ray_blocking_mask`.
    reference: artist/raytracing/blocking.py:831-995 (which returns the hit
    indices; boolean flags are the static-shape equivalent).

    Parameters
    ----------
    points_at_ray_origins : jnp.ndarray
        Shape ``[M, P, 4]`` (expanded over the ray axis internally).
    ray_directions : jnp.ndarray
        Shape ``[M, R, P, 4]``.
    blocking_primitives_corners : jnp.ndarray
        Shape ``[B, 4, 4]``.
    ray_to_heliostat_mapping : jnp.ndarray
        Owning primitive index per ray-origin heliostat. Shape ``[M]``.
    intersection_distances_target : jnp.ndarray
        Shape ``[M, R, P]``.
    stack_size : int
        Traversal stack bound. Karras trees over Morton-sorted input are
        ~log2(B) deep; 64 covers any realistic field (the reference raises
        on overflow; here overflowing pushes are dropped, which can only
        under-approximate the keep-set in pathological trees).
    """
    number_of_rays = ray_directions.shape[1]
    origins = jnp.broadcast_to(
        points_at_ray_origins[:, None, :, :3], ray_directions[..., :3].shape
    ).reshape(-1, 3)
    directions = ray_directions[..., :3].reshape(-1, 3)
    owners = jnp.repeat(
        ray_to_heliostat_mapping,
        number_of_rays * points_at_ray_origins.shape[1],
    )
    t_target = intersection_distances_target.reshape(-1)

    lbvh = build_linear_bounding_volume_hierarchies(blocking_primitives_corners)
    number_of_primitives = blocking_primitives_corners.shape[0]
    if number_of_primitives == 0:
        return jnp.zeros((0,), bool)

    inverse_directions = 1.0 / (directions + 1e-12)

    def traverse_one(origin, inverse_direction, owner, t_max):
        stack = jnp.full((stack_size,), -1, jnp.int32).at[0].set(0)
        flags = jnp.zeros((number_of_primitives,), bool)

        def cond(state):
            _stack, pointer, _flags = state
            return pointer > 0

        def body(state):
            stack, pointer, flags = state
            node = stack[pointer - 1]
            pointer = pointer - 1
            entry, exit_ = ray_aabb_intersect(
                origin,
                inverse_direction,
                lbvh.aabb_min[node],
                lbvh.aabb_max[node],
            )
            hit = (exit_ >= entry) & (exit_ > 1e-6) & (entry <= t_max)
            leaf = lbvh.is_leaf[node]
            primitive = lbvh.primitive_index[node]
            flags = flags.at[primitive].set(
                flags[primitive] | (hit & leaf & (primitive != owner))
            )
            push = hit & ~leaf
            left_child = lbvh.left[node]
            right_child = lbvh.right[node]
            stack = stack.at[jnp.minimum(pointer, stack_size - 1)].set(
                jnp.where(push, left_child, stack[jnp.minimum(pointer, stack_size - 1)])
            )
            pointer = pointer + jnp.where(push, 1, 0)
            stack = stack.at[jnp.minimum(pointer, stack_size - 1)].set(
                jnp.where(push, right_child, stack[jnp.minimum(pointer, stack_size - 1)])
            )
            pointer = pointer + jnp.where(push, 1, 0)
            pointer = jnp.minimum(pointer, stack_size)
            return stack, pointer, flags

        _, _, flags = jax.lax.while_loop(
            cond, body, (stack, jnp.int32(1), flags)
        )
        return flags

    flags = jax.vmap(traverse_one)(origins, inverse_directions, owners, t_target)
    return jnp.any(flags, axis=0)
