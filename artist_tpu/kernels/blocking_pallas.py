"""Pallas TPU kernels for the soft ray-blocking mask.

The XLA formulation of heliostat-on-heliostat blocking materializes
``[M, R, P, B_chunk]`` dot-product tensors in HBM for every term of the
soft mask (artist_tpu/raytracing/blocking.py), then rematerializes them in
the backward scan - at production scale the blocking pass costs ~5x the
whole unblocked render step. These kernels keep every pair interaction in
VMEM: rays stream through in blocks, primitives tile across grid steps,
and each pair tile is pure fp32 VPU work that never touches HBM.

Layout (the part that matters on TPU): pair tiles are
``[PRIM_TILE=8 sublanes, RAY_BLOCK lanes]``. Ray vectors arrive as 1D
blocks - already lane-major - so broadcasting them across the 8 primitive
sublanes is free; per-primitive scalars arrive as ``[8, 1]`` column blocks
broadcasting across lanes. Putting rays on sublanes instead (the naive
``x[:, None]`` formulation) forces a Mosaic relayout of every ray vector
per tile and ran barely faster than the XLA path. Divisions are hoisted:
the Gram determinant enters as a precomputed reciprocal and the plane
denominator is inverted once per pair and reused.

Decomposition:
- ``_cull_kernel``: non-differentiable AABB slab test vs. the target-hit
  distance; OR-reduces over rays to the per-primitive participation mask
  (the reference LBVH filter's semantics,
  artist/raytracing/blocking.py:912-943).
- ``_sigma_forward_kernel``: the soft mask's optical depth
  ``sigma[t] = sum_b s(k uc) s(k(1-uc)) s(k vc) s(k(1-vc)) s(k(t-off))``.
- ``_sigma_bwd_rays_kernel`` / ``_sigma_bwd_prims_kernel``: hand-derived
  VJP, split in two so each kernel's accumulated output block is revisited
  only on consecutive grid steps (rays-fast for per-primitive grads,
  primitives-fast for per-ray grads). Both recompute the pair forward from
  the streamed inputs - remat in VMEM instead of HBM residuals.

The kernels take PRE-REDUCED per-primitive quantities (``c0.n``, Gram
entries, reciprocal determinant, ...) as inputs; their cotangents flow
back through the XLA graph into corners/spans/normals automatically, so
the custom VJP only covers the pair math.

reference semantics: artist/raytracing/blocking.py:212-354.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = int(os.environ.get("ARTIST_BLOCKING_RAY_BLOCK", 2048))
# Backward kernels hold ~15 live [8, block] fp32 temporaries.
BWD_RAY_BLOCK = int(os.environ.get("ARTIST_BLOCKING_BWD_RAY_BLOCK", 2048))
# 16 measured best on v5e at the production shape (8: -5%, 32: -12%).
PRIM_TILE = int(os.environ.get("ARTIST_BLOCKING_PRIM_TILE", 16))


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# Clamp for the soft-gate exponentials: exp(80) ~ 5.5e34 stays finite in
# fp32, so every per-term slope ratio like (au - bu) / dU below is finite
# even deep in saturation (where sigma itself underflows to exactly 0).
_EXP_CLAMP = 80.0


def _pair_terms(
    rays, prims, softness, ray_origin_offset, epsilon=1e-12, t_target_row=None
):
    """Shared pair math for one [PRIM_TILE, block] tile.

    ``rays``: tuple of [block] lane vectors; ``prims``: tuple of [tile, 1]
    columns. All outputs are [tile, block].

    The five soft gates are evaluated in ONE-DIVIDE form: the identity
    ``sigmoid(k a) sigmoid(k (1 - a)) == 1 / (1 + e^{-k a} + e^{-k (1 - a)}
    + e^{-k})`` collapses the window products, so the whole pair costs five
    (clamped) exponentials and a single divide instead of five stable
    logistics each carrying their own select + divide - the kernels are
    VPU-bound and this is measurably the dominant term. Numerically equal
    to the sigmoid form to ~1e-7 on sigma sums.

    ``t_target_row`` ([block] or None): per-ray distance to the target hit.
    When given, pairs whose plane intersection lies beyond the target are
    hard-gated to zero - the per-ray form of the reference LBVH cull's
    "blockers beyond the target hit do not block" semantics
    (artist/raytracing/blocking.py:912-943). The gate is treated as a
    constant in the VJP, matching the reference's no-grad cull.
    """
    ox, oy, oz, dx, dy, dz, ray_valid = rays
    (
        nx, ny, nz, ux, uy, uz, vx, vy, vz,
        c0n, c0u, c0v, suu, svv, suv, inv_det,
    ) = prims

    row = lambda x: x[None, :]  # noqa: E731 - [block] -> [1, block]
    o_dot_n = row(ox) * nx + row(oy) * ny + row(oz) * nz
    o_dot_u = row(ox) * ux + row(oy) * uy + row(oz) * uz
    o_dot_v = row(ox) * vx + row(oy) * vy + row(oz) * vz
    d_dot_n = row(dx) * nx + row(dy) * ny + row(dz) * nz
    d_dot_u = row(dx) * ux + row(dy) * uy + row(dz) * uz
    d_dot_v = row(dx) * vx + row(dy) * vy + row(dz) * vz

    denominator_ok = jnp.abs(d_dot_n) >= epsilon
    denominator = jnp.where(
        denominator_ok, d_dot_n, jnp.where(d_dot_n >= 0, epsilon, -epsilon)
    )
    inv_denominator = 1.0 / denominator
    t = (c0n - o_dot_n) * inv_denominator

    proj_u = o_dot_u + t * d_dot_u - c0u
    proj_v = o_dot_v + t * d_dot_v - c0v
    u_coord = (proj_u * svv - proj_v * suv) * inv_det
    v_coord = (proj_v * suu - proj_u * suv) * inv_det

    k = softness
    exp = lambda a: jnp.exp(jnp.minimum(a, _EXP_CLAMP))  # noqa: E731
    au = exp(-k * u_coord)
    bu = exp(-k * (1.0 - u_coord))
    av = exp(-k * v_coord)
    bv = exp(-k * (1.0 - v_coord))
    ct = exp(-k * (t - ray_origin_offset))
    const = math.exp(-k)  # e^{-k a} e^{-k (1-a)}; underflows like the
    denom_u = 1.0 + au + bu + const  # sigmoid form's saturated tails
    denom_v = 1.0 + av + bv + const
    denom_t = 1.0 + ct

    numerator = row(ray_valid)
    if t_target_row is not None:
        numerator = numerator * (t <= row(t_target_row)).astype(
            numerator.dtype
        )
    sigma = numerator / (denom_u * denom_v * denom_t)
    return sigma, (
        d_dot_u,
        d_dot_v,
        inv_denominator,
        denominator_ok,
        t,
        proj_u,
        proj_v,
        u_coord,
        v_coord,
        au,
        bu,
        av,
        bv,
        ct,
        denom_u,
        denom_v,
        denom_t,
    )


def _pair_gradients(
    rays,
    prims,
    gbar,
    softness,
    ray_origin_offset,
    epsilon=1e-12,
    t_target_row=None,
):
    """Per-pair cotangents shared by both backward kernels ([tile, block]).

    The behind-target gate (``t_target_row``) enters through ``sigma``
    itself: every cotangent below is proportional to ``gbar * sigma``, so a
    gated-out pair contributes exactly zero gradient, and the gate's own
    discontinuity carries none (stop-grad semantics, like the reference's
    non-differentiable cull).
    """
    (_, _, _, _, _, _, _, _, _, _, _, _, suu, svv, suv, inv_det) = prims
    sigma, (
        d_dot_u,
        d_dot_v,
        inv_denominator,
        denominator_ok,
        t,
        proj_u,
        proj_v,
        u_coord,
        v_coord,
        au,
        bu,
        av,
        bv,
        ct,
        denom_u,
        denom_v,
        denom_t,
    ) = _pair_terms(
        rays, prims, softness, ray_origin_offset, epsilon, t_target_row
    )

    # Per-gate slopes in one-divide form: sigmoid(k a) sigmoid(k (1-a)) has
    # logarithmic derivative k (e^{-k a} - e^{-k (1-a)}) / denom, which is
    # the old k (s2 - s1); both factors stay finite under the exp clamp
    # (sigma underflows to 0 first, zeroing the whole cotangent).
    k = softness
    base = gbar * sigma
    g_uc = base * (k * (au - bu) / denom_u)
    g_vc = base * (k * (av - bv) / denom_v)
    g_t_front = base * (k * ct / denom_t)

    g_pu = (g_uc * svv - g_vc * suv) * inv_det
    g_pv = (g_vc * suu - g_uc * suv) * inv_det
    g_t = g_t_front + g_pu * d_dot_u + g_pv * d_dot_v

    g_on = -g_t * inv_denominator
    # d t / d (d.n) = -t / d.n in the differentiable region; the safe-where
    # clamp has zero gradient (matches jnp.where's VJP in the XLA path).
    g_dn = jnp.where(denominator_ok, -t * g_t * inv_denominator, 0.0)
    g_ou = g_pu
    g_ov = g_pv
    g_du = g_pu * t
    g_dv = g_pv * t

    g_c0n = g_t * inv_denominator
    g_c0u = -g_pu
    g_c0v = -g_pv
    g_suu = g_vc * proj_v * inv_det
    g_svv = g_uc * proj_u * inv_det
    g_suv = -(g_uc * proj_v + g_vc * proj_u) * inv_det
    g_inv_det = (g_uc * u_coord + g_vc * v_coord) / inv_det
    return (
        sigma,
        (g_on, g_ou, g_ov, g_dn, g_du, g_dv),
        (g_c0n, g_c0u, g_c0v, g_suu, g_svv, g_suv, g_inv_det),
    )


def _read_prims(prim_refs):
    return tuple(ref[:] for ref in prim_refs)  # each [tile, 1]


def _sigma_forward_kernel(*refs, softness, ray_origin_offset, epsilon,
                          gated=False):
    n = 8 if gated else 7
    ray_refs = refs[:n]
    prim_refs = refs[n:n + 16]
    keep_ref = refs[n + 16]
    out_ref = refs[n + 17]
    rays = tuple(ref[:] for ref in ray_refs[:7])
    t_target_row = ray_refs[7][:] if gated else None
    sigma, _ = _pair_terms(
        rays, _read_prims(prim_refs), softness, ray_origin_offset, epsilon,
        t_target_row,
    )
    partial = jnp.sum(sigma * keep_ref[:], axis=0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = partial

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _sigma_bwd_rays_kernel(*refs, softness, ray_origin_offset, epsilon,
                           gated=False):
    """Grid (ray_steps, prim_steps): per-ray grads accumulate over prims."""
    n = 8 if gated else 7
    ray_refs = refs[:n]
    prim_refs = refs[n:n + 16]
    keep_ref = refs[n + 16]
    gbar_ref = refs[n + 17]
    out_refs = refs[n + 18:n + 24]  # g_ox, g_oy, g_oz, g_dx, g_dy, g_dz
    rays = tuple(ref[:] for ref in ray_refs[:7])
    t_target_row = ray_refs[7][:] if gated else None
    prims = _read_prims(prim_refs)
    gbar = (gbar_ref[:] * rays[6])[None, :] * keep_ref[:]
    _, ray_grads, _ = _pair_gradients(
        rays, prims, gbar, softness, ray_origin_offset, epsilon, t_target_row
    )
    g_on, g_ou, g_ov, g_dn, g_du, g_dv = ray_grads
    nx, ny, nz, ux, uy, uz, vx, vy, vz = prims[:9]
    partials = (
        jnp.sum(g_on * nx + g_ou * ux + g_ov * vx, axis=0),
        jnp.sum(g_on * ny + g_ou * uy + g_ov * vy, axis=0),
        jnp.sum(g_on * nz + g_ou * uz + g_ov * vz, axis=0),
        jnp.sum(g_dn * nx + g_du * ux + g_dv * vx, axis=0),
        jnp.sum(g_dn * ny + g_du * uy + g_dv * vy, axis=0),
        jnp.sum(g_dn * nz + g_du * uz + g_dv * vz, axis=0),
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        for out, partial in zip(out_refs, partials):
            out[:] = partial

    @pl.when(pl.program_id(1) != 0)
    def _():
        for out, partial in zip(out_refs, partials):
            out[:] = out[:] + partial


def _sigma_bwd_prims_kernel(*refs, softness, ray_origin_offset, epsilon,
                            gated=False):
    """Grid (prim_steps, ray_steps): per-prim grads accumulate over rays."""
    n = 8 if gated else 7
    ray_refs = refs[:n]
    prim_refs = refs[n:n + 16]
    keep_ref = refs[n + 16]
    gbar_ref = refs[n + 17]
    out_refs = refs[n + 18:n + 34]  # 16 per-primitive gradient columns [tile, 1]
    rays = tuple(ref[:] for ref in ray_refs[:7])
    t_target_row = ray_refs[7][:] if gated else None
    prims = _read_prims(prim_refs)
    gbar = (gbar_ref[:] * rays[6])[None, :] * keep_ref[:]
    _, ray_grads, prim_scalar_grads = _pair_gradients(
        rays, prims, gbar, softness, ray_origin_offset, epsilon, t_target_row
    )
    g_on, g_ou, g_ov, g_dn, g_du, g_dv = ray_grads
    ox, oy, oz, dx, dy, dz, _ = rays
    row = lambda x: x[None, :]  # noqa: E731

    partials = (
        # normals, span_u, span_v vector components
        jnp.sum(g_on * row(ox) + g_dn * row(dx), axis=1, keepdims=True),
        jnp.sum(g_on * row(oy) + g_dn * row(dy), axis=1, keepdims=True),
        jnp.sum(g_on * row(oz) + g_dn * row(dz), axis=1, keepdims=True),
        jnp.sum(g_ou * row(ox) + g_du * row(dx), axis=1, keepdims=True),
        jnp.sum(g_ou * row(oy) + g_du * row(dy), axis=1, keepdims=True),
        jnp.sum(g_ou * row(oz) + g_du * row(dz), axis=1, keepdims=True),
        jnp.sum(g_ov * row(ox) + g_dv * row(dx), axis=1, keepdims=True),
        jnp.sum(g_ov * row(oy) + g_dv * row(dy), axis=1, keepdims=True),
        jnp.sum(g_ov * row(oz) + g_dv * row(dz), axis=1, keepdims=True),
    ) + tuple(
        jnp.sum(grad, axis=1, keepdims=True) for grad in prim_scalar_grads
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        for out, partial in zip(out_refs, partials):
            out[:] = partial

    @pl.when(pl.program_id(1) != 0)
    def _():
        for out, partial in zip(out_refs, partials):
            out[:] = out[:] + partial


def _sigma_bwd_fused_kernel(*refs, softness, ray_origin_offset, epsilon,
                            blocks_per_m, gated=False):
    """Single-pass backward for the grouped path (candidates fit one tile).

    With K <= PRIM_TILE each heliostat owns exactly ONE candidate tile, and
    the 1D grid walks its ray blocks consecutively - so per-ray gradients
    can be written per step AND per-primitive gradients can accumulate in
    the same pass (the candidate-column output block stays VMEM-resident
    across the heliostat's consecutive steps). One forward-recompute +
    gradient evaluation instead of the two the split rays/prims kernels
    pay; measured ~1.8x on the backward at production shapes.
    """
    n = 8 if gated else 7
    ray_refs = refs[:n]
    prim_refs = refs[n:n + 16]
    keep_ref = refs[n + 16]
    gbar_ref = refs[n + 17]
    out_ray_refs = refs[n + 18:n + 24]  # g_ox..g_dz [block]
    out_prim_refs = refs[n + 24:n + 40]  # 16 candidate columns [tile, 1]
    rays = tuple(ref[:] for ref in ray_refs[:7])
    t_target_row = ray_refs[7][:] if gated else None
    prims = _read_prims(prim_refs)
    gbar = (gbar_ref[:] * rays[6])[None, :] * keep_ref[:]
    _, ray_grads, prim_scalar_grads = _pair_gradients(
        rays, prims, gbar, softness, ray_origin_offset, epsilon, t_target_row
    )
    g_on, g_ou, g_ov, g_dn, g_du, g_dv = ray_grads
    nx, ny, nz, ux, uy, uz, vx, vy, vz = prims[:9]
    ray_partials = (
        jnp.sum(g_on * nx + g_ou * ux + g_ov * vx, axis=0),
        jnp.sum(g_on * ny + g_ou * uy + g_ov * vy, axis=0),
        jnp.sum(g_on * nz + g_ou * uz + g_ov * vz, axis=0),
        jnp.sum(g_dn * nx + g_du * ux + g_dv * vx, axis=0),
        jnp.sum(g_dn * ny + g_du * uy + g_dv * vy, axis=0),
        jnp.sum(g_dn * nz + g_du * uz + g_dv * vz, axis=0),
    )
    for out, partial in zip(out_ray_refs, ray_partials):
        out[:] = partial

    ox, oy, oz, dx, dy, dz, _ = rays
    row = lambda x: x[None, :]  # noqa: E731
    prim_partials = (
        jnp.sum(g_on * row(ox) + g_dn * row(dx), axis=1, keepdims=True),
        jnp.sum(g_on * row(oy) + g_dn * row(dy), axis=1, keepdims=True),
        jnp.sum(g_on * row(oz) + g_dn * row(dz), axis=1, keepdims=True),
        jnp.sum(g_ou * row(ox) + g_du * row(dx), axis=1, keepdims=True),
        jnp.sum(g_ou * row(oy) + g_du * row(dy), axis=1, keepdims=True),
        jnp.sum(g_ou * row(oz) + g_du * row(dz), axis=1, keepdims=True),
        jnp.sum(g_ov * row(ox) + g_dv * row(dx), axis=1, keepdims=True),
        jnp.sum(g_ov * row(oy) + g_dv * row(dy), axis=1, keepdims=True),
        jnp.sum(g_ov * row(oz) + g_dv * row(dz), axis=1, keepdims=True),
    ) + tuple(
        jnp.sum(grad, axis=1, keepdims=True) for grad in prim_scalar_grads
    )

    @pl.when(pl.program_id(0) % blocks_per_m == 0)
    def _():
        for out, partial in zip(out_prim_refs, prim_partials):
            out[:] = partial

    @pl.when(pl.program_id(0) % blocks_per_m != 0)
    def _():
        for out, partial in zip(out_prim_refs, prim_partials):
            out[:] = out[:] + partial


def _cull_kernel(*refs):
    """AABB slab test, OR-reduced over rays (non-differentiable)."""
    ray_refs = refs[:6]
    ray_valid_ref = refs[6]
    t_target_ref = refs[7]
    own_ref = refs[8]
    aabb_refs = refs[9:15]
    prim_index_ref = refs[15]
    out_ref = refs[16]

    ox, oy, oz, dx, dy, dz = (ref[:] for ref in ray_refs)
    min_x, min_y, min_z, max_x, max_y, max_z = (ref[:] for ref in aabb_refs)
    row = lambda x: x[None, :]  # noqa: E731

    entry = jnp.full((min_x.shape[0], ox.shape[0]), -jnp.inf, jnp.float32)
    exit_ = jnp.full_like(entry, jnp.inf)
    for o_axis, d_axis, low, high in (
        (ox, dx, min_x, max_x),
        (oy, dy, min_y, max_y),
        (oz, dz, min_z, max_z),
    ):
        inverse = 1.0 / (row(d_axis) + 1e-12)
        t_low = (low - row(o_axis)) * inverse
        t_high = (high - row(o_axis)) * inverse
        entry = jnp.maximum(entry, jnp.minimum(t_low, t_high))
        exit_ = jnp.minimum(exit_, jnp.maximum(t_low, t_high))

    hit = (
        (exit_ >= entry)
        & (exit_ > 1e-6)
        & (entry <= row(t_target_ref[:]))
        & (row(own_ref[:]) != prim_index_ref[:])
        & (row(ray_valid_ref[:]) > 0)
    )
    partial = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = partial

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], partial)


def _pad_axis(x: jnp.ndarray, size: int, value=0.0) -> jnp.ndarray:
    pad = size - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=value)


def _ray_specs(blk: int, count: int, ray_fast: bool):
    index = (lambda i, j: (j,)) if ray_fast else (lambda i, j: (i,))
    return [
        pl.BlockSpec((blk,), index, memory_space=pltpu.VMEM) for _ in range(count)
    ]


def _prim_specs(count: int, ray_fast: bool):
    index = (lambda i, j: (i, 0)) if ray_fast else (lambda i, j: (j, 0))
    return [
        pl.BlockSpec((PRIM_TILE, 1), index, memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def cull_primitives_pallas(
    rays_flat: tuple[jnp.ndarray, ...],
    ray_valid: jnp.ndarray,
    t_target: jnp.ndarray,
    own_index: jnp.ndarray,
    aabb_min: jnp.ndarray,
    aabb_max: jnp.ndarray,
) -> jnp.ndarray:
    """Per-primitive participation mask [B] (hard, non-differentiable)."""
    total = rays_flat[0].shape[0]
    number_of_primitives = aabb_min.shape[0]
    prim_padded = pl.cdiv(number_of_primitives, PRIM_TILE) * PRIM_TILE
    prim_steps = prim_padded // PRIM_TILE
    ray_steps = total // RAY_BLOCK

    def column(x, pad_value):
        return _pad_axis(x[None], prim_padded, value=pad_value).reshape(-1, 1)

    aabb_columns = [
        column(aabb_min[:, axis], 1e30) for axis in range(3)
    ] + [column(aabb_max[:, axis], -1e30) for axis in range(3)]
    prim_index = column(
        jnp.arange(number_of_primitives, dtype=jnp.float32), -2.0
    )

    hit_any = pl.pallas_call(
        _cull_kernel,
        grid=(prim_steps, ray_steps),  # rays fast: prim output accumulates
        in_specs=(
            _ray_specs(RAY_BLOCK, 9, ray_fast=True)
            + _prim_specs(7, ray_fast=True)
        ),
        out_specs=pl.BlockSpec(
            (PRIM_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((prim_padded, 1), jnp.float32),
        interpret=_interpret(),
    )(*rays_flat, ray_valid, t_target, own_index, *aabb_columns, prim_index)
    return hit_any[:number_of_primitives, 0] > 0.5


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def blocking_sigma_pallas(
    ray_components: tuple[jnp.ndarray, ...],
    ray_valid: jnp.ndarray,
    primitive_columns: tuple[jnp.ndarray, ...],
    keep: jnp.ndarray,
    softness: float,
    ray_origin_offset: float,
    epsilon: float = 1e-12,
) -> jnp.ndarray:
    """Summed soft occlusion sigma per ray (flattened, padded).

    Parameters
    ----------
    ray_components : tuple of jnp.ndarray
        ``(ox, oy, oz, dx, dy, dz)``, each ``[T]`` fp32 with T a multiple of
        the ray block.
    ray_valid : jnp.ndarray
        1.0 for real rays, 0.0 for padding. ``[T]``.
    primitive_columns : tuple of jnp.ndarray
        16 columns ``[B_pad, 1]``: nx ny nz ux uy uz vx vy vz c0n c0u c0v
        suu svv suv inv_det_safe.
    keep : jnp.ndarray
        Participation mask column (cull x validity), ``[B_pad, 1]`` fp32;
        padded primitive slots MUST be 0.

    Returns
    -------
    jnp.ndarray
        ``sigma_sum [T]``.
    """
    return _sigma_forward(
        ray_components, ray_valid, primitive_columns, keep, softness,
        ray_origin_offset, epsilon,
    )


def _sigma_forward(
    ray_components, ray_valid, primitive_columns, keep, softness,
    ray_origin_offset, epsilon,
):
    total = ray_components[0].shape[0]
    prim_padded = primitive_columns[0].shape[0]
    ray_steps = total // RAY_BLOCK
    prim_steps = prim_padded // PRIM_TILE
    kernel = functools.partial(
        _sigma_forward_kernel,
        softness=softness,
        ray_origin_offset=ray_origin_offset,
        epsilon=epsilon,
    )
    return pl.pallas_call(
        kernel,
        grid=(ray_steps, prim_steps),  # prims fast: ray output accumulates
        in_specs=(
            _ray_specs(RAY_BLOCK, 7, ray_fast=False)
            + _prim_specs(17, ray_fast=False)
        ),
        out_specs=pl.BlockSpec(
            (RAY_BLOCK,), lambda i, j: (i,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
        interpret=_interpret(),
    )(*ray_components, ray_valid, *primitive_columns, keep)


def _sigma_fwd(
    ray_components, ray_valid, primitive_columns, keep, softness, offset, epsilon
):
    out = _sigma_forward(
        ray_components, ray_valid, primitive_columns, keep, softness, offset, epsilon
    )
    return out, (ray_components, ray_valid, primitive_columns, keep)


def _sigma_bwd(softness, offset, epsilon, residuals, gbar):
    ray_components, ray_valid, primitive_columns, keep, = residuals
    total = ray_components[0].shape[0]
    prim_padded = primitive_columns[0].shape[0]
    ray_steps = total // BWD_RAY_BLOCK
    prim_steps = prim_padded // PRIM_TILE

    ray_grads = pl.pallas_call(
        functools.partial(
            _sigma_bwd_rays_kernel, softness=softness, ray_origin_offset=offset,
            epsilon=epsilon,
        ),
        grid=(ray_steps, prim_steps),
        in_specs=(
            _ray_specs(BWD_RAY_BLOCK, 7, ray_fast=False)
            + _prim_specs(17, ray_fast=False)
            + _ray_specs(BWD_RAY_BLOCK, 1, ray_fast=False)
        ),
        out_specs=tuple(
            pl.BlockSpec(
                (BWD_RAY_BLOCK,), lambda i, j: (i,), memory_space=pltpu.VMEM
            )
            for _ in range(6)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((total,), jnp.float32) for _ in range(6)
        ),
        interpret=_interpret(),
    )(*ray_components, ray_valid, *primitive_columns, keep, gbar)

    prim_grads = pl.pallas_call(
        functools.partial(
            _sigma_bwd_prims_kernel, softness=softness, ray_origin_offset=offset,
            epsilon=epsilon,
        ),
        grid=(prim_steps, ray_steps),  # rays fast: prim outputs accumulate
        in_specs=(
            _ray_specs(BWD_RAY_BLOCK, 7, ray_fast=True)
            + _prim_specs(17, ray_fast=True)
            + _ray_specs(BWD_RAY_BLOCK, 1, ray_fast=True)
        ),
        out_specs=tuple(
            pl.BlockSpec(
                (PRIM_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(16)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((prim_padded, 1), jnp.float32)
            for _ in range(16)
        ),
        interpret=_interpret(),
    )(*ray_components, ray_valid, *primitive_columns, keep, gbar)

    return (tuple(ray_grads), None, tuple(prim_grads), None)


blocking_sigma_pallas.defvjp(_sigma_fwd, _sigma_bwd)


def soft_ray_blocking_mask_pallas(
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
) -> jnp.ndarray:
    """Drop-in Pallas backend for ``blocking.soft_ray_blocking_mask``.

    Same semantics as the XLA path (same primitive cull, same soft gates,
    same Beer-Lambert accumulation); all pair interactions stay in VMEM.
    """
    number_of_heliostats, number_of_rays, number_of_points = ray_directions.shape[:3]
    number_of_primitives = blocking_primitives_corners.shape[0]

    # ---- per-primitive quantities (XLA, differentiable) ----
    corner_0 = blocking_primitives_corners[:, 0, :3]
    span_u = blocking_primitives_spans[:, 0, :3]
    span_v = blocking_primitives_spans[:, 1, :3]
    normals3 = blocking_primitives_normals[:, :3]
    span_u_sq = jnp.sum(span_u * span_u, axis=-1)
    span_v_sq = jnp.sum(span_v * span_v, axis=-1)
    span_uv = jnp.sum(span_u * span_v, axis=-1)
    det = span_u_sq * span_v_sq - span_uv * span_uv
    det_safe = jnp.where(
        jnp.abs(det) < epsilon, jnp.where(det >= 0, epsilon, -epsilon), det
    )

    prim_padded = pl.cdiv(number_of_primitives, PRIM_TILE) * PRIM_TILE

    def column(x, pad_value=0.0):
        return _pad_axis(
            x[None].astype(jnp.float32), prim_padded, value=pad_value
        ).reshape(-1, 1)

    primitive_columns = (
        column(normals3[:, 0]),
        column(normals3[:, 1]),
        column(normals3[:, 2]),
        column(span_u[:, 0]),
        column(span_u[:, 1]),
        column(span_u[:, 2]),
        column(span_v[:, 0]),
        column(span_v[:, 1]),
        column(span_v[:, 2]),
        column(jnp.sum(corner_0 * normals3, axis=-1)),
        column(jnp.sum(corner_0 * span_u, axis=-1)),
        column(jnp.sum(corner_0 * span_v, axis=-1)),
        column(span_u_sq, pad_value=1.0),
        column(span_v_sq, pad_value=1.0),
        column(span_uv),
        column(1.0 / det_safe, pad_value=1.0),
    )

    # ---- rays flattened to one padded axis ----
    shape = (number_of_heliostats, number_of_rays, number_of_points)
    total = number_of_heliostats * number_of_rays * number_of_points
    _pad_unit = math.lcm(RAY_BLOCK, BWD_RAY_BLOCK)
    total_padded = pl.cdiv(total, _pad_unit) * _pad_unit

    def flat(x):
        return _pad_axis(x.reshape(1, -1), total_padded)[0]

    origins3 = jnp.broadcast_to(ray_origins[:, None, :, :3], shape + (3,))
    directions3 = ray_directions[..., :3]
    ray_components = tuple(
        flat(origins3[..., axis]) for axis in range(3)
    ) + tuple(flat(directions3[..., axis]) for axis in range(3))
    ray_valid = _pad_axis(jnp.ones((1, total), jnp.float32), total_padded)[0]

    # ---- participation mask ----
    keep = jnp.ones((number_of_primitives,), bool)
    if intersection_distances_target is not None:
        aabb_min = jnp.min(blocking_primitives_corners[:, :, :3], axis=1)
        aabb_max = jnp.max(blocking_primitives_corners[:, :, :3], axis=1)
        own = (
            ray_primitive_indices
            if ray_primitive_indices is not None
            else jnp.full((number_of_heliostats,), -1, jnp.int32)
        )
        own_flat = _pad_axis(
            jnp.broadcast_to(own[:, None, None], shape)
            .astype(jnp.float32)
            .reshape(1, -1),
            total_padded,
            value=-1.0,
        )[0]
        t_target_flat = flat(intersection_distances_target)
        keep = keep & jax.lax.stop_gradient(
            cull_primitives_pallas(
                tuple(jax.lax.stop_gradient(c) for c in ray_components),
                ray_valid,
                jax.lax.stop_gradient(t_target_flat),
                own_flat,
                jax.lax.stop_gradient(aabb_min),
                jax.lax.stop_gradient(aabb_max),
            )
        )
    keep_column = _pad_axis(
        keep.astype(jnp.float32)[None], prim_padded
    ).reshape(-1, 1)

    sigma = blocking_sigma_pallas(
        ray_components,
        ray_valid,
        primitive_columns,
        keep_column,
        softness,
        ray_origin_offset,
        epsilon,
    )
    sigma = checkpoint_name(sigma, "blocking_sigma")
    sigma_sum = sigma[:total].reshape(shape)
    return 1.0 - jnp.exp(-alpha * sigma_sum)


# --------------------------------------------------------------------------- #
# Compacted-candidate ("grouped") path: per-heliostat top-K blocker lists.
#
# The flat kernels above stream EVERY primitive past every ray - O(rays x B)
# with B the whole field, quadratic in field size. Heliostat neighborhoods
# are nearly static during an optimization, so the render path preselects at
# most K candidate blockers per ray-owning heliostat (a conservative
# corridor test, artist_tpu/raytracing/blocking.py:select_blocking_candidates)
# and gathers their pre-reduced columns into dense [M, K] tensors; the pair
# kernels below then run O(rays x K) with K ~ 16 regardless of field size.
# The reference's behind-the-target cull becomes the per-ray t <= t_target
# gate inside _pair_terms (so no separate cull kernel runs at all).
#
# Layout: rays stay flattened on lanes, but per-HELIOSTAT padded to a block
# multiple so no ray block straddles two heliostats; the grid walks
# (heliostat-ray blocks, candidate tiles) and the index maps recover the
# owning heliostat as block_index // blocks_per_heliostat.
# reference semantics: artist/raytracing/blocking.py:212-354 (soft mask)
# + :831-995 (cull).
# --------------------------------------------------------------------------- #


def _grouped_ray_specs(blk: int, count: int, blocks_per_m: int, k_steps: int,
                       ray_fast: bool):
    if ray_fast:  # grid (M * k_steps, ray_steps)
        index = lambda i, j: ((i // k_steps) * blocks_per_m + j,)  # noqa: E731
    else:  # grid (M * ray_steps, k_steps)
        index = lambda i, j: (i,)  # noqa: E731
    return [
        pl.BlockSpec((blk,), index, memory_space=pltpu.VMEM) for _ in range(count)
    ]


def _grouped_prim_specs(count: int, blocks_per_m: int, k_steps: int,
                        ray_fast: bool):
    if ray_fast:
        index = lambda i, j: (i, 0)  # noqa: E731
    else:
        index = lambda i, j: ((i // blocks_per_m) * k_steps + j, 0)  # noqa: E731
    return [
        pl.BlockSpec((PRIM_TILE, 1), index, memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def blocking_sigma_pallas_grouped(
    ray_components: tuple[jnp.ndarray, ...],
    ray_valid: jnp.ndarray,
    t_target: jnp.ndarray,
    primitive_columns: tuple[jnp.ndarray, ...],
    keep: jnp.ndarray,
    num_groups: int,
    softness: float,
    ray_origin_offset: float,
    epsilon: float = 1e-12,
) -> jnp.ndarray:
    """Summed soft sigma per ray against each ray-owner's K candidates.

    Parameters
    ----------
    ray_components : tuple of jnp.ndarray
        ``(ox, oy, oz, dx, dy, dz)``, each ``[M * RP_pad]`` fp32 with RP_pad
        (rays per heliostat) a multiple of lcm(RAY_BLOCK, BWD_RAY_BLOCK).
    ray_valid : jnp.ndarray
        1.0 real / 0.0 padding, same shape.
    t_target : jnp.ndarray
        Per-ray distance to the target hit (behind-target gate; padding
        slots hold a large negative value). NOT differentiated (the
        reference cull is no-grad).
    primitive_columns : tuple of jnp.ndarray
        16 gathered candidate columns ``[M * K_pad, 1]`` (same order as the
        flat path: nx..inv_det), K_pad a multiple of PRIM_TILE.
    keep : jnp.ndarray
        Candidate validity ``[M * K_pad, 1]`` fp32 (0 for padded slots).
    num_groups : int
        M, static.

    Returns
    -------
    jnp.ndarray
        ``sigma_sum [M * RP_pad]``.
    """
    return _grouped_sigma_forward(
        ray_components, ray_valid, t_target, primitive_columns, keep,
        num_groups, softness, ray_origin_offset, epsilon,
    )


def _grouped_sigma_forward(
    ray_components, ray_valid, t_target, primitive_columns, keep,
    num_groups, softness, ray_origin_offset, epsilon,
):
    total = ray_components[0].shape[0]
    rp_pad = total // num_groups
    blocks_per_m = rp_pad // RAY_BLOCK
    k_steps = primitive_columns[0].shape[0] // num_groups // PRIM_TILE
    kernel = functools.partial(
        _sigma_forward_kernel,
        softness=softness,
        ray_origin_offset=ray_origin_offset,
        epsilon=epsilon,
        gated=True,
    )
    return pl.pallas_call(
        kernel,
        # candidate tiles fastest: each ray output block accumulates over
        # consecutive steps.
        grid=(num_groups * blocks_per_m, k_steps),
        in_specs=(
            _grouped_ray_specs(RAY_BLOCK, 8, blocks_per_m, k_steps, False)
            + _grouped_prim_specs(17, blocks_per_m, k_steps, False)
        ),
        out_specs=pl.BlockSpec(
            (RAY_BLOCK,), lambda i, j: (i,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
        interpret=_interpret(),
    )(*ray_components, ray_valid, t_target, *primitive_columns, keep)


def _grouped_sigma_fwd(
    ray_components, ray_valid, t_target, primitive_columns, keep,
    num_groups, softness, offset, epsilon,
):
    out = _grouped_sigma_forward(
        ray_components, ray_valid, t_target, primitive_columns, keep,
        num_groups, softness, offset, epsilon,
    )
    return out, (ray_components, ray_valid, t_target, primitive_columns, keep)


def _grouped_sigma_bwd(num_groups, softness, offset, epsilon, residuals, gbar):
    ray_components, ray_valid, t_target, primitive_columns, keep = residuals
    total = ray_components[0].shape[0]
    rp_pad = total // num_groups
    blocks_per_m = rp_pad // BWD_RAY_BLOCK
    prim_total = primitive_columns[0].shape[0]
    k_steps = prim_total // num_groups // PRIM_TILE

    if k_steps == 1:
        # Candidates fit one tile (the default K == PRIM_TILE): one fused
        # pass computes ray AND candidate gradients together.
        ray_index = lambda i: (i,)  # noqa: E731
        prim_index = lambda i: (i // blocks_per_m, 0)  # noqa: E731
        ray_spec = pl.BlockSpec(
            (BWD_RAY_BLOCK,), ray_index, memory_space=pltpu.VMEM
        )
        prim_spec = pl.BlockSpec(
            (PRIM_TILE, 1), prim_index, memory_space=pltpu.VMEM
        )
        outputs = pl.pallas_call(
            functools.partial(
                _sigma_bwd_fused_kernel, softness=softness,
                ray_origin_offset=offset, epsilon=epsilon,
                blocks_per_m=blocks_per_m, gated=True,
            ),
            grid=(num_groups * blocks_per_m,),
            in_specs=([ray_spec] * 8 + [prim_spec] * 17 + [ray_spec]),
            out_specs=tuple([ray_spec] * 6 + [prim_spec] * 16),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((total,), jnp.float32)] * 6
                + [jax.ShapeDtypeStruct((prim_total, 1), jnp.float32)] * 16
            ),
            interpret=_interpret(),
        )(*ray_components, ray_valid, t_target, *primitive_columns, keep, gbar)
        return (tuple(outputs[:6]), None, None, tuple(outputs[6:]), None)

    ray_grads = pl.pallas_call(
        functools.partial(
            _sigma_bwd_rays_kernel, softness=softness, ray_origin_offset=offset,
            epsilon=epsilon, gated=True,
        ),
        grid=(num_groups * blocks_per_m, k_steps),
        in_specs=(
            _grouped_ray_specs(BWD_RAY_BLOCK, 8, blocks_per_m, k_steps, False)
            + _grouped_prim_specs(17, blocks_per_m, k_steps, False)
            + _grouped_ray_specs(BWD_RAY_BLOCK, 1, blocks_per_m, k_steps, False)
        ),
        out_specs=tuple(
            pl.BlockSpec(
                (BWD_RAY_BLOCK,), lambda i, j: (i,), memory_space=pltpu.VMEM
            )
            for _ in range(6)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((total,), jnp.float32) for _ in range(6)
        ),
        interpret=_interpret(),
    )(*ray_components, ray_valid, t_target, *primitive_columns, keep, gbar)

    prim_grads = pl.pallas_call(
        functools.partial(
            _sigma_bwd_prims_kernel, softness=softness, ray_origin_offset=offset,
            epsilon=epsilon, gated=True,
        ),
        # ray blocks fastest: each candidate-column output block accumulates
        # over its heliostat's consecutive ray steps.
        grid=(num_groups * k_steps, blocks_per_m),
        in_specs=(
            _grouped_ray_specs(BWD_RAY_BLOCK, 8, blocks_per_m, k_steps, True)
            + _grouped_prim_specs(17, blocks_per_m, k_steps, True)
            + _grouped_ray_specs(BWD_RAY_BLOCK, 1, blocks_per_m, k_steps, True)
        ),
        out_specs=tuple(
            pl.BlockSpec(
                (PRIM_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(16)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((prim_total, 1), jnp.float32)
            for _ in range(16)
        ),
        interpret=_interpret(),
    )(*ray_components, ray_valid, t_target, *primitive_columns, keep, gbar)

    return (tuple(ray_grads), None, None, tuple(prim_grads), None)


blocking_sigma_pallas_grouped.defvjp(_grouped_sigma_fwd, _grouped_sigma_bwd)


def soft_ray_blocking_mask_pallas_compact(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    blocking_primitives_corners: jnp.ndarray,
    blocking_primitives_spans: jnp.ndarray,
    blocking_primitives_normals: jnp.ndarray,
    candidate_indices: jnp.ndarray,
    candidate_valid: jnp.ndarray,
    intersection_distances_target: jnp.ndarray,
    epsilon: float = 1e-12,
    softness: float = 1000.0,
    alpha: float = 100.0,
    ray_origin_offset: float = 0.05,
) -> jnp.ndarray:
    """Soft blocking mask over per-heliostat candidate blocker lists.

    Same pair math and Beer-Lambert accumulation as the flat Pallas path,
    but each heliostat's rays only ever meet its K gathered candidates, and
    the reference cull's behind-the-target semantics run per ray inside the
    kernel. Candidate gradients scatter back to the full primitive set
    through the gather's VJP.

    Parameters
    ----------
    candidate_indices : jnp.ndarray
        Global primitive index of each candidate, ``[M, K]`` int32 (K a
        multiple of PRIM_TILE; padded slots may repeat any index).
    candidate_valid : jnp.ndarray
        False for padded/failed candidate slots, ``[M, K]``.
    intersection_distances_target : jnp.ndarray
        Per-ray target-hit distance ``[M, R, P]`` (required - it drives the
        in-kernel cull gate).
    """
    number_of_heliostats, number_of_rays, number_of_points = (
        ray_directions.shape[:3]
    )
    k_pad = candidate_indices.shape[1]
    if k_pad % PRIM_TILE:
        raise ValueError(
            f"candidate count ({k_pad}) must be a multiple of the primitive "
            f"tile ({PRIM_TILE})"
        )

    # ---- per-primitive quantities (XLA, differentiable), as a [B, 16] table
    corner_0 = blocking_primitives_corners[:, 0, :3]
    span_u = blocking_primitives_spans[:, 0, :3]
    span_v = blocking_primitives_spans[:, 1, :3]
    normals3 = blocking_primitives_normals[:, :3]
    span_u_sq = jnp.sum(span_u * span_u, axis=-1)
    span_v_sq = jnp.sum(span_v * span_v, axis=-1)
    span_uv = jnp.sum(span_u * span_v, axis=-1)
    det = span_u_sq * span_v_sq - span_uv * span_uv
    det_safe = jnp.where(
        jnp.abs(det) < epsilon, jnp.where(det >= 0, epsilon, -epsilon), det
    )
    table = jnp.stack(
        [
            normals3[:, 0], normals3[:, 1], normals3[:, 2],
            span_u[:, 0], span_u[:, 1], span_u[:, 2],
            span_v[:, 0], span_v[:, 1], span_v[:, 2],
            jnp.sum(corner_0 * normals3, axis=-1),
            jnp.sum(corner_0 * span_u, axis=-1),
            jnp.sum(corner_0 * span_v, axis=-1),
            span_u_sq, span_v_sq, span_uv,
            1.0 / det_safe,
        ],
        axis=1,
    ).astype(jnp.float32)  # [B, 16]

    # One gather for all columns; its VJP scatter-adds candidate gradients
    # back onto the primitive table.
    gathered = jnp.take(table, candidate_indices.reshape(-1), axis=0)
    primitive_columns = tuple(
        gathered[:, c].reshape(-1, 1) for c in range(16)
    )
    keep_column = candidate_valid.astype(jnp.float32).reshape(-1, 1)

    # ---- rays: flattened per heliostat, per-heliostat padding ----
    shape = (number_of_heliostats, number_of_rays, number_of_points)
    rp = number_of_rays * number_of_points
    pad_unit = math.lcm(RAY_BLOCK, BWD_RAY_BLOCK)
    rp_pad = pl.cdiv(rp, pad_unit) * pad_unit

    def flat(x, value=0.0):
        x = x.reshape(number_of_heliostats, rp)
        if rp_pad != rp:
            x = jnp.pad(x, ((0, 0), (0, rp_pad - rp)), constant_values=value)
        return x.reshape(-1)

    origins3 = jnp.broadcast_to(ray_origins[:, None, :, :3], shape + (3,))
    directions3 = ray_directions[..., :3]
    ray_components = tuple(
        flat(origins3[..., axis]) for axis in range(3)
    ) + tuple(flat(directions3[..., axis]) for axis in range(3))
    ray_valid = flat(jnp.ones(shape, jnp.float32))
    t_target_flat = flat(
        jax.lax.stop_gradient(intersection_distances_target), value=-1e30
    )

    sigma = blocking_sigma_pallas_grouped(
        ray_components,
        ray_valid,
        t_target_flat,
        primitive_columns,
        keep_column,
        number_of_heliostats,
        softness,
        ray_origin_offset,
        epsilon,
    )
    # Named so the render's chunk remat policy can save the kernel output:
    # the backward then re-runs only the cheap XLA glue, not the forward
    # pair kernel (see RenderConfig.remat_chunks).
    sigma = checkpoint_name(sigma, "blocking_sigma")
    sigma_sum = sigma.reshape(number_of_heliostats, rp_pad)[:, :rp].reshape(shape)
    return 1.0 - jnp.exp(-alpha * sigma_sum)
