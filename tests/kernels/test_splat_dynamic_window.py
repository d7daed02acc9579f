"""Exactness of the per-ray-block dynamic-window splat.

Unlike the static per-heliostat window (which may drop rays), the dynamic
path must be bit-equivalent to the scatter reference for EVERY input: each
block's window derives from its own deposit extent and oversized blocks
take the in-kernel ownership-masked full-height fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import artist_tpu.kernels.splat_pallas as splat_pallas
from artist_tpu.raytracing.splatting import bilinear_splat, point_tile_order

RESOLUTION = (256, 256)


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    # Small blocks keep the interpret-mode test fast while exercising
    # multiple blocks per map (incl. fallback blocks).
    monkeypatch.setattr(splat_pallas, "DYN_RAY_BLOCK", 256)


@pytest.fixture
def mixed_rays():
    rng = np.random.RandomState(0)
    num = 3
    u = np.concatenate(
        [
            30 + 8 * rng.rand(num, 512),  # compact -> window path
            5 + 200 * rng.rand(num, 256),  # dispersed -> fallback path
            120 + 10 * rng.rand(num, 232),  # compact, different offset
        ],
        axis=1,
    ).astype(np.float32)
    e = (250 * rng.rand(num, 1000)).astype(np.float32)
    u[:, :17] = -5.0  # out-of-bounds rows
    e[:, 40:50] = 300.0  # out-of-bounds cols
    w = rng.rand(num, 1000).astype(np.float32)
    return e, u, w


def test_dynamic_window_forward_exact(mixed_rays):
    e, u, w = mixed_rays
    reference = bilinear_splat(
        e, u, w, RESOLUTION, flip_up_down=False, method="scatter"
    )
    dynamic = bilinear_splat(
        e,
        u,
        w,
        RESOLUTION,
        flip_up_down=False,
        method="pallas_fp32",
        block_window=96,
    )
    np.testing.assert_allclose(
        np.asarray(dynamic), np.asarray(reference), atol=5e-7
    )


def test_dynamic_window_gradients_exact(mixed_rays):
    e, u, w = mixed_rays
    rng = np.random.RandomState(1)
    cotangent = jnp.asarray(
        rng.rand(e.shape[0], RESOLUTION[1], RESOLUTION[0]).astype(np.float32)
    )

    def loss(kwargs, e_, u_, w_):
        out = bilinear_splat(e_, u_, w_, RESOLUTION, flip_up_down=False, **kwargs)
        return jnp.sum(out * cotangent)

    args = (jnp.asarray(e), jnp.asarray(u), jnp.asarray(w))
    reference = jax.grad(loss, argnums=(1, 2, 3))(dict(method="scatter"), *args)
    dynamic = jax.grad(loss, argnums=(1, 2, 3))(
        dict(method="pallas_fp32", block_window=96), *args
    )
    for name, mine, ref in zip(("de", "du", "dw"), dynamic, reference):
        scale = max(float(jnp.abs(ref).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(mine) / scale,
            np.asarray(ref) / scale,
            atol=1e-6,
            err_msg=name,
        )


def test_dynamic_window_zero_weight_ray_gradient():
    """dw is weight-independent: a zero-weight in-bounds ray far from its
    block's window must still receive the exact intensity gradient (advisor
    finding, round 4: extents computed over ``w > 0`` silently zeroed dw for
    w == 0 rays outside the window)."""
    num, n = 1, 256
    rng = np.random.RandomState(7)
    u = (30 + 8 * rng.rand(num, n)).astype(np.float32)
    e = (100 + 20 * rng.rand(num, n)).astype(np.float32)
    w = rng.rand(num, n).astype(np.float32)
    # One ray at u=200 (far outside the [24, 120) window of the rest) with
    # EXACTLY zero weight - its dw must match the scatter reference (1-ish),
    # not 0. Saturated blocking gates and cosine clamps produce such rays.
    u[0, 13] = 200.3
    e[0, 13] = 50.2
    w[0, 13] = 0.0

    def loss(kwargs, e_, u_, w_):
        out = bilinear_splat(e_, u_, w_, RESOLUTION, flip_up_down=False, **kwargs)
        return jnp.sum(out)

    args = (jnp.asarray(e), jnp.asarray(u), jnp.asarray(w))
    ref_dw = jax.grad(loss, argnums=3)(dict(method="scatter"), *args)
    dyn_dw = jax.grad(loss, argnums=3)(
        dict(method="pallas_fp32", block_window=96), *args
    )
    assert float(ref_dw[0, 13]) > 0.5, "test ray must carry real dw"
    np.testing.assert_allclose(
        np.asarray(dyn_dw), np.asarray(ref_dw), atol=1e-6
    )


def test_point_tile_order_is_permutation():
    order = np.asarray(point_tile_order(50, 50, 4, 10))
    assert order.shape == (10000,)
    assert np.array_equal(np.sort(order), np.arange(10000))
    # First tile: the 10x10 corner patch of facet 0.
    first = order[:100].reshape(10, 10)
    assert first[0, 0] == 0 and first[0, 9] == 9 and first[9, 0] == 450


def test_render_with_dynamic_window_matches_plain():
    """End-to-end: trace with splat_block_window (+ tile reorder) equals the
    plain scatter render."""
    from artist_tpu.field import heliostat_group as hg
    from artist_tpu.field.solar_tower import get_centers_of_target_areas
    from artist_tpu.raytracing import RenderConfig, trace_rays
    from artist_tpu.scenario.synthetic import make_synthetic_scenario

    scenario = make_synthetic_scenario(
        number_of_heliostats=2,
        number_of_surface_points_per_facet=(10, 10),
        number_of_rays=4,
    )
    group = scenario.heliostat_groups[0]
    num = group.number_of_heliostats
    indices = jnp.arange(num, dtype=jnp.int32)
    targets = jnp.zeros(num, dtype=jnp.int32)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    aim = get_centers_of_target_areas(scenario.solar_tower, targets)
    active = hg.gather_active(group, indices)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    du, de = scenario.light_sources[0].get_distortions(
        jax.random.PRNGKey(2), points.shape[1], num
    )

    def render(**overrides):
        flux, *_ = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=points,
            aligned_surface_normals=normals,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=du,
            distortions_e=de,
            config=RenderConfig(bitmap_resolution=(64, 64), **overrides),
        )
        return np.asarray(flux)

    plain = render(splat_method="scatter")
    dynamic = render(
        splat_method="pallas_fp32",
        splat_block_window=32,
        splat_point_layout=(10, 10, 4),
        splat_point_tile=5,
    )
    np.testing.assert_allclose(dynamic, plain, atol=1e-5 * max(plain.max(), 1.0))
