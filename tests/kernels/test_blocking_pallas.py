"""Pallas blocking kernels vs the XLA formulation (interpret mode on CPU).

The XLA path is itself parity-tested against the torch reference
(tests/raytracing/test_blocking.py), so agreement here transitively pins
the kernel to the reference's semantics - including the hand-derived VJP,
which must match XLA autodiff through the soft gates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artist_tpu.kernels import blocking_pallas
from artist_tpu.raytracing import blocking as xla_blocking


def _unit_square(y: float):
    corner_0 = jnp.asarray([0.0, y, 0.0, 1.0])
    span_u = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    span_v = jnp.asarray([0.0, 0.0, 1.0, 0.0])
    corners = jnp.stack(
        [corner_0, corner_0 + span_u, corner_0 + span_u + span_v, corner_0 + span_v]
    )
    return corners, jnp.stack([span_u, span_v]), jnp.asarray([0.0, -1.0, 0.0, 0.0])


@pytest.fixture
def grazing_scene():
    """Rays straddling primitive edges with soft gates ACTIVE (softness 6);
    saturated sigmoids would make the gradient comparison vacuous."""
    heliostats, rays, points = 2, 3, 4
    origins = jnp.zeros((heliostats, points, 4)).at[..., 3].set(1.0)
    origins = origins.at[:, :, 0].set(jnp.linspace(-0.6, 0.9, points))
    directions3 = jnp.tile(
        jnp.asarray([[0.05, 1.0, 0.02]]), (heliostats * rays * points, 1)
    ).reshape(heliostats, rays, points, 3)
    directions3 = directions3 + 0.08 * jax.random.normal(
        jax.random.PRNGKey(5), directions3.shape
    )
    directions3 = directions3 / jnp.linalg.norm(directions3, axis=-1, keepdims=True)
    directions = jnp.concatenate(
        [directions3, jnp.zeros(directions3.shape[:-1] + (1,))], axis=-1
    )
    parts = list(zip(_unit_square(1.0), _unit_square(2.5)))
    corners, spans, normals = (jnp.stack(p) for p in parts)
    t_target = jnp.full((heliostats, rays, points), 10.0)
    own = jnp.asarray([-1, -1], jnp.int32)
    return origins, directions, corners, spans, normals, t_target, own


def test_forward_matches_xla(grazing_scene):
    origins, directions, corners, spans, normals, t_target, own = grazing_scene
    kwargs = dict(
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        softness=6.0,
    )
    expected = xla_blocking.soft_ray_blocking_mask(
        origins, directions, corners, spans, normals, **kwargs
    )
    actual = blocking_pallas.soft_ray_blocking_mask_pallas(
        origins, directions, corners, spans, normals, **kwargs
    )
    assert float(expected.mean()) > 0.1  # the scene actually blocks
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-6)


def test_gradients_match_xla_autodiff(grazing_scene):
    origins, directions, corners, spans, normals, t_target, own = grazing_scene
    kwargs = dict(
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        softness=6.0,
    )

    def loss(fn, args):
        return jnp.sum(fn(*args, **kwargs) ** 2)

    args = (origins, directions, corners, spans, normals)
    expected = jax.grad(lambda a: loss(xla_blocking.soft_ray_blocking_mask, a))(args)
    actual = jax.grad(
        lambda a: loss(blocking_pallas.soft_ray_blocking_mask_pallas, a)
    )(args)
    for name, expected_grad, actual_grad in zip(
        ("origins", "directions", "corners", "spans", "normals"), expected, actual
    ):
        scale = max(float(jnp.abs(expected_grad).max()), 1e-6)
        assert scale > 1e-3 or name == "normals", f"vacuous gradient for {name}"
        np.testing.assert_allclose(
            np.asarray(actual_grad),
            np.asarray(expected_grad),
            atol=5e-6 * scale + 1e-7,
            err_msg=name,
        )


def test_cull_masks_own_and_behind_target(grazing_scene):
    """The fused cull reproduces the XLA path: the ray-owner's primitive and
    primitives beyond the target distance do not block."""
    origins, directions, corners, spans, normals, _, _ = grazing_scene
    # Target closer than the second square (y=2.5): it must not block.
    t_target = jnp.full(directions.shape[:3], 1.5)
    own = jnp.asarray([0, -1], jnp.int32)  # heliostat 0 owns square 0
    kwargs = dict(
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        softness=6.0,
    )
    expected = xla_blocking.soft_ray_blocking_mask(
        origins, directions, corners, spans, normals, **kwargs
    )
    actual = blocking_pallas.soft_ray_blocking_mask_pallas(
        origins, directions, corners, spans, normals, **kwargs
    )
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-6)


def test_no_target_distances_skips_cull(grazing_scene):
    origins, directions, corners, spans, normals, _, _ = grazing_scene
    expected = xla_blocking.soft_ray_blocking_mask(
        origins, directions, corners, spans, normals, softness=6.0
    )
    actual = blocking_pallas.soft_ray_blocking_mask_pallas(
        origins, directions, corners, spans, normals, softness=6.0
    )
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-6)


def test_dispatch_method_flag(grazing_scene):
    """method='pallas' through the public soft_ray_blocking_mask entry."""
    origins, directions, corners, spans, normals, t_target, own = grazing_scene
    via_dispatch = xla_blocking.soft_ray_blocking_mask(
        origins,
        directions,
        corners,
        spans,
        normals,
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        method="pallas",
    )
    direct = blocking_pallas.soft_ray_blocking_mask_pallas(
        origins,
        directions,
        corners,
        spans,
        normals,
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
    )
    np.testing.assert_allclose(
        np.asarray(via_dispatch), np.asarray(direct), atol=1e-7
    )


# --------------------------------------------------------------------------- #
# Compacted-candidate path (per-heliostat top-K blocker lists).
# --------------------------------------------------------------------------- #


def test_compact_forward_matches_xla(grazing_scene):
    origins, directions, corners, spans, normals, t_target, own = grazing_scene
    kwargs = dict(
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        softness=6.0,
    )
    expected = xla_blocking.soft_ray_blocking_mask(
        origins, directions, corners, spans, normals, **kwargs, method="xla"
    )
    compact = xla_blocking.soft_ray_blocking_mask(
        origins,
        directions,
        corners,
        spans,
        normals,
        **kwargs,
        method="pallas",
        max_candidates=16,
    )
    np.testing.assert_allclose(
        np.asarray(compact), np.asarray(expected), atol=2e-5
    )


def test_compact_gradients_match_xla_autodiff(grazing_scene):
    origins, directions, corners, spans, normals, t_target, own = grazing_scene

    def loss(method, max_candidates):
        def f(c, s, n, d):
            mask = xla_blocking.soft_ray_blocking_mask(
                origins,
                d,
                c,
                s,
                n,
                intersection_distances_target=t_target,
                ray_primitive_indices=own,
                softness=6.0,
                method=method,
                max_candidates=max_candidates,
            )
            weights = jnp.linspace(0.5, 1.5, mask.shape[-1])
            return jnp.sum(mask * weights[None, None, :])

        return jax.grad(f, argnums=(0, 1, 2, 3))(corners, spans, normals, directions)

    expected = loss("xla", None)
    compact = loss("pallas", 16)
    for name, a, b in zip(("corners", "spans", "normals", "dirs"), expected, compact):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-5, err_msg=name
        )


def test_compact_ignores_far_primitives():
    """A large field of distant primitives must not change the mask, and the
    candidate selector must keep every geometrically relevant blocker."""
    rng = np.random.default_rng(1)
    heliostats, rays, points = 3, 2, 16
    origins = np.zeros((heliostats, points, 4), np.float32)
    grid = np.linspace(-1.0, 1.0, points)
    for m in range(heliostats):
        origins[m, :, 0] = grid
        origins[m, :, 1] = 10.0 * m
        origins[m, :, 2] = 1.5
        origins[m, :, 3] = 1.0
    directions = np.zeros((heliostats, rays, points, 4), np.float32)
    directions[..., 1] = -1.0
    directions[..., 2] = -0.02 + 0.01 * rng.standard_normal((heliostats, rays, points))
    directions[..., :3] /= np.linalg.norm(
        directions[..., :3], axis=-1, keepdims=True
    )
    t_target = jnp.full((heliostats, rays, points), 60.0)

    def square_at(e, n, u):
        c0 = np.asarray([e - 1.1, n, u - 1.1, 1.0], np.float32)
        corners = np.stack(
            [
                c0,
                c0 + [0.0, 0.0, 2.2, 0.0],
                c0 + [2.2, 0.0, 2.2, 0.0],
                c0 + [2.2, 0.0, 0.0, 0.0],
            ]
        )
        return corners

    near = [square_at(0.0, 10.0 * m, 1.5) for m in range(heliostats)]
    far = [
        square_at(500.0 + 5.0 * i, -200.0 - 3.0 * i, 1.5) for i in range(61)
    ]
    corners = jnp.asarray(np.stack(near + far))
    spans = jnp.stack(
        [corners[:, 1] - corners[:, 0], corners[:, 3] - corners[:, 0]], axis=1
    )
    n3 = np.cross(np.asarray(spans[:, 0, :3]), np.asarray(spans[:, 1, :3]))
    n3 /= np.linalg.norm(n3, axis=-1, keepdims=True)
    normals = jnp.asarray(
        np.concatenate([n3, np.zeros((len(n3), 1), np.float32)], axis=1)
    )
    own = jnp.arange(heliostats, dtype=jnp.int32)
    args = (jnp.asarray(origins), jnp.asarray(directions), corners, spans, normals)

    indices, valid = xla_blocking.select_blocking_candidates(
        args[0], args[1], corners, own, t_target, max_candidates=16
    )
    # every real (near, non-self) blocker of each heliostat is a candidate
    for m in range(heliostats):
        kept = set(np.asarray(indices[m])[np.asarray(valid[m])].tolist())
        for b in range(heliostats):
            if b == m:
                continue
            if origins[b, 0, 1] < origins[m, 0, 1]:  # south of m: in ray path
                assert b in kept, (m, b, kept)
        assert not any(k >= heliostats for k in kept), "far primitive selected"

    dense = xla_blocking.soft_ray_blocking_mask(
        *args,
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        method="xla",
    )
    compact = xla_blocking.soft_ray_blocking_mask(
        *args,
        intersection_distances_target=t_target,
        ray_primitive_indices=own,
        method="pallas",
        max_candidates=16,
    )
    assert float(jnp.mean(dense)) > 0.1, "scene produced no blocking"
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense), atol=2e-3)


def test_compact_render_config_path():
    """trace_rays with blocking_candidates set matches the uncompacted render."""
    from artist_tpu.raytracing import RenderConfig

    # reuse the far-field scene through the full render entry
    # (smoke: both configs compile and agree).
    rng = np.random.default_rng(2)
    heliostats, rays, points = 2, 2, 16
    origins = np.zeros((heliostats, points, 4), np.float32)
    for m in range(heliostats):
        origins[m, :, 0] = np.linspace(-1, 1, points)
        origins[m, :, 1] = 10.0 * m
        origins[m, :, 2] = 1.5
        origins[m, :, 3] = 1.0
    corners = []
    for m in range(heliostats):
        c0 = np.asarray([-1.1, 10.0 * m, 0.4, 1.0], np.float32)
        corners.append(
            np.stack(
                [
                    c0,
                    c0 + [0.0, 0.0, 2.2, 0.0],
                    c0 + [2.2, 0.0, 2.2, 0.0],
                    c0 + [2.2, 0.0, 0.0, 0.0],
                ]
            )
        )
    corners = jnp.asarray(np.stack(corners))
    spans = jnp.stack(
        [corners[:, 1] - corners[:, 0], corners[:, 3] - corners[:, 0]], axis=1
    )
    n3 = np.cross(np.asarray(spans[:, 0, :3]), np.asarray(spans[:, 1, :3]))
    n3 /= np.linalg.norm(n3, axis=-1, keepdims=True)
    normals = jnp.asarray(
        np.concatenate([n3, np.zeros((len(n3), 1), np.float32)], axis=1)
    )
    mask_kwargs = dict(
        intersection_distances_target=jnp.full((heliostats, rays, points), 40.0),
        ray_primitive_indices=jnp.arange(heliostats, dtype=jnp.int32),
    )
    directions = np.zeros((heliostats, rays, points, 4), np.float32)
    directions[..., 1] = -1.0
    directions[..., 2] = -0.03 + 0.01 * rng.standard_normal(
        (heliostats, rays, points)
    )
    directions[..., :3] /= np.linalg.norm(
        directions[..., :3], axis=-1, keepdims=True
    )
    dense = xla_blocking.soft_ray_blocking_mask(
        jnp.asarray(origins), jnp.asarray(directions), corners, spans, normals,
        **mask_kwargs, method="xla",
    )
    compact = xla_blocking.soft_ray_blocking_mask(
        jnp.asarray(origins), jnp.asarray(directions), corners, spans, normals,
        **mask_kwargs, method="pallas", max_candidates=16,
    )
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense), atol=2e-3)
