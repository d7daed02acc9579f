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
