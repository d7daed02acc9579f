"""Parity tests: NURBS evaluation vs the torch reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
from artist_tpu.nurbs.surfaces import find_spans_uniform


@pytest.fixture(scope="module")
def torch_nurbs(reference_artist):
    from artist.nurbs.surfaces import NURBSSurfaces

    return NURBSSurfaces


def _random_case(rng, num_s=2, num_f=3, cu=8, cv=6, degree=3):
    cp = rng.randn(num_s, num_f, cu, cv, 3).astype(np.float32)
    # Flat-ish grids with small z perturbation (like a real heliostat facet).
    gu = np.linspace(-0.6, 0.6, cu, dtype=np.float32)
    gv = np.linspace(-0.5, 0.5, cv, dtype=np.float32)
    cp[..., 0] = gu[None, None, :, None]
    cp[..., 1] = gv[None, None, None, :]
    cp[..., 2] = 0.02 * rng.randn(num_s, num_f, cu, cv).astype(np.float32)
    return cp


class TestSpans:
    def test_spans_match_reference(self, torch_nurbs):
        import torch

        rng = np.random.RandomState(0)
        cp = _random_case(rng)
        pts = np.asarray(
            create_nurbs_evaluation_grid((7, 5))
        )  # [35, 2]
        eval_pts = np.broadcast_to(pts[None, None], (2, 3, 35, 2)).astype(np.float32)

        ref = torch_nurbs(
            degrees=torch.tensor([3, 3]),
            control_points=torch.from_numpy(cp),
            device=torch.device("cpu"),
        )
        theirs_u = ref.find_spans(
            direction=0,
            evaluation_points=torch.from_numpy(eval_pts.copy()),
            knot_vectors=ref.knot_vectors_u,
            device=torch.device("cpu"),
        )
        ours_u = find_spans_uniform(jnp.asarray(eval_pts[..., 0]), cp.shape[2], 3)
        np.testing.assert_array_equal(np.asarray(ours_u), theirs_u.numpy())


class TestEvaluation:
    @pytest.mark.parametrize("degree", [2, 3])
    def test_points_and_normals_match_reference(self, torch_nurbs, degree):
        import torch

        rng = np.random.RandomState(1)
        cp = _random_case(rng, degree=degree)
        pts = np.asarray(create_nurbs_evaluation_grid((9, 9)))
        eval_pts = np.broadcast_to(pts[None, None], (2, 3, 81, 2)).astype(np.float32)

        ref = torch_nurbs(
            degrees=torch.tensor([degree, degree]),
            control_points=torch.from_numpy(cp),
            device=torch.device("cpu"),
        )
        theirs_p, theirs_n = ref.calculate_surface_points_and_normals(
            evaluation_points=torch.from_numpy(eval_pts.copy()),
            canting=None,
            facet_translations=None,
            device=torch.device("cpu"),
        )
        ours_p, ours_n = evaluate_nurbs_surfaces(
            jnp.asarray(cp), (degree, degree), jnp.asarray(eval_pts)
        )
        np.testing.assert_allclose(np.asarray(ours_p), theirs_p.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours_n), theirs_n.numpy(), atol=2e-4)

    def test_with_canting_and_translation(self, torch_nurbs):
        import torch

        rng = np.random.RandomState(2)
        cp = _random_case(rng)
        pts = np.asarray(create_nurbs_evaluation_grid((6, 6)))
        eval_pts = np.broadcast_to(pts[None, None], (2, 3, 36, 2)).astype(np.float32)
        canting = np.zeros((2, 3, 2, 4), dtype=np.float32)
        canting[..., 0, 0] = 0.6
        canting[..., 0, 2] = 0.01 * rng.randn(2, 3)
        canting[..., 1, 1] = 0.5
        canting[..., 1, 2] = 0.01 * rng.randn(2, 3)
        translations = rng.randn(2, 3, 4).astype(np.float32)
        translations[..., 3] = 0.0

        ref = torch_nurbs(
            degrees=torch.tensor([3, 3]),
            control_points=torch.from_numpy(cp),
            device=torch.device("cpu"),
        )
        theirs_p, theirs_n = ref.calculate_surface_points_and_normals(
            evaluation_points=torch.from_numpy(eval_pts.copy()),
            canting=torch.from_numpy(canting),
            facet_translations=torch.from_numpy(translations),
            device=torch.device("cpu"),
        )
        ours_p, ours_n = evaluate_nurbs_surfaces(
            jnp.asarray(cp),
            (3, 3),
            jnp.asarray(eval_pts),
            canting=jnp.asarray(canting),
            facet_translations=jnp.asarray(translations),
        )
        np.testing.assert_allclose(np.asarray(ours_p), theirs_p.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours_n), theirs_n.numpy(), atol=2e-4)

    def test_gradients_flow_to_control_points(self):
        cp = jnp.asarray(_random_case(np.random.RandomState(3)))
        pts = create_nurbs_evaluation_grid((5, 5))

        def loss(c):
            p, n = evaluate_nurbs_surfaces(c, (3, 3), pts)
            return jnp.sum(p[..., 2] ** 2) + jnp.sum(n[..., 0] ** 2)

        g = jax.grad(loss)(cp)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_fit_analytic_surface(self):
        """Self-consistency: Adam-fit control points to an analytic surface.

        reference test strategy: tests/nurbs/test_surfaces.py:50-148 (mean
        error < 1e-2 after 100 epochs).
        """
        import optax

        rng = np.random.RandomState(4)
        n = 16
        x, y = np.meshgrid(
            np.linspace(-1, 1, n, dtype=np.float32),
            np.linspace(-1, 1, n, dtype=np.float32),
            indexing="ij",
        )
        z = 0.1 * np.sin(2 * x) * np.cos(2 * y)
        target = jnp.asarray(
            np.stack([x, y, z], axis=-1).reshape(1, 1, -1, 3).astype(np.float32)
        )

        eval_pts = create_nurbs_evaluation_grid((n, n))
        cp0 = np.zeros((1, 1, 8, 8, 3), dtype=np.float32)
        cp0[..., 0] = np.linspace(-1, 1, 8, dtype=np.float32)[:, None]
        cp0[..., 1] = np.linspace(-1, 1, 8, dtype=np.float32)[None, :]
        params = jnp.asarray(cp0)

        optimizer = optax.adam(5e-2)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(c):
                pts, _ = evaluate_nurbs_surfaces(c, (3, 3), eval_pts)
                return jnp.mean((pts[..., :3] - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        for _ in range(150):
            params, opt_state, loss = step(params, opt_state)

        pts, _ = evaluate_nurbs_surfaces(params, (3, 3), eval_pts)
        err = np.abs(np.asarray(pts[..., :3]) - np.asarray(target)).mean()
        assert err < 1e-2, f"mean abs error {err}"


def test_validate_uniform_knot_vectors():
    """Non-uniform knots must be rejected loudly (reference's search branch
    at artist/nurbs/surfaces.py:157-245 is unreachable from its pipelines)."""
    import numpy as np
    import pytest

    from artist_tpu.nurbs.surfaces import validate_uniform_knot_vectors

    degree, n_ctrl = 3, 6
    uniform = np.concatenate(
        [np.zeros(degree), np.linspace(0, 1, n_ctrl - degree + 1), np.ones(degree)]
    )
    validate_uniform_knot_vectors(uniform, degree)  # does not raise
    validate_uniform_knot_vectors(np.stack([uniform, uniform]), degree)

    non_uniform = uniform.copy()
    non_uniform[degree + 1] += 0.07
    with pytest.raises(ValueError, match="Non-uniform knot vectors"):
        validate_uniform_knot_vectors(non_uniform, degree)


def test_shared_grid_fast_path_matches_general_path():
    """The one-matmul shared-grid evaluation equals the batched general
    path (same grid explicitly broadcast per facet) in values AND
    control-point gradients."""
    import jax

    from artist_tpu.nurbs import (
        create_nurbs_evaluation_grid,
        evaluate_nurbs_surfaces,
    )

    key = jax.random.PRNGKey(11)
    control_points = jax.random.uniform(
        key, (3, 4, 7, 6, 3), jnp.float32, -1.0, 1.0
    )
    grid = create_nurbs_evaluation_grid((9, 8))  # [P, 2] -> fast path
    broadcast_grid = jnp.broadcast_to(
        grid[None, None], (3, 4) + grid.shape
    )  # [S, F, P, 2] -> general path

    fast_points, fast_normals = evaluate_nurbs_surfaces(
        control_points, (3, 3), grid
    )
    general_points, general_normals = evaluate_nurbs_surfaces(
        control_points, (3, 3), broadcast_grid
    )
    np.testing.assert_allclose(
        np.asarray(fast_points), np.asarray(general_points), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast_normals), np.asarray(general_normals), atol=1e-5
    )

    def summarize(evaluation_points):
        def loss(cp):
            points, normals = evaluate_nurbs_surfaces(
                cp, (3, 3), evaluation_points
            )
            return jnp.sum(points * points) + jnp.sum(normals)

        return jax.grad(loss)(control_points)

    np.testing.assert_allclose(
        np.asarray(summarize(grid)),
        np.asarray(summarize(broadcast_grid)),
        rtol=1e-4,
        atol=1e-5,
    )
