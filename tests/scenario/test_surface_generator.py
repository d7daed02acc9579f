"""Surface-generator fitting unit tests.

reference: tests/scenario/test_surface_generator.py - fit NURBS control
points to a synthetic curved surface by points and by normals, and verify
the fitted surface reproduces the target.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
from artist_tpu.scenario.surface_generator import SurfaceGenerator
from artist_tpu.util import constants


def _paraboloid_cloud(n: int = 24, curvature: float = 0.02):
    """Gently curved facet point cloud + analytic normals (homogeneous)."""
    lin = np.linspace(-0.6, 0.6, n, dtype=np.float32)
    xx, yy = np.meshgrid(lin, lin, indexing="ij")
    zz = curvature * (xx**2 + yy**2)
    points = np.stack(
        [xx, yy, zz, np.ones_like(xx)], axis=-1
    ).reshape(-1, 4)
    # Normal of z - c(x^2+y^2): (-2cx, -2cy, 1)/|..|
    nx = -2 * curvature * xx
    ny = -2 * curvature * yy
    nz = np.ones_like(xx)
    norm = np.sqrt(nx**2 + ny**2 + nz**2)
    normals = np.stack(
        [nx / norm, ny / norm, nz / norm, np.zeros_like(xx)], axis=-1
    ).reshape(-1, 4)
    return jnp.asarray(points), jnp.asarray(normals)


@pytest.mark.parametrize(
    "fit_method",
    [constants.fit_nurbs_from_points, constants.fit_nurbs_from_normals],
)
def test_fit_reproduces_paraboloid(fit_method):
    points, normals = _paraboloid_cloud()
    generator = SurfaceGenerator(number_of_control_points=(7, 7))
    control_points = generator.fit_nurbs(
        points,
        normals,
        initial_learning_rate=5e-3,
        fit_method=fit_method,
        max_epoch=400,
    )
    assert control_points.shape == (1, 7, 7, 3)

    evaluated_points, evaluated_normals = evaluate_nurbs_surfaces(
        control_points[None],
        (3, 3),
        create_nurbs_evaluation_grid((16, 16)),
    )
    if fit_method == constants.fit_nurbs_from_points:
        # Surface heights follow the paraboloid: z = c r^2 at the corners.
        z = np.asarray(evaluated_points)[0, 0, :, 2]
        x = np.asarray(evaluated_points)[0, 0, :, 0]
        y = np.asarray(evaluated_points)[0, 0, :, 1]
        np.testing.assert_allclose(z, 0.02 * (x**2 + y**2), atol=2e-3)
    else:
        # Normals tilt outward proportionally to the position.
        n = np.asarray(evaluated_normals)[0, 0]
        assert np.all(n[:, 2] > 0.99)  # nearly up
        # Points near +x edge must tilt toward -x.
        x = np.asarray(evaluated_points)[0, 0, :, 0]
        edge = x > 0.4
        assert np.all(n[edge, 0] < 0)


def test_unknown_fit_method_raises():
    points, normals = _paraboloid_cloud(n=4)
    with pytest.raises(NotImplementedError):
        SurfaceGenerator(number_of_control_points=(5, 5)).fit_nurbs(
            points, normals, fit_method="laser_scan"
        )
