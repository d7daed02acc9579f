"""Direct analytic tests for ray/target intersection geometry.

reference: artist/raytracing/geometry.py:44-445 (the flux integration tests
exercise these end to end; here hand-constructible rays pin down distances,
Lambert intensities, bitmap coordinates, and patch masking in isolation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.raytracing.geometry import (
    line_cylinder_intersections,
    line_plane_intersections,
    reflect,
)


def _tower(
    plane_center=(0.0, 10.0, 0.0, 1.0),
    plane_normal=(0.0, -1.0, 0.0, 0.0),
    cylinder_center=(0.0, -10.0, 0.0, 1.0),
    radius=2.0,
    height=4.0,
    opening_angle=np.pi,
) -> SolarTower:
    # The cylinder normal points NORTH toward the field ([0, 1, 0]): the
    # reference's patch-angle formula measures the hit angle in the local
    # frame but the normal angle from world east/north components
    # (reference: artist/raytracing/geometry.py:399-406), which coincide
    # only for a north-facing receiver - the PAINT Juelich convention.
    return SolarTower(
        planar_centers=jnp.asarray([plane_center], jnp.float32),
        planar_normals=jnp.asarray([plane_normal], jnp.float32),
        planar_dimensions=jnp.asarray([[4.0, 4.0]], jnp.float32),
        cylindrical_centers=jnp.asarray([cylinder_center], jnp.float32),
        cylindrical_axes=jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32),
        cylindrical_normals=jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
        cylindrical_radii=jnp.asarray([radius], jnp.float32),
        cylindrical_heights=jnp.asarray([height], jnp.float32),
        cylindrical_opening_angles=jnp.asarray([opening_angle], jnp.float32),
        planar_names=("plane",),
        cylindrical_names=("cylinder",),
    )


def _single_ray(direction):
    """[M=1, R=1, P=1] ray bundle from the origin."""
    directions = jnp.asarray(direction, jnp.float32).reshape(1, 1, 1, 4)
    origins = jnp.zeros((1, 1, 4), jnp.float32).at[..., 3].set(1.0)
    magnitudes = jnp.ones((1, 1, 1), jnp.float32)
    return directions, magnitudes, origins


class TestReflect:
    def test_mirror_law(self):
        """45-degree incidence on an up normal turns north into up."""
        incoming = jnp.asarray([[[0.0, 1.0, -1.0, 0.0]]], jnp.float32) / np.sqrt(2)
        normals = jnp.asarray([[[0.0, 0.0, 1.0, 0.0]]], jnp.float32)
        outgoing = reflect(incoming, normals)
        np.testing.assert_allclose(
            np.asarray(outgoing)[0, 0],
            np.array([0.0, 1.0, 1.0, 0.0]) / np.sqrt(2),
            atol=1e-6,
        )

    def test_energy_preserving(self):
        key = jax.random.PRNGKey(3)
        incoming = jax.random.normal(key, (2, 5, 4)).at[..., 3].set(0.0)
        normals = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32), (2, 5, 4)
        )
        outgoing = reflect(incoming, normals)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(outgoing)[..., :3], axis=-1),
            np.linalg.norm(np.asarray(incoming)[..., :3], axis=-1),
            rtol=1e-5,
        )


class TestPlaneIntersections:
    def test_perpendicular_hit_distance_and_center(self):
        """A ray straight north from the origin hits the plane at y=10 at
        distance 10, full Lambert intensity, dead-center bitmap coords."""
        directions, magnitudes, origins = _single_ray([0.0, 1.0, 0.0, 0.0])
        bitmap_e, bitmap_u, distances, intensities = line_plane_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        np.testing.assert_allclose(float(distances[0, 0, 0]), 10.0, rtol=1e-6)
        np.testing.assert_allclose(float(intensities[0, 0, 0]), 1.0, rtol=1e-6)
        # Center of a 4x4 plane -> bitmap center (e-axis flipped, same value).
        np.testing.assert_allclose(float(bitmap_e[0, 0, 0]), 63 / 2, atol=1e-4)
        np.testing.assert_allclose(float(bitmap_u[0, 0, 0]), 63 / 2, atol=1e-4)

    def test_oblique_hit_lambert_cosine(self):
        """A 45-degree ray has intensity cos(45) and sqrt(2) distance."""
        directions, magnitudes, origins = _single_ray(
            np.array([0.0, 1.0, 1.0, 0.0]) / np.sqrt(2)
        )
        tower = _tower(plane_center=(0.0, 1.0, 1.0, 1.0))
        _, _, distances, intensities = line_plane_intersections(
            directions, magnitudes, origins, tower, jnp.asarray([0]), (64, 64)
        )
        np.testing.assert_allclose(
            float(distances[0, 0, 0]), np.sqrt(2.0), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(intensities[0, 0, 0]), 1.0 / np.sqrt(2.0), rtol=1e-5
        )

    def test_back_facing_ray_is_zeroed(self):
        """Rays hitting the back face produce no flux."""
        directions, magnitudes, origins = _single_ray([0.0, -1.0, 0.0, 0.0])
        _, _, distances, intensities = line_plane_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        assert float(distances[0, 0, 0]) == 0.0
        assert float(intensities[0, 0, 0]) == 0.0

    def test_out_of_bounds_hit_is_zeroed(self):
        """Hits outside the plane's width/height are masked out."""
        direction = np.array([3.0, 10.0, 0.0, 0.0])
        direction = direction / np.linalg.norm(direction)
        directions, magnitudes, origins = _single_ray(direction)
        _, _, _, intensities = line_plane_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        assert float(intensities[0, 0, 0]) == 0.0


class TestCylinderIntersections:
    def test_perpendicular_hit_front_surface(self):
        """A ray straight south from the origin hits the near surface of the
        cylinder (center y=-10, radius 2) at distance 8 with full intensity,
        in the middle of the patch
        (reference: artist/raytracing/geometry.py:207-445)."""
        directions, magnitudes, origins = _single_ray([0.0, -1.0, 0.0, 0.0])
        bitmap_e, bitmap_u, distances, intensities = line_cylinder_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        np.testing.assert_allclose(float(distances[0, 0, 0]), 8.0, rtol=1e-5)
        np.testing.assert_allclose(float(intensities[0, 0, 0]), 1.0, rtol=1e-4)
        # z=0 is mid-height; the hit angle is mid-opening-angle.
        np.testing.assert_allclose(float(bitmap_u[0, 0, 0]), 63 / 2, atol=1e-3)
        np.testing.assert_allclose(float(bitmap_e[0, 0, 0]), 63 / 2, atol=1e-3)

    def test_point_on_cylinder_surface(self):
        """The intersection point satisfies the cylinder equation."""
        direction = np.array([0.1, -1.0, 0.02, 0.0])
        direction = direction / np.linalg.norm(direction)
        directions, magnitudes, origins = _single_ray(direction)
        tower = _tower()
        _, _, distances, intensities = line_cylinder_intersections(
            directions, magnitudes, origins, tower, jnp.asarray([0]), (64, 64)
        )
        assert float(intensities[0, 0, 0]) > 0.0
        hit = np.asarray(origins)[0, 0, :3] + float(
            distances[0, 0, 0]
        ) * np.asarray(direction[:3])
        center = np.array([0.0, -10.0, 0.0])
        radial = hit - center
        radial[2] = 0.0  # distance to the axis (axis = up)
        np.testing.assert_allclose(np.linalg.norm(radial), 2.0, rtol=1e-4)

    def test_above_patch_height_is_masked(self):
        """Hits above the finite cylinder height are masked out."""
        direction = np.array([0.0, -1.0, 0.5, 0.0])  # climbs ~4 units over y=8
        direction = direction / np.linalg.norm(direction)
        directions, magnitudes, origins = _single_ray(direction)
        _, _, _, intensities = line_cylinder_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        assert float(intensities[0, 0, 0]) == 0.0

    def test_miss_is_zeroed(self):
        """A ray pointing away from the cylinder produces nothing."""
        directions, magnitudes, origins = _single_ray([1.0, 0.0, 0.0, 0.0])
        _, _, distances, intensities = line_cylinder_intersections(
            directions, magnitudes, origins, _tower(), jnp.asarray([0]), (64, 64)
        )
        assert float(intensities[0, 0, 0]) == 0.0
        assert float(distances[0, 0, 0]) == 0.0

    def test_gradients_flow_through_intersection(self):
        """The quadratic solve is differentiable w.r.t. ray origins."""

        def distance_of(origin_y):
            origins = jnp.zeros((1, 1, 4), jnp.float32)
            origins = origins.at[0, 0, 1].set(origin_y).at[0, 0, 3].set(1.0)
            directions = jnp.asarray([0.0, -1.0, 0.0, 0.0], jnp.float32).reshape(
                1, 1, 1, 4
            )
            _, _, distances, _ = line_cylinder_intersections(
                directions,
                jnp.ones((1, 1, 1), jnp.float32),
                origins,
                _tower(),
                jnp.asarray([0]),
                (64, 64),
            )
            return distances[0, 0, 0]

        gradient = jax.grad(distance_of)(jnp.float32(0.0))
        # Moving the origin 1 m north lengthens the hit distance by 1 m
        # (the cylinder stands south of the origin).
        np.testing.assert_allclose(float(gradient), 1.0, rtol=1e-4)
