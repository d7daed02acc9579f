"""Production-scale smoke: 1,000-heliostat field builds and renders.

Verifies the scenario builder, the candidate-compacted blocking path
(O(rays x K), field-size independent) and the ray-chunk/remat memory
bounding all hold at 10x the bench field. Sizing per the reference's
production workload (reference:
examples/field_optimizations/config.yaml:22-57).
"""

import numpy as np

import jax
import jax.numpy as jnp

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.blocking import (
    create_blocking_primitives_rectangles_by_index,
    select_blocking_candidates,
)
from artist_tpu.scenario.synthetic import make_synthetic_scenario

HELIOSTATS = 1000


def test_thousand_heliostat_render_and_gradient():
    scenario = make_synthetic_scenario(
        number_of_heliostats=HELIOSTATS,
        number_of_surface_points_per_facet=(5, 5),
        number_of_rays=2,
    )
    group = scenario.heliostat_groups[0]
    tower = scenario.solar_tower
    num = group.number_of_heliostats
    assert num == HELIOSTATS

    indices = jnp.arange(num, dtype=jnp.int32)
    targets = jnp.zeros(num, dtype=jnp.int32)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    aim = get_centers_of_target_areas(tower, targets)
    active = hg.gather_active(group, indices)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    num_points = points.shape[1]
    du, de = scenario.light_sources[0].get_distortions(
        jax.random.PRNGKey(11), num_points, num
    )
    primitives = create_blocking_primitives_rectangles_by_index(points)
    config = RenderConfig(
        bitmap_resolution=(64, 64),
        ray_chunk=1,
        blocking_active=True,
        blocking_candidates=16,
    )

    def loss(points_):
        flux, intercept, on_target, blocking = trace_rays(
            tower=tower,
            aligned_surface_points=points_,
            aligned_surface_normals=normals,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=du,
            distortions_e=de,
            blocking_primitives=create_blocking_primitives_rectangles_by_index(
                points_
            ),
            ray_primitive_indices=indices,
            config=config,
        )
        return jnp.sum(flux * jnp.arange(64, dtype=jnp.float32)[None, :, None]), (
            flux,
            on_target,
        )

    (value, (flux, on_target)), grads = jax.jit(
        jax.value_and_grad(loss, has_aux=True)
    )(points)
    assert np.isfinite(float(value))
    assert np.isfinite(np.asarray(grads)).all()
    assert np.asarray(flux).shape == (HELIOSTATS, 64, 64)
    assert float(jnp.mean(on_target)) > 0.5

    # The candidate selector stays tiny at this scale: every heliostat's
    # non-padded candidate count is bounded by K, and its own primitive is
    # never selected.
    cand, valid = select_blocking_candidates(
        points, jnp.broadcast_to(incident[:, None, None], du.shape + (4,)),
        primitives[0], indices, jnp.full(du.shape, 100.0), max_candidates=16,
    )
    assert cand.shape == (HELIOSTATS, 16)
    own_selected = (cand == indices[:, None]) & valid
    assert not bool(own_selected.any())
