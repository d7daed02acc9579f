"""Mesh, sharding, and distributed-setup utilities.

reference: tests/util/test_env.py (group-to-rank mappings and backend
selection; here mesh construction and the round-robin mapping).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.parallel import (
    distribute_groups_among_ranks,
    make_mesh,
    ray_sharding,
    replicated_sharding,
    sample_sharding,
    setup_distributed_environment,
)


def test_round_robin_mapping_matches_reference(reference_artist):
    from artist.util.env import distribute_groups_among_ranks as reference_mapping

    for world_size, groups in [(1, 3), (2, 4), (3, 2), (8, 3), (4, 4)]:
        theirs, their_nested = reference_mapping(
            world_size=world_size, number_of_heliostat_groups=groups
        )
        mine = distribute_groups_among_ranks(groups, world_size)
        assert mine == theirs, (world_size, groups)
        assert (world_size > groups) == their_nested


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("heliostats", "rays")
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh(shape=(len(jax.devices()) // 2, 2))
    assert mesh2.devices.shape == (len(jax.devices()) // 2, 2)
    with pytest.raises(ValueError, match="does not match"):
        make_mesh(shape=(3, 5))


def test_shardings_distribute_arrays():
    mesh = make_mesh(shape=(4, 2))
    x = jnp.zeros((8, 4))
    sharded = jax.device_put(x, sample_sharding(mesh))
    assert len(sharded.sharding.device_set) == 8
    d = jnp.zeros((8, 4, 16))
    sharded_d = jax.device_put(d, ray_sharding(mesh))
    assert len(sharded_d.sharding.device_set) == 8
    r = jax.device_put(x, replicated_sharding(mesh))
    assert r.sharding.is_fully_replicated


def test_sharded_render_matches_single_device():
    """The mesh-sharded render must produce identical flux bitmaps."""
    from artist_tpu.field import heliostat_group as hg
    from artist_tpu.field.solar_tower import get_centers_of_target_areas
    from artist_tpu.raytracing import RenderConfig, trace_rays
    from artist_tpu.scenario.synthetic import make_synthetic_scenario

    scenario = make_synthetic_scenario(
        number_of_heliostats=8,
        number_of_control_points_per_facet=(6, 6),
        number_of_surface_points_per_facet=(4, 4),
        number_of_rays=4,
    )
    group = scenario.heliostat_groups[0]
    num = group.number_of_heliostats
    active = hg.gather_active(group, jnp.arange(num, dtype=jnp.int32))
    targets = jnp.zeros(num, dtype=jnp.int32)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    aim = get_centers_of_target_areas(scenario.solar_tower, targets)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    du, de = scenario.light_sources[0].get_distortions(
        jax.random.PRNGKey(7), points.shape[1], num
    )
    config = RenderConfig(bitmap_resolution=(32, 32))

    def run(p, n, du_, de_):
        flux, *_ = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=p,
            aligned_surface_normals=n,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=du_,
            distortions_e=de_,
            config=config,
        )
        return flux

    base = np.asarray(run(points, normals, du, de))
    mesh = make_mesh(shape=(4, 2))
    sharded = np.asarray(
        run(
            jax.device_put(points, sample_sharding(mesh)),
            jax.device_put(normals, sample_sharding(mesh)),
            jax.device_put(du, ray_sharding(mesh)),
            jax.device_put(de, ray_sharding(mesh)),
        )
    )
    np.testing.assert_allclose(sharded, base, atol=1e-5)


def test_setup_distributed_environment_single_process():
    with setup_distributed_environment(number_of_heliostat_groups=2) as setup:
        assert not setup.is_distributed
        assert setup.rank == 0
        assert setup.world_size == 1
        assert setup.groups_to_ranks_mapping == {0: [0, 1]}
        assert setup.ranks_to_groups_mapping == {0: [0], 1: [0]}
        assert setup.mesh is not None
