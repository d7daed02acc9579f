"""Heliostat-on-heliostat blocking parity vs the torch reference.

Our design replaces the reference's LBVH cull + soft mask
(artist/raytracing/blocking.py:513-995) with a brute-force soft mask over
all primitives plus a per-ray hard distance gate (SURVEY.md section 7). The
compositions are correctness-equivalent; this test verifies it end-to-end
on the reference's dedicated blocking scenario with identical injected
distortions, at the reference's golden tolerance.
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.blocking import (
    create_blocking_primitives_rectangles_by_index,
)
from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = pathlib.Path("/root/reference/tests/data/scenarios/test_blocking.h5")
POINTS = (8, 8)
NUM_RAYS = 20
RESOLUTION = (64, 64)


def _distortions(num_active, num_points):
    rng = np.random.RandomState(7)
    scale = np.sqrt(4.3681e-06)
    du = (scale * rng.randn(num_active, NUM_RAYS, num_points)).astype(np.float32)
    de = (scale * rng.randn(num_active, NUM_RAYS, num_points)).astype(np.float32)
    return du, de


@pytest.fixture(scope="module")
def reference_blocking_flux(reference_artist):
    import h5py
    import torch
    from artist.raytracing import HeliostatRayTracer
    from artist.scenario import Scenario

    if not SCENARIO.exists():
        pytest.skip("blocking scenario not available")
    with h5py.File(SCENARIO) as f:
        scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(list(POINTS)),
            device=torch.device("cpu"),
        )
    group = scenario.heliostat_field.heliostat_groups[0]
    num = group.number_of_heliostats
    mask = torch.ones(num, dtype=torch.int32)
    group.activate_heliostats(active_heliostats_mask=mask, device=torch.device("cpu"))
    targets = torch.zeros(num, dtype=torch.int64)
    aim = scenario.solar_tower.get_centers_of_target_areas(
        target_area_indices=targets, device=torch.device("cpu")
    )
    incident = torch.tensor([[0.0, 1.0, 0.0, 0.0]]).repeat(num, 1)
    group.align_surfaces_with_incident_ray_directions(
        aim_points=aim,
        incident_ray_directions=incident,
        active_heliostats_mask=mask,
        device=torch.device("cpu"),
    )
    scenario.set_number_of_rays(number_of_rays=NUM_RAYS)
    tracer = HeliostatRayTracer(
        scenario=scenario,
        heliostat_group=group,
        blocking_active=True,
        bitmap_resolution=torch.tensor(list(RESOLUTION)),
    )
    num_points = group.active_surface_points.shape[1]
    du, de = _distortions(num, num_points)
    tracer.distortions_dataset.distortions_u = torch.from_numpy(du)
    tracer.distortions_dataset.distortions_e = torch.from_numpy(de)
    flux, intercept, on_target, blocking_factor = tracer.trace_rays(
        incident_ray_directions=incident,
        active_heliostats_mask=mask,
        target_area_indices=targets,
        device=torch.device("cpu"),
    )
    return (
        flux.detach().numpy(),
        blocking_factor.numpy(),
        du,
        de,
    )


def test_blocking_integration_matches_reference(reference_blocking_flux):
    ref_flux, ref_blocking_factor, du, de = reference_blocking_flux

    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=POINTS
    )
    group = scenario.heliostat_groups[0]
    num = group.number_of_heliostats
    active = hg.gather_active(
        group, hg.active_indices_from_mask(np.ones(num, np.int32))
    )
    targets = jnp.zeros(num, dtype=jnp.int32)
    aim = get_centers_of_target_areas(scenario.solar_tower, targets)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    primitives = create_blocking_primitives_rectangles_by_index(points)
    flux, intercept, on_target, blocking_factor = trace_rays(
        ray_primitive_indices=jnp.arange(num, dtype=jnp.int32),
        tower=scenario.solar_tower,
        aligned_surface_points=points,
        aligned_surface_normals=normals,
        incident_ray_directions=incident,
        target_area_indices=targets,
        distortions_u=jnp.asarray(du),
        distortions_e=jnp.asarray(de),
        blocking_primitives=primitives,
        config=RenderConfig(bitmap_resolution=RESOLUTION, blocking_active=True),
    )
    assert ref_flux.sum() > 0
    # Blocking must actually occur in this scenario.
    assert (ref_blocking_factor < 1.0).any()
    atol = max(0.01 * float(np.abs(ref_flux).mean()), 1e-6)
    np.testing.assert_allclose(np.asarray(flux), ref_flux, rtol=0.01, atol=atol)
    np.testing.assert_allclose(
        np.asarray(blocking_factor), ref_blocking_factor, atol=1e-3
    )


def test_blocking_reduces_flux(reference_blocking_flux):
    """With blocking off, blocked heliostats must deliver more flux."""
    _, ref_blocking_factor, du, de = reference_blocking_flux
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=POINTS
    )
    group = scenario.heliostat_groups[0]
    num = group.number_of_heliostats
    active = hg.gather_active(
        group, hg.active_indices_from_mask(np.ones(num, np.int32))
    )
    targets = jnp.zeros(num, dtype=jnp.int32)
    aim = get_centers_of_target_areas(scenario.solar_tower, targets)
    incident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32), (num, 4)
    )
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    primitives = create_blocking_primitives_rectangles_by_index(points)

    def run(blocking_active):
        flux, _, _, blocking_factor = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=points,
            aligned_surface_normals=normals,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=jnp.asarray(du),
            distortions_e=jnp.asarray(de),
            blocking_primitives=primitives if blocking_active else None,
            ray_primitive_indices=jnp.arange(num, dtype=jnp.int32),
            config=RenderConfig(
                bitmap_resolution=RESOLUTION, blocking_active=blocking_active
            ),
        )
        return np.asarray(flux), np.asarray(blocking_factor)

    flux_on, factor_on = run(True)
    flux_off, factor_off = run(False)
    np.testing.assert_allclose(factor_off, 1.0, atol=1e-6)
    # Heliostats whose target-hitting rays are blocked deliver less flux;
    # rays that miss the target count toward the blocking factor but carry
    # zero intensity either way.
    blocked = (factor_on < 1.0 - 1e-3) & (flux_off.sum(axis=(1, 2)) > 0)
    assert blocked.any()
    assert (
        flux_on.sum(axis=(1, 2))[blocked] < flux_off.sum(axis=(1, 2))[blocked]
    ).all()


def test_primitive_chunking_matches_single_pass():
    """Chunked scan over primitives (values AND gradients) must equal the
    single-pass evaluation, including cull semantics and ragged padding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artist_tpu.raytracing.blocking import soft_ray_blocking_mask

    rng = np.random.RandomState(21)
    num_heliostats, num_rays, num_points, num_primitives = 3, 2, 5, 7
    origins = jnp.asarray(
        rng.rand(num_heliostats, num_points, 4).astype(np.float32) * 4
    )
    directions = jnp.asarray(
        rng.rand(num_heliostats, num_rays, num_points, 4).astype(np.float32) - 0.5
    )
    corner_0 = rng.rand(num_primitives, 4).astype(np.float32) * 4
    span_u = rng.rand(num_primitives, 4).astype(np.float32)
    span_v = rng.rand(num_primitives, 4).astype(np.float32)
    corners = jnp.asarray(
        np.stack(
            [corner_0, corner_0 + span_u, corner_0 + span_u + span_v, corner_0 + span_v],
            axis=1,
        )
    )
    spans = jnp.asarray(np.stack([span_u, span_v], axis=1))
    normals3 = np.cross(span_u[:, :3], span_v[:, :3])
    normals3 /= np.linalg.norm(normals3, axis=-1, keepdims=True)
    normals = jnp.asarray(
        np.concatenate([normals3, np.zeros((num_primitives, 1))], axis=1).astype(
            np.float32
        )
    )
    target_distances = jnp.asarray(
        rng.rand(num_heliostats, num_rays, num_points).astype(np.float32) * 10
    )
    own = jnp.asarray(np.array([0, 3, 6], np.int32))

    def blocked_sum(origins_, chunk):
        return jnp.sum(
            soft_ray_blocking_mask(
                origins_,
                directions,
                corners,
                spans,
                normals,
                intersection_distances_target=target_distances,
                ray_primitive_indices=own,
                primitive_chunk=chunk,
            )
        )

    reference_value, reference_grad = jax.value_and_grad(blocked_sum)(origins, None)
    for chunk in (1, 2, 3, 7, 16):
        value, grad = jax.value_and_grad(blocked_sum)(origins, chunk)
        np.testing.assert_allclose(
            float(value), float(reference_value), rtol=1e-5, err_msg=f"chunk={chunk}"
        )
        np.testing.assert_allclose(
            np.asarray(grad), np.asarray(reference_grad), rtol=1e-4, atol=1e-6
        )
