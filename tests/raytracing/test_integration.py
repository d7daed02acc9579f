"""End-to-end parity: align + trace -> flux bitmap vs the torch reference.

Strategy (BASELINE.md fidelity gates): inject IDENTICAL distortion tensors
into both frameworks (torch RNG draws are not reproducible in JAX), then
compare the rendered flux bitmaps at the reference's own golden tolerance
(rtol 1%, atol max(1% * mean, 1e-6); reference:
tests/field/test_integration_alignment.py:163-169).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.field import heliostat_group
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = "test_scenario_paint_single_heliostat.h5"
POINTS = (8, 8)
NUM_RAYS = 10  # must equal the scenario light source's number_of_rays
RESOLUTION = (64, 64)


def _reference_flux(
    reference_scenario_dir, incident, target_index, distortions_u, distortions_e
):
    import h5py
    import torch
    from artist.raytracing import HeliostatRayTracer
    from artist.scenario import Scenario

    with h5py.File(reference_scenario_dir / SCENARIO) as f:
        scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(list(POINTS)),
            device=torch.device("cpu"),
        )
    group = scenario.heliostat_field.heliostat_groups[0]
    mask = torch.tensor([1], dtype=torch.int32)
    group.activate_heliostats(active_heliostats_mask=mask, device=torch.device("cpu"))
    target_indices = torch.tensor([target_index])
    aim = scenario.solar_tower.get_centers_of_target_areas(
        target_area_indices=target_indices, device=torch.device("cpu")
    )
    incident_t = torch.tensor([incident])
    group.align_surfaces_with_incident_ray_directions(
        aim_points=aim,
        incident_ray_directions=incident_t,
        active_heliostats_mask=mask,
        device=torch.device("cpu"),
    )
    tracer = HeliostatRayTracer(
        scenario=scenario,
        heliostat_group=group,
        blocking_active=False,
        bitmap_resolution=torch.tensor(list(RESOLUTION)),
    )
    # Inject deterministic distortions shared with the TPU framework.
    tracer.distortions_dataset.distortions_u = torch.from_numpy(distortions_u)
    tracer.distortions_dataset.distortions_e = torch.from_numpy(distortions_e)
    flux, intercept, on_target, blocking = tracer.trace_rays(
        incident_ray_directions=incident_t,
        active_heliostats_mask=mask,
        target_area_indices=target_indices,
        device=torch.device("cpu"),
    )
    return (
        flux.detach().numpy(),
        intercept.numpy(),
        on_target.numpy(),
        blocking.numpy(),
        aim.numpy(),
    )


def _tpu_flux(
    reference_scenario_dir,
    incident,
    target_index,
    distortions_u,
    distortions_e,
    ray_chunk=None,
):
    from artist_tpu.field.solar_tower import get_centers_of_target_areas

    scenario = load_scenario_from_hdf5(
        reference_scenario_dir / SCENARIO, number_of_surface_points_per_facet=POINTS
    )
    group = scenario.heliostat_groups[0]
    active = heliostat_group.gather_active(
        group, heliostat_group.active_indices_from_mask(np.array([1]))
    )
    target_indices = jnp.asarray([target_index], dtype=jnp.int32)
    aim = get_centers_of_target_areas(scenario.solar_tower, target_indices)
    incident_j = jnp.asarray([incident], dtype=jnp.float32)
    points, normals, _, _ = heliostat_group.align_surfaces_with_incident_ray_directions(
        active, aim, incident_j
    )
    flux, intercept, on_target, blocking = trace_rays(
        tower=scenario.solar_tower,
        aligned_surface_points=points,
        aligned_surface_normals=normals,
        incident_ray_directions=incident_j,
        target_area_indices=target_indices,
        distortions_u=jnp.asarray(distortions_u),
        distortions_e=jnp.asarray(distortions_e),
        config=RenderConfig(bitmap_resolution=RESOLUTION, ray_chunk=ray_chunk),
    )
    return (
        np.asarray(flux),
        np.asarray(intercept),
        np.asarray(on_target),
        np.asarray(blocking),
    )


def _distortions(num_points):
    rng = np.random.RandomState(7)
    scale = np.sqrt(4.3681e-06)
    du = (scale * rng.randn(1, NUM_RAYS, num_points)).astype(np.float32)
    de = (scale * rng.randn(1, NUM_RAYS, num_points)).astype(np.float32)
    return du, de


def _assert_flux_close(ours, theirs):
    atol = max(0.01 * float(np.abs(theirs).mean()), 1e-6)
    np.testing.assert_allclose(ours, theirs, rtol=0.01, atol=atol)


class TestEndToEndFlux:
    @pytest.mark.parametrize(
        "incident,target",
        [
            ([0.0, 1.0, 0.0, 0.0], 0),  # sun in the south, planar target
            ([-1.0, 0.0, 0.0, 0.0], 1),  # sun in the east, planar target
            ([0.0, 1.0, 0.0, 0.0], 3),  # cylindrical receiver
        ],
    )
    def test_flux_matches_reference(
        self, reference_artist, reference_scenario_dir, incident, target
    ):
        num_points = POINTS[0] * POINTS[1] * 4
        du, de = _distortions(num_points)
        ref_flux, ref_icpt, ref_on, ref_blk, _ = _reference_flux(
            reference_scenario_dir, incident, target, du, de
        )
        flux, icpt, on, blk = _tpu_flux(
            reference_scenario_dir, incident, target, du, de
        )
        assert ref_flux.sum() > 0, "oracle rendered an empty bitmap - bad setup"
        _assert_flux_close(flux, ref_flux)
        np.testing.assert_allclose(icpt, ref_icpt, atol=1e-6)
        np.testing.assert_allclose(on, ref_on, atol=1e-6)
        np.testing.assert_allclose(blk, ref_blk, atol=1e-6)

    def test_ray_chunking_is_exact(self, reference_scenario_dir):
        num_points = POINTS[0] * POINTS[1] * 4
        du, de = _distortions(num_points)
        full = _tpu_flux(reference_scenario_dir, [0.0, 1.0, 0.0, 0.0], 0, du, de)
        chunked = _tpu_flux(
            reference_scenario_dir, [0.0, 1.0, 0.0, 0.0], 0, du, de, ray_chunk=1
        )
        # Chunked and unchunked compile to different fusions; f32
        # reassociation allows a few 1e-4-level differences.
        np.testing.assert_allclose(full[0], chunked[0], atol=5e-4)
