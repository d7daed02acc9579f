"""Pixel-gradient parity vs the torch reference (BASELINE.md fidelity gate).

The same scalar loss (sum of flux inside a window) is differentiated w.r.t.
the aligned surface normals and points in both frameworks with identical
injected distortions; gradients must agree. This validates the whole
backward chain through reflect -> scatter -> intersect -> splat.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas

SCENARIO = "/root/reference/tests/data/scenarios/test_scenario_paint_single_heliostat.h5"
POINTS = (8, 8)
NUM_RAYS = 10
RESOLUTION = (64, 64)


@pytest.fixture(scope="module")
def aligned_state():
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=POINTS
    )
    group = scenario.heliostat_groups[0]
    active = hg.gather_active(group, hg.active_indices_from_mask(np.array([1])))
    targets = jnp.zeros(1, dtype=jnp.int32)
    aim = get_centers_of_target_areas(scenario.solar_tower, targets)
    incident = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32)
    points, normals, _, _ = hg.align_surfaces_with_incident_ray_directions(
        active, aim, incident
    )
    rng = np.random.RandomState(7)
    scale = np.sqrt(4.3681e-06)
    num_points = points.shape[1]
    du = (scale * rng.randn(1, NUM_RAYS, num_points)).astype(np.float32)
    de = (scale * rng.randn(1, NUM_RAYS, num_points)).astype(np.float32)
    return scenario, incident, targets, points, normals, du, de


def _window_loss_weights():
    # A spatially varying weight makes the gradient informative per pixel.
    yy, xx = np.mgrid[0 : RESOLUTION[1], 0 : RESOLUTION[0]]
    return (np.sin(xx / 5.0) * np.cos(yy / 7.0) + 1.5).astype(np.float32)


def _reference_gradients(reference_artist, aligned_state):
    import torch
    from artist.raytracing import geometry as rgeo
    from artist.geometry import transforms as rtransforms
    from artist.scene.rays import Rays
    import h5py
    from artist.scenario import Scenario

    scenario, incident, targets, points, normals, du, de = aligned_state
    with h5py.File(SCENARIO) as f:
        ref_scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor(list(POINTS)),
            device=torch.device("cpu"),
        )
    ref_points = torch.from_numpy(np.asarray(points)).requires_grad_()
    ref_normals = torch.from_numpy(np.asarray(normals)).requires_grad_()
    incident_t = torch.from_numpy(np.asarray(incident))

    preferred = rgeo.reflect(
        incident_ray_directions=incident_t[:, None, :],
        reflection_surface_normals=ref_normals,
    )
    rotations = rtransforms.rotate_distortions(
        e=torch.from_numpy(de), u=torch.from_numpy(du), device=torch.device("cpu")
    )
    scattered = (rotations @ preferred.unsqueeze(1).unsqueeze(-1)).squeeze(-1)
    rays = Rays(
        ray_directions=scattered,
        ray_magnitudes=torch.ones(1, NUM_RAYS, ref_points.shape[1]),
    )
    planar = ref_scenario.solar_tower.target_areas[0]
    be, bu, dist, inten = rgeo.line_plane_intersections(
        rays=rays,
        points_at_ray_origins=ref_points,
        target_areas=planar,
        target_area_indices=torch.zeros(1, dtype=torch.int64),
        bitmap_resolution=torch.tensor(list(RESOLUTION)),
        device=torch.device("cpu"),
    )
    from artist.raytracing.heliostat_ray_tracer import HeliostatRayTracer

    tracer = HeliostatRayTracer(
        scenario=ref_scenario,
        heliostat_group=ref_scenario.heliostat_field.heliostat_groups[0],
        blocking_active=False,
        bitmap_resolution=torch.tensor(list(RESOLUTION)),
    )
    flux = tracer.bilinear_splatting(
        bitmap_intersections_e=be,
        bitmap_intersections_u=bu,
        absolute_intensities=inten * 0.935,
        device=torch.device("cpu"),
    )
    weights = torch.from_numpy(_window_loss_weights())
    loss = (flux * weights).sum()
    loss.backward()
    return (
        ref_points.grad.numpy(),
        ref_normals.grad.numpy(),
        flux.detach().numpy(),
    )


def test_pixel_gradients_match_reference(reference_artist, aligned_state):
    scenario, incident, targets, points, normals, du, de = aligned_state
    weights = jnp.asarray(_window_loss_weights())
    config = RenderConfig(bitmap_resolution=RESOLUTION)

    def loss_fn(points_, normals_):
        flux, _, _, _ = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=points_,
            aligned_surface_normals=normals_,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=jnp.asarray(du),
            distortions_e=jnp.asarray(de),
            config=config,
        )
        return jnp.sum(flux * weights)

    grad_points, grad_normals = jax.grad(loss_fn, argnums=(0, 1))(points, normals)
    ref_grad_points, ref_grad_normals, ref_flux = _reference_gradients(
        reference_artist, aligned_state
    )
    assert ref_flux.sum() > 0

    for mine, theirs, name in [
        (np.asarray(grad_points), ref_grad_points, "points"),
        (np.asarray(grad_normals), ref_grad_normals, "normals"),
    ]:
        scale = np.abs(theirs).max()
        assert scale > 0, f"reference gradient w.r.t. {name} is zero"
        np.testing.assert_allclose(
            mine / scale,
            theirs / scale,
            atol=1e-3,
            err_msg=f"gradient w.r.t. {name}",
        )
