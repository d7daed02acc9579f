"""Aim-point optimizer convergence proofs.

Two levels (VERDICT round-2 follow-up):

1. An analytic single-heliostat case: the ground-truth flux is rendered at a
   KNOWN shifted aim point with the exact distortions the optimizer draws,
   so the loss has an attainable optimum at known motor positions - the
   optimizer must reach them (descent, not just activity).
2. A short-horizon two-framework run against the torch reference on the same
   PAINT scenario and configuration (the pattern of
   tests/optim/test_convergence_parity.py). Ray sampling differs between
   frameworks (threefry vs torch RNG), so the comparison checks matched loss
   landscapes and comparable descent, not lockstep trajectories.

reference oracle: artist/optim/aim_point_optimizer.py:724-972.
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.flux.bitmap import get_center_of_mass, trapezoid_distribution
from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.blocking import (
    create_blocking_primitives_rectangles_by_index,
)
from artist_tpu.raytracing.render import compute_ray_magnitude
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.scenario.synthetic import make_synthetic_scenario
from artist_tpu.util import constants

REFERENCE_ROOT = pathlib.Path("/root/reference")
SCENARIO = (
    REFERENCE_ROOT / "tests/data/scenarios/test_scenario_paint_four_heliostats.h5"
)


def _configuration(
    learning_rate: float, max_epoch: int, gamma: float = 1.0
) -> dict:
    return {
        constants.optimization: {
            constants.initial_learning_rate: learning_rate,
            constants.tolerance: 1e-5,
            constants.max_epoch: max_epoch,
            constants.batch_size: 50,
            constants.log_step: 0,
            constants.early_stopping_delta: 1.0,
            constants.early_stopping_patience: 10,
            constants.early_stopping_window: 10 * max_epoch,
        },
        constants.scheduler: {
            constants.scheduler_type: constants.exponential,
            constants.gamma: gamma,
        },
        constants.constraints: {
            constants.rho_flux_integral: 1.0,
            constants.rho_local_flux: 1.0,
            constants.rho_intercept: 1.0,
            constants.max_flux_density: 1e9,
        },
    }


def test_aim_point_reaches_known_offset_optimum():
    """The optimizer recovers motor positions whose flux was the ground truth.

    The GT bitmap is rendered at aim point = target center + (1.2 m E,
    0.8 m U) using the very distortions the optimizer will draw (same seed
    split), so the KL loss has a zero-ish optimum at a known motor-position
    pair; the test asserts the optimizer actually reaches it.
    """
    resolution = (64, 64)
    dni = 800.0
    seed = 7
    scenario = make_synthetic_scenario(
        1, (7, 7), (8, 8), 32, actuator_type=constants.ideal_actuator_key
    )
    group = scenario.heliostat_groups[0]
    tower = scenario.solar_tower
    sun = scenario.light_sources[0]
    num_points = group.surface_points.shape[1]

    # The exact distortions AimPointOptimizer.optimize draws for group 0.
    group_key = jax.random.split(jax.random.PRNGKey(seed), 1)[0]
    distortions_u, distortions_e = sun.get_distortions(group_key, num_points, 1)
    ray_magnitude = compute_ray_magnitude(
        dni, group.canting, num_points, sun.number_of_rays
    )
    incident = jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32)
    zero = jnp.zeros(1, jnp.int32)
    active = hg.gather_active(group, zero)
    config = RenderConfig(bitmap_resolution=resolution, blocking_active=True)

    def render(points, normals):
        flux, _, _, _ = trace_rays(
            tower=tower,
            aligned_surface_points=points,
            aligned_surface_normals=normals,
            incident_ray_directions=incident,
            target_area_indices=zero,
            distortions_u=distortions_u,
            distortions_e=distortions_e,
            ray_magnitude=ray_magnitude,
            blocking_primitives=create_blocking_primitives_rectangles_by_index(
                points
            ),
            ray_primitive_indices=zero,
            config=config,
        )
        return flux[0]

    aim_star = get_centers_of_target_areas(tower, zero) + jnp.asarray(
        [[1.2, 0.0, 0.8, 0.0]], jnp.float32
    )
    points, normals, _, motor_star = (
        hg.align_surfaces_with_incident_ray_directions(active, aim_star, incident)
    )
    ground_truth = render(points, normals)
    gt_com = np.asarray(get_center_of_mass(ground_truth[None])[0])

    optimizer = AimPointOptimizer(
        scenario=scenario,
        # lr 1e-3 with gamma-0.97 decay over 300 epochs settles the motors to
        # ~2e-5 of the optimum; 2e-3 overshoots off-target and loses the KL
        # gradient signal entirely.
        optimization_configuration=_configuration(1e-3, 300, gamma=0.97),
        incident_ray_direction=[0.0, 1.0, 0.0, 0.0],
        target_area_index=0,
        ground_truth=ground_truth,
        dni=dni,
        bitmap_resolution=resolution,
        seed=seed,
    )
    _, history, *_ = optimizer.optimize("kl_divergence")
    losses = np.asarray(history["total_loss"])

    # Descent to (near) the attainable optimum, not mere activity.
    assert losses.min() < 0.01 * losses[0], (losses[0], losses.min())

    # The optimized motors reproduce the known-aim alignment ...
    motors = np.asarray(scenario.heliostat_groups[0].motor_positions)
    np.testing.assert_allclose(motors, np.asarray(motor_star), atol=1e-3)

    # ... and the resulting flux lands on the ground-truth focal spot.
    points2, normals2, _ = hg.align_surfaces_with_motor_positions(
        active, jnp.asarray(motors)
    )
    final_com = np.asarray(get_center_of_mass(render(points2, normals2)[None])[0])
    assert np.abs(final_com - gt_com).max() < 0.5, (final_com, gt_com)


@pytest.mark.slow
def test_aim_point_convergence_matches_oracle():
    """Short-horizon two-framework run: matched landscape, comparable descent.

    Ray draws differ (threefry vs torch RNG), so epoch-by-epoch lockstep is
    impossible; the invariants asserted are the reference-golden-style ones:
    the initial losses agree (same physics, same ground truth), both descend,
    and motor movement magnitudes are commensurate.
    """
    if not SCENARIO.exists():
        pytest.skip("reference scenario data not available")
    resolution = (64, 64)
    epochs = 8
    learning_rate = 1e-3
    horizontal = np.asarray(trapezoid_distribution(resolution[0], 10, 20))
    vertical = np.asarray(trapezoid_distribution(resolution[1], 10, 20))
    ground_truth = np.outer(vertical, horizontal).astype(np.float32)

    # ---- TPU framework ----
    scenario = load_scenario_from_hdf5(
        SCENARIO, number_of_surface_points_per_facet=(8, 8)
    )
    initial_motors = [
        np.asarray(g.motor_positions).copy() for g in scenario.heliostat_groups
    ]
    optimizer = AimPointOptimizer(
        scenario=scenario,
        optimization_configuration=_configuration(learning_rate, epochs),
        incident_ray_direction=[0.0, 1.0, 0.0, 0.0],
        target_area_index=0,
        ground_truth=ground_truth,
        dni=800,
        bitmap_resolution=resolution,
    )
    _, history, *_ = optimizer.optimize("kl_divergence")
    tpu_losses = np.asarray(history["total_loss"])
    tpu_movement = max(
        float(np.abs(np.asarray(g.motor_positions) - m0).max())
        for g, m0 in zip(scenario.heliostat_groups, initial_motors)
    )

    # ---- torch oracle ----
    sys.path[:0] = [
        str(pathlib.Path(__file__).resolve().parents[1] / "_shims"),
        str(REFERENCE_ROOT),
    ]
    import h5py
    import torch

    import artist.io  # noqa: F401 - breaks the reference's import cycle
    from artist.optim import AimPointOptimizer as OracleOptimizer
    from artist.optim.loss import KLDivergenceLoss
    from artist.scenario import Scenario as OracleScenario
    from artist.util import constants as oracle_constants

    torch.manual_seed(7)
    device = torch.device("cpu")
    with h5py.File(SCENARIO, "r") as f:
        oracle_scenario = OracleScenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([8, 8]),
            device=device,
        )
    oracle_initial = [
        g.kinematics.motor_positions.detach().clone()
        for g in oracle_scenario.heliostat_field.heliostat_groups
    ]
    ddp_setup = {
        "device": device,
        "is_distributed": False,
        "is_nested": False,
        "rank": 0,
        "world_size": 1,
        "process_subgroup": None,
        "groups_to_ranks_mapping": {0: [0, 1]},
        "heliostat_group_rank": 0,
        "heliostat_group_world_size": 1,
        "ranks_to_groups_mapping": {0: [0], 1: [0]},
    }
    oracle_configuration = _configuration(learning_rate, epochs)
    oracle_configuration[oracle_constants.constraints][
        oracle_constants.max_flux_density
    ] = 1e9
    oracle = OracleOptimizer(
        ddp_setup=ddp_setup,
        scenario=oracle_scenario,
        optimization_configuration=oracle_configuration,
        incident_ray_direction=torch.tensor([0.0, 1.0, 0.0, 0.0]),
        target_area_index=0,
        ground_truth=torch.from_numpy(ground_truth),
        dni=800,
        bitmap_resolution=torch.tensor(list(resolution)),
        device=device,
    )
    _, oracle_history, *_ = oracle.optimize(
        loss_definition=KLDivergenceLoss(), device=device
    )
    oracle_losses = np.asarray(
        [float(value) for value in oracle_history["total_loss"]]
    )
    oracle_movement = max(
        float((g.kinematics.motor_positions - m0).abs().max())
        for g, m0 in zip(oracle_scenario.heliostat_field.heliostat_groups, oracle_initial)
    )

    # Same physics + same ground truth => same loss landscape at epoch 0
    # (up to ray-sampling noise).
    assert abs(tpu_losses[0] - oracle_losses[0]) < 0.15 * oracle_losses[0], (
        tpu_losses[0],
        oracle_losses[0],
    )
    # Both trajectories live in the same loss band epoch by epoch (at this
    # lr both frameworks oscillate around the landscape's floor - descent-
    # to-optimum is proven by the analytic test above; lockstep is
    # impossible across RNGs).
    ratio = tpu_losses / oracle_losses
    assert (0.6 < ratio).all() and (ratio < 1.7).all(), ratio
    # Commensurate motor movement under identical lr/schedule.
    assert 0.2 < tpu_movement / oracle_movement < 5.0, (
        tpu_movement,
        oracle_movement,
    )
