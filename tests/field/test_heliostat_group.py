"""Heliostat-group activation unit tests.

reference: tests/field/test_heliostat_group.py (activation via
repeat_interleave; here the static-shape gather equivalent).
"""

import jax.numpy as jnp
import numpy as np

from artist_tpu.field import heliostat_group as hg
from artist_tpu.scenario.synthetic import make_synthetic_scenario


def test_active_indices_from_mask_multiplicity():
    """mask [2, 0, 1] -> samples [0, 0, 2] (the reference's
    repeat_interleave semantics, heliostat_group.py:225-316)."""
    np.testing.assert_array_equal(
        hg.active_indices_from_mask(np.array([2, 0, 1])), [0, 0, 2]
    )
    np.testing.assert_array_equal(
        hg.active_indices_from_mask(np.array([0, 0, 0])), np.empty(0, np.int32)
    )
    np.testing.assert_array_equal(
        hg.active_indices_from_mask(np.array([1, 1, 1])), [0, 1, 2]
    )


def test_gather_active_replicates_all_tensors():
    scenario = make_synthetic_scenario(
        number_of_heliostats=3,
        number_of_control_points_per_facet=(6, 6),
        number_of_surface_points_per_facet=(4, 4),
        number_of_rays=2,
    )
    group = scenario.heliostat_groups[0]
    indices = jnp.asarray([2, 0, 0], jnp.int32)
    active = hg.gather_active(group, indices)

    assert active.number_of_heliostats == 3
    np.testing.assert_array_equal(
        np.asarray(active.positions), np.asarray(group.positions)[[2, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(active.nurbs_control_points),
        np.asarray(group.nurbs_control_points)[[2, 0, 0]],
    )
    np.testing.assert_array_equal(
        np.asarray(active.motor_positions),
        np.asarray(group.motor_positions)[[2, 0, 0]],
    )
    # Static metadata carries through unchanged.
    assert active.names == group.names
    assert active.actuator_type == group.actuator_type
    assert active.nurbs_degrees == group.nurbs_degrees


def test_gather_active_empty_optimizable_parameters_pass_through():
    scenario = make_synthetic_scenario(
        number_of_heliostats=2,
        number_of_control_points_per_facet=(6, 6),
        number_of_surface_points_per_facet=(4, 4),
        number_of_rays=2,
        actuator_type="ideal",
    )
    group = scenario.heliostat_groups[0]
    assert group.actuator_optimizable.size == 0
    active = hg.gather_active(group, jnp.asarray([1, 1, 0], jnp.int32))
    assert active.actuator_optimizable.size == 0
    assert active.positions.shape[0] == 3


def test_alignment_gradients_accumulate_over_repeated_samples():
    """Two samples of the same heliostat sum their gradients into its
    parameters - the property the gather-based activation must preserve
    (reference nested-DDP gradient semantics)."""
    import jax

    scenario = make_synthetic_scenario(
        number_of_heliostats=2,
        number_of_control_points_per_facet=(6, 6),
        number_of_surface_points_per_facet=(4, 4),
        number_of_rays=2,
    )
    group = scenario.heliostat_groups[0]

    def single(params, index):
        active = hg.gather_active(
            group.replace(rotation_deviations=params),
            jnp.asarray([index], jnp.int32),
        )
        points, _, _ = hg.align_surfaces_with_motor_positions(
            active, jnp.full((1, 2), 30000.0, jnp.float32)
        )
        return jnp.sum(points**2)

    def doubled(params):
        active = hg.gather_active(
            group.replace(rotation_deviations=params),
            jnp.asarray([0, 0], jnp.int32),
        )
        points, _, _ = hg.align_surfaces_with_motor_positions(
            active, jnp.full((2, 2), 30000.0, jnp.float32)
        )
        return jnp.sum(points**2)

    params = group.rotation_deviations
    gradient_single = jax.grad(lambda p: single(p, 0))(params)
    gradient_double = jax.grad(doubled)(params)
    np.testing.assert_allclose(
        np.asarray(gradient_double),
        2.0 * np.asarray(gradient_single),
        rtol=1e-5,
    )
