"""Orbax checkpoint round-trip of scenario optimizable state."""

import numpy as np

import jax.numpy as jnp

from artist_tpu.io.checkpoint import (
    CheckpointManager,
    apply_optimizable_state,
    scenario_optimizable_state,
)
from artist_tpu.scenario.synthetic import make_synthetic_scenario


def test_checkpoint_roundtrip(tmp_path):
    scenario = make_synthetic_scenario(
        number_of_heliostats=3,
        number_of_control_points_per_facet=(6, 6),
        number_of_surface_points_per_facet=(4, 4),
    )
    manager = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    state = scenario_optimizable_state(scenario)
    assert manager.latest_step is None
    assert manager.restore() is None
    manager.save(0, state)

    # Mutate, save again, then restore step 0 and verify the original values.
    mutated = scenario.heliostat_groups[0].replace(
        rotation_deviations=scenario.heliostat_groups[0].rotation_deviations + 1.0
    )
    scenario.heliostat_groups[0] = mutated
    manager.save(1, scenario_optimizable_state(scenario))
    manager.wait_until_finished()
    assert manager.latest_step == 1

    restored = manager.restore(0)
    scenario = apply_optimizable_state(scenario, restored)
    np.testing.assert_allclose(
        np.asarray(scenario.heliostat_groups[0].rotation_deviations),
        np.asarray(state["group_0"]["rotation_deviations"]),
    )
    restored_latest = manager.restore()
    np.testing.assert_allclose(
        np.asarray(restored_latest["group_0"]["rotation_deviations"]),
        np.asarray(mutated.rotation_deviations),
    )
    manager.close()
