"""Parity tests: actuators + rigid-body kinematics + alignment vs oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from artist_tpu.field import actuators, heliostat_group
from artist_tpu.field import kinematics_rigid_body as rigid_body
from artist_tpu.scenario import load_scenario_from_hdf5

SCENARIO = "test_scenario_paint_single_heliostat.h5"


@pytest.fixture(scope="module")
def oracle_scenario(reference_artist, reference_scenario_dir):
    import h5py
    import torch
    from artist.scenario import Scenario

    with h5py.File(reference_scenario_dir / SCENARIO) as f:
        scenario = Scenario.load_scenario_from_hdf5(
            scenario_file=f,
            number_of_surface_points_per_facet=torch.tensor([8, 8]),
            device=torch.device("cpu"),
        )
    return scenario


@pytest.fixture(scope="module")
def tpu_scenario(reference_scenario_dir):
    return load_scenario_from_hdf5(
        reference_scenario_dir / SCENARIO, number_of_surface_points_per_facet=(8, 8)
    )


class TestSurfaceLoading:
    def test_surface_points_match(self, oracle_scenario, tpu_scenario):
        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        ours = tpu_scenario.heliostat_groups[0]
        np.testing.assert_allclose(
            np.asarray(ours.surface_points),
            theirs.surface_points.numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.surface_normals),
            theirs.surface_normals.numpy(),
            atol=1e-4,
        )

    def test_packed_parameters_match(self, oracle_scenario, tpu_scenario):
        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        ours = tpu_scenario.heliostat_groups[0]
        np.testing.assert_allclose(
            np.asarray(ours.actuator_non_optimizable),
            theirs.kinematics.actuators.non_optimizable_parameters.numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ours.actuator_optimizable),
            theirs.kinematics.actuators.optimizable_parameters.detach().numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ours.translation_deviations),
            theirs.kinematics.translation_deviation_parameters.numpy(),
            atol=1e-6,
        )


class TestActuators:
    def test_motor_to_angles_roundtrip_matches(self, oracle_scenario, tpu_scenario):
        import torch

        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        theirs.activate_heliostats(
            active_heliostats_mask=torch.tensor([1], dtype=torch.int32),
            device=torch.device("cpu"),
        )
        ours = tpu_scenario.heliostat_groups[0]

        motor = np.array([[11000.0, 42000.0]], dtype=np.float32)
        angles_theirs = theirs.kinematics.actuators.motor_positions_to_angles(
            motor_positions=torch.from_numpy(motor), device=torch.device("cpu")
        )
        angles_ours = actuators.motor_positions_to_angles(
            ours.actuator_type,
            ours.actuator_non_optimizable,
            ours.actuator_optimizable,
            jnp.asarray(motor),
        )
        np.testing.assert_allclose(
            np.asarray(angles_ours), angles_theirs.detach().numpy(), atol=1e-5
        )

        back_theirs = theirs.kinematics.actuators.angles_to_motor_positions(
            angles=angles_theirs, device=torch.device("cpu")
        )
        back_ours = actuators.angles_to_motor_positions(
            ours.actuator_type,
            ours.actuator_non_optimizable,
            ours.actuator_optimizable,
            angles_ours,
        )
        np.testing.assert_allclose(
            np.asarray(back_ours), back_theirs.detach().numpy(), rtol=1e-4
        )


class TestKinematics:
    def test_orientations_from_motor_positions(self, oracle_scenario, tpu_scenario):
        import torch

        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        theirs.activate_heliostats(
            active_heliostats_mask=torch.tensor([1], dtype=torch.int32),
            device=torch.device("cpu"),
        )
        ours = tpu_scenario.heliostat_groups[0]
        motor = np.array([[20000.0, 60000.0]], dtype=np.float32)

        orient_theirs = theirs.kinematics.motor_positions_to_orientations(
            motor_positions=torch.from_numpy(motor), device=torch.device("cpu")
        )
        orient_ours = rigid_body.motor_positions_to_orientations(
            jnp.asarray(motor),
            ours.positions,
            ours.translation_deviations,
            ours.rotation_deviations,
            ours.actuator_type,
            ours.actuator_non_optimizable,
            ours.actuator_optimizable,
        )
        np.testing.assert_allclose(
            np.asarray(orient_ours), orient_theirs.detach().numpy(), atol=1e-5
        )

    @pytest.mark.parametrize(
        "incident",
        [
            [0.0, 1.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 0.0],
            [0.577350269, 0.577350269, -0.577350269, 0.0],
        ],
    )
    def test_alignment_orientations_match(self, oracle_scenario, tpu_scenario, incident):
        import torch

        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        theirs.activate_heliostats(
            active_heliostats_mask=torch.tensor([1], dtype=torch.int32),
            device=torch.device("cpu"),
        )
        aim = oracle_scenario.solar_tower.get_centers_of_target_areas(
            target_area_indices=torch.tensor([0]), device=torch.device("cpu")
        )
        incident_t = torch.tensor([incident])
        orientations_theirs = theirs.kinematics.incident_ray_directions_to_orientations(
            incident_ray_directions=incident_t,
            aim_points=aim,
            device=torch.device("cpu"),
        )

        ours = tpu_scenario.heliostat_groups[0]
        orientations_ours, motor_ours = rigid_body.incident_ray_directions_to_orientations(
            jnp.asarray(np.array([incident], dtype=np.float32)),
            jnp.asarray(aim.numpy()),
            ours.positions,
            ours.translation_deviations,
            ours.rotation_deviations,
            ours.actuator_type,
            ours.actuator_non_optimizable,
            ours.actuator_optimizable,
        )
        np.testing.assert_allclose(
            np.asarray(orientations_ours),
            orientations_theirs.detach().numpy(),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(motor_ours),
            theirs.kinematics.active_motor_positions.detach().numpy(),
            rtol=1e-3,
            atol=0.5,  # motor steps are O(1e4); half a step is far below resolution
        )

    def test_aligned_surfaces_match(self, oracle_scenario, tpu_scenario):
        import torch

        theirs = oracle_scenario.heliostat_field.heliostat_groups[0]
        mask = torch.tensor([1], dtype=torch.int32)
        theirs.activate_heliostats(active_heliostats_mask=mask, device=torch.device("cpu"))
        aim = oracle_scenario.solar_tower.get_centers_of_target_areas(
            target_area_indices=torch.tensor([0]), device=torch.device("cpu")
        )
        incident = torch.tensor([[0.0, 1.0, 0.0, 0.0]])
        theirs.align_surfaces_with_incident_ray_directions(
            aim_points=aim,
            incident_ray_directions=incident,
            active_heliostats_mask=mask,
            device=torch.device("cpu"),
        )

        ours = tpu_scenario.heliostat_groups[0]
        active = heliostat_group.gather_active(
            ours, heliostat_group.active_indices_from_mask(np.array([1]))
        )
        points, normals, _, _ = heliostat_group.align_surfaces_with_incident_ray_directions(
            active,
            jnp.asarray(aim.numpy()),
            jnp.asarray(incident.numpy()),
        )
        np.testing.assert_allclose(
            np.asarray(points), theirs.active_surface_points.detach().numpy(), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(normals),
            theirs.active_surface_normals.detach().numpy(),
            atol=1e-4,
        )


class TestInvalidMotorPositionDiagnostics:
    """reference: artist/field/kinematics_rigid_body.py:493-500."""

    def test_validity_mask_and_warning(self, tpu_scenario, caplog):
        import logging

        import jax

        ours = tpu_scenario.heliostat_groups[0]
        # Narrow the motor limits so no solution can be valid.
        from artist_tpu.util import indices

        squeezed = np.asarray(ours.actuator_non_optimizable).copy()
        squeezed[:, indices.actuator_min_motor_position] = 0.0
        squeezed[:, indices.actuator_max_motor_position] = 1.0

        normals = jnp.asarray([[0.0, -0.2, 0.98, 0.0]], dtype=jnp.float32)
        motor, valid = rigid_body.motor_positions_from_normals(
            normals,
            ours.rotation_deviations,
            ours.actuator_type,
            jnp.asarray(squeezed),
            ours.actuator_optimizable,
            return_validity=True,
        )
        assert motor.shape == (1, 2)
        assert not bool(valid[0])

        # Wide limits -> valid.
        _, valid_wide = rigid_body.motor_positions_from_normals(
            normals,
            ours.rotation_deviations,
            ours.actuator_type,
            ours.actuator_non_optimizable,
            ours.actuator_optimizable,
            return_validity=True,
        )
        assert bool(valid_wide[0])

        # The alignment path surfaces the warning via host callback,
        # including under jit.
        with caplog.at_level(logging.WARNING, logger="artist_tpu.field"):
            orientations, _ = jax.jit(
                lambda: rigid_body.incident_ray_directions_to_orientations(
                    jnp.asarray([[0.0, 1.0, 0.0, 0.0]], dtype=jnp.float32),
                    jnp.asarray([[0.0, -50.0, 30.0, 1.0]], dtype=jnp.float32),
                    ours.positions,
                    ours.translation_deviations,
                    ours.rotation_deviations,
                    ours.actuator_type,
                    jnp.asarray(squeezed),
                    ours.actuator_optimizable,
                )
            )()
            jax.block_until_ready(orientations)
        assert any(
            "No valid motor position combination" in record.message
            for record in caplog.records
        )
