"""Workload 2: kinematics calibration (rotation-deviation reconstruction).

TPU-native re-design of the reference KinematicsReconstructor
(reference: artist/optim/kinematics_reconstructor.py:83-1063). Two methods:

- ``raytracing`` (flux-driven): align with measured motor positions, trace,
  compare flux per sample, **median** reduction per heliostat
  (reference: kinematics_reconstructor.py:535-622).
- ``alignment``: no ray tracing - predicted normals (orientation x z-hat)
  vs normals derived from measured focal spots
  (reference: kinematics_reconstructor.py:421-533); NaN gradients from
  severely misaligned samples are scrubbed to zero
  (reference: kinematics_reconstructor.py:822-826).

Both run as one jitted step per epoch with the rotation-deviation
parameters [H, 4] as the optimized pytree leaf; the nested-DDP gradient
all-reduce becomes an XLA ``psum`` when a mesh shards the sample axis.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field import kinematics_rigid_body as rigid_body
from artist_tpu.flux.bitmap import get_center_of_mass
from artist_tpu.geometry.coordinates import bitmap_coordinates_to_target_coordinates
from artist_tpu.geometry.transforms import _normalize
from artist_tpu.optim import checkpointing, losses, training
from artist_tpu.parallel import collectives
from artist_tpu.parallel.env import DistributedSetup
from artist_tpu.parallel.mesh import put_global
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.render import compute_ray_magnitude
from artist_tpu.scenario.scenario import Scenario
from artist_tpu.util import constants

log = logging.getLogger("artist_tpu.optim")

# numpy so the import never initializes the XLA backend (multi-process
# setups must call jax.distributed.initialize first).
_Z_HAT = np.array([0.0, 0.0, 1.0, 0.0], dtype=np.float32)


def compute_measured_normals(
    heliostat_positions: jnp.ndarray,
    focal_spots_measured: jnp.ndarray,
    incident_ray_directions: jnp.ndarray,
) -> jnp.ndarray:
    """Surface normals implied by measured focal spots.

    reference: artist/optim/kinematics_reconstructor.py:421-470.

    Parameters
    ----------
    heliostat_positions : jnp.ndarray
        Per-sample heliostat positions. Shape ``[S, 4]``.
    focal_spots_measured : jnp.ndarray
        Measured focal spots in local ENU. Shape ``[S, 4]``.
    incident_ray_directions : jnp.ndarray
        Shape ``[S, 4]``.

    Returns
    -------
    jnp.ndarray
        Measured unit normals. Shape ``[S, 4]`` with zero w component.
    """
    preferred = _normalize(
        focal_spots_measured[:, :3] - heliostat_positions[:, :3]
    )
    normals3 = _normalize(preferred - incident_ray_directions[:, :3])
    return jnp.concatenate(
        [normals3, jnp.zeros((normals3.shape[0], 1), normals3.dtype)], axis=1
    )


@dataclass
class GroupKinematicsResult:
    """Per-group outcome of a kinematics reconstruction run."""

    group_index: int
    loss_history: list[float]
    test_loss: dict[str, np.ndarray]
    final_loss_per_heliostat: np.ndarray
    active_heliostat_indices: np.ndarray


class KinematicsReconstructor:
    """Reconstruct kinematics rotation deviations of all heliostat groups.

    reference: artist/optim/kinematics_reconstructor.py:83-1063.
    """

    def __init__(
        self,
        scenario: Scenario,
        data: dict[str, Any],
        optimization_configuration: dict[str, Any],
        reconstruction_method: str = constants.kinematics_reconstruction_raytracing,
        dni: float | None = None,
        bitmap_resolution: tuple[int, int] = (256, 256),
        mesh: jax.sharding.Mesh | None = None,
        seed: int = 7,
        distributed_setup: DistributedSetup | None = None,
        checkpoint_dir=None,
        checkpoint_every: int = 25,
    ) -> None:
        if reconstruction_method not in (
            constants.kinematics_reconstruction_raytracing,
            constants.kinematics_reconstruction_alignment,
        ):
            raise ValueError(
                f"The kinematics reconstruction method '{reconstruction_method}' is "
                f"unknown. Please select another reconstruction method and try again!"
            )
        self.scenario = scenario
        self.data = data
        self.optimizer_dict = optimization_configuration[constants.optimization]
        self.scheduler_dict = optimization_configuration[constants.scheduler]
        self.reconstruction_method = reconstruction_method
        self.dni = dni
        self.bitmap_resolution = tuple(bitmap_resolution)
        self.distributed_setup = distributed_setup
        if mesh is None and distributed_setup is not None:
            mesh = distributed_setup.mesh
        self.mesh = mesh
        self.seed = seed
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = int(checkpoint_every)

    # ------------------------------------------------------------------ #

    def _trace_flux(
        self,
        group: hg.HeliostatGroupState,
        rotation_deviations: jnp.ndarray,
        batch: dict,
    ) -> jnp.ndarray:
        """Align with measured motor positions and trace flux bitmaps."""
        active = hg.gather_active(
            group.replace(rotation_deviations=rotation_deviations),
            batch["active_indices"],
        )
        points, normals, _ = hg.align_surfaces_with_motor_positions(
            active, batch["motor_positions"]
        )
        flux, _, _, _ = trace_rays(
            tower=self.scenario.solar_tower,
            aligned_surface_points=points,
            aligned_surface_normals=normals,
            incident_ray_directions=batch["incident_ray_directions"],
            target_area_indices=batch["target_area_indices"],
            distortions_u=batch["distortions_u"],
            distortions_e=batch["distortions_e"],
            ray_magnitude=batch["ray_magnitude"],
            config=RenderConfig(
                bitmap_resolution=self.bitmap_resolution, blocking_active=False
            ),
        )
        return flux

    def _flux_loss_per_sample(
        self, loss_name: str, flux: jnp.ndarray, batch: dict
    ) -> jnp.ndarray:
        if loss_name == "kl_divergence":
            return losses.kl_divergence_loss(flux, batch["flux_measured"])
        if loss_name == "pixel":
            return losses.pixel_loss(flux, batch["flux_measured"])
        if loss_name == "focal_spot":
            predicted_com = get_center_of_mass(flux)
            measured_com = get_center_of_mass(batch["flux_measured"])
            tower = self.scenario.solar_tower
            resolution = (flux.shape[2], flux.shape[1])
            predicted = bitmap_coordinates_to_target_coordinates(
                predicted_com, resolution, tower, batch["target_area_indices"]
            )
            measured = bitmap_coordinates_to_target_coordinates(
                measured_com, resolution, tower, batch["target_area_indices"]
            )
            return jnp.linalg.norm(predicted[:, :3] - measured[:, :3], axis=1)
        raise ValueError(f"Unknown loss for kinematics reconstruction: {loss_name}")

    def _build_step_functions(
        self,
        group: hg.HeliostatGroupState,
        loss_name: str,
        optimizer: optax.GradientTransformation,
    ):
        if self.reconstruction_method == constants.kinematics_reconstruction_raytracing:

            def loss_fn(rotation_deviations, group, batch):
                flux = self._trace_flux(group, rotation_deviations, batch)
                per_sample = self._flux_loss_per_sample(loss_name, flux, batch)
                per_heliostat = losses.reduce_loss_per_heliostat(
                    per_sample,
                    batch["padded_sample_indices"],
                    batch["sample_valid"],
                    "median",
                )
                return jnp.mean(per_heliostat), per_heliostat

        else:

            def loss_fn(rotation_deviations, group, batch):
                active = hg.gather_active(
                    group.replace(rotation_deviations=rotation_deviations),
                    batch["active_indices"],
                )
                orientations = rigid_body.motor_positions_to_orientations(
                    motor_positions=batch["motor_positions"],
                    heliostat_positions=active.positions,
                    translation_deviations=active.translation_deviations,
                    rotation_deviations=active.rotation_deviations,
                    actuator_type=active.actuator_type,
                    actuator_non_optimizable=active.actuator_non_optimizable,
                    actuator_optimizable=active.actuator_optimizable,
                )
                normals_predicted = jnp.einsum(
                    "mij,j->mi",
                    orientations,
                    _Z_HAT,
                    precision=jax.lax.Precision.HIGHEST,
                )
                if loss_name == "angle":
                    per_sample = losses.angle_loss(
                        normals_predicted, batch["normals_measured"]
                    )
                elif loss_name == "cosine_similarity":
                    per_sample = losses.cosine_similarity_loss(
                        normals_predicted[:, :3], batch["normals_measured"][:, :3]
                    )
                else:
                    raise ValueError(
                        f"Unknown loss for alignment-driven reconstruction: {loss_name}"
                    )
                per_heliostat = losses.reduce_loss_per_heliostat(
                    per_sample,
                    batch["padded_sample_indices"],
                    batch["sample_valid"],
                    "mean",
                )
                return jnp.mean(per_heliostat), per_heliostat

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(rotation_deviations, opt_state, group, batch, learning_rate):
            (loss_value, per_heliostat), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(rotation_deviations, group, batch)
            # NaN-gradient scrubbing (reference: kinematics_reconstructor.py:822-826).
            grads = jnp.nan_to_num(grads, nan=0.0, posinf=0.0, neginf=0.0)
            updates, opt_state = optimizer.update(
                grads, opt_state, rotation_deviations, learning_rate=learning_rate
            )
            rotation_deviations = optax.apply_updates(rotation_deviations, updates)
            return rotation_deviations, opt_state, loss_value, per_heliostat

        @jax.jit
        def gradient_step(rotation_deviations, group, batch):
            """One objective evaluation: (loss, NaN-scrubbed grads, per-heliostat).

            The exact gradient the train step feeds Adam - exposed for
            diagnostics and the oracle gradient-parity gate."""
            (loss_value, per_heliostat), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(rotation_deviations, group, batch)
            grads = jnp.nan_to_num(grads, nan=0.0, posinf=0.0, neginf=0.0)
            return loss_value, grads, per_heliostat

        reduction = (
            "median"
            if self.reconstruction_method
            == constants.kinematics_reconstruction_raytracing
            else "mean"
        )

        @jax.jit
        def validate_step(rotation_deviations, group, batch):
            flux = self._trace_flux(group, rotation_deviations, batch)
            return {
                name: losses.reduce_loss_per_heliostat(
                    self._flux_loss_per_sample(loss, flux, batch),
                    batch["padded_sample_indices"],
                    batch["sample_valid"],
                    reduction,
                )
                for name, loss in (
                    ("pixel_loss", "pixel"),
                    ("kl_div", "kl_divergence"),
                    ("focal_spot_loss", "focal_spot"),
                )
            }

        return train_step, validate_step, gradient_step

    # ------------------------------------------------------------------ #

    def single_step_gradients(
        self, loss_definition: str | None = None
    ) -> dict[int, dict[str, np.ndarray]]:
        """One objective gradient per group, without updating anything.

        Evaluates the exact training objective at the current rotation
        deviations on the train split and returns ``{group_index: {"loss",
        "gradients"}}``. The flux-driven ("raytracing") method exercises
        the full align-with-motors -> trace -> per-heliostat-median chain.
        Diagnostic + oracle gradient-parity gate
        (tests/optim/test_full_objective_gradient_parity.py).
        """
        if loss_definition is None:
            loss_definition = (
                "focal_spot"
                if self.reconstruction_method
                == constants.kinematics_reconstruction_raytracing
                else "angle"
            )
        parser = self.data[constants.data_parser]
        mapping = self.data[constants.heliostat_data_mapping]
        outputs: dict[int, dict[str, np.ndarray]] = {}
        for group_index, group in enumerate(self.scenario.heliostat_groups):
            calibration = parser.parse_data_for_reconstruction(
                heliostat_data_mapping=mapping,
                heliostat_names=group.names,
                target_name_to_index=self.scenario.solar_tower.target_name_to_index,
                power_plant_position=self.scenario.power_plant_position,
                bitmap_resolution=self.bitmap_resolution,
            )
            if calibration.active_heliostats_mask.sum() == 0:
                continue
            split = training.train_test_split(
                active_heliostats_mask=calibration.active_heliostats_mask,
                flux_measured=calibration.flux_measured,
                focal_spots_measured=calibration.focal_spots,
                incident_ray_directions=calibration.incident_ray_directions,
                motor_positions=calibration.motor_positions,
                target_area_indices=calibration.target_area_indices,
            )
            unique = np.nonzero(calibration.active_heliostats_mask)[0]
            key_train, _ = jax.random.split(jax.random.PRNGKey(self.seed))
            train_batch = self._make_batch(
                group,
                split.active_heliostats_mask_train,
                split.incident_ray_directions_train,
                split.target_area_indices_train,
                split.flux_measured_train,
                split.motor_positions_train,
                split.focal_spots_measured_train,
                key_train,
                unique,
            )
            _, _, gradient_step = self._build_step_functions(
                group, loss_definition, optax.adam(learning_rate=1.0)
            )
            loss, gradients, _ = gradient_step(
                group.rotation_deviations, group, train_batch
            )
            outputs[group_index] = {
                "loss": np.asarray(loss),
                "gradients": np.asarray(gradients),
            }
        return outputs

    # ------------------------------------------------------------------ #

    def _shard_samples(self, *arrays):
        if self.mesh is None:
            return arrays
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("heliostats")
        )
        return tuple(put_global(a, sharding) for a in arrays)

    def _make_batch(
        self,
        group: hg.HeliostatGroupState,
        mask: np.ndarray,
        incident: np.ndarray,
        targets: np.ndarray,
        flux: np.ndarray,
        motor_positions: np.ndarray,
        focal_spots: np.ndarray,
        key: jax.Array,
        row_heliostats: np.ndarray,
    ) -> dict:
        sun = self.scenario.light_sources[0]
        active_indices = hg.active_indices_from_mask(mask)
        num_samples = active_indices.shape[0]
        num_points = group.surface_points.shape[1]
        distortions_u, distortions_e = sun.get_distortions(
            key, num_points, num_samples
        )
        if self.dni is not None:
            ray_magnitude = compute_ray_magnitude(
                self.dni, group.canting, num_points, sun.number_of_rays
            )
        else:
            ray_magnitude = 1.0
        positions = jnp.take(
            group.positions, jnp.asarray(active_indices), axis=0
        )
        normals_measured = compute_measured_normals(
            positions,
            jnp.asarray(focal_spots, dtype=jnp.float32),
            jnp.asarray(incident, dtype=jnp.float32),
        )
        (
            incident_d,
            targets_d,
            flux_d,
            motors_d,
            active_d,
            normals_d,
        ) = self._shard_samples(
            jnp.asarray(incident, dtype=jnp.float32),
            jnp.asarray(targets, dtype=jnp.int32),
            jnp.asarray(flux, dtype=jnp.float32),
            jnp.asarray(motor_positions, dtype=jnp.float32),
            jnp.asarray(active_indices),
            normals_measured,
        )
        if self.mesh is not None:
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("heliostats", "rays")
            )
            distortions_u = put_global(distortions_u, sharding)
            distortions_e = put_global(distortions_e, sharding)
        padded, valid = losses.build_sample_index_matrix(
            np.asarray(mask)[row_heliostats]
        )
        return {
            "padded_sample_indices": jnp.asarray(padded),
            "sample_valid": jnp.asarray(valid),
            "active_indices": active_d,
            "incident_ray_directions": incident_d,
            "target_area_indices": targets_d,
            "flux_measured": flux_d,
            "motor_positions": motors_d,
            "normals_measured": normals_d,
            "distortions_u": distortions_u,
            "distortions_e": distortions_e,
            "ray_magnitude": ray_magnitude,
        }

    def reconstruct_kinematics(
        self, loss_definition: str | None = None
    ) -> tuple[np.ndarray, list[GroupKinematicsResult]]:
        """Run the reconstruction for every heliostat group.

        reference: artist/optim/kinematics_reconstructor.py:135-182.

        Parameters
        ----------
        loss_definition : str | None
            Loss name. Defaults to ``"focal_spot"`` for the raytracing method
            and ``"angle"`` for the alignment method.
        """
        if loss_definition is None:
            loss_definition = (
                "focal_spot"
                if self.reconstruction_method
                == constants.kinematics_reconstruction_raytracing
                else "angle"
            )
        log.info(
            "Beginning kinematics reconstruction with %s.", self.reconstruction_method
        )
        parser = self.data[constants.data_parser]
        mapping = self.data[constants.heliostat_data_mapping]

        total_heliostats = sum(
            g.number_of_heliostats for g in self.scenario.heliostat_groups
        )
        final_loss = np.full(total_heliostats, np.inf, dtype=np.float32)
        results: list[GroupKinematicsResult] = []
        offset = 0

        # Non-nested multi-process mode: each rank reconstructs only its
        # round-robin share of the groups (reference:
        # kinematics_reconstructor.py distribution mirrors the surface
        # reconstructor's, surface_reconstructor.py:883-893).
        setup = self.distributed_setup
        local_groups: set[int] | None = None
        if setup is not None and setup.is_distributed and not setup.is_nested:
            local_groups = set(setup.groups_to_ranks_mapping.get(setup.rank, []))
        reconstructed_deviations: dict[int, np.ndarray] = {}

        max_epoch = int(self.optimizer_dict[constants.max_epoch])
        tolerance = float(self.optimizer_dict[constants.tolerance])
        log_step = int(self.optimizer_dict.get(constants.log_step, 0)) or max_epoch
        initial_lr = float(
            self.optimizer_dict[constants.initial_learning_rate_rotation_deviation]
        )

        for group_index, group in enumerate(self.scenario.heliostat_groups):
            if local_groups is not None and group_index not in local_groups:
                offset += group.number_of_heliostats
                continue
            calibration = parser.parse_data_for_reconstruction(
                heliostat_data_mapping=mapping,
                heliostat_names=group.names,
                target_name_to_index=self.scenario.solar_tower.target_name_to_index,
                power_plant_position=self.scenario.power_plant_position,
                bitmap_resolution=self.bitmap_resolution,
            )
            if calibration.active_heliostats_mask.sum() == 0:
                offset += group.number_of_heliostats
                continue

            split = training.train_test_split(
                active_heliostats_mask=calibration.active_heliostats_mask,
                flux_measured=calibration.flux_measured,
                focal_spots_measured=calibration.focal_spots,
                incident_ray_directions=calibration.incident_ray_directions,
                motor_positions=calibration.motor_positions,
                target_area_indices=calibration.target_area_indices,
            )

            unique = np.nonzero(calibration.active_heliostats_mask)[0]
            key_train, key_test = jax.random.split(jax.random.PRNGKey(self.seed))
            train_batch = self._make_batch(
                group,
                split.active_heliostats_mask_train,
                split.incident_ray_directions_train,
                split.target_area_indices_train,
                split.flux_measured_train,
                split.motor_positions_train,
                split.focal_spots_measured_train,
                key_train,
                unique,
            )
            test_batch = self._make_batch(
                group,
                split.active_heliostats_mask_test,
                split.incident_ray_directions_test,
                split.target_area_indices_test,
                split.flux_measured_test,
                split.motor_positions_test,
                split.focal_spots_measured_test,
                key_test,
                unique,
            )

            base_optimizer = optax.adam(learning_rate=1.0)

            def scaled_update(grads, state, params=None, *, learning_rate):
                updates, state = base_optimizer.update(grads, state, params)
                updates = jax.tree.map(lambda u: u * learning_rate, updates)
                return updates, state

            wrapped = optax.GradientTransformationExtraArgs(
                init=base_optimizer.init, update=scaled_update
            )
            train_step, validate_step, _ = self._build_step_functions(
                group, loss_definition, wrapped
            )

            rotation_deviations = group.rotation_deviations
            opt_state = wrapped.init(rotation_deviations)
            scheduler = training.make_scheduler(initial_lr, self.scheduler_dict)
            early_stopper = training.EarlyStopping(
                window_size=int(self.optimizer_dict[constants.early_stopping_window]),
                patience=int(self.optimizer_dict[constants.early_stopping_patience]),
                min_improvement=float(
                    self.optimizer_dict[constants.early_stopping_delta]
                ),
                relative=True,
            )

            history: list[float] = []
            test_loss: dict[str, np.ndarray] = {}
            loss_value = np.inf
            per_heliostat = None
            epoch = 0

            ckpt = None
            if self.checkpoint_dir is not None:
                ckpt = checkpointing.LoopCheckpointer(
                    self.checkpoint_dir,
                    f"kinematics_group_{group_index}",
                    every=self.checkpoint_every,
                    # Rank-disjoint groups must save locally (see the
                    # surface reconstructor's per_process note).
                    per_process=local_groups is not None,
                )
                restored = ckpt.restore_latest()
                if restored is not None:
                    epoch = int(restored["epoch"]) + 1
                    rotation_deviations = jnp.asarray(
                        restored["rotation_deviations"]
                    )
                    opt_state = checkpointing.unpack_pytree(
                        opt_state, restored["opt_state"]
                    )
                    loss_value = float(restored["last_loss"])
                    checkpointing.restore_scheduler(scheduler, restored["scheduler"])
                    checkpointing.restore_early_stopping(
                        early_stopper, restored["early_stopping"]
                    )
                    checkpointing.restore_history(history, restored["history"])
                    log.info(
                        "Resuming kinematics reconstruction of group %d at epoch %d.",
                        group_index,
                        epoch,
                    )

            while loss_value > tolerance and epoch <= max_epoch:
                if isinstance(scheduler, training.ReduceOnPlateau):
                    learning_rate = scheduler.learning_rate
                else:
                    learning_rate = float(scheduler(epoch))
                rotation_deviations, opt_state, loss_j, per_heliostat = train_step(
                    rotation_deviations,
                    opt_state,
                    group,
                    train_batch,
                    jnp.float32(learning_rate),
                )
                loss_value = float(loss_j)
                if isinstance(scheduler, training.ReduceOnPlateau):
                    scheduler.step(loss_value)
                stop = early_stopper.step(loss_value)
                is_last = epoch == max_epoch - 1
                if epoch % log_step == 0 or is_last or stop:
                    log.info("Epoch: %d, Loss: %.6f", epoch, loss_value)
                    test_loss = {
                        k: np.asarray(v)
                        for k, v in validate_step(
                            rotation_deviations, group, test_batch
                        ).items()
                    }
                if stop:
                    log.info("Early stopping at epoch %d.", epoch)
                    break
                history.append(loss_value)
                if ckpt is not None and ckpt.should_save(epoch):
                    ckpt.save(
                        epoch,
                        {
                            "rotation_deviations": np.asarray(rotation_deviations),
                            "opt_state": checkpointing.pack_pytree(opt_state),
                            "last_loss": np.float64(loss_value),
                            "scheduler": checkpointing.scheduler_state(scheduler),
                            "early_stopping": checkpointing.early_stopping_state(
                                early_stopper
                            ),
                            "history": checkpointing.pack_history(history),
                        },
                    )
                epoch += 1

            if ckpt is not None:
                ckpt.finish()
            self.scenario.heliostat_groups[group_index] = group.replace(
                rotation_deviations=rotation_deviations
            )
            reconstructed_deviations[group_index] = np.asarray(rotation_deviations)
            per_heliostat_np = (
                np.asarray(per_heliostat)
                if per_heliostat is not None
                else np.full(unique.shape[0], np.inf, np.float32)
            )
            final_loss[offset + unique] = per_heliostat_np
            results.append(
                GroupKinematicsResult(
                    group_index=group_index,
                    loss_history=history,
                    test_loss=test_loss,
                    final_loss_per_heliostat=per_heliostat_np,
                    active_heliostat_indices=unique,
                )
            )
            offset += group.number_of_heliostats
            log.info("Kinematics reconstructed for group %d.", group_index)

        final_loss, results, merged_deviations = (
            collectives.synchronize_group_results(
                setup, final_loss, results, reconstructed_deviations,
                "kinematics_reconstruction",
            )
        )
        for group_index, deviations in merged_deviations.items():
            if group_index in reconstructed_deviations:
                continue  # locally reconstructed; scenario already updated
            self.scenario.heliostat_groups[group_index] = (
                self.scenario.heliostat_groups[group_index].replace(
                    rotation_deviations=jnp.asarray(deviations)
                )
            )

        return final_loss, results
