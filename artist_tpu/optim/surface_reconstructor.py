"""Workload 1: NURBS surface reconstruction from measured flux images.

TPU-native re-design of the reference SurfaceReconstructor
(reference: artist/optim/surface_reconstructor.py:842-1224):

- One **jitted training step** per heliostat group (NURBS evaluation ->
  alignment -> ray trace -> crop -> loss + Augmented-Lagrangian energy
  constraint + balanced regularizers -> grad -> edge-lock -> Adam update),
  instead of the reference's eager epoch body. Distortions are sampled once
  (the reference recreates its ray tracer with a fixed seed every epoch, so
  its distortions are identical across epochs too).
- The gather-based activation (sample -> heliostat index map) replaces
  ``repeat_interleave``; gradients of repeated samples sum into the
  per-heliostat control points automatically under autodiff.
- Multi-chip: pass a ``jax.sharding.Mesh``; the train-sample axis of all
  per-sample arrays is sharded over the ``heliostats`` mesh axis and the ray
  axis over the ``rays`` axis, parameters are replicated, and XLA inserts the
  gradient ``psum`` (the reference's nested-DDP all-reduce,
  artist/optim/surface_reconstructor.py:766-777).
- Augmented-Lagrangian multiplier state and the optax optimizer state live in
  an explicit pytree threaded through the step (no module mutation).
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
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.flux.bitmap import crop_flux_distributions_around_center
from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
from artist_tpu.optim import checkpointing, losses, training
from artist_tpu.optim.regularizers import (
    ideal_surface_regularizer,
    smoothness_regularizer,
)
from artist_tpu.parallel import collectives
from artist_tpu.parallel.env import DistributedSetup
from artist_tpu.parallel.mesh import put_global
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.render import compute_ray_magnitude
from artist_tpu.scenario.scenario import Scenario, update_surfaces
from artist_tpu.util import constants

log = logging.getLogger("artist_tpu.optim")


def lock_control_points_on_outer_edges(gradients: jnp.ndarray) -> jnp.ndarray:
    """Zero u/v gradients of outer-edge control points (keeps facets rectangular).

    reference: artist/optim/surface_reconstructor.py:1162-1224.

    Parameters
    ----------
    gradients : jnp.ndarray
        Control-point gradients. Shape ``[H, F, Cu, Cv, 3]``.
    """
    num_cu, num_cv = gradients.shape[2], gradients.shape[3]
    rows = jnp.arange(num_cu)[:, None]
    cols = jnp.arange(num_cv)[None, :]
    edge = (rows == 0) | (rows == num_cu - 1) | (cols == 0) | (cols == num_cv - 1)
    keep_uv = jnp.where(edge[None, None, :, :, None], 0.0, 1.0)
    mask = jnp.concatenate(
        [jnp.broadcast_to(keep_uv, gradients[..., :2].shape), jnp.ones_like(gradients[..., 2:])],
        axis=-1,
    )
    return gradients * mask


@dataclass
class GroupReconstructionResult:
    """Per-group outcome of a reconstruction run."""

    group_index: int
    loss_history: dict[str, list[float]]
    test_loss: dict[str, np.ndarray]
    final_loss_per_heliostat: np.ndarray  # [active_heliostats]
    active_heliostat_indices: np.ndarray  # group-local indices


class SurfaceReconstructor:
    """Reconstruct NURBS surfaces of all heliostat groups from flux images.

    reference: artist/optim/surface_reconstructor.py:157-1224.

    Parameters
    ----------
    scenario : Scenario
        The runtime scene.
    data : dict
        ``{"data_parser": parser, "heliostat_data_mapping": [...]}``
        (reference: util/constants.py data_parser keys).
    optimization_configuration : dict
        ``{optimization: {...}, scheduler: {...}, constraints: {...}}``.
    dni : float | None
        Direct normal irradiance in W/m^2; None keeps unit ray magnitudes.
    number_of_surface_points : tuple[int, int]
        NURBS sampling resolution per facet.
    bitmap_resolution : tuple[int, int]
        Flux bitmap resolution (width_e, height_u).
    mesh : jax.sharding.Mesh | None
        Optional device mesh with axes ``("heliostats", "rays")``; shards the
        sample and ray axes of the render. Defaults to
        ``distributed_setup.mesh`` when a setup is given.
    checkpoint_dir : path | None
        When set, the per-group epoch loop periodically saves its full
        resume state (control points, optax state, AL multipliers and
        reference integrals, scheduler / early-stopping state, histories,
        epoch) under ``checkpoint_dir/surface_group_{i}`` and resumes from
        the latest checkpoint on restart. The reference has no training
        checkpoints (scenario HDF5 only); see
        :mod:`artist_tpu.optim.checkpointing`.
    checkpoint_every : int
        Save cadence in epochs (default 25).
    distributed_setup : DistributedSetup | None
        Multi-process setup from ``setup_distributed_environment``. When
        distributed and non-nested, each process reconstructs only its
        round-robin share of the heliostat groups and results are merged
        host-side afterwards (reference:
        artist/optim/surface_reconstructor.py:790-840). In nested mode every
        process runs every group over the global mesh (the sample/ray
        sharding's psum replaces the reference's nested-DDP all-reduce).
    """

    def __init__(
        self,
        scenario: Scenario,
        data: dict[str, Any],
        optimization_configuration: dict[str, Any],
        dni: float | None = None,
        number_of_surface_points: tuple[int, int] = (50, 50),
        bitmap_resolution: tuple[int, int] = (256, 256),
        epsilon: float = 1e-12,
        mesh: jax.sharding.Mesh | None = None,
        seed: int = 7,
        distributed_setup: DistributedSetup | None = None,
        checkpoint_dir=None,
        checkpoint_every: int = 25,
        ray_chunk: int | None = None,
    ) -> None:
        """``ray_chunk``: chunk the ray axis of the trace under a remat scan
        (RenderConfig.ray_chunk) - bounds the step's activation memory at
        production shapes (batch 48 x 180 rays x 10k points otherwise
        materializes tens of GB of per-ray intermediates in the backward;
        with chunking a single 16 GB chip runs the reference's production
        surface-reconstruction configuration)."""
        self.scenario = scenario
        self.ray_chunk = ray_chunk
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = int(checkpoint_every)
        self.data = data
        self.optimizer_dict = optimization_configuration[constants.optimization]
        self.scheduler_dict = optimization_configuration[constants.scheduler]
        self.constraint_dict = optimization_configuration[constants.constraints]
        self.dni = dni
        self.number_of_surface_points = tuple(number_of_surface_points)
        self.bitmap_resolution = tuple(bitmap_resolution)
        self.epsilon = epsilon
        self.distributed_setup = distributed_setup
        if mesh is None and distributed_setup is not None:
            mesh = distributed_setup.mesh
        self.mesh = mesh
        self.seed = seed

    # ------------------------------------------------------------------ #

    def _shard_samples(self, *arrays: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        """Shard the leading (sample) axis over the mesh's heliostats axis."""
        if self.mesh is None:
            return arrays
        spec = jax.sharding.PartitionSpec("heliostats")
        sharding = jax.sharding.NamedSharding(self.mesh, spec)
        return tuple(put_global(a, sharding) for a in arrays)

    def _shard_distortions(self, du: jnp.ndarray, de: jnp.ndarray):
        if self.mesh is None:
            return du, de
        spec = jax.sharding.PartitionSpec("heliostats", "rays")
        sharding = jax.sharding.NamedSharding(self.mesh, spec)
        return put_global(du, sharding), put_global(de, sharding)

    # ------------------------------------------------------------------ #

    def _build_step_functions(
        self,
        group: hg.HeliostatGroupState,
        loss_name: str,
        optimizer: optax.GradientTransformation,
    ):
        """Create the jitted train and validation step closures for one group."""
        scenario = self.scenario
        tower = scenario.solar_tower
        constraint = self.constraint_dict
        epsilon = self.epsilon
        evaluation_points = create_nurbs_evaluation_grid(self.number_of_surface_points)
        render_config = RenderConfig(
            bitmap_resolution=self.bitmap_resolution,
            blocking_active=False,
            ray_chunk=self.ray_chunk,
        )

        def flux_loss_fn(cropped: jnp.ndarray, measured: jnp.ndarray) -> jnp.ndarray:
            if loss_name == "kl_divergence":
                return losses.kl_divergence_loss(cropped, measured)
            if loss_name == "pixel":
                return losses.pixel_loss(cropped, measured)
            raise ValueError(f"Unknown loss for surface reconstruction: {loss_name}")

        def predict_cropped_flux(
            control_points: jnp.ndarray,
            active_indices: jnp.ndarray,
            aim_points: jnp.ndarray,
            incident_ray_directions: jnp.ndarray,
            target_area_indices: jnp.ndarray,
            distortions_u: jnp.ndarray,
            distortions_e: jnp.ndarray,
            ray_magnitude,
        ) -> jnp.ndarray:
            active = hg.gather_active(
                group.replace(nurbs_control_points=control_points), active_indices
            )
            points, normals = evaluate_nurbs_surfaces(
                active.nurbs_control_points,
                group.nurbs_degrees,
                evaluation_points,
                canting=active.canting,
                facet_translations=active.facet_translations,
            )
            num_samples = active_indices.shape[0]
            active = active.replace(
                surface_points=points.reshape(num_samples, -1, 4),
                surface_normals=normals.reshape(num_samples, -1, 4),
            )
            warn_sharding = (
                jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
                if self.mesh is not None
                else None
            )
            aligned_points, aligned_normals, _, _ = (
                hg.align_surfaces_with_incident_ray_directions(
                    active,
                    aim_points,
                    incident_ray_directions,
                    warn_sharding=warn_sharding,
                )
            )
            flux, _, _, _ = trace_rays(
                tower=tower,
                aligned_surface_points=aligned_points,
                aligned_surface_normals=aligned_normals,
                incident_ray_directions=incident_ray_directions,
                target_area_indices=target_area_indices,
                distortions_u=distortions_u,
                distortions_e=distortions_e,
                ray_magnitude=ray_magnitude,
                config=render_config,
            )
            return crop_flux_distributions_around_center(
                flux, tower, target_area_indices
            )

        rho = float(constraint[constants.rho_flux_integral])
        energy_tolerance = float(constraint[constants.energy_tolerance])
        weight_smoothness = float(constraint[constants.weight_smoothness])
        weight_ideal = float(constraint[constants.weight_ideal_surface])

        def loss_terms(
            control_points: jnp.ndarray,
            batch: dict,
            flux_integrals_reference: jnp.ndarray,
            lambda_flux_integral: jnp.ndarray,
            original_control_points: jnp.ndarray,
        ):
            cropped = predict_cropped_flux(
                control_points,
                batch["active_indices"],
                batch["aim_points"],
                batch["incident_ray_directions"],
                batch["target_area_indices"],
                batch["distortions_u"],
                batch["distortions_e"],
                batch["ray_magnitude"],
            )
            flux_loss_per_sample = flux_loss_fn(cropped, batch["flux_measured"])
            flux_loss_per_heliostat = losses.reduce_loss_per_heliostat(
                flux_loss_per_sample,
                batch["padded_sample_indices"],
                batch["sample_valid"],
                "mean",
            )

            # Augmented-Lagrangian flux-integral (energy conservation)
            # constraint (reference: surface_reconstructor.py:593-654).
            flux_integrals = jnp.sum(cropped, axis=(1, 2))
            relative_differences = (flux_integrals - flux_integrals_reference) / (
                flux_integrals_reference + epsilon
            )
            constraint_per_sample = jnp.clip(
                -energy_tolerance - relative_differences, 0.0, None
            )
            constraint_per_heliostat = losses.reduce_loss_per_heliostat(
                constraint_per_sample,
                batch["padded_sample_indices"],
                batch["sample_valid"],
                "mean",
            )
            flux_integral_constraint = (
                lambda_flux_integral * constraint_per_heliostat
                + 0.5 * rho * constraint_per_heliostat**2
            )

            # Dynamically balanced regularizers
            # (reference: surface_reconstructor.py:656-747).
            unique_cp = jnp.take(control_points, batch["unique_heliostats"], axis=0)
            smooth = smoothness_regularizer(unique_cp, original_control_points)
            ideal = ideal_surface_regularizer(unique_cp, original_control_points)
            # NOTE: alpha/beta stay in the autodiff graph - the reference
            # does not detach them (surface_reconstructor.py:734-747), so
            # d(alpha * smooth)/d cp largely cancels once the regularizer
            # value dwarfs epsilon; stopping their gradient changes the
            # optimization trajectory measurably (convergence-parity test).
            alpha = (
                weight_smoothness
                * jnp.mean(flux_loss_per_heliostat)
                / (jnp.mean(smooth) + epsilon)
            )
            beta = (
                weight_ideal
                * jnp.mean(flux_loss_per_heliostat)
                / (jnp.mean(ideal) + epsilon)
            )

            total_per_heliostat = (
                flux_loss_per_heliostat
                + flux_integral_constraint
                + alpha * smooth
                + beta * ideal
            )
            aux = {
                "total_loss_per_heliostat": total_per_heliostat,
                "flux_loss": jnp.mean(flux_loss_per_heliostat),
                "flux_integral": jnp.mean(relative_differences),
                "smoothness": jnp.mean(alpha * smooth),
                "ideal": jnp.mean(beta * ideal),
                "flux_integral_constraint": jnp.mean(flux_integral_constraint),
                "constraint_per_heliostat": constraint_per_heliostat,
                "flux_integrals": flux_integrals,
            }
            return jnp.mean(total_per_heliostat), aux

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(
            control_points: jnp.ndarray,
            opt_state,
            lambda_flux_integral: jnp.ndarray,
            flux_integrals_reference: jnp.ndarray,
            original_control_points: jnp.ndarray,
            batch: dict,
            learning_rate: jnp.ndarray,
        ):
            (total_loss, aux), grads = jax.value_and_grad(loss_terms, has_aux=True)(
                control_points,
                batch,
                flux_integrals_reference,
                lambda_flux_integral,
                original_control_points,
            )
            grads = lock_control_points_on_outer_edges(grads)
            updates, opt_state = optimizer.update(
                grads, opt_state, control_points, learning_rate=learning_rate
            )
            control_points = optax.apply_updates(control_points, updates)
            # AL multiplier update (reference: surface_reconstructor.py:1049-1056).
            lambda_flux_integral = jnp.clip(
                lambda_flux_integral + rho * aux["constraint_per_heliostat"], 0.0, None
            )
            return control_points, opt_state, lambda_flux_integral, total_loss, aux

        @jax.jit
        def validate_step(control_points: jnp.ndarray, batch: dict):
            cropped = predict_cropped_flux(
                control_points,
                batch["active_indices"],
                batch["aim_points"],
                batch["incident_ray_directions"],
                batch["target_area_indices"],
                batch["distortions_u"],
                batch["distortions_e"],
                batch["ray_magnitude"],
            )
            pixel = losses.reduce_loss_per_heliostat(
                losses.pixel_loss(cropped, batch["flux_measured"]),
                batch["padded_sample_indices"],
                batch["sample_valid"],
                "mean",
            )
            kl = losses.reduce_loss_per_heliostat(
                losses.kl_divergence_loss(cropped, batch["flux_measured"]),
                batch["padded_sample_indices"],
                batch["sample_valid"],
                "mean",
            )
            return {"test_loss_pixel": pixel, "test_loss_kl_divergence": kl}

        @jax.jit
        def reference_integrals(control_points: jnp.ndarray, batch: dict):
            cropped = predict_cropped_flux(
                control_points,
                batch["active_indices"],
                batch["aim_points"],
                batch["incident_ray_directions"],
                batch["target_area_indices"],
                batch["distortions_u"],
                batch["distortions_e"],
                batch["ray_magnitude"],
            )
            return jnp.sum(cropped, axis=(1, 2))

        @jax.jit
        def gradient_step(
            control_points: jnp.ndarray,
            lambda_flux_integral: jnp.ndarray,
            flux_integrals_reference: jnp.ndarray,
            original_control_points: jnp.ndarray,
            batch: dict,
        ):
            """One full-objective evaluation: (loss, edge-locked grads, aux).

            The exact gradient the train step feeds Adam (flux loss + AL
            energy constraint + balanced regularizers, edge lock applied) -
            exposed for diagnostics and the oracle gradient-parity gate."""
            (total_loss, aux), grads = jax.value_and_grad(loss_terms, has_aux=True)(
                control_points,
                batch,
                flux_integrals_reference,
                lambda_flux_integral,
                original_control_points,
            )
            return total_loss, lock_control_points_on_outer_edges(grads), aux

        return train_step, validate_step, reference_integrals, gradient_step

    # ------------------------------------------------------------------ #

    def _make_batch(
        self,
        group: hg.HeliostatGroupState,
        mask: np.ndarray,
        incident: np.ndarray,
        targets: np.ndarray,
        flux: np.ndarray,
        key: jax.Array,
        sun,
        row_heliostats: np.ndarray,
    ) -> dict:
        """Assemble the device-side per-sample arrays for one split.

        ``row_heliostats`` fixes the per-heliostat row basis (group-local
        indices of calibration-active heliostats) so the ragged loss
        reduction stays aligned with ``original_control_points`` and the
        AL multipliers even when a heliostat has zero samples in this split.
        """
        active_indices = hg.active_indices_from_mask(mask)
        num_samples = active_indices.shape[0]
        num_points = (
            self.number_of_surface_points[0]
            * self.number_of_surface_points[1]
            * group.number_of_facets_per_heliostat
        )
        distortions_u, distortions_e = sun.get_distortions(
            key, num_points, num_samples
        )
        if self.dni is not None:
            ray_magnitude = compute_ray_magnitude(
                self.dni, group.canting, num_points, sun.number_of_rays
            )
        else:
            ray_magnitude = 1.0
        target_indices = jnp.asarray(targets, dtype=jnp.int32)
        aim_points = get_centers_of_target_areas(
            self.scenario.solar_tower, target_indices
        )
        (
            incident_d,
            target_indices,
            aim_points,
            flux_d,
            active_indices_d,
        ) = self._shard_samples(
            jnp.asarray(incident, dtype=jnp.float32),
            target_indices,
            aim_points,
            jnp.asarray(flux, dtype=jnp.float32),
            jnp.asarray(active_indices),
        )
        distortions_u, distortions_e = self._shard_distortions(
            distortions_u, distortions_e
        )
        padded, valid = losses.build_sample_index_matrix(
            np.asarray(mask)[row_heliostats]
        )
        return {
            "active_indices": active_indices_d,
            "aim_points": aim_points,
            "incident_ray_directions": incident_d,
            "target_area_indices": target_indices,
            "distortions_u": distortions_u,
            "distortions_e": distortions_e,
            "flux_measured": flux_d,
            "ray_magnitude": ray_magnitude,
            "unique_heliostats": jnp.asarray(row_heliostats, dtype=jnp.int32),
            "padded_sample_indices": jnp.asarray(padded),
            "sample_valid": jnp.asarray(valid),
        }

    def single_step_gradients(
        self,
        loss_definition: str = "kl_divergence",
        lambda_flux_integral: dict[int, np.ndarray] | None = None,
        flux_integrals_reference: dict[int, np.ndarray] | None = None,
    ) -> dict[int, dict[str, np.ndarray]]:
        """One full-objective gradient per group, without updating anything.

        Evaluates the exact training objective (flux loss + Augmented-
        Lagrangian energy constraint + dynamically balanced regularizers,
        edge-lock applied to the gradient) at the current control points on
        the train split and returns ``{group_index: {"loss", "gradients",
        "flux_integrals", "lambda_flux_integral"}}``. Used as a diagnostic
        and as the single-step gradient-parity gate against the torch
        oracle (tests/optim/test_full_objective_gradient_parity.py).

        Parameters
        ----------
        lambda_flux_integral, flux_integrals_reference : dict | None
            Optional per-group overrides of the AL multiplier / reference
            integrals (defaults: zero multiplier, reference = integrals at
            the current control points, i.e. the epoch-0 state).
        """
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
                key_train,
                self.scenario.light_sources[0],
                unique,
            )
            optimizer = optax.adam(learning_rate=1.0)
            _, _, reference_integrals, gradient_step = self._build_step_functions(
                group, loss_definition, optimizer
            )
            control_points = group.nurbs_control_points
            original_control_points = jnp.take(
                control_points, jnp.asarray(unique, dtype=jnp.int32), axis=0
            )
            if flux_integrals_reference is not None and group_index in (
                flux_integrals_reference
            ):
                flux_ref = jnp.asarray(flux_integrals_reference[group_index])
            else:
                flux_ref = jax.lax.stop_gradient(
                    reference_integrals(control_points, train_batch)
                )
            if lambda_flux_integral is not None and group_index in (
                lambda_flux_integral
            ):
                lambda_flux = jnp.asarray(
                    lambda_flux_integral[group_index], jnp.float32
                )
            else:
                lambda_flux = jnp.zeros(unique.shape[0], dtype=jnp.float32)
            loss, gradients, aux = gradient_step(
                control_points,
                lambda_flux,
                flux_ref,
                original_control_points,
                train_batch,
            )
            outputs[group_index] = {
                "loss": np.asarray(loss),
                "gradients": np.asarray(gradients),
                "flux_integrals": np.asarray(aux["flux_integrals"]),
                "lambda_flux_integral": np.asarray(lambda_flux),
            }
        return outputs

    def reconstruct_surfaces(
        self, loss_definition: str = "kl_divergence"
    ) -> tuple[np.ndarray, list[GroupReconstructionResult]]:
        """Run the reconstruction for every heliostat group.

        reference: artist/optim/surface_reconstructor.py:842-1160.

        Returns
        -------
        tuple
            (final loss per heliostat over the whole field ``[H_total]``,
            per-group results). The scenario's heliostat groups are updated
            in place on the Python object (new pytrees with reconstructed
            control points and refreshed surfaces).
        """
        log.info("Beginning surface reconstruction.")
        parser = self.data[constants.data_parser]
        mapping = self.data[constants.heliostat_data_mapping]

        total_heliostats = sum(
            g.number_of_heliostats for g in self.scenario.heliostat_groups
        )
        final_loss = np.full(total_heliostats, np.inf, dtype=np.float32)
        results: list[GroupReconstructionResult] = []
        offset = 0

        # Non-nested multi-process mode: reconstruct only this rank's
        # round-robin share of the groups; merged host-side afterwards
        # (reference: surface_reconstructor.py:883-893).
        setup = self.distributed_setup
        local_groups: set[int] | None = None
        if setup is not None and setup.is_distributed and not setup.is_nested:
            local_groups = set(setup.groups_to_ranks_mapping.get(setup.rank, []))
        reconstructed_control_points: dict[int, np.ndarray] = {}

        max_epoch = int(self.optimizer_dict[constants.max_epoch])
        tolerance = float(self.optimizer_dict[constants.tolerance])
        log_step = int(self.optimizer_dict.get(constants.log_step, 0)) or max_epoch
        initial_lr = float(self.optimizer_dict[constants.initial_learning_rate])

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
            key = jax.random.PRNGKey(self.seed)
            key_train, key_test = jax.random.split(key)
            sun = self.scenario.light_sources[0]
            train_batch = self._make_batch(
                group,
                split.active_heliostats_mask_train,
                split.incident_ray_directions_train,
                split.target_area_indices_train,
                split.flux_measured_train,
                key_train,
                sun,
                unique,
            )
            test_batch = self._make_batch(
                group,
                split.active_heliostats_mask_test,
                split.incident_ray_directions_test,
                split.target_area_indices_test,
                split.flux_measured_test,
                key_test,
                sun,
                unique,
            )

            # Adam with a per-step learning rate passed explicitly (supports
            # the stateful ReduceOnPlateau controller as well as schedules).
            base_optimizer = optax.adam(learning_rate=1.0)

            def scaled_update(grads, state, params=None, *, learning_rate):
                updates, state = base_optimizer.update(grads, state, params)
                updates = jax.tree.map(lambda u: u * learning_rate, updates)
                return updates, state

            wrapped = optax.GradientTransformationExtraArgs(
                init=base_optimizer.init, update=scaled_update
            )
            train_step, validate_step, reference_integrals, _ = (
                self._build_step_functions(group, loss_definition, wrapped)
            )

            control_points = group.nurbs_control_points
            opt_state = wrapped.init(control_points)
            original_control_points = jnp.take(
                control_points, jnp.asarray(unique, dtype=jnp.int32), axis=0
            )

            scheduler = training.make_scheduler(initial_lr, self.scheduler_dict)
            early_stopper = training.EarlyStopping(
                window_size=int(self.optimizer_dict[constants.early_stopping_window]),
                patience=int(self.optimizer_dict[constants.early_stopping_patience]),
                min_improvement=float(
                    self.optimizer_dict[constants.early_stopping_delta]
                ),
                relative=True,
            )

            flux_ref = reference_integrals(control_points, train_batch)
            flux_ref = jax.lax.stop_gradient(flux_ref)
            lambda_flux = jnp.zeros(unique.shape[0], dtype=jnp.float32)

            history: dict[str, list[float]] = {
                k: []
                for k in (
                    "total_loss",
                    "flux_loss",
                    "smoothness_regularizer",
                    "ideal_regularizer",
                    "flux_integral",
                    "flux_integral_constraint",
                )
            }
            test_loss: dict[str, np.ndarray] = {}
            total_loss = np.inf
            total_per_heliostat = None
            epoch = 0

            ckpt = None
            if self.checkpoint_dir is not None:
                ckpt = checkpointing.LoopCheckpointer(
                    self.checkpoint_dir,
                    f"surface_group_{group_index}",
                    every=self.checkpoint_every,
                    # Non-nested multi-process: groups are rank-disjoint, so
                    # each rank must save its own groups locally - orbax's
                    # collective manager would never commit non-zero ranks'
                    # state (host 0 commits behind cross-process barriers).
                    # Nested mode keeps the collective default (every
                    # process holds every group's replicated state).
                    per_process=local_groups is not None,
                )
                restored = ckpt.restore_latest()
                if restored is not None:
                    epoch = int(restored["epoch"]) + 1
                    control_points = jnp.asarray(restored["control_points"])
                    opt_state = checkpointing.unpack_pytree(
                        opt_state, restored["opt_state"]
                    )
                    lambda_flux = jnp.asarray(restored["lambda_flux"])
                    flux_ref = jnp.asarray(restored["flux_integrals_reference"])
                    total_loss = float(restored["last_loss"])
                    checkpointing.restore_scheduler(scheduler, restored["scheduler"])
                    checkpointing.restore_early_stopping(
                        early_stopper, restored["early_stopping"]
                    )
                    checkpointing.restore_history(history, restored["history"])
                    log.info(
                        "Resuming surface reconstruction of group %d at epoch %d.",
                        group_index,
                        epoch,
                    )

            while total_loss > tolerance and epoch <= max_epoch:
                if isinstance(scheduler, training.ReduceOnPlateau):
                    learning_rate = scheduler.learning_rate
                else:
                    learning_rate = float(scheduler(epoch))
                (
                    control_points,
                    opt_state,
                    lambda_flux,
                    loss_value,
                    aux,
                ) = train_step(
                    control_points,
                    opt_state,
                    lambda_flux,
                    flux_ref,
                    original_control_points,
                    train_batch,
                    jnp.float32(learning_rate),
                )
                total_loss = float(loss_value)
                total_per_heliostat = aux["total_loss_per_heliostat"]
                if isinstance(scheduler, training.ReduceOnPlateau):
                    scheduler.step(total_loss)
                stop = early_stopper.step(total_loss)
                is_last = epoch == max_epoch - 1
                if epoch % log_step == 0 or is_last or stop:
                    log.info("Epoch: %d, Loss: %.6f", epoch, total_loss)
                    test_loss = {
                        k: np.asarray(v)
                        for k, v in validate_step(control_points, test_batch).items()
                    }
                if stop:
                    log.info("Early stopping at epoch %d.", epoch)
                    break
                history["total_loss"].append(total_loss)
                history["flux_loss"].append(float(aux["flux_loss"]))
                history["flux_integral"].append(float(aux["flux_integral"]))
                history["smoothness_regularizer"].append(float(aux["smoothness"]))
                history["ideal_regularizer"].append(float(aux["ideal"]))
                history["flux_integral_constraint"].append(
                    float(aux["flux_integral_constraint"])
                )
                if ckpt is not None and ckpt.should_save(epoch):
                    ckpt.save(
                        epoch,
                        {
                            "control_points": np.asarray(control_points),
                            "opt_state": checkpointing.pack_pytree(opt_state),
                            "lambda_flux": np.asarray(lambda_flux),
                            "flux_integrals_reference": np.asarray(flux_ref),
                            "last_loss": np.float64(total_loss),
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
            new_group = group.replace(nurbs_control_points=control_points)
            new_group = update_surfaces(
                new_group, self.number_of_surface_points
            )
            self.scenario.heliostat_groups[group_index] = new_group
            reconstructed_control_points[group_index] = np.asarray(control_points)

            per_heliostat = (
                np.asarray(total_per_heliostat)
                if total_per_heliostat is not None
                else np.full(unique.shape[0], np.inf, np.float32)
            )
            final_loss[offset + unique] = per_heliostat
            results.append(
                GroupReconstructionResult(
                    group_index=group_index,
                    loss_history=history,
                    test_loss=test_loss,
                    final_loss_per_heliostat=per_heliostat,
                    active_heliostat_indices=unique,
                )
            )
            offset += group.number_of_heliostats
            log.info("Surfaces reconstructed for group %d.", group_index)

        final_loss, results, merged_control_points = (
            collectives.synchronize_group_results(
                setup, final_loss, results, reconstructed_control_points,
                "surface_reconstruction",
            )
        )
        for group_index, control_points in merged_control_points.items():
            if group_index in reconstructed_control_points:
                continue  # locally reconstructed; scenario already updated
            remote_group = self.scenario.heliostat_groups[group_index].replace(
                nurbs_control_points=jnp.asarray(control_points)
            )
            self.scenario.heliostat_groups[group_index] = update_surfaces(
                remote_group, self.number_of_surface_points
            )

        return final_loss, results
