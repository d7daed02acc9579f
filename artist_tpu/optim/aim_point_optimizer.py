"""Workload 3: field-level flux shaping via motor positions.

TPU-native re-design of the reference AimPointOptimizer
(reference: artist/optim/aim_point_optimizer.py:63-972):

- The tanh reparameterization (scale = min margin to the motor limits,
  clamped >= 1, reference: aim_point_optimizer.py:127-258) keeps relative
  update magnitudes comparable across heliostats.
- One jitted step covers ALL heliostat groups: align every group from its
  reparameterized motor positions, build the blocking primitives from the
  aligned surfaces of the whole field, trace with blocking ON, sum flux on
  the chosen target, apply the KL loss plus three Augmented-Lagrangian
  constraints (flux integral up, per-heliostat intercept up, per-pixel flux
  density down, reference: aim_point_optimizer.py:523-679).
- The cross-rank differentiable flux all-reduce becomes an XLA ``psum``
  inserted automatically when a mesh shards the heliostat axis.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artist_tpu.field import heliostat_group as hg
from artist_tpu.field.solar_tower import get_centers_of_target_areas
from artist_tpu.optim import checkpointing, losses, training
from artist_tpu.parallel import collectives
from artist_tpu.parallel.env import DistributedSetup
from artist_tpu.parallel.mesh import fetch_global, put_global
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.raytracing.blocking import (
    create_blocking_primitives_rectangles_by_index,
)
from artist_tpu.raytracing.render import compute_ray_magnitude, get_bitmaps_per_target
from artist_tpu.scenario.scenario import Scenario
from artist_tpu.util import constants, indices

log = logging.getLogger("artist_tpu.optim")


class AimPointOptimizer:
    """Optimize motor positions so the field's total flux matches a target
    distribution.

    reference: artist/optim/aim_point_optimizer.py:63-972.

    Parameters
    ----------
    scenario : Scenario
        The runtime scene.
    optimization_configuration : dict
        ``{optimization: {...}, scheduler: {...}, constraints: {...}}``.
    incident_ray_direction : array-like
        The common incident ray direction. Shape ``[4]``.
    target_area_index : int
        Global index of the target area receiving the flux.
    ground_truth : array-like
        Target flux distribution. Shape ``[height_u, width_e]``.
    dni : float
        Direct normal irradiance in W/m^2.
    distributed_setup : DistributedSetup | None
        Multi-process setup. When distributed and non-nested, each rank
        traces only its round-robin heliostat groups; motor positions and
        flux/intercept contributions are exchanged host-side every epoch
        (see ``_optimize_distributed``).
    mesh : jax.sharding.Mesh | None
        Device mesh; shards each group's heliostat/ray axes (defaults to
        ``distributed_setup.mesh``).
    """

    def __init__(
        self,
        scenario: Scenario,
        optimization_configuration: dict[str, Any],
        incident_ray_direction,
        target_area_index: int,
        ground_truth,
        dni: float,
        bitmap_resolution: tuple[int, int] = (256, 256),
        epsilon: float = 1e-12,
        seed: int = 7,
        distributed_setup: DistributedSetup | None = None,
        mesh: jax.sharding.Mesh | None = None,
        checkpoint_dir=None,
        checkpoint_every: int = 25,
        blocking_candidates: int | None = 16,
        heliostat_chunk: int | None = None,
    ) -> None:
        """``blocking_candidates``: per-heliostat candidate-blocker budget K
        for the compacted Pallas pair kernels. The default (16, matching
        ``RenderConfig``) keeps the measured ~4.9x compacted path; pass
        None/0 for the dense O(rays x field) kernels. The corridor
        pre-cull is conservative and stop-gradient (docs/performance.md).

        ``heliostat_chunk``: microbatch each group's heliostat axis under a
        remat scan (parallel/microbatch.py) - bounds the
        O(heliostats x points) backward buffers so plant-scale fields
        (4,000+ heliostats) fit a single chip. Blocking stays field-wide
        and exact: corners are extracted chunk-by-chunk first, then every
        chunk traces against the full primitive set. Must divide each
        group's heliostat count."""
        self.scenario = scenario
        self.blocking_candidates = (
            int(blocking_candidates) if blocking_candidates else None
        )
        self.heliostat_chunk = int(heliostat_chunk) if heliostat_chunk else None
        effective_mesh = mesh
        if effective_mesh is None and distributed_setup is not None:
            effective_mesh = distributed_setup.mesh
        if (
            self.heliostat_chunk
            and effective_mesh is not None
            and effective_mesh.devices.size > 1
        ):
            # A MULTI-device mesh already shards the heliostat axis;
            # scanning chunks of a sharded axis would serialize the very
            # parallelism the mesh provides (and every take() becomes a
            # cross-device gather). A trivial 1-device mesh (which
            # setup_distributed_environment always builds) shards nothing,
            # so chunking stays available there.
            log.warning(
                "heliostat_chunk is ignored on a %d-device mesh: the mesh "
                "shards the heliostat axis instead.",
                effective_mesh.devices.size,
            )
            self.heliostat_chunk = None
        self.distributed_setup = distributed_setup
        if mesh is None and distributed_setup is not None:
            mesh = distributed_setup.mesh
        self.mesh = mesh
        self.optimizer_dict = optimization_configuration[constants.optimization]
        self.scheduler_dict = optimization_configuration[constants.scheduler]
        self.constraint_dict = optimization_configuration[constants.constraints]
        self.incident_ray_direction = jnp.asarray(
            incident_ray_direction, dtype=jnp.float32
        )
        self.target_area_index = int(target_area_index)
        self.ground_truth = jnp.asarray(ground_truth, dtype=jnp.float32)
        self.dni = float(dni)
        self.bitmap_resolution = tuple(bitmap_resolution)
        self.epsilon = epsilon
        self.seed = seed
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = int(checkpoint_every)

    # ------------------------------------------------------------------ #

    def _target_plane_dimensions(self) -> np.ndarray:
        """Physical (width, height) of the chosen target area.

        reference: artist/optim/aim_point_optimizer.py:300-348.
        """
        tower = self.scenario.solar_tower
        n_planar = tower.number_of_planar_target_areas
        if self.target_area_index < n_planar:
            return np.asarray(tower.planar_dimensions[self.target_area_index])
        c = self.target_area_index - n_planar
        return np.asarray(
            [
                float(tower.cylindrical_radii[c])
                * float(tower.cylindrical_opening_angles[c]),
                float(tower.cylindrical_heights[c]),
            ]
        )

    def _initialize_group_parameters(self):
        """Pre-align all groups to get initial motor positions + tanh scales.

        reference: artist/optim/aim_point_optimizer.py:127-258.
        """
        initial_motor_positions = []
        scales = []
        params = []
        actives = []
        per_group_targets = []
        per_group_incident = []
        for group in self.scenario.heliostat_groups:
            num = group.number_of_heliostats
            active_indices = jnp.arange(num, dtype=jnp.int32)
            target_indices = jnp.full(
                (num,), self.target_area_index, dtype=jnp.int32
            )
            incident = jnp.broadcast_to(self.incident_ray_direction, (num, 4))
            active = hg.gather_active(group, active_indices)
            aim = get_centers_of_target_areas(
                self.scenario.solar_tower, target_indices
            )
            _, _, _, motor_positions = (
                hg.align_surfaces_with_incident_ray_directions(
                    active, aim, incident
                )
            )
            motor_positions = jax.lax.stop_gradient(motor_positions)
            minimum = group.actuator_non_optimizable[
                :, indices.actuator_min_motor_position
            ]
            maximum = group.actuator_non_optimizable[
                :, indices.actuator_max_motor_position
            ]
            lower_margin = motor_positions - minimum
            upper_margin = maximum - motor_positions
            scale = jnp.clip(jnp.minimum(lower_margin, upper_margin), 1.0, None)

            initial_motor_positions.append(motor_positions)
            scales.append(scale)
            params.append(jnp.zeros_like(motor_positions))
            actives.append(active_indices)
            per_group_targets.append(target_indices)
            per_group_incident.append(incident)
        return (
            tuple(params),
            tuple(scales),
            tuple(initial_motor_positions),
            tuple(actives),
            tuple(per_group_targets),
            tuple(per_group_incident),
        )

    # ------------------------------------------------------------------ #

    def optimize(self, loss_definition: str = "kl_divergence"):
        """Run the aim-point optimization.

        reference: artist/optim/aim_point_optimizer.py:724-972.

        Returns
        -------
        tuple
            (final loss, loss history dict, intercept factors, on-target
            factors, blocking factors). The scenario's heliostat groups get
            the optimized motor positions.
        """
        setup = self.distributed_setup
        if setup is not None and setup.is_distributed and not setup.is_nested:
            return self._optimize_distributed(loss_definition, setup)

        log.info("Start the aim point optimization.")
        groups = self.scenario.heliostat_groups
        tower = self.scenario.solar_tower
        sun = self.scenario.light_sources[0]
        (
            params,
            scales,
            initial_motor_positions,
            active_indices,
            target_indices,
            incident_dirs,
        ) = self._initialize_group_parameters()

        # Exposed for inspection (initial pre-aligned motor positions and the
        # tanh reparameterization scales).
        self.initial_motor_positions_all_groups = initial_motor_positions
        self.scales_all_groups = scales

        key = jax.random.PRNGKey(self.seed)
        group_keys = jax.random.split(key, len(groups))
        distortions = []
        ray_magnitudes = []
        for group, group_key in zip(groups, group_keys):
            num_points = group.surface_points.shape[1]
            distortion_pair = sun.get_distortions(
                group_key, num_points, group.number_of_heliostats
            )
            if self.mesh is not None:
                # Shard each group's heliostat/ray axes over the mesh; the
                # flux splat's cross-shard sum and the gradient psum are
                # inserted by XLA (the reference's differentiable flux
                # all_reduce, aim_point_optimizer.py:515-519).
                sharding = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec("heliostats", "rays")
                )
                distortion_pair = tuple(
                    put_global(d, sharding) for d in distortion_pair
                )
            distortions.append(distortion_pair)
            ray_magnitudes.append(
                compute_ray_magnitude(
                    self.dni, group.canting, num_points, sun.number_of_rays
                )
            )
        distortions = tuple(distortions)

        target_plane_dimensions = self._target_plane_dimensions()
        max_flux_density_per_pixel = float(
            np.prod(target_plane_dimensions)
            / np.prod(self.bitmap_resolution)
            * self.constraint_dict[constants.max_flux_density]
        )
        rho_local = float(self.constraint_dict[constants.rho_local_flux])
        rho_integral = float(self.constraint_dict[constants.rho_flux_integral])
        rho_intercept = float(self.constraint_dict[constants.rho_intercept])
        epsilon = self.epsilon
        use_constraints = loss_definition == "kl_divergence"
        render_config = RenderConfig(
            bitmap_resolution=self.bitmap_resolution,
            blocking_active=True,
            blocking_candidates=self.blocking_candidates,
        )
        number_of_target_areas = tower.number_of_target_areas

        # Big scene arrays (group state, distortion tensors) enter the jitted
        # steps as ARGUMENTS: closure-captured concrete arrays are inlined
        # into the HLO as literal constants, bloating compiles.
        scene = {"groups": tuple(groups), "distortions": distortions}

        heliostat_chunk = self.heliostat_chunk

        def forward(group_params, scene):
            """Align all groups, trace with blocking, accumulate target flux.

            With ``heliostat_chunk`` set, each group's align/trace runs as
            heliostat microbatches under a remat scan
            (parallel/microbatch.py): corners first (phase 1, tiny
            outputs), then every chunk traces against the FULL primitive
            set (phase 2) and the target flux accumulates across chunks -
            field-wide blocking and its gradients stay exact while the
            O(heliostats x points) backward buffers stay chunk-sized."""
            from artist_tpu.parallel.microbatch import (
                chunked_map,
                chunked_sum_and_map,
            )

            groups_ = scene["groups"]
            distortions_ = scene["distortions"]
            motors = [
                initial_motor_positions[g] + jnp.tanh(group_params[g]) * scales[g]
                for g in range(len(groups_))
            ]

            def aligned_chunk(g, idx):
                active = hg.gather_active(groups_[g], idx)
                points, normals, _ = hg.align_surfaces_with_motor_positions(
                    active, jnp.take(motors[g], idx, axis=0)
                )
                return points, normals

            def chunking(group):
                if not heliostat_chunk:
                    return None
                if group.number_of_heliostats <= heliostat_chunk:
                    return None
                if group.number_of_heliostats % heliostat_chunk:
                    log.warning(
                        "heliostat_chunk=%d does not divide the group's %d "
                        "heliostats; microbatching is DISABLED for this "
                        "group (it will need the full field's memory).",
                        heliostat_chunk,
                        group.number_of_heliostats,
                    )
                    return None
                return heliostat_chunk

            # Field-wide blocking primitives from all aligned surfaces
            # (reference: heliostat_ray_tracer.py:159-183). Un-chunked
            # groups keep their aligned surfaces for the trace phase
            # (aligned once, as before round 5); chunked groups re-align
            # per chunk inside the remat scans instead of materializing
            # the field-wide arrays.
            corners, spans, prim_normals = [], [], []
            aligned_full: dict[int, tuple] = {}
            for g, group in enumerate(groups_):
                chunk = chunking(group)
                if chunk:
                    c, s, n = chunked_map(
                        lambda idx, g=g: (
                            create_blocking_primitives_rectangles_by_index(
                                aligned_chunk(g, idx)[0]
                            )
                        ),
                        active_indices[g],
                        chunk,
                    )
                else:
                    aligned_full[g] = aligned_chunk(g, active_indices[g])
                    c, s, n = create_blocking_primitives_rectangles_by_index(
                        aligned_full[g][0]
                    )
                corners.append(c)
                spans.append(s)
                prim_normals.append(n)
            primitives = (
                jnp.concatenate(corners),
                jnp.concatenate(spans),
                jnp.concatenate(prim_normals),
            )

            total_flux = jnp.zeros(
                (self.bitmap_resolution[1], self.bitmap_resolution[0]),
                dtype=jnp.float32,
            )
            group_offsets = np.concatenate(
                [[0], np.cumsum([g.number_of_heliostats for g in groups_])[:-1]]
            )
            intercepts, on_targets, blockings = [], [], []
            for g, group in enumerate(groups_):

                def traced_chunk(idx, g=g, group=group, aligned=None):
                    points, normals = aligned or aligned_chunk(g, idx)
                    flux, intercept, on_target, blocking = trace_rays(
                        tower=tower,
                        aligned_surface_points=points,
                        aligned_surface_normals=normals,
                        incident_ray_directions=jnp.take(
                            incident_dirs[g], idx, axis=0
                        ),
                        target_area_indices=jnp.take(
                            target_indices[g], idx, axis=0
                        ),
                        distortions_u=jnp.take(distortions_[g][0], idx, axis=0),
                        distortions_e=jnp.take(distortions_[g][1], idx, axis=0),
                        ray_magnitude=ray_magnitudes[g],
                        blocking_primitives=primitives,
                        ray_primitive_indices=idx + int(group_offsets[g]),
                        config=render_config,
                    )
                    flux_on_target = get_bitmaps_per_target(
                        flux,
                        jnp.take(target_indices[g], idx, axis=0),
                        number_of_target_areas,
                    )[self.target_area_index]
                    return flux_on_target, (intercept, on_target, blocking)

                chunk = chunking(group)
                if chunk:
                    group_flux, (intercept, on_target, blocking) = (
                        chunked_sum_and_map(traced_chunk, active_indices[g], chunk)
                    )
                else:
                    group_flux, (intercept, on_target, blocking) = traced_chunk(
                        active_indices[g], aligned=aligned_full[g]
                    )
                total_flux = total_flux + group_flux
                intercepts.append(intercept)
                on_targets.append(on_target)
                blockings.append(blocking)
            return (
                total_flux,
                jnp.concatenate(intercepts),
                jnp.concatenate(on_targets),
                jnp.concatenate(blockings),
            )

        def flux_loss_fn(total_flux):
            if loss_definition == "kl_divergence":
                return losses.kl_divergence_loss(
                    total_flux[None], self.ground_truth[None]
                )[0]
            if loss_definition == "pixel":
                return losses.pixel_loss(total_flux[None], self.ground_truth[None])[0]
            raise ValueError(
                f"Unknown loss for aim point optimization: {loss_definition}"
            )

        def loss_fn(group_params, scene, references, lambdas):
            total_flux, intercepts, on_targets, blockings = forward(
                group_params, scene
            )
            flux_loss = flux_loss_fn(total_flux)
            aux = {
                "flux_loss": flux_loss,
                "total_flux_sum": jnp.sum(total_flux),
                "intercepts": intercepts,
                "on_targets": on_targets,
                "blockings": blockings,
            }
            if not use_constraints:
                aux.update(
                    flux_integral_constraint=0.0,
                    intercept_constraint=0.0,
                    local_flux_constraint=0.0,
                    flux_integral_difference=0.0,
                    intercept_differences_mean=0.0,
                    local_flux_violation_max=0.0,
                )
                return flux_loss, aux

            flux_integral_reference, intercept_reference = references
            lambda_integral, lambda_intercept, lambda_local = lambdas

            # Flux integral must not drop below the epoch-0 reference
            # (reference: aim_point_optimizer.py:608-623).
            integral_difference = (
                flux_integral_reference - jnp.sum(total_flux)
            ) / (flux_integral_reference + epsilon)
            integral_clamped = jnp.clip(integral_difference, 0.0, None)
            integral_constraint = (
                lambda_integral * integral_clamped
                + 0.5 * rho_integral * integral_clamped**2
            )

            # Per-heliostat intercept must not drop (spillage,
            # reference: aim_point_optimizer.py:625-636).
            intercept_differences = (intercept_reference - intercepts) / (
                intercept_reference + epsilon
            )
            intercept_clamped = jnp.clip(intercept_differences, 0.0, None)
            intercept_constraint = jnp.mean(
                lambda_intercept * intercept_clamped
                + 0.5 * rho_intercept * intercept_clamped**2
            )

            # Local flux density cap (reference: aim_point_optimizer.py:638-647).
            local_violation = (total_flux - max_flux_density_per_pixel) / (
                max_flux_density_per_pixel + epsilon
            )
            local_clamped = jnp.clip(local_violation, 0.0, None)
            local_constraint = jnp.max(
                lambda_local * local_clamped + 0.5 * rho_local * local_clamped**2
            )

            loss = (
                flux_loss + integral_constraint + intercept_constraint + local_constraint
            )
            aux.update(
                flux_integral_constraint=integral_constraint,
                intercept_constraint=intercept_constraint,
                local_flux_constraint=local_constraint,
                flux_integral_difference=integral_difference,
                intercept_differences_mean=jnp.mean(intercept_differences),
                local_flux_violation_max=jnp.max(local_violation),
            )
            return loss, aux

        base_optimizer = optax.adam(learning_rate=1.0)

        def scaled_update(grads, state, params_=None, *, learning_rate):
            updates, state = base_optimizer.update(grads, state, params_)
            updates = jax.tree.map(lambda u: u * learning_rate, updates)
            return updates, state

        optimizer = optax.GradientTransformationExtraArgs(
            init=base_optimizer.init, update=scaled_update
        )

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(
            group_params, opt_state, scene, references, lambdas, learning_rate
        ):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                group_params, scene, references, lambdas
            )
            updates, opt_state = optimizer.update(
                grads, opt_state, group_params, learning_rate=learning_rate
            )
            group_params = jax.tree.map(
                lambda p, u: p + u, group_params, updates
            )
            # AL multiplier updates (reference: aim_point_optimizer.py:656-668).
            lambda_integral, lambda_intercept, lambda_local = lambdas
            new_lambdas = (
                jnp.clip(
                    lambda_integral
                    + rho_integral * aux["flux_integral_difference"],
                    0.0,
                    None,
                ),
                jnp.clip(
                    lambda_intercept
                    + rho_intercept * aux["intercept_differences_mean"],
                    0.0,
                    None,
                ),
                jnp.clip(
                    lambda_local + rho_local * aux["local_flux_violation_max"],
                    0.0,
                    None,
                ),
            )
            return group_params, opt_state, new_lambdas, loss, aux

        # Epoch-0 references (the reference captures them in its first epoch,
        # where all constraint terms evaluate to exactly zero).
        init_flux, init_intercepts, _, _ = jax.jit(forward)(params, scene)
        references = (
            jax.lax.stop_gradient(jnp.sum(init_flux)),
            jax.lax.stop_gradient(init_intercepts),
        )
        lambdas = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))

        opt_state = optimizer.init(params)
        initial_lr = float(self.optimizer_dict[constants.initial_learning_rate])
        scheduler = training.make_scheduler(initial_lr, self.scheduler_dict)
        early_stopper = training.EarlyStopping(
            window_size=int(self.optimizer_dict[constants.early_stopping_window]),
            patience=int(self.optimizer_dict[constants.early_stopping_patience]),
            min_improvement=float(self.optimizer_dict[constants.early_stopping_delta]),
            relative=True,
        )
        max_epoch = int(self.optimizer_dict[constants.max_epoch])
        tolerance = float(self.optimizer_dict[constants.tolerance])
        log_step = int(self.optimizer_dict.get(constants.log_step, 0)) or max_epoch

        history: dict[str, list[float]] = {
            k: []
            for k in (
                "total_loss",
                "flux_loss",
                "local_flux_constraint",
                "intercept_constraint",
                "flux_integral_constraint",
                "flux_integral",
            )
        }
        loss_value = np.inf
        aux = None
        epoch = 0

        ckpt = None
        if self.checkpoint_dir is not None:
            ckpt = checkpointing.LoopCheckpointer(
                self.checkpoint_dir, "aim_point", every=self.checkpoint_every
            )
            restored = ckpt.restore_latest()
            if restored is not None:
                epoch = int(restored["epoch"]) + 1
                params = checkpointing.unpack_pytree(params, restored["params"])
                opt_state = checkpointing.unpack_pytree(
                    opt_state, restored["opt_state"]
                )
                lambdas = checkpointing.unpack_pytree(lambdas, restored["lambdas"])
                references = checkpointing.unpack_pytree(
                    references, restored["references"]
                )
                loss_value = float(restored["last_loss"])
                checkpointing.restore_scheduler(scheduler, restored["scheduler"])
                checkpointing.restore_early_stopping(
                    early_stopper, restored["early_stopping"]
                )
                checkpointing.restore_history(history, restored["history"])
                log.info("Resuming aim-point optimization at epoch %d.", epoch)

        while loss_value > tolerance and epoch <= max_epoch:
            if isinstance(scheduler, training.ReduceOnPlateau):
                learning_rate = scheduler.learning_rate
            else:
                learning_rate = float(scheduler(epoch))
            params, opt_state, lambdas, loss_j, aux = train_step(
                params,
                opt_state,
                scene,
                references,
                lambdas,
                jnp.float32(learning_rate),
            )
            loss_value = float(loss_j)
            if isinstance(scheduler, training.ReduceOnPlateau):
                scheduler.step(loss_value)
            if epoch % log_step == 0:
                log.info("Epoch: %d, Loss: %.6f, LR: %.2e", epoch, loss_value, learning_rate)
            history["total_loss"].append(loss_value)
            history["flux_loss"].append(float(aux["flux_loss"]))
            if use_constraints:
                reference_integral = float(references[0])
                history["flux_integral"].append(
                    100.0
                    / reference_integral
                    * (float(aux["total_flux_sum"]) - reference_integral + 1e-8)
                )
                history["local_flux_constraint"].append(
                    float(aux["local_flux_constraint"])
                )
                history["intercept_constraint"].append(
                    float(aux["intercept_constraint"])
                )
                history["flux_integral_constraint"].append(
                    float(aux["flux_integral_constraint"])
                )
            if early_stopper.step(loss_value):
                log.info("Early stopping at epoch %d.", epoch)
                break
            if ckpt is not None and ckpt.should_save(epoch):
                ckpt.save(
                    epoch,
                    {
                        "params": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, params)
                        ),
                        "opt_state": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, opt_state)
                        ),
                        "lambdas": checkpointing.pack_pytree(lambdas),
                        "references": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, references)
                        ),
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
        # Write optimized motor positions back into the scenario groups
        # (fetch_global: under a multi-process mesh the updated params may be
        # device-sharded across hosts).
        for g, group in enumerate(groups):
            motor = initial_motor_positions[g] + jnp.tanh(params[g]) * scales[g]
            self.scenario.heliostat_groups[g] = group.replace(
                motor_positions=jnp.asarray(fetch_global(motor))
            )

        log.info("Aim points optimized.")
        return (
            loss_value,
            history,
            fetch_global(aux["intercepts"]) if aux is not None else None,
            fetch_global(aux["on_targets"]) if aux is not None else None,
            fetch_global(aux["blockings"]) if aux is not None else None,
        )

    # ------------------------------------------------------------------ #

    def _optimize_distributed(self, loss_definition: str, setup):
        """Group-parallel aim-point optimization across processes.

        TPU-native equivalent of the reference's distributed mode
        (reference: artist/optim/aim_point_optimizer.py:440-722): each rank
        traces only its round-robin heliostat groups; the reference's
        differentiable ``all_reduce(SUM)`` of the total flux
        (aim_point_optimizer.py:515-519) becomes a host-side exchange of
        flux/intercept contributions entering the loss as constants - exact,
        because remote contributions are independent of local parameters, so
        ``d loss / d params_local`` is unchanged. Unlike the reference (which
        lets remote groups' blocking geometry go stale until the final
        broadcast, aim_point_optimizer.py:704-722), current motor positions
        are exchanged every epoch so field-wide blocking stays consistent and
        results match the single-process run exactly.
        """
        log.info(
            "Start the aim point optimization (distributed, rank %d/%d).",
            setup.rank,
            setup.world_size,
        )
        groups = self.scenario.heliostat_groups
        tower = self.scenario.solar_tower
        sun = self.scenario.light_sources[0]
        number_of_groups = len(groups)
        local_list = sorted(setup.groups_to_ranks_mapping.get(setup.rank, []))
        remote_list = [g for g in range(number_of_groups) if g not in local_list]
        local_positions = {g: i for i, g in enumerate(local_list)}
        remote_positions = {g: i for i, g in enumerate(remote_list)}

        (
            all_params,
            scales,
            initial_motor_positions,
            active_indices,
            target_indices,
            incident_dirs,
        ) = self._initialize_group_parameters()
        self.initial_motor_positions_all_groups = initial_motor_positions
        self.scales_all_groups = scales
        params = tuple(all_params[g] for g in local_list)

        key = jax.random.PRNGKey(self.seed)
        group_keys = jax.random.split(key, number_of_groups)
        distortions = []
        ray_magnitudes = {}
        for g in local_list:
            group = groups[g]
            num_points = group.surface_points.shape[1]
            distortions.append(
                sun.get_distortions(
                    group_keys[g], num_points, group.number_of_heliostats
                )
            )
            ray_magnitudes[g] = compute_ray_magnitude(
                self.dni, group.canting, num_points, sun.number_of_rays
            )
        distortions = tuple(distortions)

        group_sizes = [g.number_of_heliostats for g in groups]
        group_offsets = np.concatenate([[0], np.cumsum(group_sizes)[:-1]])
        total_heliostats = int(np.sum(group_sizes))
        local_heliostat_indices = jnp.asarray(
            np.concatenate(
                [group_offsets[g] + np.arange(group_sizes[g]) for g in local_list]
            ),
            dtype=jnp.int32,
        )

        target_plane_dimensions = self._target_plane_dimensions()
        max_flux_density_per_pixel = float(
            np.prod(target_plane_dimensions)
            / np.prod(self.bitmap_resolution)
            * self.constraint_dict[constants.max_flux_density]
        )
        rho_local = float(self.constraint_dict[constants.rho_local_flux])
        rho_integral = float(self.constraint_dict[constants.rho_flux_integral])
        rho_intercept = float(self.constraint_dict[constants.rho_intercept])
        epsilon = self.epsilon
        use_constraints = loss_definition == "kl_divergence"
        render_config = RenderConfig(
            bitmap_resolution=self.bitmap_resolution,
            blocking_active=True,
            blocking_candidates=self.blocking_candidates,
        )
        number_of_target_areas = tower.number_of_target_areas
        scene = {"groups": tuple(groups), "distortions": distortions}

        def local_forward(local_params, remote_motors, scene):
            """Trace local groups; align ALL groups for blocking geometry."""
            groups_ = scene["groups"]
            distortions_ = scene["distortions"]
            aligned = []
            for g in range(number_of_groups):
                if g in local_positions:
                    motor = initial_motor_positions[g] + jnp.tanh(
                        local_params[local_positions[g]]
                    ) * scales[g]
                else:
                    motor = jax.lax.stop_gradient(
                        remote_motors[remote_positions[g]]
                    )
                active = hg.gather_active(groups_[g], active_indices[g])
                points, normals, _ = hg.align_surfaces_with_motor_positions(
                    active, motor
                )
                aligned.append((points, normals))

            corners, spans, prim_normals = [], [], []
            for points, _ in aligned:
                c, s, n = create_blocking_primitives_rectangles_by_index(points)
                corners.append(c)
                spans.append(s)
                prim_normals.append(n)
            primitives = (
                jnp.concatenate(corners),
                jnp.concatenate(spans),
                jnp.concatenate(prim_normals),
            )

            flux_local = jnp.zeros(
                (self.bitmap_resolution[1], self.bitmap_resolution[0]),
                dtype=jnp.float32,
            )
            intercepts, on_targets, blockings = [], [], []
            for i, g in enumerate(local_list):
                points, normals = aligned[g]
                primitive_indices = jnp.arange(
                    group_sizes[g], dtype=jnp.int32
                ) + int(group_offsets[g])
                flux, intercept, on_target, blocking = trace_rays(
                    tower=tower,
                    aligned_surface_points=points,
                    aligned_surface_normals=normals,
                    incident_ray_directions=incident_dirs[g],
                    target_area_indices=target_indices[g],
                    distortions_u=distortions_[i][0],
                    distortions_e=distortions_[i][1],
                    ray_magnitude=ray_magnitudes[g],
                    blocking_primitives=primitives,
                    ray_primitive_indices=primitive_indices,
                    config=render_config,
                )
                flux_local = flux_local + get_bitmaps_per_target(
                    flux, target_indices[g], number_of_target_areas
                )[self.target_area_index]
                intercepts.append(intercept)
                on_targets.append(on_target)
                blockings.append(blocking)
            return (
                flux_local,
                jnp.concatenate(intercepts),
                jnp.concatenate(on_targets),
                jnp.concatenate(blockings),
            )

        def flux_loss_fn(total_flux):
            if loss_definition == "kl_divergence":
                return losses.kl_divergence_loss(
                    total_flux[None], self.ground_truth[None]
                )[0]
            if loss_definition == "pixel":
                return losses.pixel_loss(total_flux[None], self.ground_truth[None])[0]
            raise ValueError(
                f"Unknown loss for aim point optimization: {loss_definition}"
            )

        def full_loss(
            local_params,
            remote_motors,
            scene,
            flux_remote,
            intercepts_remote_full,
            references,
            lambdas,
        ):
            flux_local, intercepts_local, on_targets, blockings = local_forward(
                local_params, remote_motors, scene
            )
            total_flux = flux_local + flux_remote
            # Full per-heliostat intercept vector: remote entries constant,
            # local entries differentiable.
            intercepts_full = intercepts_remote_full.at[
                local_heliostat_indices
            ].set(intercepts_local)
            flux_loss = flux_loss_fn(total_flux)
            aux = {
                "flux_loss": flux_loss,
                "total_flux_sum": jnp.sum(total_flux),
                "intercepts_local": intercepts_local,
                "on_targets_local": on_targets,
                "blockings_local": blockings,
            }
            if not use_constraints:
                aux.update(
                    flux_integral_constraint=0.0,
                    intercept_constraint=0.0,
                    local_flux_constraint=0.0,
                    flux_integral_difference=0.0,
                    intercept_differences_mean=0.0,
                    local_flux_violation_max=0.0,
                )
                return flux_loss, aux

            flux_integral_reference, intercept_reference = references
            lambda_integral, lambda_intercept, lambda_local = lambdas

            integral_difference = (
                flux_integral_reference - jnp.sum(total_flux)
            ) / (flux_integral_reference + epsilon)
            integral_clamped = jnp.clip(integral_difference, 0.0, None)
            integral_constraint = (
                lambda_integral * integral_clamped
                + 0.5 * rho_integral * integral_clamped**2
            )

            intercept_differences = (intercept_reference - intercepts_full) / (
                intercept_reference + epsilon
            )
            intercept_clamped = jnp.clip(intercept_differences, 0.0, None)
            intercept_constraint = jnp.mean(
                lambda_intercept * intercept_clamped
                + 0.5 * rho_intercept * intercept_clamped**2
            )

            local_violation = (total_flux - max_flux_density_per_pixel) / (
                max_flux_density_per_pixel + epsilon
            )
            local_clamped = jnp.clip(local_violation, 0.0, None)
            local_constraint = jnp.max(
                lambda_local * local_clamped + 0.5 * rho_local * local_clamped**2
            )

            loss = (
                flux_loss
                + integral_constraint
                + intercept_constraint
                + local_constraint
            )
            aux.update(
                flux_integral_constraint=integral_constraint,
                intercept_constraint=intercept_constraint,
                local_flux_constraint=local_constraint,
                flux_integral_difference=integral_difference,
                intercept_differences_mean=jnp.mean(intercept_differences),
                local_flux_violation_max=jnp.max(local_violation),
            )
            return loss, aux

        base_optimizer = optax.adam(learning_rate=1.0)

        def scaled_update(grads, state, params_=None, *, learning_rate):
            updates, state = base_optimizer.update(grads, state, params_)
            updates = jax.tree.map(lambda u: u * learning_rate, updates)
            return updates, state

        optimizer = optax.GradientTransformationExtraArgs(
            init=base_optimizer.init, update=scaled_update
        )

        @jax.jit
        def motors_of_local(local_params):
            return tuple(
                initial_motor_positions[g]
                + jnp.tanh(local_params[local_positions[g]]) * scales[g]
                for g in local_list
            )

        contribution = jax.jit(local_forward)

        @partial(jax.jit, donate_argnums=(1,))
        def train_step(
            local_params,
            opt_state,
            remote_motors,
            scene,
            flux_remote,
            intercepts_remote_full,
            references,
            lambdas,
            learning_rate,
        ):
            (loss, aux), grads = jax.value_and_grad(full_loss, has_aux=True)(
                local_params,
                remote_motors,
                scene,
                flux_remote,
                intercepts_remote_full,
                references,
                lambdas,
            )
            updates, opt_state = optimizer.update(
                grads, opt_state, local_params, learning_rate=learning_rate
            )
            local_params = jax.tree.map(lambda p, u: p + u, local_params, updates)
            lambda_integral, lambda_intercept, lambda_local = lambdas
            new_lambdas = (
                jnp.clip(
                    lambda_integral
                    + rho_integral * aux["flux_integral_difference"],
                    0.0,
                    None,
                ),
                jnp.clip(
                    lambda_intercept
                    + rho_intercept * aux["intercept_differences_mean"],
                    0.0,
                    None,
                ),
                jnp.clip(
                    lambda_local + rho_local * aux["local_flux_violation_max"],
                    0.0,
                    None,
                ),
            )
            return local_params, opt_state, new_lambdas, loss, aux

        def exchange_motors(local_params):
            """All ranks learn every group's current motor positions."""
            motors_local = motors_of_local(local_params)
            gathered = collectives.all_gather_object(
                {
                    g: np.asarray(motor)
                    for g, motor in zip(local_list, motors_local)
                },
                "aim_point_motors",
            )
            merged: dict[int, np.ndarray] = {}
            for rank_motors in gathered:
                merged.update(rank_motors)
            remote_motors = tuple(
                jnp.asarray(merged[g]) for g in remote_list
            )
            return remote_motors, merged

        def exchange_contributions(local_params, remote_motors):
            """Sum of remote fluxes + full factor vectors as np arrays."""
            flux_local, intercepts_local, on_targets_local, blockings_local = (
                contribution(local_params, remote_motors, scene)
            )
            gathered = collectives.all_gather_object(
                (
                    setup.rank,
                    np.asarray(flux_local),
                    {
                        "indices": np.asarray(local_heliostat_indices),
                        "intercepts": np.asarray(intercepts_local),
                        "on_targets": np.asarray(on_targets_local),
                        "blockings": np.asarray(blockings_local),
                    },
                ),
                "aim_point_contributions",
            )
            flux_remote = np.zeros(
                (self.bitmap_resolution[1], self.bitmap_resolution[0]), np.float32
            )
            full = {
                name: np.zeros(total_heliostats, np.float32)
                for name in ("intercepts", "on_targets", "blockings")
            }
            for rank, flux, factors in gathered:
                if rank != setup.rank:
                    flux_remote += flux
                for name in full:
                    full[name][factors["indices"]] = factors[name]
            intercepts_remote_full = full["intercepts"].copy()
            intercepts_remote_full[np.asarray(local_heliostat_indices)] = 0.0
            return (
                jnp.asarray(flux_remote),
                jnp.asarray(intercepts_remote_full),
                full,
                np.add.reduce([flux for _, flux, _ in gathered]),
            )

        # Epoch-0 references from the full-field initial state.
        remote_motors, _ = exchange_motors(params)
        flux_remote, intercepts_remote_full, full_factors, init_total_flux = (
            exchange_contributions(params, remote_motors)
        )
        references = (
            jnp.float32(init_total_flux.sum()),
            jnp.asarray(
                full_factors["intercepts"]
            ),
        )
        lambdas = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))

        opt_state = optimizer.init(params)
        initial_lr = float(self.optimizer_dict[constants.initial_learning_rate])
        scheduler = training.make_scheduler(initial_lr, self.scheduler_dict)
        early_stopper = training.EarlyStopping(
            window_size=int(self.optimizer_dict[constants.early_stopping_window]),
            patience=int(self.optimizer_dict[constants.early_stopping_patience]),
            min_improvement=float(self.optimizer_dict[constants.early_stopping_delta]),
            relative=True,
        )
        max_epoch = int(self.optimizer_dict[constants.max_epoch])
        tolerance = float(self.optimizer_dict[constants.tolerance])
        log_step = int(self.optimizer_dict.get(constants.log_step, 0)) or max_epoch

        history: dict[str, list[float]] = {
            k: []
            for k in (
                "total_loss",
                "flux_loss",
                "local_flux_constraint",
                "intercept_constraint",
                "flux_integral_constraint",
                "flux_integral",
            )
        }
        loss_value = np.inf
        aux = None
        epoch = 0

        # Per-rank checkpoints: each rank's params cover only its round-robin
        # groups, so a resume needs the SAME world size and group mapping.
        ckpt = None
        if self.checkpoint_dir is not None:
            ckpt = checkpointing.LoopCheckpointer(
                self.checkpoint_dir,
                f"aim_point_rank{setup.rank}",
                every=self.checkpoint_every,
                # Per-rank state on per-rank directories: orbax must save
                # locally, not behind its collective primary-host barriers.
                per_process=True,
            )
            restored = ckpt.restore_latest()
            if restored is not None:
                epoch = int(restored["epoch"]) + 1
                params = checkpointing.unpack_pytree(params, restored["params"])
                opt_state = checkpointing.unpack_pytree(
                    opt_state, restored["opt_state"]
                )
                lambdas = checkpointing.unpack_pytree(lambdas, restored["lambdas"])
                references = checkpointing.unpack_pytree(
                    references, restored["references"]
                )
                loss_value = float(restored["last_loss"])
                checkpointing.restore_scheduler(scheduler, restored["scheduler"])
                checkpointing.restore_early_stopping(
                    early_stopper, restored["early_stopping"]
                )
                checkpointing.restore_history(history, restored["history"])
                log.info(
                    "Rank %d resuming aim-point optimization at epoch %d.",
                    setup.rank,
                    epoch,
                )

        while loss_value > tolerance and epoch <= max_epoch:
            if isinstance(scheduler, training.ReduceOnPlateau):
                learning_rate = scheduler.learning_rate
            else:
                learning_rate = float(scheduler(epoch))
            if epoch > 0:
                remote_motors, _ = exchange_motors(params)
                flux_remote, intercepts_remote_full, full_factors, _ = (
                    exchange_contributions(params, remote_motors)
                )
            params, opt_state, lambdas, loss_j, aux = train_step(
                params,
                opt_state,
                remote_motors,
                scene,
                flux_remote,
                intercepts_remote_full,
                references,
                lambdas,
                jnp.float32(learning_rate),
            )
            # Each rank sums flux contributions in a different order
            # (flux_local + gathered remotes), so local losses can differ in
            # the last ulp. Every control-flow decision below (tolerance,
            # ReduceOnPlateau, EarlyStopping) must be identical on all ranks
            # or a rank that keeps looping blocks forever in the next
            # all_gather — canonicalize on rank 0's loss.
            loss_value = float(
                collectives.broadcast_object(float(loss_j), 0, "aim_point_loss")
            )
            if isinstance(scheduler, training.ReduceOnPlateau):
                scheduler.step(loss_value)
            if epoch % log_step == 0:
                log.info(
                    "Epoch: %d, Loss: %.6f, LR: %.2e", epoch, loss_value, learning_rate
                )
            history["total_loss"].append(loss_value)
            history["flux_loss"].append(float(aux["flux_loss"]))
            if use_constraints:
                reference_integral = float(references[0])
                history["flux_integral"].append(
                    100.0
                    / reference_integral
                    * (float(aux["total_flux_sum"]) - reference_integral + 1e-8)
                )
                history["local_flux_constraint"].append(
                    float(aux["local_flux_constraint"])
                )
                history["intercept_constraint"].append(
                    float(aux["intercept_constraint"])
                )
                history["flux_integral_constraint"].append(
                    float(aux["flux_integral_constraint"])
                )
            if early_stopper.step(loss_value):
                log.info("Early stopping at epoch %d.", epoch)
                break
            if ckpt is not None and ckpt.should_save(epoch):
                ckpt.save(
                    epoch,
                    {
                        "params": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, params)
                        ),
                        "opt_state": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, opt_state)
                        ),
                        "lambdas": checkpointing.pack_pytree(lambdas),
                        "references": checkpointing.pack_pytree(
                            jax.tree.map(fetch_global, references)
                        ),
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
        # Final synchronization: every rank applies every group's optimized
        # motor positions (the reference's final broadcast,
        # aim_point_optimizer.py:704-722). ``full_factors`` stays at the last
        # epoch's pre-update values, matching the single-process aux.
        remote_motors, merged_motors = exchange_motors(params)
        for g in range(number_of_groups):
            self.scenario.heliostat_groups[g] = groups[g].replace(
                motor_positions=jnp.asarray(merged_motors[g])
            )

        log.info("Aim points optimized (rank %d).", setup.rank)
        return (
            loss_value,
            history,
            full_factors["intercepts"],
            full_factors["on_targets"],
            full_factors["blockings"],
        )
