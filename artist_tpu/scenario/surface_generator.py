"""Surface generator: NURBS fitting from deflectometry data, ideal surfaces.

TPU-native re-design of the reference SurfaceGenerator
(reference: artist/scenario/surface_generator.py:29-436): the per-facet
Adam fit runs as a jitted optax loop; facets are fitted **batched in one
pass** (the reference fits them sequentially) since the NURBS evaluation is
already batched over [surfaces, facets].
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artist_tpu.geometry.coordinates import normalize_points
from artist_tpu.nurbs import evaluate_nurbs_surfaces
from artist_tpu.nurbs.utils import create_planar_nurbs_control_points
from artist_tpu.util import constants
from artist_tpu.util.config import FacetConfig, SurfaceConfig

log = logging.getLogger("artist_tpu.scenario")


class SurfaceGenerator:
    """Generate fitted or ideal surface configurations.

    reference: artist/scenario/surface_generator.py:29-436.
    """

    def __init__(
        self,
        number_of_control_points: tuple[int, int] = (10, 10),
        degrees: tuple[int, int] = (3, 3),
    ) -> None:
        self.number_of_control_points = tuple(number_of_control_points)
        self.degrees = (int(degrees[0]), int(degrees[1]))

    def fit_nurbs(
        self,
        surface_points: jnp.ndarray,
        surface_normals: jnp.ndarray,
        initial_learning_rate: float = 1e-3,
        fit_method: str = constants.fit_nurbs_from_normals,
        tolerance: float = 1e-10,
        max_epoch: int = 400,
    ) -> jnp.ndarray:
        """Fit NURBS control points to a point cloud or its normals.

        reference: artist/scenario/surface_generator.py:71-223. Accepts a
        batched ``[F, N, 4]`` input and fits all facets at once.

        Parameters
        ----------
        surface_points : jnp.ndarray
            Homogeneous surface points. Shape ``[F, N, 4]`` or ``[N, 4]``.
        surface_normals : jnp.ndarray
            Homogeneous surface normals, same shape.
        initial_learning_rate : float
            Adam learning rate (the reference's examples use 1e-3).
        fit_method : str
            ``point_cloud`` (fit points) or ``deflectometry`` (fit normals).
        tolerance, max_epoch :
            Convergence controls.

        Returns
        -------
        jnp.ndarray
            Fitted control points. Shape ``[F, Cu, Cv, 3]``.
        """
        if fit_method not in (
            constants.fit_nurbs_from_points,
            constants.fit_nurbs_from_normals,
        ):
            raise NotImplementedError(
                f"The conversion method '{fit_method}' is not yet supported in ARTIST."
            )
        if surface_points.ndim == 2:
            surface_points = surface_points[None]
            surface_normals = surface_normals[None]
        num_facets = surface_points.shape[0]
        num_cu, num_cv = self.number_of_control_points

        # Evaluation parameters: points projected to the e-n plane,
        # normalized per facet to the open interval (0, 1).
        evaluation_points = jax.vmap(normalize_points)(surface_points[:, :, :2])

        # Planar initial control-point grid sized to the point cloud extents.
        width = jnp.max(surface_points[:, :, 0], axis=1) - jnp.min(
            surface_points[:, :, 0], axis=1
        )
        height = jnp.max(surface_points[:, :, 1], axis=1) - jnp.min(
            surface_points[:, :, 1], axis=1
        )
        lin_u = jnp.linspace(-0.5, 0.5, num_cu)
        lin_v = jnp.linspace(-0.5, 0.5, num_cv)
        control_points = jnp.zeros((num_facets, num_cu, num_cv, 3), jnp.float32)
        control_points = control_points.at[..., 0].set(
            width[:, None, None] * lin_u[None, :, None]
        )
        control_points = control_points.at[..., 1].set(
            height[:, None, None] * lin_v[None, None, :]
        )

        fit_points = fit_method == constants.fit_nurbs_from_points
        target = surface_points if fit_points else surface_normals
        degrees = self.degrees

        optimizer = optax.adam(initial_learning_rate)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(control_points, opt_state):
            def loss_fn(cp):
                points, normals = evaluate_nurbs_surfaces(
                    cp[None], degrees, evaluation_points[None]
                )
                prediction = points[0] if fit_points else normals[0]
                return jnp.mean((prediction - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(control_points)
            updates, opt_state = optimizer.update(grads, opt_state)
            return optax.apply_updates(control_points, updates), opt_state, loss

        opt_state = optimizer.init(control_points)
        loss = np.inf
        epoch = 0
        while loss > tolerance and epoch <= max_epoch:
            control_points, opt_state, loss_j = step(control_points, opt_state)
            loss = float(loss_j)
            if epoch % 100 == 0:
                log.info("Epoch: %d, Loss: %.3e.", epoch, loss)
            epoch += 1
        return control_points

    def generate_fitted_surface_config(
        self,
        heliostat_name: str,
        facet_translation_vectors: np.ndarray,
        canting: np.ndarray,
        surface_points_with_facets_list: list[np.ndarray],
        surface_normals_with_facets_list: list[np.ndarray],
        initial_learning_rate: float = 1e-3,
        deflectometry_step_size: int = 100,
        fit_method: str = constants.fit_nurbs_from_normals,
        tolerance: float = 1e-10,
        max_epoch: int = 400,
    ) -> SurfaceConfig:
        """Fit per-facet NURBS to deflectometry clouds -> SurfaceConfig.

        reference: artist/scenario/surface_generator.py:225-377.

        Parameters
        ----------
        facet_translation_vectors : np.ndarray
            Shape ``[F, 4]``.
        canting : np.ndarray
            Shape ``[F, 2, 4]``.
        surface_points_with_facets_list, surface_normals_with_facets_list :
            Per-facet clouds ``[N_f, 3]`` (counts may vary; truncated to the
            minimum).
        deflectometry_step_size : int
            Subsampling stride over the point clouds.
        """
        log.info("Beginning generation of the fitted surface configuration.")
        min_points = min(p.shape[0] for p in surface_points_with_facets_list)
        points = np.stack([p[:min_points] for p in surface_points_with_facets_list])
        min_normals = min(n.shape[0] for n in surface_normals_with_facets_list)
        normals = np.stack([n[:min_normals] for n in surface_normals_with_facets_list])
        points = points[:, ::deflectometry_step_size]
        normals = normals[:, ::deflectometry_step_size]

        facet_translation_vectors = np.asarray(
            facet_translation_vectors, dtype=np.float32
        )
        # With a point-cloud fit the facet translations are learned
        # implicitly by the control points.
        if fit_method == constants.fit_nurbs_from_points:
            facet_translation_vectors = np.zeros_like(facet_translation_vectors)

        points4 = np.concatenate(
            [points, np.ones(points.shape[:2] + (1,), np.float32)], axis=-1
        )
        normals4 = np.concatenate(
            [normals, np.zeros(normals.shape[:2] + (1,), np.float32)], axis=-1
        )

        log.info("Generating NURBS surface for heliostat: %s.", heliostat_name)
        fitted = np.asarray(
            self.fit_nurbs(
                jnp.asarray(points4),
                jnp.asarray(normals4),
                initial_learning_rate=initial_learning_rate,
                fit_method=fit_method,
                tolerance=tolerance,
                max_epoch=max_epoch,
            )
        )
        facet_config_list = []
        for i in range(fitted.shape[0]):
            # The fit learns the facet shape centered at the origin; the
            # facet translation shifts it to its concentrator position.
            translated = fitted[i] + facet_translation_vectors[i, :3]
            facet_config_list.append(
                FacetConfig(
                    facet_key=f"facet_{i + 1}",
                    control_points=translated,
                    degrees=np.asarray(self.degrees, np.int64),
                    translation_vector=facet_translation_vectors[i],
                    canting=np.asarray(canting[i], np.float32),
                )
            )
        log.info("Surface configuration based on fit complete!")
        return SurfaceConfig(facet_list=facet_config_list)

    def generate_ideal_surface_config(
        self,
        facet_translation_vectors: np.ndarray,
        canting: np.ndarray,
    ) -> SurfaceConfig:
        """Planar (ideal) control-point grids sized by the canting norms.

        reference: artist/scenario/surface_generator.py:378-436.
        """
        control_points = np.asarray(
            create_planar_nurbs_control_points(
                self.number_of_control_points, jnp.asarray(canting, dtype=jnp.float32)
            )
        )
        facet_config_list = [
            FacetConfig(
                facet_key=f"facet_{i + 1}",
                control_points=control_points[i],
                degrees=np.asarray(self.degrees, np.int64),
                translation_vector=np.asarray(
                    facet_translation_vectors[i], np.float32
                ),
                canting=np.asarray(canting[i], np.float32),
            )
            for i in range(control_points.shape[0])
        ]
        return SurfaceConfig(facet_list=facet_config_list)
