"""Sun model: Gaussian scatter-angle distortion sampling.

reference: artist/scene/sun.py:41-234. The reference samples a 2D
``MultivariateNormal(mean=0, cov=c*I)`` over (u, e) scatter angles with a
global torch seed; here sampling is a pure function of a ``jax.random`` key
(threefry), giving deterministic per-call streams without global state.
For cross-framework golden tests, distortions are injected directly into
the renderer instead of reproducing torch RNG draws.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from artist_tpu.util import constants


@dataclass(frozen=True)
class Sun:
    """Sun light source with a normal scatter-angle distribution.

    Attributes
    ----------
    number_of_rays : int
        Rays sampled per (heliostat, surface point).
    distribution_parameters : dict
        Distribution type / mean / covariance
        (default: normal, mean 0, covariance 4.3681e-06 rad^2,
        reference: artist/scene/sun.py:41-45).
    """

    number_of_rays: int = 200
    distribution_parameters: dict = field(
        default_factory=lambda: {
            constants.light_source_distribution_type: constants.light_source_distribution_is_normal,
            constants.light_source_mean: 0.0,
            constants.light_source_covariance: 4.3681e-06,
        }
    )

    def __post_init__(self):
        dist_type = self.distribution_parameters[constants.light_source_distribution_type]
        if dist_type != constants.light_source_distribution_is_normal:
            raise ValueError(f"Unknown sun distribution type: {dist_type}")

    def get_distortions(
        self,
        key: jax.Array,
        number_of_points: int,
        number_of_active_heliostats: int,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Sample scatter-angle distortions.

        reference: artist/scene/sun.py:199-234.

        Parameters
        ----------
        key : jax.Array
            PRNG key.
        number_of_points : int
            Surface points per heliostat.
        number_of_active_heliostats : int
            Active heliostat samples.

        Returns
        -------
        tuple of jnp.ndarray
            (distortions_u, distortions_e), each
            ``[number_of_active_heliostats, number_of_rays, number_of_points]``.
        """
        mean = self.distribution_parameters[constants.light_source_mean]
        covariance = self.distribution_parameters[constants.light_source_covariance]
        std = jnp.sqrt(jnp.asarray(covariance, dtype=jnp.float32))
        sample = mean + std * jax.random.normal(
            key,
            (
                number_of_active_heliostats,
                self.number_of_rays,
                number_of_points,
                2,
            ),
            dtype=jnp.float32,
        )
        return sample[..., 0], sample[..., 1]
