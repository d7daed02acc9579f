"""Ray value type.

reference: artist/scene/rays.py (ray_directions [H, R, P, 4] +
ray_magnitudes [H, R, P], shape-validated).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Rays:
    """Bundle of scattered rays.

    Attributes
    ----------
    ray_directions : jnp.ndarray
        Shape ``[M, R, P, 4]``.
    ray_magnitudes : jnp.ndarray
        Shape ``[M, R, P]``.
    """

    ray_directions: jnp.ndarray
    ray_magnitudes: jnp.ndarray

    def __post_init__(self):
        if self.ray_directions.ndim >= 1 and self.ray_directions.shape[:-1] != self.ray_magnitudes.shape:
            raise ValueError(
                "ray_directions and ray_magnitudes shapes are inconsistent: "
                f"{self.ray_directions.shape} vs {self.ray_magnitudes.shape}"
            )
