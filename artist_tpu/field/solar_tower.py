"""Solar tower with planar and cylindrical target areas, as a pytree.

TPU-native re-design of the reference SolarTower / TowerTargetAreas classes
(reference: artist/field/solar_tower.py:1-188,
artist/field/tower_target_areas_planar.py,
artist/field/tower_target_areas_cylindrical.py:100-193): one flat pytree
holding both target-area families as batched arrays. The global target
index orders planar areas first, then cylindrical ones
(reference: artist/field/solar_tower.py:115-130).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


@flax.struct.dataclass
class SolarTower:
    """All tower target areas of a scenario."""

    planar_centers: jnp.ndarray  # [Tp, 4]
    planar_normals: jnp.ndarray  # [Tp, 4]
    planar_dimensions: jnp.ndarray  # [Tp, 2] (width plane_e, height plane_u)

    cylindrical_centers: jnp.ndarray  # [Tc, 4]
    cylindrical_axes: jnp.ndarray  # [Tc, 4]
    cylindrical_normals: jnp.ndarray  # [Tc, 4]
    cylindrical_radii: jnp.ndarray  # [Tc]
    cylindrical_heights: jnp.ndarray  # [Tc]
    cylindrical_opening_angles: jnp.ndarray  # [Tc]

    planar_names: tuple = flax.struct.field(pytree_node=False, default=())
    cylindrical_names: tuple = flax.struct.field(pytree_node=False, default=())

    @property
    def number_of_planar_target_areas(self) -> int:
        return self.planar_centers.shape[0]

    @property
    def number_of_cylindrical_target_areas(self) -> int:
        return self.cylindrical_centers.shape[0]

    @property
    def number_of_target_areas(self) -> int:
        return self.number_of_planar_target_areas + self.number_of_cylindrical_target_areas

    @property
    def names(self) -> tuple:
        return self.planar_names + self.cylindrical_names

    @property
    def target_name_to_index(self) -> dict:
        """Global name -> index mapping (planar first).

        reference: artist/field/solar_tower.py:115-130.
        """
        return {name: i for i, name in enumerate(self.names)}


def get_centers_of_target_areas(
    tower: SolarTower, target_area_indices: jnp.ndarray
) -> jnp.ndarray:
    """Center coordinates of the indexed target areas.

    Planar centers are returned directly; cylindrical centers are offset
    outward along the surface normal by the radius (point on the curved
    surface facing the field). reference:
    artist/field/solar_tower.py:129-188.

    Parameters
    ----------
    target_area_indices : jnp.ndarray
        Global target indices. Shape ``[M]``.

    Returns
    -------
    jnp.ndarray
        Homogeneous center coordinates. Shape ``[M, 4]``.
    """
    n_planar = tower.number_of_planar_target_areas
    planar_mask = target_area_indices < n_planar

    centers = jnp.zeros((target_area_indices.shape[0], 4), dtype=jnp.float32)
    if n_planar > 0:
        p_idx = jnp.clip(target_area_indices, 0, n_planar - 1)
        centers = jnp.where(
            planar_mask[:, None], tower.planar_centers[p_idx], centers
        )
    if tower.number_of_cylindrical_target_areas > 0:
        c_idx = jnp.clip(
            target_area_indices - n_planar,
            0,
            tower.number_of_cylindrical_target_areas - 1,
        )
        cyl_centers = (
            tower.cylindrical_centers[c_idx]
            + tower.cylindrical_radii[c_idx][:, None] * tower.cylindrical_normals[c_idx]
        )
        centers = jnp.where(planar_mask[:, None], centers, cyl_centers)
    return centers.at[:, 3].set(1.0)
