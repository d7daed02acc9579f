"""Light source base definitions.

reference: artist/scene/light_source.py (ABC with number_of_rays,
get_distortions). In the functional TPU design a light source is a small
config dataclass plus a pure sampling function keyed by
``jax.random`` PRNG keys; :class:`artist_tpu.scene.sun.Sun` is the only
concrete model (matching the reference).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LightSource:
    """Common light-source configuration."""

    number_of_rays: int
