"""Loss zoo for the inverse problems.

reference: artist/optim/loss.py:124-549. Pure functions (no Loss class
hierarchy); each returns a per-sample loss vector ``[M]``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from artist_tpu.field.solar_tower import SolarTower
from artist_tpu.flux.bitmap import get_center_of_mass
from artist_tpu.geometry.coordinates import bitmap_coordinates_to_target_coordinates
from artist_tpu.geometry.transforms import _normalize


def vector_loss(
    prediction: jnp.ndarray,
    ground_truth: jnp.ndarray,
    reduction_dimensions: tuple[int, ...] = (1,),
) -> jnp.ndarray:
    """Summed MSE along the given dims. reference: artist/optim/loss.py:60-121."""
    return jnp.sum((prediction - ground_truth) ** 2, axis=reduction_dimensions)


def pixel_loss(prediction: jnp.ndarray, ground_truth: jnp.ndarray) -> jnp.ndarray:
    """Pixel-wise MSE normalized by total ground-truth intensity.

    reference: artist/optim/loss.py:251-319.
    """
    per_pixel = (prediction - ground_truth) ** 2
    return jnp.sum(per_pixel, axis=(1, 2)) / jnp.sum(ground_truth, axis=(1, 2))


def kl_divergence_loss(
    prediction: jnp.ndarray, ground_truth: jnp.ndarray
) -> jnp.ndarray:
    """KL divergence of L1-normalized flux distributions, D(P || Q).

    torch KLDivLoss(log_target=True)(log Q, log P) = P * (log P - log Q).
    reference: artist/optim/loss.py:322-410.
    """
    eps = 1e-12

    def l1_normalize(x: jnp.ndarray) -> jnp.ndarray:
        norm = jnp.sum(jnp.abs(x), axis=(1, 2), keepdims=True)
        return x / jnp.maximum(norm, eps)

    p = l1_normalize(ground_truth)
    q = l1_normalize(prediction)
    log_p = jnp.log(p + eps)
    log_q = jnp.log(q + eps)
    return jnp.sum(p * (log_p - log_q), axis=(1, 2))


def focal_spot_loss(
    prediction_bitmaps: jnp.ndarray,
    ground_truth_focal_spots: jnp.ndarray,
    tower: SolarTower,
    target_area_indices: jnp.ndarray,
    bitmap_resolution: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Euclidean distance between predicted and measured focal spots.

    The prediction's center of mass is mapped to world coordinates on the
    target surface (planar or cylindrical) and compared to the ground-truth
    focal spot coordinates. reference: artist/optim/loss.py:124-248 (the
    reference recomputes the ground-truth center of mass from bitmaps when
    given bitmaps; here the measured spot is passed directly as done by the
    kinematics reconstructor).

    Parameters
    ----------
    prediction_bitmaps : jnp.ndarray
        Shape ``[M, H, W]``.
    ground_truth_focal_spots : jnp.ndarray
        World coordinates. Shape ``[M, 4]``.
    """
    if bitmap_resolution is None:
        bitmap_resolution = (prediction_bitmaps.shape[2], prediction_bitmaps.shape[1])
    centers = get_center_of_mass(prediction_bitmaps)
    predicted = bitmap_coordinates_to_target_coordinates(
        centers, bitmap_resolution, tower, target_area_indices
    )
    return jnp.linalg.norm(predicted[:, :3] - ground_truth_focal_spots[:, :3], axis=1)


def angle_loss(prediction: jnp.ndarray, ground_truth: jnp.ndarray) -> jnp.ndarray:
    """Angular distance (arccos of the normalized dot product).

    reference: artist/optim/loss.py:413-459.
    """
    p = _normalize(prediction[:, :3])
    g = _normalize(ground_truth[:, :3])
    return jnp.arccos(jnp.clip(jnp.sum(p * g, axis=-1), -1.0, 1.0))


def cosine_similarity_loss(
    prediction: jnp.ndarray, ground_truth: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """1 - cosine similarity. reference: artist/optim/loss.py:462-506."""
    dot = jnp.sum(prediction * ground_truth, axis=-1)
    norms = jnp.linalg.norm(prediction, axis=-1) * jnp.linalg.norm(
        ground_truth, axis=-1
    )
    return 1.0 - dot / jnp.maximum(norms, eps)


def reduce_loss_per_sample(
    loss_per_sample: jnp.ndarray,
    number_of_samples_per_heliostat: int,
    reduction: Callable[[jnp.ndarray], jnp.ndarray] | str = "mean",
) -> jnp.ndarray:
    """Sample -> heliostat loss reduction (mean or median).

    reference: artist/optim/loss.py:509-549.
    """
    number_of_heliostats = loss_per_sample.size // number_of_samples_per_heliostat
    trimmed = loss_per_sample[: number_of_heliostats * number_of_samples_per_heliostat]
    grouped = trimmed.reshape(number_of_heliostats, number_of_samples_per_heliostat)
    if reduction == "mean":
        return jnp.mean(grouped, axis=1)
    if reduction == "median":
        # torch.median picks the lower of the two middle elements.
        sorted_losses = jnp.sort(grouped, axis=1)
        return sorted_losses[:, (number_of_samples_per_heliostat - 1) // 2]
    return reduction(grouped)
