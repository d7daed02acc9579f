"""Loss zoo for the inverse problems.

reference: artist/optim/loss.py:124-549. Pure functions (no Loss class
hierarchy); each returns a per-sample loss vector ``[M]``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

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
    ground_truth: jnp.ndarray,
    tower: SolarTower,
    target_area_indices: jnp.ndarray,
    bitmap_resolution: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Euclidean distance between predicted and measured focal spots.

    The prediction's center of mass is mapped to world coordinates on the
    target surface (planar or cylindrical) and compared to the ground truth.
    Like the reference (artist/optim/loss.py:124-248), ``ground_truth`` may
    be measured flux **bitmaps** ``[M, H, W]`` - their center of mass is then
    recomputed and mapped to world coordinates the same way - or
    pre-extracted focal-spot world coordinates ``[M, 4]`` (the kinematics
    reconstructor's alignment data path).

    Parameters
    ----------
    prediction_bitmaps : jnp.ndarray
        Shape ``[M, H, W]``.
    ground_truth : jnp.ndarray
        Measured flux bitmaps ``[M, H, W]`` or focal-spot world coordinates
        ``[M, 4]``.
    """
    if bitmap_resolution is None:
        bitmap_resolution = (prediction_bitmaps.shape[2], prediction_bitmaps.shape[1])
    centers = get_center_of_mass(prediction_bitmaps)
    predicted = bitmap_coordinates_to_target_coordinates(
        centers, bitmap_resolution, tower, target_area_indices
    )
    if ground_truth.ndim == 3:
        measured_centers = get_center_of_mass(ground_truth)
        measured = bitmap_coordinates_to_target_coordinates(
            measured_centers, bitmap_resolution, tower, target_area_indices
        )
    else:
        measured = ground_truth
    return jnp.linalg.norm(predicted[:, :3] - measured[:, :3], axis=1)


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
    """Sample -> heliostat loss reduction (mean or median), uniform counts.

    reference: artist/optim/loss.py:509-549. For per-heliostat sample counts
    that differ use :func:`reduce_loss_per_heliostat` instead.
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


def build_sample_index_matrix(
    sample_counts,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side helper: pad ragged per-heliostat sample blocks to a matrix.

    The per-sample arrays are ordered blocks (heliostat h owns samples
    ``[start_h, start_h + counts[h])``, reference:
    artist/io/paint_calibration_parser.py:172-313). Returns a gather matrix
    and validity mask with **static shapes** so the ragged reduction stays
    jit-compatible.

    Parameters
    ----------
    sample_counts : array-like
        Per-heliostat sample counts (zeros allowed). Shape ``[H]``. Rows are
        emitted for every heliostat in this array, including zero-count ones
        (their reduced loss is 0).

    Returns
    -------
    tuple of np.ndarray
        ``padded_indices`` int32 ``[H, max_count]`` (0-filled past each
        heliostat's count) and ``valid`` bool ``[H, max_count]``.
    """
    counts = np.asarray(sample_counts, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    max_count = max(1, int(counts.max()) if counts.size else 1)
    offsets = np.arange(max_count)[None, :]
    valid = offsets < counts[:, None]
    padded = np.where(valid, starts[:, None] + offsets, 0).astype(np.int32)
    return padded, valid


def reduce_loss_per_heliostat(
    loss_per_sample: jnp.ndarray,
    padded_sample_indices: jnp.ndarray,
    sample_valid: jnp.ndarray,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Sample -> heliostat loss reduction for ragged per-heliostat counts.

    Static-shape (jit-compatible) generalization of
    :func:`reduce_loss_per_sample`: per-heliostat sample blocks of different
    lengths are expressed as a padded gather matrix (built host-side by
    :func:`build_sample_index_matrix`). reference:
    artist/optim/loss.py:509-549 (which assumes uniform counts).

    Parameters
    ----------
    loss_per_sample : jnp.ndarray
        Shape ``[S]``.
    padded_sample_indices : jnp.ndarray
        int32 ``[H, max_count]`` gather matrix.
    sample_valid : jnp.ndarray
        bool ``[H, max_count]``; False marks padding.
    reduction : str
        ``"mean"`` or ``"median"`` (lower middle element, torch semantics).

    Returns
    -------
    jnp.ndarray
        Per-heliostat loss. Shape ``[H]``; 0 for heliostats with no samples.
    """
    grouped = jnp.take(loss_per_sample, padded_sample_indices, axis=0)
    counts = jnp.sum(sample_valid, axis=1)
    if reduction == "mean":
        total = jnp.sum(jnp.where(sample_valid, grouped, 0.0), axis=1)
        return total / jnp.maximum(counts, 1)
    if reduction == "median":
        sorted_losses = jnp.sort(jnp.where(sample_valid, grouped, jnp.inf), axis=1)
        middle = jnp.maximum((counts - 1) // 2, 0)
        picked = jnp.take_along_axis(sorted_losses, middle[:, None], axis=1)[:, 0]
        return jnp.where(counts > 0, picked, 0.0)
    raise ValueError(f"Unknown reduction: {reduction}")
