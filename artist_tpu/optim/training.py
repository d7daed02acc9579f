"""Training utilities: LR schedules, early stopping, train/test split.

reference: artist/optim/training.py:13-367. Schedulers are optax schedules /
stateful equivalents of the torch schedulers used by the reference.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np
import optax

from artist_tpu.util import constants


def exponential_schedule(initial_learning_rate: float, parameters: dict) -> optax.Schedule:
    """lr * gamma^step. reference: artist/optim/training.py:13-34."""
    gamma = float(parameters[constants.gamma])
    return lambda step: initial_learning_rate * gamma**step


def cyclic_schedule(parameters: dict) -> optax.Schedule:
    """Triangular cyclic LR (torch CyclicLR semantics).

    reference: artist/optim/training.py:37-61.
    """
    base_lr = float(parameters[constants.lr_min])
    max_lr = float(parameters[constants.lr_max])
    step_size_up = int(parameters[constants.step_size_up])

    def schedule(step):
        import jax.numpy as jnp

        cycle = jnp.floor(1 + step / (2 * step_size_up))
        x = jnp.abs(step / step_size_up - 2 * cycle + 1)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1 - x)

    return schedule


class ReduceOnPlateau:
    """Stateful reduce-on-plateau LR controller (host-side, like torch's).

    reference: artist/optim/training.py:64-90. Call ``step(loss)`` per epoch
    and read ``learning_rate``.
    """

    def __init__(self, initial_learning_rate: float, parameters: dict) -> None:
        self.learning_rate = initial_learning_rate
        self.factor = float(parameters[constants.reduce_factor])
        self.patience = int(parameters[constants.patience])
        self.threshold = float(parameters[constants.threshold])
        self.cooldown = int(parameters[constants.cooldown])
        self.min_lr = float(parameters[constants.lr_min])
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def step(self, loss: float) -> float:
        if loss < self.best * (1 - self.threshold):
            self.best = loss
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.learning_rate = max(self.learning_rate * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad_epochs = 0
        return self.learning_rate


def make_scheduler(initial_learning_rate: float, scheduler_config: dict):
    """Scheduler factory keyed by config type string.

    Returns either an optax schedule (exponential/cyclic) or a
    ReduceOnPlateau controller. reference: artist/optim/training.py:13-90.
    """
    scheduler_type = scheduler_config[constants.scheduler_type]
    parameters = scheduler_config.get(constants.scheduler, scheduler_config)
    if scheduler_type == constants.exponential:
        return exponential_schedule(initial_learning_rate, parameters)
    if scheduler_type == constants.cyclic:
        return cyclic_schedule(parameters)
    if scheduler_type == constants.reduce_on_plateau:
        return ReduceOnPlateau(initial_learning_rate, parameters)
    raise ValueError(f"Unknown scheduler type: {scheduler_type}")


class EarlyStopping:
    """Windowed relative-improvement early stopping.

    reference: artist/optim/training.py:93-185.
    """

    def __init__(
        self,
        window_size: int = 10,
        patience: int = 20,
        min_improvement: float = 1e-4,
        relative: bool = True,
        eps: float = 1e-8,
    ) -> None:
        self.window_size = window_size
        self.patience = patience
        self.min_improvement = min_improvement
        self.relative = relative
        self.eps = eps
        self.loss_history: deque = deque(maxlen=window_size)
        self.counter = 0

    def step(self, loss: float) -> bool:
        self.loss_history.append(loss)
        if len(self.loss_history) < self.window_size:
            return False
        improvement = self.loss_history[0] - self.loss_history[-1]
        if self.relative:
            improvement /= max(abs(self.loss_history[0]), self.eps)
        if improvement > self.min_improvement:
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.patience


@dataclass
class TrainTestSplit:
    """Per-heliostat ordered train/test split of calibration data.

    reference: artist/optim/training.py:188-265.
    """

    flux_measured_train: np.ndarray
    focal_spots_measured_train: np.ndarray
    incident_ray_directions_train: np.ndarray
    motor_positions_train: np.ndarray
    target_area_indices_train: np.ndarray

    flux_measured_test: np.ndarray
    focal_spots_measured_test: np.ndarray
    incident_ray_directions_test: np.ndarray
    motor_positions_test: np.ndarray
    target_area_indices_test: np.ndarray

    active_heliostats_mask_train: np.ndarray
    active_heliostats_mask_test: np.ndarray

    train_indices: np.ndarray
    test_indices: np.ndarray

    number_of_train_samples: int
    number_of_test_samples: int
    number_of_samples_per_heliostat: int


def train_test_split(
    active_heliostats_mask: np.ndarray,
    flux_measured: np.ndarray,
    focal_spots_measured: np.ndarray,
    incident_ray_directions: np.ndarray,
    motor_positions: np.ndarray,
    target_area_indices: np.ndarray,
    test_fraction: float = 0.25,
) -> TrainTestSplit:
    """Split ordered per-heliostat sample blocks: train from the block start,
    test from the block end.

    reference: artist/optim/training.py:268-367 (host-side; numpy here). The
    reference assumes one uniform sample count per heliostat; real PAINT data
    is ragged (per-heliostat counts differ), so the split here walks the true
    block boundaries from ``active_heliostats_mask``: heliostat ``h`` with
    ``c_h`` samples contributes ``max(1, int(c_h * test_fraction))`` test
    samples from the end of its block and the rest to training. With uniform
    counts the result is identical to the reference's.

    The ``number_of_*_samples`` scalar fields hold the per-heliostat counts
    when they are uniform and the maximum otherwise; per-heliostat counts are
    the masks themselves.
    """
    active_heliostats_mask = np.asarray(active_heliostats_mask)
    counts = active_heliostats_mask.astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    test_counts = np.where(
        counts > 0, np.maximum(1, (counts * test_fraction).astype(np.int64)), 0
    )
    train_counts = counts - test_counts

    train_indices = np.concatenate(
        [
            np.arange(start, start + n_train)
            for start, n_train in zip(starts, train_counts)
        ]
        or [np.empty(0, np.int64)]
    )
    test_indices = np.concatenate(
        [
            np.arange(start + n_train, start + count)
            for start, n_train, count in zip(starts, train_counts, counts)
        ]
        or [np.empty(0, np.int64)]
    )

    mask_train = train_counts.astype(active_heliostats_mask.dtype)
    mask_test = test_counts.astype(active_heliostats_mask.dtype)

    active_counts = counts[counts > 0]
    samples_per_heliostat = int(active_counts.max()) if active_counts.size else 0
    number_of_train = int(train_counts.max()) if counts.size else 0
    number_of_test = int(test_counts.max()) if counts.size else 0

    def take(x, idx):
        return np.asarray(x)[idx]

    return TrainTestSplit(
        flux_measured_train=take(flux_measured, train_indices),
        focal_spots_measured_train=take(focal_spots_measured, train_indices),
        incident_ray_directions_train=take(incident_ray_directions, train_indices),
        motor_positions_train=take(motor_positions, train_indices),
        target_area_indices_train=take(target_area_indices, train_indices),
        flux_measured_test=take(flux_measured, test_indices),
        focal_spots_measured_test=take(focal_spots_measured, test_indices),
        incident_ray_directions_test=take(incident_ray_directions, test_indices),
        motor_positions_test=take(motor_positions, test_indices),
        target_area_indices_test=take(target_area_indices, test_indices),
        active_heliostats_mask_train=mask_train,
        active_heliostats_mask_test=mask_test,
        train_indices=train_indices,
        test_indices=test_indices,
        number_of_train_samples=number_of_train,
        number_of_test_samples=number_of_test,
        number_of_samples_per_heliostat=samples_per_heliostat,
    )
