"""Checkpoint/resume plumbing for the inverse-problem optimizers.

The reference has no training checkpoints - its persistence is scenario
HDF5 only (reference: artist/scenario/h5_scenario_generator.py:220; SURVEY
section 5 calls out orbax checkpointing as the "do better" item for long
reconstructions on preemptible TPU fleets). This module adapts the generic
orbax wrapper (:mod:`artist_tpu.io.checkpoint`) to the optimizers' epoch
loops: each loop periodically saves its FULL resume state - optimized
parameters, optax state, Augmented-Lagrangian multipliers and references,
scheduler / early-stopping state, loss histories and the epoch counter -
and restores it on restart, continuing the exact trajectory.

Pytrees with non-dict structure (optax states, tuples of per-group params)
are flattened to string-keyed leaf dicts for serialization and re-attached
to a freshly initialized template on restore, so the checkpoint format
never depends on optax internals.
"""

from __future__ import annotations

import logging
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from artist_tpu.io.checkpoint import CheckpointManager
from artist_tpu.optim import training

log = logging.getLogger("artist_tpu.optim")


def pack_pytree(tree: Any) -> dict[str, np.ndarray]:
    """Flatten an arbitrary pytree into a string-keyed dict of arrays."""
    leaves = jax.tree.leaves(tree)
    return {f"{index:04d}": np.asarray(leaf) for index, leaf in enumerate(leaves)}


def unpack_pytree(template: Any, packed: dict[str, Any]) -> Any:
    """Rebuild a pytree with ``template``'s structure from packed leaves."""
    treedef = jax.tree.structure(template)
    template_leaves = jax.tree.leaves(template)
    if len(template_leaves) != len(packed):
        raise ValueError(
            f"Checkpoint has {len(packed)} leaves but the template expects "
            f"{len(template_leaves)} - the optimizer configuration changed "
            f"since the checkpoint was written."
        )
    # Numeric sort: beyond 9999 leaves the '%04d' keys grow a digit and
    # lexicographic order would silently permute leaves ('10000' < '2000').
    leaves = []
    for key, template_leaf in zip(sorted(packed, key=int), template_leaves):
        template_leaf = jnp.asarray(template_leaf)
        leaf = jnp.asarray(packed[key]).astype(template_leaf.dtype)
        if leaf.shape != template_leaf.shape:
            raise ValueError(
                f"Checkpoint leaf {key} has shape {leaf.shape} but the "
                f"template expects {template_leaf.shape} - the optimizer "
                f"configuration changed since the checkpoint was written."
            )
        leaves.append(leaf)
    return jax.tree.unflatten(treedef, leaves)


def scheduler_state(scheduler: Any) -> dict[str, np.ndarray]:
    """Snapshot a scheduler's mutable state (empty for stateless schedules)."""
    if isinstance(scheduler, training.ReduceOnPlateau):
        return {
            "learning_rate": np.float64(scheduler.learning_rate),
            "best": np.float64(scheduler.best),
            "num_bad_epochs": np.int64(scheduler.num_bad_epochs),
            "cooldown_counter": np.int64(scheduler.cooldown_counter),
        }
    # Stateless schedules (exponential/cyclic) are pure functions of the
    # epoch; a sentinel keeps the checkpoint pytree non-empty.
    return {"stateless": np.int64(1)}


def restore_scheduler(scheduler: Any, state: dict[str, Any]) -> None:
    if isinstance(scheduler, training.ReduceOnPlateau) and "learning_rate" in state:
        scheduler.learning_rate = float(state["learning_rate"])
        scheduler.best = float(state["best"])
        scheduler.num_bad_epochs = int(state["num_bad_epochs"])
        scheduler.cooldown_counter = int(state["cooldown_counter"])


def early_stopping_state(stopper: training.EarlyStopping) -> dict[str, np.ndarray]:
    return {
        "loss_history": np.asarray(list(stopper.loss_history), np.float64),
        "counter": np.int64(stopper.counter),
    }


def restore_early_stopping(
    stopper: training.EarlyStopping, state: dict[str, Any]
) -> None:
    stopper.loss_history.clear()
    stopper.loss_history.extend(np.asarray(state["loss_history"]).tolist())
    stopper.counter = int(state["counter"])


def pack_history(history: dict[str, list[float]] | list[float]) -> dict | np.ndarray:
    if isinstance(history, dict):
        return {key: np.asarray(value, np.float64) for key, value in history.items()}
    return np.asarray(history, np.float64)


def restore_history(
    history: dict[str, list[float]] | list[float], state: Any
) -> None:
    """Refill a live history container from its packed form, in place."""
    if isinstance(history, dict):
        for key in history:
            history[key].clear()
            history[key].extend(np.asarray(state[key]).tolist())
    else:
        history.clear()
        history.extend(np.asarray(state).tolist())


class LoopCheckpointer:
    """Periodic checkpointing of ONE optimization loop.

    Parameters
    ----------
    directory : path
        The user-facing checkpoint root (``checkpoint_dir`` of the
        optimizers).
    label : str
        Subdirectory for this loop (e.g. ``"surface_group_0"``) so several
        groups / phases share one root without colliding.
    every : int
        Save every ``every`` epochs (0 disables periodic saves).
    max_to_keep : int
        Retained checkpoints per loop.
    per_process : bool
        Local (non-collective) orbax saving - required for per-rank state in
        multi-process runs (see :class:`artist_tpu.io.checkpoint.CheckpointManager`).
    """

    def __init__(
        self,
        directory: pathlib.Path | str,
        label: str,
        every: int = 25,
        max_to_keep: int = 3,
        per_process: bool = False,
    ) -> None:
        self.every = int(every)
        self._manager = CheckpointManager(
            pathlib.Path(directory) / label,
            max_to_keep=max_to_keep,
            per_process=per_process,
        )

    def restore_latest(self) -> dict[str, Any] | None:
        """The latest saved state dict, or None for a fresh start."""
        return self._manager.restore()

    def should_save(self, epoch: int) -> bool:
        return self.every > 0 and epoch > 0 and epoch % self.every == 0

    def save(self, epoch: int, state: dict[str, Any]) -> None:
        state = dict(state, epoch=np.int64(epoch))
        self._manager.save(epoch, state)

    def finish(self) -> None:
        self._manager.wait_until_finished()
        self._manager.close()
