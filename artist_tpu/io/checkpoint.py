"""Training checkpoints via orbax.

The reference has no training checkpoints - persistence is scenario HDF5
only (reference: SURVEY.md section 5, artist/scenario/h5_scenario_generator.py).
Long reconstructions on preemptible TPU fleets need restartable state, so
this module checkpoints the optimizable pytrees (NURBS control points,
kinematics deviations, actuator parameters, motor positions) plus optimizer
and Augmented-Lagrangian state.
"""

from __future__ import annotations

import logging
import os
import pathlib
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from artist_tpu.scenario.scenario import Scenario

log = logging.getLogger("artist_tpu.io")


def scenario_optimizable_state(scenario: Scenario) -> dict[str, Any]:
    """Extract the optimizable pytrees of every heliostat group."""
    return {
        f"group_{index}": {
            "nurbs_control_points": group.nurbs_control_points,
            "translation_deviations": group.translation_deviations,
            "rotation_deviations": group.rotation_deviations,
            "actuator_optimizable": group.actuator_optimizable,
            "motor_positions": group.motor_positions,
        }
        for index, group in enumerate(scenario.heliostat_groups)
    }


def apply_optimizable_state(
    scenario: Scenario, state: dict[str, Any]
) -> Scenario:
    """Write restored optimizable pytrees back into the scenario groups."""
    for index, group in enumerate(scenario.heliostat_groups):
        group_state = state[f"group_{index}"]
        replacements = {
            key: jax.numpy.asarray(value)
            for key, value in group_state.items()
            if np.asarray(value).size
            or np.asarray(getattr(group, key)).size == 0
        }
        scenario.heliostat_groups[index] = group.replace(**replacements)
    return scenario


_KEY_SEPARATOR = "||"


def _flatten_state(state: dict[str, Any], prefix: str = "") -> dict[str, Any]:
    flat: dict[str, Any] = {}
    for key, value in state.items():
        path = f"{prefix}{_KEY_SEPARATOR}{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(_flatten_state(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _unflatten_state(flat: dict[str, Any]) -> dict[str, Any]:
    state: dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split(_KEY_SEPARATOR)
        node = state
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return state


class _LocalNpzBackend:
    """Process-local checkpoint backend: nested numpy dicts as ``.npz``.

    Used for per-rank state in multi-process runs. Orbax is the wrong tool
    there even with ``primary_host=None``: measured on a real 2-process
    run, non-primary ranks finalized their step directories (the
    ``_CHECKPOINT_METADATA`` landed) while the pytree item stayed EMPTY -
    host numpy arrays are only written by the primary host. This backend
    has no cross-process coordination at all: one ``step.npz`` per save,
    written to a temp name and atomically renamed (a torn write can never
    be taken for a committed checkpoint), numeric-sorted step discovery,
    ``max_to_keep`` pruning.
    """

    def __init__(self, directory: pathlib.Path, max_to_keep: int) -> None:
        self.directory = directory
        self.max_to_keep = max_to_keep

    def _steps(self) -> list[int]:
        return sorted(
            int(path.stem)
            for path in self.directory.glob("*.npz")
            if path.stem.isdigit()
        )

    def save(self, step: int, state: dict[str, Any]) -> bool:
        final = self.directory / f"{step}.npz"
        temporary = self.directory / f"tmp_{os.getpid()}_{step}.npz"
        with open(temporary, "wb") as handle:
            np.savez(handle, **_flatten_state(state))
        temporary.replace(final)
        for stale in self._steps()[: -self.max_to_keep or None]:
            (self.directory / f"{stale}.npz").unlink(missing_ok=True)
        return True

    def latest_step(self) -> int | None:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, step: int) -> dict[str, Any] | None:
        path = self.directory / f"{step}.npz"
        if not path.exists():
            return None
        with np.load(path) as archive:
            return _unflatten_state({key: archive[key] for key in archive.files})


class CheckpointManager:
    """Thin orbax wrapper for periodic save/restore of training state.

    Parameters
    ----------
    directory : path
        Checkpoint root (created if missing).
    max_to_keep : int
        Retained checkpoint count.
    per_process : bool
        Save from THIS process alone. Required for per-rank checkpoints in
        multi-process runs: orbax's manager is a collective API (host 0
        commits behind cross-process barriers) and even its
        ``primary_host=None`` mode skips host-numpy payloads on
        non-primary ranks (verified empty item directories in a real
        2-process run), so per-rank state uses the fully local
        ``.npz`` backend instead. Single-process runs keep orbax either
        way (identical on-disk format to ``per_process=False``).
    """

    def __init__(
        self,
        directory: pathlib.Path | str,
        max_to_keep: int = 3,
        per_process: bool = False,
    ) -> None:
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._local: _LocalNpzBackend | None = None
        self._manager = None
        has_local_steps = any(
            path.stem.isdigit() for path in self.directory.glob("*.npz")
        )
        if (per_process and jax.process_count() > 1) or has_local_steps:
            # Also chosen when the directory already holds local-format
            # steps, so a single-process tool (or a resumed run with a
            # different world size... which per-rank state forbids anyway)
            # can read what a per-process run wrote.
            self._local = _LocalNpzBackend(self.directory, max_to_keep)
        else:
            self._manager = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )

    def save(self, step: int, state: dict[str, Any], force: bool = False) -> bool:
        """Save a pytree of arrays under the given step number."""
        if self._local is not None:
            saved = self._local.save(step, state)
        else:
            saved = self._manager.save(
                step, args=ocp.args.StandardSave(state), force=force
            )
        if saved:
            log.info("Saved checkpoint at step %d to %s.", step, self.directory)
        return saved

    def restore(self, step: int | None = None) -> dict[str, Any] | None:
        """Restore the given (or latest) step; None when no checkpoint exists."""
        if step is None:
            step = self.latest_step
        if step is None:
            return None
        if self._local is not None:
            state = self._local.restore(step)
        else:
            # StandardRestore without a target returns the saved tree as
            # nested dicts of numpy arrays; callers re-attach structure via
            # optim.checkpointing.unpack_pytree (which validates leaf
            # counts), so orbax's "no target tree" caution is satisfied by
            # construction.
            state = self._manager.restore(step, args=ocp.args.StandardRestore())
        log.info("Restored checkpoint step %d from %s.", step, self.directory)
        return state

    @property
    def latest_step(self) -> int | None:
        if self._local is not None:
            return self._local.latest_step()
        return self._manager.latest_step()

    def wait_until_finished(self) -> None:
        if self._manager is not None:
            self._manager.wait_until_finished()

    def close(self) -> None:
        if self._manager is not None:
            self._manager.close()

