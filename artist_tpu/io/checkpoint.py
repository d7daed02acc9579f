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


class CheckpointManager:
    """Thin orbax wrapper for periodic save/restore of training state.

    Parameters
    ----------
    directory : path
        Checkpoint root (created if missing).
    max_to_keep : int
        Retained checkpoint count.
    per_process : bool
        Save from THIS process alone (``primary_host=None``). Required for
        per-rank checkpoints in multi-process runs: orbax's manager is
        otherwise a collective API (host 0 commits behind cross-process
        barriers), so per-rank managers on per-rank directories would
        deadlock or never commit non-zero ranks' state.
    """

    def __init__(
        self,
        directory: pathlib.Path | str,
        max_to_keep: int = 3,
        per_process: bool = False,
    ) -> None:
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        if per_process and jax.process_count() > 1:
            options = ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=None
                ),
            )
        self._manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: dict[str, Any], force: bool = False) -> bool:
        """Save a pytree of arrays under the given step number."""
        saved = self._manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if saved:
            log.info("Saved checkpoint at step %d to %s.", step, self.directory)
        return saved

    def restore(self, step: int | None = None) -> dict[str, Any] | None:
        """Restore the given (or latest) step; None when no checkpoint exists."""
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            return None
        # StandardRestore without a target returns the saved tree as nested
        # dicts of numpy arrays; callers re-attach structure via
        # optim.checkpointing.unpack_pytree (which validates leaf counts),
        # so orbax's "no target tree" caution is satisfied by construction.
        state = self._manager.restore(step, args=ocp.args.StandardRestore())
        log.info("Restored checkpoint step %d from %s.", step, self.directory)
        return state

    @property
    def latest_step(self) -> int | None:
        return self._manager.latest_step()

    def wait_until_finished(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.close()
