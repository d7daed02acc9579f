"""Plant-scale aim-point optimization on a single chip.

Demonstrates the round-5 plant-scale path: a Juelich-class synthetic field
(default 4,000 heliostats) optimized by :class:`AimPointOptimizer` with

- ``heliostat_chunk``: heliostat-axis microbatching (gradient accumulation
  under a remat scan, :mod:`artist_tpu.parallel.microbatch`) so the
  O(heliostats x points) backward buffers fit one 16 GB chip;
- ``blocking_candidates``: the candidate-compacted Pallas blocking pair
  kernels (O(rays x K) instead of O(rays x field)).

Blocking stays field-wide and exact across chunks (two-phase corner
extraction; see docs/performance.md, "Plant scale").

Run small on CPU (smoke)::

    JAX_PLATFORMS=cpu PLANT_HELIOSTATS=16 PLANT_CHUNK=8 python examples/plant_scale_aim_points.py

Run at plant scale on a TPU chip::

    PLANT_HELIOSTATS=4000 PLANT_CHUNK=500 python examples/plant_scale_aim_points.py

The reference cannot run this workload on one accelerator: its optimizer
materializes the full field's backward (no sample-axis accumulation;
reference: artist/optim/aim_point_optimizer.py:523-679 traces all active
heliostats in one graph).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit CPU request: this container's sitecustomize force-
# selects the tunneled TPU backend IN-CONFIG at import, so the env var
# alone is not enough (same pattern as bench.py / tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from artist_tpu.flux.bitmap import trapezoid_distribution
from artist_tpu.optim.aim_point_optimizer import AimPointOptimizer
from artist_tpu.scenario.synthetic import make_synthetic_scenario
from artist_tpu.util import constants, enable_compilation_cache, set_logger_config

HELIOSTATS = int(os.environ.get("PLANT_HELIOSTATS", 4000))
CHUNK = int(os.environ.get("PLANT_CHUNK", 500))
RAYS = int(os.environ.get("PLANT_RAYS", 2))
POINTS = int(os.environ.get("PLANT_SURFACE_POINTS", 50))
EPOCHS = int(os.environ.get("PLANT_EPOCHS", 10))
RESOLUTION = (256, 256)


def main() -> None:
    set_logger_config()
    enable_compilation_cache()
    scenario = make_synthetic_scenario(
        number_of_heliostats=HELIOSTATS,
        number_of_surface_points_per_facet=(POINTS, POINTS),
        number_of_rays=RAYS,
    )
    horizontal = np.asarray(trapezoid_distribution(RESOLUTION[0], 30, 60))
    vertical = np.asarray(trapezoid_distribution(RESOLUTION[1], 30, 60))
    ground_truth = np.outer(vertical, horizontal)

    optimizer = AimPointOptimizer(
        scenario=scenario,
        optimization_configuration={
            constants.optimization: {
                constants.initial_learning_rate: 1e-3,
                constants.tolerance: 0.0,
                constants.max_epoch: EPOCHS,
                constants.batch_size: 100,
                constants.log_step: 1,
                constants.early_stopping_delta: 1.0,
                constants.early_stopping_patience: 50,
                constants.early_stopping_window: 50,
            },
            constants.scheduler: {
                constants.scheduler_type: constants.exponential,
                constants.gamma: 0.99,
            },
            constants.constraints: {
                constants.rho_flux_integral: 1.0,
                constants.rho_intercept: 1.0,
                constants.rho_local_flux: 1.0,
                constants.max_flux_density: 1e6,
            },
        },
        incident_ray_direction=np.array([0.0, 1.0, 0.0, 0.0], np.float32),
        target_area_index=0,
        ground_truth=ground_truth,
        dni=1000.0,
        bitmap_resolution=RESOLUTION,
        blocking_candidates=16,
        heliostat_chunk=CHUNK if HELIOSTATS > CHUNK else None,
    )
    final_loss, history, intercepts, on_targets, blockings = optimizer.optimize(
        "kl_divergence"
    )
    print(
        f"{HELIOSTATS} heliostats, chunk {CHUNK}: final loss {final_loss:.4f}, "
        f"history {['%.4f' % value for value in history['total_loss']]}, "
        f"mean intercept {float(np.mean(intercepts)):.3f}, "
        f"mean blocking factor {float(np.mean(blockings)):.4f}"
    )


if __name__ == "__main__":
    main()
