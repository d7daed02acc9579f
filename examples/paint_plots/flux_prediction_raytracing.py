"""Trace flux predictions for the configured heliostats and save bitmaps.

For each scenario (ideal / fitted) every heliostat aligns to its
calibration measurement's FOCAL SPOT (the measured aim), traces 1000 rays,
and the predicted bitmap plus the measured UTIS flux image land in
``results_dir/flux_prediction_results.npz`` keyed
``<heliostat>/<ideal|fitted|utis>``.

reference: examples/paint_plots/flux_prediction_raytracing.py (the torch
checkpoint becomes an ``.npz``; alignment/tracing runs as one jitted call
per scenario).

Usage:
    python flux_prediction_raytracing.py [--config C] [--data_dir D]
        [--scenarios_dir S] [--results_dir R]
"""

from __future__ import annotations

import os
import pathlib
import sys

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from artist_tpu.field import heliostat_group as hg  # noqa: E402
from artist_tpu.io.calibration import (  # noqa: E402
    PaintCalibrationDataParser,
    load_flux_from_png,
)
from artist_tpu.raytracing import RenderConfig, trace_rays  # noqa: E402
from artist_tpu.scenario import load_scenario_from_hdf5  # noqa: E402
from artist_tpu.scene.sun import Sun  # noqa: E402
from artist_tpu.util.logging_utils import set_logger_config  # noqa: E402

set_logger_config()

RESOLUTION = (256, 256)
NUMBER_OF_RAYS = 1000


def generate_flux_images(
    scenario_path: pathlib.Path,
    heliostats: dict[str, int],
    data_directory: pathlib.Path,
    results: dict[str, np.ndarray],
    result_key: str,
) -> None:
    """Align to the measured focal spots, trace, store bitmaps in results."""
    scenario = load_scenario_from_hdf5(scenario_path)
    # reference: flux_prediction_raytracing.py:342 sets 1000 rays.
    sun = Sun(
        number_of_rays=NUMBER_OF_RAYS,
        distribution_parameters=scenario.light_sources[0].distribution_parameters,
    )

    heliostat_data_mapping = [
        (
            name,
            [
                data_directory
                / name
                / "Calibration"
                / f"{measurement}-calibration-properties.json"
            ],
            [],
        )
        for name, measurement in heliostats.items()
    ]

    for group in scenario.heliostat_groups:
        parser = PaintCalibrationDataParser()
        calibration = parser.parse_data_for_reconstruction(
            heliostat_data_mapping=heliostat_data_mapping,
            heliostat_names=group.names,
            target_name_to_index=scenario.solar_tower.target_name_to_index,
            power_plant_position=scenario.power_plant_position,
            bitmap_resolution=RESOLUTION,
        )
        if calibration.active_heliostats_mask.sum() == 0:
            continue
        active_indices = hg.active_indices_from_mask(
            calibration.active_heliostats_mask
        )
        active = hg.gather_active(group, jnp.asarray(active_indices))
        incident = jnp.asarray(calibration.incident_ray_directions, jnp.float32)
        targets = jnp.asarray(calibration.target_area_indices, jnp.int32)
        # Aim at the MEASURED focal spot (reference:
        # flux_prediction_raytracing.py:399-407 uses the calibration focal
        # spots as aim points).
        aim_points = jnp.asarray(calibration.focal_spots, jnp.float32)
        aligned_points, aligned_normals, _, _ = (
            hg.align_surfaces_with_incident_ray_directions(
                active, aim_points, incident
            )
        )
        distortions_u, distortions_e = sun.get_distortions(
            jax.random.PRNGKey(7),
            active.surface_points.shape[1],
            active_indices.shape[0],
        )
        flux, _, _, _ = trace_rays(
            tower=scenario.solar_tower,
            aligned_surface_points=aligned_points,
            aligned_surface_normals=aligned_normals,
            incident_ray_directions=incident,
            target_area_indices=targets,
            distortions_u=distortions_u,
            distortions_e=distortions_e,
            config=RenderConfig(bitmap_resolution=RESOLUTION),
        )
        flux = np.asarray(flux)
        active_names = [
            name
            for name, count in zip(group.names, calibration.active_heliostats_mask)
            for _ in range(int(count))
        ]
        for sample, name in enumerate(active_names):
            results[f"{name}/{result_key}"] = flux[sample]
            utis_key = f"{name}/utis"
            if utis_key not in results:
                image_path = (
                    data_directory
                    / name
                    / "Calibration"
                    / f"{heliostats[name]}-flux.png"
                )
                measured = load_flux_from_png(
                    [(name, [image_path])], (name,), RESOLUTION
                )
                results[utis_key] = np.asarray(measured)[0]


def main() -> None:
    args = load_config(
        ["data_dir", "scenarios_dir", "results_dir", "heliostats_for_raytracing"],
        description=__doc__.splitlines()[0],
    )
    heliostats = {
        name: int(measurement)
        for name, measurement in (args.heliostats_for_raytracing or {}).items()
    }
    if not heliostats:
        raise ValueError("heliostats_for_raytracing is empty.")
    args.results_dir.mkdir(parents=True, exist_ok=True)
    results_file = args.results_dir / "flux_prediction_results.npz"
    results: dict[str, np.ndarray] = {}
    if results_file.exists():
        results = dict(np.load(results_file))
    for stem in ("ideal", "fitted"):
        scenario_path = args.scenarios_dir / f"flux_prediction_{stem}.h5"
        if not scenario_path.exists():
            print(f"Skipping {stem}: {scenario_path} not found "
                  f"(run flux_prediction_scenario.py first).")
            continue
        generate_flux_images(
            scenario_path=scenario_path,
            heliostats=heliostats,
            data_directory=args.data_dir,
            results=results,
            result_key=stem,
        )
    np.savez(results_file, **results)
    print(f"Flux prediction results saved to {results_file}")


if __name__ == "__main__":
    main()
