"""Predicted-vs-measured flux plot on PAINT calibration data.

reference: examples/paint_plots/{flux_prediction_scenario.py,
flux_prediction_raytracing.py, flux_prediction_plot.py} (condensed): build a
scenario from PAINT files, align each calibration sample with its MEASURED
motor positions, trace rays, crop the prediction around its center of mass
(the PAINT flux-centered images are UTIS-centered), and plot prediction
against measurement.

Usage:
    python examples/paint_plots/flux_prediction_plot.py [data_dir] [heliostat]
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

# The container's sitecustomize may force-select a TPU backend in-config,
# overriding the JAX_PLATFORMS env var; honor an explicit CPU request.
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from artist_tpu.field import heliostat_group as hg
from artist_tpu.flux.bitmap import crop_flux_distributions_around_center
from artist_tpu.io.calibration import PaintCalibrationDataParser
from artist_tpu.io.paint_scenario_parser import (
    extract_paint_heliostats_ideal_surface,
    extract_paint_tower_measurements,
)
from artist_tpu.raytracing import RenderConfig, trace_rays
from artist_tpu.scenario import load_scenario_from_hdf5
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator
from artist_tpu.util.config import LightSourceConfig, LightSourceListConfig
from artist_tpu.util.logging_utils import set_logger_config

RESOLUTION = (256, 256)


def build_scenario(data_dir: pathlib.Path, heliostat: str) -> pathlib.Path:
    power_plant, planar_targets, cylindrical_targets = (
        extract_paint_tower_measurements(data_dir / "tower-measurements.json")
    )
    heliostats, prototype = extract_paint_heliostats_ideal_surface(
        paths=[(heliostat, data_dir / f"{heliostat}-heliostat-properties.json")],
        power_plant_position=power_plant.power_plant_position,
        number_of_nurbs_control_points=(7, 7),
    )
    light_sources = LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(light_source_key="sun_1", number_of_rays=120)
        ]
    )
    scenario_path = pathlib.Path("/tmp/artist_tpu_examples/paint_plots_scenario.h5")
    scenario_path.parent.mkdir(parents=True, exist_ok=True)
    H5ScenarioGenerator(
        file_path=scenario_path,
        power_plant_config=power_plant,
        target_area_list_planar_config=planar_targets,
        target_area_list_cylindrical_config=cylindrical_targets,
        light_source_list_config=light_sources,
        heliostat_list_config=heliostats,
        prototype_config=prototype,
    ).generate_scenario()
    return scenario_path


def plot_from_results(results_file: pathlib.Path, plots_dir: pathlib.Path) -> None:
    """Measured / ideal / fitted comparison grid from the pipeline's results.

    reference: examples/paint_plots/flux_prediction_plot.py:50-136 - one row
    per heliostat, one column per source, each image max-normalized.
    """
    results = dict(np.load(results_file))
    names = sorted({key.split("/")[0] for key in results})
    columns = [("utis", "Measured (UTIS)"), ("ideal", "Ideal surface"),
               ("fitted", "Fitted surface")]
    fig, axes = plt.subplots(
        len(names), len(columns), figsize=(4 * len(columns), 4 * len(names)),
        squeeze=False,
    )
    for row, name in enumerate(names):
        for column, (key, title) in enumerate(columns):
            axis = axes[row][column]
            image = results.get(f"{name}/{key}")
            if image is None:
                axis.axis("off")
                continue
            peak = image.max() or 1.0
            axis.imshow(image / peak, cmap="inferno")
            axis.set_title(f"{name}: {title}")
            axis.set_xticks([])
            axis.set_yticks([])
    fig.tight_layout()
    plots_dir.mkdir(parents=True, exist_ok=True)
    output = plots_dir / "flux_prediction.pdf"
    fig.savefig(output, dpi=300, bbox_inches="tight")
    print(f"plot written to {output}")


def main() -> None:
    set_logger_config()
    # Pipeline mode: plot the results file written by
    # flux_prediction_raytracing.py when it exists.
    if len(sys.argv) > 1 and sys.argv[1].endswith(".npz"):
        results_file = pathlib.Path(sys.argv[1])
        plots_dir = pathlib.Path(
            sys.argv[2] if len(sys.argv) > 2 else results_file.parent / "plots"
        )
        plot_from_results(results_file, plots_dir)
        return

    data_dir = pathlib.Path(
        sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/data/field_data"
    )
    heliostat = sys.argv[2] if len(sys.argv) > 2 else "AA39"

    scenario = load_scenario_from_hdf5(
        build_scenario(data_dir, heliostat),
        number_of_surface_points_per_facet=(50, 50),
    )
    group = scenario.heliostat_groups[0]
    tower = scenario.solar_tower
    sun = scenario.light_sources[0]

    properties = sorted(data_dir.glob(f"{heliostat}-calibration-properties_*.json"))
    fluxes = [
        data_dir / f"{heliostat}-flux-centered_{p.stem.rsplit('_', 1)[-1]}.png"
        for p in properties
    ]
    pairs = [(p, f) for p, f in zip(properties, fluxes) if f.exists()]
    data = PaintCalibrationDataParser().parse_data_for_reconstruction(
        heliostat_data_mapping=[
            (heliostat, [p for p, _ in pairs], [f for _, f in pairs])
        ],
        heliostat_names=group.names,
        target_name_to_index=tower.target_name_to_index,
        power_plant_position=scenario.power_plant_position,
        bitmap_resolution=RESOLUTION,
    )

    # Align every calibration sample with its measured motor positions.
    active = hg.gather_active(
        group, hg.active_indices_from_mask(data.active_heliostats_mask)
    )
    points, normals, _orientations = hg.align_surfaces_with_motor_positions(
        active, jnp.asarray(data.motor_positions)
    )
    distortions_u, distortions_e = sun.get_distortions(
        jax.random.PRNGKey(7), points.shape[1], points.shape[0]
    )
    flux, intercept, _on_target, _blocking = trace_rays(
        tower=tower,
        aligned_surface_points=points,
        aligned_surface_normals=normals,
        incident_ray_directions=jnp.asarray(data.incident_ray_directions),
        target_area_indices=jnp.asarray(data.target_area_indices),
        distortions_u=distortions_u,
        distortions_e=distortions_e,
        config=RenderConfig(bitmap_resolution=RESOLUTION),
    )
    predicted = crop_flux_distributions_around_center(
        flux, tower, jnp.asarray(data.target_area_indices)
    )

    samples = predicted.shape[0]
    fig, axes = plt.subplots(2, samples, figsize=(4 * samples, 8), squeeze=False)
    for s in range(samples):
        axes[0][s].imshow(np.asarray(predicted[s]), cmap="inferno")
        axes[0][s].set_title(f"predicted {s} (intercept {float(intercept[s]):.2f})")
        axes[1][s].imshow(np.asarray(data.flux_measured[s]), cmap="inferno")
        axes[1][s].set_title(f"measured {s}")
    fig.suptitle(f"Flux prediction for {heliostat}")
    fig.tight_layout()
    output = pathlib.Path("/tmp/artist_tpu_examples/flux_prediction.png")
    output.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output, dpi=150)
    print(f"plot written to {output}")


if __name__ == "__main__":
    main()
