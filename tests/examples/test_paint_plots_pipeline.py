"""End-to-end test of the paint_plots pipeline on a synthetic PAINT layout.

reference: examples/paint_plots/INSTRUCTIONS.md execution order. The PAINT
directory structure is reconstructed from the repository's bundled AA39
test data; every script runs as a real subprocess in order and the final
artifacts (results JSON/npz + three PDFs) must exist.
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[2] / "examples" / "paint_plots"
FIELD_DATA = pathlib.Path("/root/reference/tests/data/field_data")


def _run(script: str, *arguments: str) -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, str(EXAMPLES / script), *arguments],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=EXAMPLES,
        env=env,
    )
    assert result.returncode == 0, (
        f"{script} failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}"
    )


@pytest.mark.slow
def test_paint_plots_pipeline_end_to_end(tmp_path):
    if not FIELD_DATA.exists():
        pytest.skip("reference field data not available")
    data = tmp_path / "data"
    results = tmp_path / "results"
    scenarios = tmp_path / "scenarios"
    plots = tmp_path / "plots"
    (data / "AA39" / "Properties").mkdir(parents=True)
    (data / "AA39" / "Calibration").mkdir(parents=True)
    shutil.copy(
        FIELD_DATA / "AA39-heliostat-properties.json",
        data / "AA39" / "Properties" / "AA39-heliostat-properties.json",
    )
    for index in (1, 2, 3):
        measurement = 100000 + index
        shutil.copy(
            FIELD_DATA / f"AA39-calibration-properties_{index}.json",
            data / "AA39" / "Calibration"
            / f"{measurement}-calibration-properties.json",
        )
        shutil.copy(
            FIELD_DATA / f"AA39-flux_{index}.png",
            data / "AA39" / "Calibration" / f"{measurement}-flux.png",
        )
    shutil.copy(
        FIELD_DATA / "tower-measurements.json",
        data / "WRI1030197-tower-measurements.json",
    )
    config = tmp_path / "config.yaml"
    config.write_text(
        f"""
data_dir: "{data}"
tower_file_name: "WRI1030197-tower-measurements.json"
scenarios_dir: "{scenarios}"
results_dir: "{results}"
plots_dir: "{plots}"
minimum_number_of_measurements: 3
maximum_number_of_heliostats_for_reconstruction: 5
excluded_heliostats_for_reconstruction: []
calibration_image_type: "flux"
heliostats_for_raytracing:
  AA39: 100001
number_of_points_to_plot: 100
random_seed: 7
"""
    )
    config_arguments = ("--config", str(config))

    _run("reconstruction_generate_viable_heliostats_list.py", *config_arguments)
    viable = json.loads((results / "viable_heliostats.json").read_text())
    assert [item["name"] for item in viable] == ["AA39"]
    assert len(viable[0]["calibrations"]) == 3

    _run("reconstruction_scenario.py", *config_arguments)
    assert (scenarios / "reconstruction.h5").exists()

    _run("reconstruction_generate_results.py", *config_arguments, "--max_epoch", "3")
    reconstruction = json.loads(
        (results / "kinematics_reconstruction_results.json").read_text()
    )
    assert set(reconstruction["AA39"]) == {"UTIS", "HeliOS", "Position"}
    assert reconstruction["AA39"]["UTIS"] > 0

    _run("reconstruction_plot.py", *config_arguments)
    assert (plots / "reconstruction_error_distribution.pdf").exists()
    assert (plots / "reconstruction_error_distance.pdf").exists()

    _run("flux_prediction_scenario.py", *config_arguments)
    assert (scenarios / "flux_prediction_ideal.h5").exists()

    _run("flux_prediction_raytracing.py", *config_arguments)
    flux_results = dict(np.load(results / "flux_prediction_results.npz"))
    assert flux_results["AA39/ideal"].shape == (256, 256)
    assert flux_results["AA39/ideal"].sum() > 0
    assert flux_results["AA39/utis"].shape == (256, 256)

    _run(
        "flux_prediction_plot.py",
        str(results / "flux_prediction_results.npz"),
        str(plots),
    )
    assert (plots / "flux_prediction.pdf").exists()
