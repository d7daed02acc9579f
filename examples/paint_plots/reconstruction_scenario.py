"""Generate the HDF5 scenario for the kinematics reconstruction plots.

Builds an ideal-surface scenario from the tower measurements and the
heliostat properties of every viable heliostat (the list from
``reconstruction_generate_viable_heliostats_list.py``).

reference: examples/paint_plots/reconstruction_scenario.py.

Usage:
    python reconstruction_scenario.py [--config C] [--data_dir D]
        [--tower_file_name T] [--results_dir R] [--scenarios_dir S]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

from artist_tpu.io.paint_scenario_parser import (  # noqa: E402
    extract_paint_heliostats_ideal_surface,
    extract_paint_tower_measurements,
)
from artist_tpu.scenario.h5_generator import H5ScenarioGenerator  # noqa: E402
from artist_tpu.util import constants  # noqa: E402
from artist_tpu.util.config import (  # noqa: E402
    LightSourceConfig,
    LightSourceListConfig,
)
from artist_tpu.util.logging_utils import set_logger_config  # noqa: E402

set_logger_config()


def generate_reconstruction_scenario(
    scenario_path: pathlib.Path,
    tower_file: pathlib.Path,
    heliostat_files_list: list[tuple[str, pathlib.Path]],
) -> None:
    """Generate the reconstruction scenario HDF5 (ideal surfaces, 10 rays)."""
    (
        power_plant_config,
        target_area_list_planar_config,
        target_area_list_cylindrical_config,
    ) = extract_paint_tower_measurements(tower_measurements_path=tower_file)

    light_source_list_config = LightSourceListConfig(
        light_source_list=[
            LightSourceConfig(
                light_source_key="sun",
                light_source_type=constants.sun_key,
                number_of_rays=10,
                distribution_type=constants.light_source_distribution_is_normal,
                mean=0.0,
                covariance=4.3681e-06,
            )
        ]
    )

    heliostat_list_config, prototype_config = (
        extract_paint_heliostats_ideal_surface(
            paths=heliostat_files_list,
            power_plant_position=power_plant_config.power_plant_position,
        )
    )

    H5ScenarioGenerator(
        file_path=scenario_path,
        power_plant_config=power_plant_config,
        target_area_list_planar_config=target_area_list_planar_config,
        target_area_list_cylindrical_config=target_area_list_cylindrical_config,
        light_source_list_config=light_source_list_config,
        prototype_config=prototype_config,
        heliostat_list_config=heliostat_list_config,
    ).generate_scenario()


def main() -> None:
    args = load_config(
        ["data_dir", "tower_file_name", "results_dir", "scenarios_dir"],
        description=__doc__.splitlines()[0],
    )
    viable_path = args.results_dir / "viable_heliostats.json"
    if not viable_path.exists():
        raise FileNotFoundError(
            f"The viable heliostat list at {viable_path} was not found; run "
            f"reconstruction_generate_viable_heliostats_list.py first."
        )
    with open(viable_path) as f:
        viable = json.load(f)
    heliostat_files_list = [
        (item["name"], pathlib.Path(item["properties"])) for item in viable
    ]
    args.scenarios_dir.mkdir(parents=True, exist_ok=True)
    scenario_path = args.scenarios_dir / "reconstruction.h5"
    generate_reconstruction_scenario(
        scenario_path=scenario_path,
        tower_file=args.data_dir / args.tower_file_name,
        heliostat_files_list=heliostat_files_list,
    )
    print(f"Reconstruction scenario saved to {scenario_path}")


if __name__ == "__main__":
    main()
