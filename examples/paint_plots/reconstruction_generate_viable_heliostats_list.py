"""Generate the list of viable heliostats for kinematics reconstruction.

Scans a PAINT data directory for heliostats with at least
``minimum_number_of_measurements`` calibration files whose focal-spot
section carries BOTH the UTIS and HeliOS centroids, and a matching flux
image per file. The sorted list (name, calibration paths, flux image paths,
properties path) lands in ``results_dir/viable_heliostats.json``.

reference: examples/paint_plots/reconstruction_generate_viable_heliostats_list.py
(the PAINT naming conventions are inlined - <name>/Properties/
<name>-heliostat-properties.json and <name>/Calibration/
<id>-calibration-properties.json with <id>-<image_type>.png - so no
``paint`` package import is needed to walk an existing download).

Usage:
    python reconstruction_generate_viable_heliostats_list.py [--config C]
        [--data_dir D] [--results_dir R] [--minimum_number_of_measurements N]
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

HELIOSTAT_NAME_PATTERN = re.compile(r"^[A-Z]{2}[0-9]{2}$")
CALIBRATION_SUFFIX = "-calibration-properties.json"
FOCAL_SPOT_KEY = "focal_spot"
UTIS_KEY = "UTIS"
HELIOS_KEY = "HeliOS"


def find_viable_heliostats(
    data_directory: pathlib.Path,
    minimum_number_of_measurements: int,
    maximum_number_of_heliostats: int,
    excluded_heliostats: set[str],
    calibration_image_type: str,
) -> list[dict]:
    """Heliostats with enough dual-centroid calibration files + flux images."""
    found = []
    heliostat_dirs = sorted(
        d
        for d in data_directory.iterdir()
        if d.is_dir() and HELIOSTAT_NAME_PATTERN.match(d.name)
    )
    for heliostat_dir in heliostat_dirs:
        name = heliostat_dir.name
        if name in excluded_heliostats:
            print(f"Skipping excluded heliostat: {name}")
            continue
        properties_path = (
            heliostat_dir / "Properties" / f"{name}-heliostat-properties.json"
        )
        calibration_dir = heliostat_dir / "Calibration"
        if not calibration_dir.exists():
            continue

        calibrations, flux_images = [], []
        for calibration_path in sorted(
            calibration_dir.glob(f"*{CALIBRATION_SUFFIX}")
        ):
            try:
                with calibration_path.open() as f:
                    focal_spots = json.load(f).get(FOCAL_SPOT_KEY, {})
                if UTIS_KEY in focal_spots and HELIOS_KEY in focal_spots:
                    stem = calibration_path.name.removesuffix(CALIBRATION_SUFFIX)
                    image_path = (
                        calibration_dir / f"{stem}-{calibration_image_type}.png"
                    )
                    if image_path.exists():
                        calibrations.append(calibration_path)
                        flux_images.append(image_path)
            except Exception as error:  # noqa: BLE001 - skip corrupt files
                print(f"Warning: skipping {calibration_path}: {error}")

        if len(calibrations) >= minimum_number_of_measurements:
            found.append(
                {
                    "name": name,
                    "calibrations": [
                        str(p) for p in calibrations[:minimum_number_of_measurements]
                    ],
                    "flux_images": [
                        str(p) for p in flux_images[:minimum_number_of_measurements]
                    ],
                    "properties": str(properties_path),
                }
            )
            print(f"Added heliostat {name} ({len(found)} so far).")
        if len(found) >= maximum_number_of_heliostats:
            break
    return sorted(found, key=lambda item: item["name"])


def main() -> None:
    args = load_config(
        [
            "data_dir",
            "results_dir",
            "minimum_number_of_measurements",
            "maximum_number_of_heliostats_for_reconstruction",
            "excluded_heliostats_for_reconstruction",
            "calibration_image_type",
        ],
        description=__doc__.splitlines()[0],
    )
    viable = find_viable_heliostats(
        data_directory=args.data_dir,
        minimum_number_of_measurements=int(args.minimum_number_of_measurements),
        maximum_number_of_heliostats=int(
            args.maximum_number_of_heliostats_for_reconstruction
        ),
        excluded_heliostats=set(args.excluded_heliostats_for_reconstruction or []),
        calibration_image_type=args.calibration_image_type,
    )
    args.results_dir.mkdir(parents=True, exist_ok=True)
    output = args.results_dir / "viable_heliostats.json"
    with open(output, "w") as f:
        json.dump(viable, f, indent=1)
    print(f"{len(viable)} viable heliostats saved to {output}")


if __name__ == "__main__":
    main()
