"""Select the viable heliostats for the field optimizations.

reference: examples/field_optimizations/generate_viable_heliostats_list.py:
filter the calibration metadata to heliostats with a minimum number of
valid measurements and write two lists - the "baseline" list (the
config-pinned heliostat set) and the "full field" list (every heliostat
clearing the threshold). Each entry carries the heliostat name, its
calibration-properties paths, the flux-image paths for kinematics and for
surface reconstruction (``flux`` vs ``flux-centered``), and the
heliostat-properties path - exactly the tuple shape
``artist_tpu.io.calibration.PaintCalibrationDataParser`` consumes.

Usage:
    python examples/field_optimizations/generate_viable_heliostats_list.py \
        [config.yaml]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import csv
import json
import pathlib
import sys
from collections import defaultdict

from generate_scenarios import load_config


def _select(
    rows: list[dict],
    heliostat_names: list[str] | None,
    minimum_number_of_measurements: int,
    maximum_number_of_measurements: int,
    kinematics_image_type: str,
    surface_image_type: str,
    excluded: set[str],
) -> list[list]:
    """Per-heliostat calibration selection (reference: find_calibration_data).

    With ``heliostat_names`` the selection is restricted to those names
    (baseline case); otherwise every heliostat with enough measurements
    qualifies (full-field case). Rows missing either required image type
    are dropped as invalid measurements.
    """
    image_column = {"flux": "Flux", "flux-centered": "FluxCentered"}
    by_heliostat: dict[str, list[dict]] = defaultdict(list)
    for row in rows:
        if row["HeliostatId"] in excluded:
            continue
        if heliostat_names is not None and row["HeliostatId"] not in heliostat_names:
            continue
        if not row[image_column[kinematics_image_type]]:
            continue
        if not row[image_column[surface_image_type]]:
            continue
        by_heliostat[row["HeliostatId"]].append(row)

    viable = []
    for heliostat, entries in sorted(by_heliostat.items()):
        if len(entries) < minimum_number_of_measurements:
            continue
        # The reference picks the entries closest in time to a reference
        # date; without STAC datetimes the deterministic fallback is the
        # calibration-id order.
        entries = sorted(entries, key=lambda r: (r["DateTime"], r["CalibrationId"]))
        entries = entries[:maximum_number_of_measurements]
        viable.append(
            [
                heliostat,
                [r["CalibrationProperties"] for r in entries],
                [r[image_column[kinematics_image_type]] for r in entries],
                [r[image_column[surface_image_type]] for r in entries],
                entries[0]["HeliostatProperties"],
            ]
        )
    return viable


def generate_lists(config: dict) -> tuple[pathlib.Path, pathlib.Path]:
    metadata_root = pathlib.Path(
        config.get("metadata_root", config.get("results_dir", "."))
    )
    metadata_file = metadata_root / "metadata" / "calibration_metadata.csv"
    if not metadata_file.exists():
        raise SystemExit(
            f"{metadata_file} not found - run download_metadata.py first."
        )
    with open(metadata_file, newline="", encoding="utf-8") as handle:
        rows = list(csv.DictReader(handle))

    results_dir = pathlib.Path(config["results_dir"])
    results_dir.mkdir(parents=True, exist_ok=True)
    minimum = int(config.get("minimum_number_of_measurements", 1))
    maximum = int(config.get("maximum_number_of_measurements", 20))
    kinematics_type = config.get("kinematics_reconstruction_image_type", "flux-centered")
    surface_type = config.get("surface_reconstruction_image_type", "flux-centered")
    excluded = set(config.get("excluded_heliostats_for_reconstruction", []) or [])

    baseline = _select(
        rows,
        list(config.get("heliostats", [])) or None,
        minimum,
        maximum,
        kinematics_type,
        surface_type,
        excluded,
    )
    full_field = _select(
        rows, None, minimum, maximum, kinematics_type, surface_type, excluded
    )

    baseline_path = results_dir / "viable_heliostats_baseline.json"
    full_field_path = results_dir / "viable_heliostats_full_field.json"
    for path, data in ((baseline_path, baseline), (full_field_path, full_field)):
        with open(path, "w", encoding="utf-8") as handle:
            json.dump(data, handle, indent=2)
        print(f"Wrote {len(data)} viable heliostats to {path}")
    return baseline_path, full_field_path


if __name__ == "__main__":
    generate_lists(load_config(sys.argv))
