"""Download PAINT calibration data for the field-optimization example.

reference: examples/field_optimizations/download_data.py, which pulls
tower measurements, heliostat properties, calibration JSONs, and flux PNGs
from the PAINT database (https://paint-database.org).

This environment has no network egress, so the script only VALIDATES a
pre-downloaded data directory (the reference's test fixtures under
``tests/data/field_data`` satisfy it). Point ``data_dir`` in ``config.yaml``
at a full PAINT download for production runs; the expected layout is flat:

    <data_dir>/tower-measurements.json
    <data_dir>/<heliostat>-heliostat-properties.json
    <data_dir>/<heliostat>-calibration-properties_<id>.json
    <data_dir>/<heliostat>-flux-centered_<id>.png
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import pathlib
import sys

from generate_scenarios import load_config


def validate(config: dict) -> list[str]:
    data_dir = pathlib.Path(config["data_dir"])
    problems = []
    if not (data_dir / config["tower_file_name"]).exists():
        problems.append(f"missing tower measurements in {data_dir}")
    for name in config["heliostats"]:
        if not (data_dir / f"{name}-heliostat-properties.json").exists():
            problems.append(f"missing heliostat properties for {name}")
        if not list(data_dir.glob(f"{name}-calibration-properties_*.json")):
            problems.append(f"missing calibration data for {name}")
    return problems


if __name__ == "__main__":
    problems = validate(load_config(sys.argv))
    if problems:
        for p in problems:
            print(f"ERROR: {p}")
        raise SystemExit(1)
    print("data directory complete")
