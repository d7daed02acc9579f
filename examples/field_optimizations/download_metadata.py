"""Build the calibration-metadata table consumed by
``generate_viable_heliostats_list.py``.

reference: examples/field_optimizations/download_metadata.py, which pulls
per-heliostat calibration metadata from the PAINT STAC API
(paint.data.stac_client.StacClient.get_heliostat_metadata). This
environment has no network egress, so the metadata table is built by
SCANNING a pre-downloaded data directory instead: every
``<name>-calibration-properties_<id>.json`` contributes one row with its
associated flux-image paths. Point ``data_dir`` at a full PAINT download
for production runs - the resulting CSV has the same role (and the same
filtering downstream) as the reference's STAC-downloaded metadata.

Usage:
    python examples/field_optimizations/download_metadata.py [config.yaml]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import csv
import json
import pathlib
import sys

from generate_scenarios import load_config


def build_metadata(config: dict) -> pathlib.Path:
    """Scan ``data_dir`` and write metadata/calibration_metadata.csv."""
    data_dir = pathlib.Path(config["data_dir"])
    metadata_root = pathlib.Path(
        config.get("metadata_root", config.get("results_dir", "."))
    )
    metadata_dir = metadata_root / "metadata"
    metadata_dir.mkdir(parents=True, exist_ok=True)
    out_path = metadata_dir / "calibration_metadata.csv"

    rows = []
    for properties_path in sorted(data_dir.glob("*-calibration-properties_*.json")):
        name, _, calibration_id = properties_path.stem.rpartition("_")
        heliostat = name.removesuffix("-calibration-properties")
        with open(properties_path, encoding="utf-8") as handle:
            properties = json.load(handle)
        flux = data_dir / f"{heliostat}-flux_{calibration_id}.png"
        flux_centered = data_dir / f"{heliostat}-flux-centered_{calibration_id}.png"
        rows.append(
            {
                "HeliostatId": heliostat,
                "CalibrationId": calibration_id,
                # PAINT STAC metadata carries acquisition datetimes; the
                # local fixtures do not, so the column is best-effort.
                "DateTime": properties.get("datetime", ""),
                "TargetName": properties.get("target_name", ""),
                "CalibrationProperties": str(properties_path),
                "Flux": str(flux) if flux.exists() else "",
                "FluxCentered": str(flux_centered) if flux_centered.exists() else "",
                "HeliostatProperties": str(
                    data_dir / f"{heliostat}-heliostat-properties.json"
                ),
            }
        )

    with open(out_path, "w", newline="", encoding="utf-8") as handle:
        writer = csv.DictWriter(handle, fieldnames=list(rows[0].keys()) if rows else [
            "HeliostatId", "CalibrationId", "DateTime", "TargetName",
            "CalibrationProperties", "Flux", "FluxCentered", "HeliostatProperties",
        ])
        writer.writeheader()
        writer.writerows(rows)
    print(f"Wrote metadata for {len(rows)} calibration measurements to {out_path}")
    return out_path


if __name__ == "__main__":
    build_metadata(load_config(sys.argv))
