"""Download PAINT calibration/deflectometry/properties data + tower file.

Requires the ``paint`` package and network access; both are optional for
this repository (the rest of the pipeline only needs an existing download),
so the script exits with instructions when unavailable.

reference: examples/paint_plots/download_data.py (same STAC collections:
tower measurements, then per-heliostat calibration properties + flux
images, heliostat properties, and deflectometry files).

Usage:
    python download_data.py [--config C] [--data_dir D]
        [--metadata_root M] [--tower_file_name T]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402


def main() -> None:
    args = load_config(
        ["data_dir", "metadata_root", "metadata_file_name", "tower_file_name"],
        description=__doc__.splitlines()[0],
    )
    try:
        from paint.data.stac_client import StacClient
    except ImportError:
        sys.exit(
            "The 'paint' package is not installed. Install it (pip install "
            "paint-csp) with network access, or point data_dir at an "
            "existing PAINT download."
        )
    metadata_csv = args.metadata_root / "metadata" / args.metadata_file_name
    if not metadata_csv.exists():
        sys.exit(
            f"Metadata CSV not found at {metadata_csv}; run "
            f"download_metadata.py first."
        )

    client = StacClient(output_dir=args.data_dir)
    client.get_tower_measurements()

    import csv

    heliostats = set()
    with open(metadata_csv) as f:
        for row in csv.DictReader(f):
            name = row.get("HeliostatId") or row.get("heliostat_id")
            if name:
                heliostats.add(name)
    for name in sorted(heliostats):
        client.get_heliostat_data(
            heliostats=[name],
            collections=["calibration", "deflectometry", "properties"],
        )
    print(f"PAINT data saved under {args.data_dir}")


if __name__ == "__main__":
    main()
