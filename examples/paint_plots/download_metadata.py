"""Download the PAINT calibration metadata CSV via the PAINT STAC client.

Requires the ``paint`` package and network access; both are optional for
this repository (the rest of the pipeline only needs an existing download),
so the script exits with instructions when unavailable.

reference: examples/paint_plots/download_metadata.py.

Usage:
    python download_metadata.py [--config C] [--metadata_root M]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402


def main() -> None:
    args = load_config(
        ["metadata_root", "metadata_file_name"],
        description=__doc__.splitlines()[0],
    )
    try:
        from paint.data.stac_client import StacClient
    except ImportError:
        sys.exit(
            "The 'paint' package is not installed. Install it (pip install "
            "paint-csp) with network access, or place an existing metadata "
            f"CSV at {args.metadata_root / 'metadata' / args.metadata_file_name}."
        )
    client = StacClient(output_dir=args.metadata_root / "metadata")
    client.get_heliostat_metadata(heliostats=None)
    print(f"Metadata saved under {args.metadata_root / 'metadata'}")


if __name__ == "__main__":
    main()
