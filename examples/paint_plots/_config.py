"""Shared configuration loading for the paint_plots scripts.

reference: every script under examples/paint_plots/ repeats ~70 lines of
YAML + argparse plumbing (e.g. reconstruction_scenario.py:112-232); here it
is factored once. Each script calls :func:`load_config` with the option
names it needs; YAML values seed the argparse defaults and command-line
flags override them, matching the reference's precedence.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import warnings

SCRIPT_DIR = pathlib.Path(__file__).resolve().parent
PROJECT_ROOT = SCRIPT_DIR.parent.parent
DEFAULT_CONFIG_PATH = SCRIPT_DIR / "paint_plot_config.yaml"

# The scripts run from this directory; make ``artist_tpu`` importable.
if str(PROJECT_ROOT) not in sys.path:
    sys.path.insert(0, str(PROJECT_ROOT))

DEFAULTS = {
    "metadata_root": "./",
    "metadata_file_name": "calibration_metadata_all_heliostats.csv",
    "data_dir": "./paint_data",
    "tower_file_name": "WRI1030197-tower-measurements.json",
    "scenarios_dir": "./examples/paint_plots/scenarios",
    "results_dir": "./examples/paint_plots/results",
    "plots_dir": "./examples/paint_plots/plots",
    "minimum_number_of_measurements": 10,
    "maximum_number_of_heliostats_for_reconstruction": 2200,
    "excluded_heliostats_for_reconstruction": [],
    "calibration_image_type": "flux",
    "heliostats_for_raytracing": {},
    "number_of_points_to_plot": 100,
    "random_seed": 7,
}

_PATH_OPTIONS = {
    "metadata_root",
    "data_dir",
    "scenarios_dir",
    "results_dir",
    "plots_dir",
}


def make_absolute(path: str | pathlib.Path) -> pathlib.Path:
    """Resolve a possibly-relative path against the repository root."""
    path = pathlib.Path(path).expanduser()
    return path if path.is_absolute() else (PROJECT_ROOT / path).resolve()


def load_config(option_names: list[str], description: str) -> argparse.Namespace:
    """Parse ``--config`` plus the requested options (YAML-seeded defaults)."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument(
        "--config",
        type=str,
        default=str(DEFAULT_CONFIG_PATH),
        help="Path to the YAML configuration file.",
    )
    args, remaining = parser.parse_known_args()

    config = {}
    config_path = pathlib.Path(args.config)
    if config_path.exists():
        try:
            import yaml

            with open(config_path) as f:
                config = yaml.safe_load(f) or {}
        except Exception as error:  # noqa: BLE001 - fall back to defaults
            warnings.warn(f"Error parsing configuration file: {error}")
    else:
        warnings.warn(
            f"Configuration file not found at {config_path}; using defaults."
        )

    for name in option_names:
        default = config.get(name, DEFAULTS.get(name))
        if name in _PATH_OPTIONS and default is not None:
            default = str(make_absolute(default))
        option_type = type(DEFAULTS.get(name, ""))
        if option_type in (dict, list):
            parser.add_argument(f"--{name}", default=default)
        else:
            parser.add_argument(f"--{name}", type=option_type, default=default)
    namespace = parser.parse_args(args=remaining)
    for name in option_names:
        if name in _PATH_OPTIONS:
            setattr(namespace, name, make_absolute(getattr(namespace, name)))
    return namespace
