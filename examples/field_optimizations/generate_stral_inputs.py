"""Export reconstructed heliostat surfaces as STRAL ``.binp`` files.

reference: examples/field_optimizations/generate_stral_inputs.py - the
reference dumps its reconstructed surfaces in STRAL's binary deflectometry
format so the commercial STRAL software can run the same field for
comparison. This build reads the generated scenario HDF5 (and, when
present, the reconstructed control points from
``results_dir/surface_reconstruction.npz``), evaluates each heliostat's
NURBS surface, and writes one ``.binp`` per heliostat with the exact
layout the reference writes (surface header ``=5f2I2f``, facet headers
``=i9fI``, 7-float point records, trailing tracking-DLL block). The files
round-trip through ``artist_tpu.io.stral.extract_stral_deflectometry_data``.

Usage:
    python examples/field_optimizations/generate_stral_inputs.py [config.yaml]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import os
import pathlib
import struct
import sys
from array import array

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from generate_scenarios import load_config

_SURFACE_HEADER = struct.Struct("=5f2I2f")
_FACET_HEADER = struct.Struct("=i9fI")
_POINT_RECORD = struct.Struct("=7f")


def save_binp(
    output_path: pathlib.Path,
    heliostat_position: np.ndarray,
    width: float,
    height: float,
    number_of_facets_grid: tuple[int, int],
    facet_translations: np.ndarray,
    canting: np.ndarray,
    points_per_facet: list[np.ndarray],
    normals_per_facet: list[np.ndarray],
    axis_offset: float = 0.0,
    mirror_offset: float = 0.0,
) -> None:
    """Write one STRAL ``.binp`` file.

    reference: examples/field_optimizations/generate_stral_inputs.py
    (save_binp_from_artist_data). STRAL's frame swaps the horizontal axes:
    the header stores (north, -east, up).
    """
    output_path.parent.mkdir(parents=True, exist_ok=True)
    number_of_facets = len(points_per_facet)
    with open(output_path, "wb") as handle:
        handle.write(
            _SURFACE_HEADER.pack(
                float(heliostat_position[1]),
                float(-heliostat_position[0]),
                float(heliostat_position[2]),
                float(width),
                float(height),
                int(number_of_facets_grid[0]),
                int(number_of_facets_grid[1]),
                float(axis_offset),
                float(mirror_offset),
            )
        )
        for facet in range(number_of_facets):
            points = np.asarray(points_per_facet[facet], np.float32)
            normals = np.asarray(normals_per_facet[facet], np.float32)
            handle.write(
                _FACET_HEADER.pack(
                    0,
                    *np.asarray(facet_translations[facet, :3], np.float32),
                    *np.asarray(canting[facet, 0, :3], np.float32),
                    *np.asarray(canting[facet, 1, :3], np.float32),
                    points.shape[0],
                )
            )
            power = width * height / (points.shape[0] * number_of_facets)
            records = np.concatenate(
                [points, normals, np.full((points.shape[0], 1), power, np.float32)],
                axis=1,
            ).astype(np.float32)
            handle.write(records.tobytes())
        # Trailing STRAL tracking block (reference writes the basic
        # HELIOKON tracking configuration).
        tracking_dll = "STJ_HELIOKON.DLL"
        tracking_method = "TrackingBasic"
        handle.write(array("f", [0.0, 0.0]).tobytes())
        handle.write(len(tracking_dll).to_bytes(4, byteorder="little"))
        handle.write(tracking_dll.encode("ascii"))
        handle.write(len(tracking_method).to_bytes(4, byteorder="little"))
        handle.write(tracking_method.encode("ascii"))
    print(f"Wrote .binp file to {output_path}")


def generate_stral_inputs(config: dict) -> list[pathlib.Path]:
    from artist_tpu.nurbs import create_nurbs_evaluation_grid, evaluate_nurbs_surfaces
    from artist_tpu.scenario import load_scenario_from_hdf5

    scenarios_dir = pathlib.Path(config["scenarios_dir"])
    results_dir = pathlib.Path(config["results_dir"])
    output_dir = pathlib.Path(
        config.get("data_for_stral_dir", results_dir / "data_for_stral")
    )
    scenario_path = scenarios_dir / "field_optimization_scenario.h5"
    if not scenario_path.exists():
        raise SystemExit(
            f"{scenario_path} not found - run generate_scenarios.py first."
        )
    scenario = load_scenario_from_hdf5(
        scenario_path, number_of_surface_points_per_facet=(50, 50)
    )

    # Prefer reconstructed control points when generate_results.py ran.
    reconstruction_path = results_dir / "surface_reconstruction.npz"
    reconstructed = (
        np.load(reconstruction_path) if reconstruction_path.exists() else None
    )

    written = []
    evaluation_points = create_nurbs_evaluation_grid((50, 50))
    for group_index, group in enumerate(scenario.heliostat_groups):
        control_points = np.asarray(group.nurbs_control_points)
        if reconstructed is not None:
            key = f"group_{group_index}_control_points"
            if key in reconstructed:
                control_points = reconstructed[key]
        import jax.numpy as jnp

        # Evaluate WITHOUT canting/facet translation: STRAL stores per-facet
        # local clouds plus the canting/translation separately (exactly what
        # extract_stral_deflectometry_data returns).
        points, normals = evaluate_nurbs_surfaces(
            jnp.asarray(control_points), group.nurbs_degrees, evaluation_points
        )
        points = np.asarray(points)
        normals = np.asarray(normals)
        canting = np.asarray(group.canting)
        translations = np.asarray(group.facet_translations)
        for index, name in enumerate(group.names):
            width = 2.0 * float(np.linalg.norm(canting[index, :, 0, :3], axis=1).max())
            height = 2.0 * float(np.linalg.norm(canting[index, :, 1, :3], axis=1).max())
            number_of_facets = canting.shape[1]
            path = output_dir / f"{name}.binp"
            save_binp(
                output_path=path,
                heliostat_position=np.asarray(group.positions[index]),
                width=width,
                height=height,
                number_of_facets_grid=(number_of_facets, 1),
                facet_translations=translations[index],
                canting=canting[index],
                points_per_facet=[
                    points[index, f, :, :3] for f in range(number_of_facets)
                ],
                normals_per_facet=[
                    normals[index, f, :, :3] for f in range(number_of_facets)
                ],
            )
            written.append(path)
    return written


if __name__ == "__main__":
    generate_stral_inputs(load_config(sys.argv))
