"""The field-optimization input-preparation scripts.

reference: examples/field_optimizations/{download_metadata,
generate_viable_heliostats_list, generate_stral_inputs}.py. The metadata
and viable-list scripts run against the bundled PAINT fixtures; the STRAL
writer is validated by round-tripping its output through the repo's own
STRAL reader.
"""

import csv
import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

EXAMPLES = (
    pathlib.Path(__file__).resolve().parents[2] / "examples" / "field_optimizations"
)
FIELD_DATA = pathlib.Path("/root/reference/tests/data/field_data")


def _load_module(name: str):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(EXAMPLES))
    try:
        spec.loader.exec_module(module)
    finally:
        sys.path.remove(str(EXAMPLES))
    return module


@pytest.fixture
def config(tmp_path):
    if not FIELD_DATA.exists():
        pytest.skip("reference field data not available")
    return {
        "data_dir": str(FIELD_DATA),
        "metadata_root": str(tmp_path),
        "results_dir": str(tmp_path / "results"),
        "heliostats": ["AA39"],
        "minimum_number_of_measurements": 1,
        "maximum_number_of_measurements": 2,
        "kinematics_reconstruction_image_type": "flux-centered",
        "surface_reconstruction_image_type": "flux-centered",
        "excluded_heliostats_for_reconstruction": [],
    }


def test_metadata_and_viable_list_pipeline(config):
    metadata_path = _load_module("download_metadata").build_metadata(config)
    assert metadata_path.exists()
    with open(metadata_path, newline="") as handle:
        rows = list(csv.DictReader(handle))
    assert any(r["HeliostatId"] == "AA39" for r in rows)
    assert all(pathlib.Path(r["CalibrationProperties"]).exists() for r in rows)

    baseline_path, full_path = _load_module(
        "generate_viable_heliostats_list"
    ).generate_lists(config)
    with open(baseline_path) as handle:
        baseline = json.load(handle)
    with open(full_path) as handle:
        full_field = json.load(handle)
    names = [entry[0] for entry in baseline]
    assert names == ["AA39"]
    # maximum_number_of_measurements caps the per-heliostat selection.
    assert all(len(entry[1]) <= 2 for entry in baseline)
    # The baseline set is a subset of the full field.
    assert {e[0] for e in baseline} <= {e[0] for e in full_field}
    # Every selected path exists and the tuple shape matches the parser's
    # (name, calibration jsons, kinematics fluxes, surface fluxes, props).
    for entry in baseline:
        assert len(entry) == 5
        for path in entry[1] + entry[2] + entry[3]:
            assert pathlib.Path(path).exists()


def test_excluded_heliostats_filtered(config):
    _load_module("download_metadata").build_metadata(config)
    config["excluded_heliostats_for_reconstruction"] = ["AA39"]
    baseline_path, full_path = _load_module(
        "generate_viable_heliostats_list"
    ).generate_lists(config)
    assert json.load(open(baseline_path)) == []


def test_stral_binp_roundtrip(tmp_path):
    """save_binp output reads back identically through the STRAL parser."""
    from artist_tpu.io.stral import extract_stral_deflectometry_data

    module = _load_module("generate_stral_inputs")
    rng = np.random.RandomState(7)
    translations = np.zeros((4, 4), np.float32)
    translations[:, :3] = rng.randn(4, 3)
    canting = rng.randn(4, 2, 4).astype(np.float32)
    canting[..., 3] = 0.0
    points = [rng.randn(50 + 10 * f, 3).astype(np.float32) for f in range(4)]
    normals = [rng.randn(50 + 10 * f, 3).astype(np.float32) for f in range(4)]
    path = tmp_path / "HELIO.binp"
    module.save_binp(
        output_path=path,
        heliostat_position=np.array([10.0, 30.0, 1.7, 1.0], np.float32),
        width=3.2,
        height=2.56,
        number_of_facets_grid=(4, 1),
        facet_translations=translations,
        canting=canting,
        points_per_facet=points,
        normals_per_facet=normals,
    )
    read_translations, read_canting, read_points, read_normals = (
        extract_stral_deflectometry_data(path)
    )
    np.testing.assert_allclose(read_translations[:, :3], translations[:, :3])
    np.testing.assert_allclose(read_canting[..., :3], canting[..., :3])
    for f in range(4):
        np.testing.assert_allclose(read_points[f], points[f])
        np.testing.assert_allclose(read_normals[f], normals[f])
