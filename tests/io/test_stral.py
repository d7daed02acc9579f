"""STRAL binary parser parity vs the torch reference on a synthesized file.

The reference test data ships no raw ``.binp`` (only a pre-generated
scenario h5), so a file is synthesized per the STRAL layout
(reference: artist/io/stral_scenario_parser.py:49-52 struct formats) and fed
to BOTH parsers.
"""

import struct

import numpy as np

from artist_tpu.io.stral import extract_stral_deflectometry_data


def _write_stral(path, rng, facets_x=2, facets_y=2, points_per_facet=11):
    surface_header = struct.Struct("=5f2I2f")
    facet_header = struct.Struct("=i9fI")
    point_record = struct.Struct("=7f")
    with open(path, "wb") as handle:
        handle.write(
            surface_header.pack(1.0, 2.0, 3.0, 4.0, 5.0, facets_x, facets_y, 0.5, 0.5)
        )
        for facet in range(facets_x * facets_y):
            translation = rng.uniform(-1, 1, 3)
            canting_e = rng.uniform(-1, 1, 3)
            canting_n = rng.uniform(-1, 1, 3)
            handle.write(
                facet_header.pack(
                    facet, *translation, *canting_e, *canting_n, points_per_facet
                )
            )
            for _ in range(points_per_facet):
                point = rng.uniform(-2, 2, 3)
                normal = rng.uniform(-0.1, 0.1, 3) + [0, 0, 1]
                normal /= np.linalg.norm(normal)
                handle.write(point_record.pack(*point, *normal, 1.0))
    return path


def test_stral_parser_matches_reference(reference_artist, tmp_path):
    import torch
    from artist.io.stral_scenario_parser import (
        extract_stral_deflectometry_data as ref_extract,
    )

    rng = np.random.RandomState(11)
    stral_file = _write_stral(tmp_path / "test.binp", rng)

    translations, canting, points, normals = extract_stral_deflectometry_data(
        stral_file
    )
    ref_translations, ref_canting, ref_points, ref_normals = ref_extract(
        stral_file_path=stral_file, device=torch.device("cpu")
    )

    np.testing.assert_allclose(translations, ref_translations.numpy(), atol=1e-6)
    np.testing.assert_allclose(canting, ref_canting.numpy(), atol=1e-6)
    assert len(points) == len(ref_points) == 4
    for mine, ref in zip(points, ref_points):
        np.testing.assert_allclose(mine, ref.numpy()[:, : mine.shape[1]], atol=1e-6)
    for mine, ref in zip(normals, ref_normals):
        np.testing.assert_allclose(mine, ref.numpy()[:, : mine.shape[1]], atol=1e-6)
