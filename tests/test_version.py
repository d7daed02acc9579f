"""Package version handling.

reference: tests/test_version.py - version comes from the installed
distribution's metadata with a source-tree fallback when not installed.
"""

from __future__ import annotations

import importlib
import importlib.metadata
from importlib.metadata import PackageNotFoundError

import artist_tpu


def test_version_from_distribution_metadata(monkeypatch) -> None:
    expected_version = "9.9.9"
    requested: list[str] = []

    def fake_version(distribution_name: str) -> str:
        requested.append(distribution_name)
        return expected_version

    monkeypatch.setattr(importlib.metadata, "version", fake_version)
    try:
        reloaded = importlib.reload(artist_tpu)
        assert requested == ["artist-tpu"]
        assert reloaded.__version__ == expected_version
    finally:
        monkeypatch.undo()
        importlib.reload(artist_tpu)


def test_version_fallback_when_distribution_is_not_installed(monkeypatch) -> None:
    def fake_version(distribution_name: str) -> str:
        raise PackageNotFoundError(distribution_name)

    monkeypatch.setattr(importlib.metadata, "version", fake_version)
    try:
        reloaded = importlib.reload(artist_tpu)
        # The source-tree fallback pins the release version (pyproject.toml).
        assert reloaded.__version__[0].isdigit()
        assert reloaded.__version__.count(".") == 2
    finally:
        monkeypatch.undo()
        importlib.reload(artist_tpu)
