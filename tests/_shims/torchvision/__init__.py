"""Minimal torchvision shim for the torch reference oracle (tests only).

Implements io.decode_image and transforms.functional.resize via PIL+torch,
matching the subset used by artist/io/calibration_parser.py.
"""
from . import io, transforms  # noqa: F401
