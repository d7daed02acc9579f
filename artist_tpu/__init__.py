"""ARTIST-TPU: a TPU-native differentiable ray tracer for solar-tower digital twins.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ARTIST
reference framework (differentiable heliostat-field ray tracing, NURBS surface
reconstruction, kinematics calibration, and field-level aim-point
optimization), built TPU-first:

- pure-functional pytree scene state (no in-place "activation" mutation),
- one fused, jitted render path (align -> reflect -> scatter -> intersect ->
  splat) with ray-chunked scanning for memory,
- analytic uniform-knot NURBS evaluation with static unrolled degree loops,
- sharding via ``jax.sharding.Mesh`` + ``shard_map`` with psum-reduced flux
  and gradients replacing the reference's torch.distributed scheme.

Capability parity is tracked against the reference layer map in SURVEY.md;
docstrings cite the corresponding reference implementation as
``reference: artist/<path>:<lines>``.
"""

# Version resolution mirrors the reference (reference: artist/__init__.py +
# tests/test_version.py): prefer the installed distribution's metadata, fall
# back to the source tree's pinned version when not installed.
from importlib.metadata import PackageNotFoundError, version as _distribution_version

try:
    __version__ = _distribution_version("artist-tpu")
except PackageNotFoundError:
    __version__ = "0.4.0"
del PackageNotFoundError, _distribution_version

from artist_tpu.util.logging_utils import set_logger_config, track_runtime  # noqa: F401
