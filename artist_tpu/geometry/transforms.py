"""Batched 4x4 homogeneous ENU transforms.

Right-handed east-north-up coordinate system; positive angles rotate
counter-clockwise; points multiply as column vectors from the right.

TPU-native notes: matrices are assembled with ``jnp.stack`` (functional, no
in-place writes) and arbitrary leading batch dimensions are supported. For
the hot distortion-scatter path, :func:`apply_distortion_rotation` applies
the combined up-then-east rotation directly to direction components, never
materializing the reference's ``[H, R, P, 4, 4]`` rotation tensor
(reference: artist/geometry/transforms.py:7-83) - a 16x memory/bandwidth
saving on the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from artist_tpu.util import indices


def _assemble(rows: list[list[jnp.ndarray]]) -> jnp.ndarray:
    """Stack a 4x4 list-of-lists of equally shaped arrays into [..., 4, 4]."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rotate_e(e: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about the east axis.

    reference: artist/geometry/transforms.py:86-128.

    Parameters
    ----------
    e : jnp.ndarray
        East rotation angles in radians. Shape ``[...]``.

    Returns
    -------
    jnp.ndarray
        Homogeneous rotation matrices. Shape ``[..., 4, 4]``.
    """
    c, s = jnp.cos(e), jnp.sin(e)
    one, zero = jnp.ones_like(e), jnp.zeros_like(e)
    return _assemble(
        [
            [one, zero, zero, zero],
            [zero, c, -s, zero],
            [zero, s, c, zero],
            [zero, zero, zero, one],
        ]
    )


def rotate_n(n: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about the north axis.

    reference: artist/geometry/transforms.py:131-170.
    """
    c, s = jnp.cos(n), jnp.sin(n)
    one, zero = jnp.ones_like(n), jnp.zeros_like(n)
    return _assemble(
        [
            [c, zero, -s, zero],
            [zero, one, zero, zero],
            [s, zero, c, zero],
            [zero, zero, zero, one],
        ]
    )


def rotate_u(u: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about the up axis.

    reference: artist/geometry/transforms.py:173-212.
    """
    c, s = jnp.cos(u), jnp.sin(u)
    one, zero = jnp.ones_like(u), jnp.zeros_like(u)
    return _assemble(
        [
            [c, -s, zero, zero],
            [s, c, zero, zero],
            [zero, zero, one, zero],
            [zero, zero, zero, one],
        ]
    )


def translate_enu(e: jnp.ndarray, n: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Translation matrices for east/north/up offsets.

    reference: artist/geometry/transforms.py:215-273.
    """
    one, zero = jnp.ones_like(e), jnp.zeros_like(e)
    return _assemble(
        [
            [one, zero, zero, e],
            [zero, one, zero, n],
            [zero, zero, one, u],
            [zero, zero, zero, one],
        ]
    )


def rotate_distortions(e: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Combined up-then-east rotation matrices for light-source distortions.

    Equals ``rotate_e(e) @ rotate_u(u)``. Provided for parity/testing; the
    render path uses :func:`apply_distortion_rotation` instead.
    reference: artist/geometry/transforms.py:7-83.
    """
    cos_e, sin_e = jnp.cos(e), jnp.sin(e)
    cos_u, sin_u = jnp.cos(u), jnp.sin(u)
    one, zero = jnp.ones_like(e), jnp.zeros_like(e)
    return _assemble(
        [
            [cos_u, -sin_u, zero, zero],
            [cos_e * sin_u, cos_e * cos_u, -sin_e, zero],
            [sin_e * sin_u, sin_e * cos_u, cos_e, zero],
            [zero, zero, zero, one],
        ]
    )


def apply_distortion_rotation(
    e: jnp.ndarray, u: jnp.ndarray, directions: jnp.ndarray
) -> jnp.ndarray:
    """Rotate direction vectors by the up-then-east distortion rotation, fused.

    Semantically identical to ``rotate_distortions(e, u) @ d`` for 4D
    directions with zero homogeneous component, but computed component-wise so
    no ``[..., 4, 4]`` tensor is ever built - this is the TPU-hot scatter op.

    Parameters
    ----------
    e, u : jnp.ndarray
        Distortion angles in radians, broadcastable to the leading shape of
        ``directions``. Shape ``[...]``.
    directions : jnp.ndarray
        Direction vectors. Shape ``[..., 3]`` or ``[..., 4]`` (homogeneous
        component passed through untouched).

    Returns
    -------
    jnp.ndarray
        Rotated directions, same shape as ``directions``.
    """
    cos_e, sin_e = jnp.cos(e), jnp.sin(e)
    cos_u, sin_u = jnp.cos(u), jnp.sin(u)
    de = directions[..., indices.e]
    dn = directions[..., indices.n]
    du = directions[..., indices.u]
    out_e = cos_u * de - sin_u * dn
    out_n = cos_e * sin_u * de + cos_e * cos_u * dn - sin_e * du
    out_u = sin_e * sin_u * de + sin_e * cos_u * dn + cos_e * du
    if directions.shape[-1] == 4:
        components = jnp.broadcast_arrays(out_e, out_n, out_u, directions[..., 3])
    else:
        components = jnp.broadcast_arrays(out_e, out_n, out_u)
    return jnp.stack(components, axis=-1)


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along the last axis (torch.nn.functional.normalize semantics).

    torch uses ``v / max(||v||, eps)``; mirrored here for numeric parity.
    """
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def canting_rotation_matrices(canting: jnp.ndarray) -> jnp.ndarray:
    """Build orthonormal facet bases from canting vectors.

    reference: artist/geometry/transforms.py:276-347 (perform_canting's
    basis construction): normalize e; u = normalize(e x n); n' = normalize(u x e);
    columns of the rotation are [e, n', u].

    Parameters
    ----------
    canting : jnp.ndarray
        Canting vectors. Shape ``[..., 2, 4]`` (east and north rows).

    Returns
    -------
    jnp.ndarray
        Homogeneous rotation matrices. Shape ``[..., 4, 4]``.
    """
    e_vec = _normalize(canting[..., indices.e, :3])
    n_candidate = canting[..., indices.n, :3]
    u_vec = _normalize(jnp.cross(e_vec, n_candidate), eps=1e-8)
    n_vec = _normalize(jnp.cross(u_vec, e_vec), eps=1e-8)

    rot3 = jnp.stack([e_vec, n_vec, u_vec], axis=-1)  # columns
    batch = rot3.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=rot3.dtype)
    out = out.at[..., :3, :3].set(rot3)
    out = out.at[..., 3, 3].set(1.0)
    return out


def perform_canting(
    canting: jnp.ndarray, data: jnp.ndarray, inverse: bool = False
) -> jnp.ndarray:
    """Cant (rotate) surface points or normals into their facet frame.

    Data are row vectors ``[..., 4]``; forward canting multiplies by the
    transposed basis, decanting by the basis itself.
    reference: artist/geometry/transforms.py:276-347.

    Parameters
    ----------
    canting : jnp.ndarray
        Canting vectors. Shape ``[S, F, 2, 4]``.
    data : jnp.ndarray
        Points/normals to transform. Shape ``[S, F, P, 4]``.
    inverse : bool
        False = cant, True = decant.
    """
    rotation = canting_rotation_matrices(canting)  # [S, F, 4, 4]
    # Geometry matmuls must run in true f32: TPU default matmul precision
    # (bf16 passes) loses ~1e-2 absolute on world coordinates.
    if inverse:
        return jnp.matmul(data, rotation, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(
        data, jnp.swapaxes(rotation, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
