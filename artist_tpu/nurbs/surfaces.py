"""Batched differentiable NURBS surface evaluation, TPU-native.

Functional re-design of the reference's ``NURBSSurfaces`` module
(reference: artist/nurbs/surfaces.py:50-727) built for XLA:

- **Analytic uniform knots**: clamped uniform knot vectors are never
  materialized; knot values are computed in closed form from indices
  (``clip((i - degree) / (C - degree), 0, 1)``), eliminating all knot
  gathers (reference gathers knots per evaluation point,
  artist/nurbs/surfaces.py:326-327).
- **Static degree loops**: the Cox-de-Boor recurrence (The NURBS Book A2.3)
  and the surface-derivative algorithm (A3.6) are unrolled over the (static,
  small) spline degree, producing pure vectorized element-wise ops over the
  ``[surfaces, facets, points]`` batch.
- **Single windowed gather**: the (degree+1)^2 control-point window per
  evaluation point is gathered once, then combined with the basis values via
  two einsums (MXU-friendly), instead of (degree+1)^2 separate batched
  gathers (reference: artist/nurbs/surfaces.py:592-613).

All control points carry weight 1 (rational machinery kept for parity with
the reference, artist/nurbs/surfaces.py:524-537).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from artist_tpu.geometry.transforms import (
    _normalize,
    canting_rotation_matrices,
    perform_canting,
)


def validate_uniform_knot_vectors(
    knot_vectors, degree: int, atol: float = 1e-6
) -> None:
    """Reject non-uniform knot vectors loudly.

    The analytic evaluation in this module assumes clamped UNIFORM knots -
    the only kind the reference ever constructs
    (artist/nurbs/surfaces.py:98-155: ``calculate_uniform_knot_vectors`` is
    called unconditionally at init; the non-uniform search branch at
    :157-245 is unreachable from its own pipelines, and scenario HDF5 files
    carry no knot data). Any ingress path that DOES receive explicit knot
    vectors must call this guard first: silently evaluating non-uniform
    knots with the uniform closed form would be wrong without warning.

    Parameters
    ----------
    knot_vectors : array-like
        Knot vectors ``[..., C + degree + 1]`` (batched or flat).
    degree : int
        Spline degree.

    Raises
    ------
    ValueError
        If the knots are not clamped uniform within ``atol``.
    """
    import numpy as np

    knots = np.asarray(knot_vectors, dtype=np.float64)
    length = knots.shape[-1]
    number_of_control_points = length - degree - 1
    index = np.arange(length)
    expected = np.clip(
        (index - degree) / (number_of_control_points - degree), 0.0, 1.0
    )
    if not np.allclose(knots, expected, atol=atol):
        raise ValueError(
            "Non-uniform knot vectors are not supported: the TPU NURBS "
            "evaluation uses the analytic clamped-uniform closed form "
            "(reference artist/nurbs/surfaces.py:98-155 also only ever "
            "constructs uniform knots). Re-parameterize the surface with "
            "uniform knots or refit the control points."
        )


def find_spans_uniform(
    evaluation_points: jnp.ndarray, number_of_control_points: int, degree: int
) -> jnp.ndarray:
    """Knot spans for clamped uniform knot vectors, O(1) closed form.

    reference: artist/nurbs/surfaces.py:198-207 (uniform branch).

    Parameters
    ----------
    evaluation_points : jnp.ndarray
        Parameter values in one direction. Shape ``[...]``.
    number_of_control_points : int
        Control points in this direction (static).
    degree : int
        Spline degree in this direction (static).

    Returns
    -------
    jnp.ndarray
        Span indices (int32), same shape as ``evaluation_points``.
    """
    n_unique = number_of_control_points - degree + 1
    return jnp.floor(evaluation_points * (n_unique - 1)).astype(jnp.int32) + degree


def _uniform_knot_value(
    index: jnp.ndarray, number_of_control_points: int, degree: int
) -> jnp.ndarray:
    """Analytic clamped uniform knot value at ``index``.

    Knot vector layout (reference: artist/nurbs/surfaces.py:98-155):
    ``degree`` zeros, then linspace(0, 1, C - degree + 1), then ``degree``
    ones - equivalently ``clip((i - degree) / (C - degree), 0, 1)``.
    """
    denom = number_of_control_points - degree
    return jnp.clip(
        (index.astype(jnp.float32) - degree) / denom, 0.0, 1.0
    )


def basis_functions_and_derivatives(
    evaluation_points: jnp.ndarray,
    spans: jnp.ndarray,
    number_of_control_points: int,
    degree: int,
    nth_derivative: int = 1,
) -> list[list[jnp.ndarray]]:
    """Nonzero B-spline basis functions and derivatives (A2.3, statically unrolled).

    reference: artist/nurbs/surfaces.py:247-417. All loops run over the
    static degree, so XLA sees pure element-wise arithmetic on the batch.

    Parameters
    ----------
    evaluation_points : jnp.ndarray
        Parameter values, shape ``[...]`` (any batch shape).
    spans : jnp.ndarray
        Knot span per point, same shape.
    number_of_control_points, degree, nth_derivative : int
        Static sizes.

    Returns
    -------
    list[list[jnp.ndarray]]
        ``derivatives[k][r]``: k-th derivative of the r-th nonzero basis
        function, each with the batch shape of ``evaluation_points``.
    """
    t = evaluation_points
    ones = jnp.ones_like(t)
    zeros = jnp.zeros_like(t)

    def knot(i: jnp.ndarray) -> jnp.ndarray:
        return _uniform_knot_value(i, number_of_control_points, degree)

    ndu: list[list[jnp.ndarray]] = [
        [zeros for _ in range(degree + 1)] for _ in range(degree + 1)
    ]
    ndu[0][0] = ones
    left: list[jnp.ndarray] = [zeros for _ in range(degree + 1)]
    right: list[jnp.ndarray] = [zeros for _ in range(degree + 1)]

    for j in range(1, degree + 1):
        left[j] = t - knot(spans - j + 1)
        right[j] = knot(spans + j) - t
        saved = zeros
        for r in range(j):
            ndu[j][r] = right[r + 1] + left[j - r]
            tmp = ndu[r][j - 1] / ndu[j][r]
            ndu[r][j] = saved + right[r + 1] * tmp
            saved = left[j - r] * tmp
        ndu[j][j] = saved

    derivatives: list[list[jnp.ndarray]] = [
        [zeros for _ in range(degree + 1)] for _ in range(nth_derivative + 1)
    ]
    for j in range(degree + 1):
        derivatives[0][j] = ndu[j][degree]

    # a stores (alternating) the two most recent rows of the A2.3 recursion.
    a: list[list[jnp.ndarray]] = [[zeros for _ in range(degree + 1)] for _ in range(2)]
    for r in range(degree + 1):
        s1, s2 = 0, 1
        a[0][0] = ones
        for k in range(1, nth_derivative + 1):
            d = zeros
            rk = r - k
            pk = degree - k
            if r >= k:
                a[s2][0] = a[s1][0] / ndu[pk + 1][rk]
                d = a[s2][0] * ndu[rk][pk]
            j1 = 1 if rk >= -1 else -rk
            j2 = k - 1 if r - 1 <= pk else degree - r
            for j in range(j1, j2 + 1):
                a[s2][j] = (a[s1][j] - a[s1][j - 1]) / ndu[pk + 1][rk + j]
                d = d + a[s2][j] * ndu[rk + j][pk]
            if r <= pk:
                a[s2][k] = -a[s1][k - 1] / ndu[pk + 1][r]
                d = d + a[s2][k] * ndu[r][pk]
            derivatives[k][r] = d
            s1, s2 = s2, s1

    factor = degree
    for k in range(1, nth_derivative + 1):
        for j in range(degree + 1):
            derivatives[k][j] = derivatives[k][j] * factor
        factor *= degree - k

    return derivatives


def _finalize_skl(skl, canting, facet_translations):
    """Points/normals (+ optional canting) from the derivative surfaces."""
    return _finalize_components(
        skl[..., 0, 0, :],
        skl[..., 1, 0, :],
        skl[..., 0, 1, :],
        canting,
        facet_translations,
    )


def _finalize_components(
    surface_points_homogeneous, derivative_u, derivative_v, canting,
    facet_translations,
):
    """Points/normals (+ optional canting) from the (S, S_u, S_v) surfaces."""
    weights = surface_points_homogeneous[..., 3:4]
    points3 = surface_points_homogeneous[..., :3] / weights

    normals3 = jnp.cross(derivative_u[..., :3], derivative_v[..., :3])
    normals3 = _normalize(normals3)

    points4 = jnp.concatenate(
        [points3, jnp.ones(points3.shape[:-1] + (1,), points3.dtype)], axis=-1
    )
    normals4 = jnp.concatenate(
        [normals3, jnp.zeros(normals3.shape[:-1] + (1,), normals3.dtype)], axis=-1
    )

    if canting is not None:
        points4 = perform_canting(canting, points4)
        points4 = points4 + facet_translations[:, :, None, :]
        normals4 = perform_canting(canting, normals4)

    return points4, normals4


def _evaluate_shared_grid(
    control_points: jnp.ndarray,
    degrees: tuple[int, int],
    evaluation_points: jnp.ndarray,
    canting: jnp.ndarray | None,
    facet_translations: jnp.ndarray | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluation for a grid shared by all (surface, facet) pairs.

    The joint basis ``W[p, k, l, i, j] = Bu[p, k, i] Bv[p, l, j]`` is tiny
    (``P x 4 x Cu x Cv``) and shared, so all surfaces evaluate in a single
    MXU-shaped matmul against the stacked control points.
    """
    degree_u, degree_v = degrees
    num_s, num_f, num_cu, num_cv, _ = control_points.shape
    num_p = evaluation_points.shape[0]

    t_u = evaluation_points[:, 0]
    t_v = evaluation_points[:, 1]
    spans_u = find_spans_uniform(t_u, num_cu, degree_u)
    spans_v = find_spans_uniform(t_v, num_cv, degree_v)
    basis_u = basis_functions_and_derivatives(t_u, spans_u, num_cu, degree_u, 1)
    basis_v = basis_functions_and_derivatives(t_v, spans_v, num_cv, degree_v, 1)

    bu = jnp.stack(
        [jnp.stack(basis_u[k], axis=-1) for k in range(2)], axis=-2
    )  # [P, 2, du+1]
    bv = jnp.stack(
        [jnp.stack(basis_v[k], axis=-1) for k in range(2)], axis=-2
    )  # [P, 2, dv+1]
    window_u = (spans_u - degree_u)[:, None] + jnp.arange(degree_u + 1)
    window_v = (spans_v - degree_v)[:, None] + jnp.arange(degree_v + 1)
    onehot_u = (window_u[..., None] == jnp.arange(num_cu)).astype(bu.dtype)
    onehot_v = (window_v[..., None] == jnp.arange(num_cv)).astype(bv.dtype)
    precision = jax.lax.Precision.HIGHEST
    bu_full = jnp.einsum("pka,pai->pki", bu, onehot_u, precision=precision)
    bv_full = jnp.einsum("plb,pbj->plj", bv, onehot_v, precision=precision)

    cp_h = jnp.concatenate(
        [
            control_points,
            jnp.ones(control_points.shape[:-1] + (1,), control_points.dtype),
        ],
        axis=-1,
    )
    # LAYOUT-CRITICAL: the natural [S, F, P, 2, 2, 4] derivative tensor (or
    # any transpose/reshuffle of it, even one XLA invents while fusing) ends
    # up as a copy whose minor dim is 4 - tile-padded 32x on TPU, a 20 GB
    # allocation at 1,000 heliostats. So nothing here is ever more than
    # 2-D until the final per-component [S, F, P] reshape: one matmul per
    # derivative order produces the (coord, surface, facet)-major
    # orientation directly, and the whole finalize is elementwise math with
    # a final stack onto the coordinate axis (which XLA lays out well).
    cp2t = (
        cp_h.reshape(num_s * num_f, num_cu * num_cv, 4)
        .transpose(2, 0, 1)
        .reshape(4 * num_s * num_f, num_cu * num_cv)
    )

    def derivative_surface(k: int, l: int):
        joint = (
            bu_full[:, k, :, None] * bv_full[:, l, None, :]
        ).reshape(num_p, num_cu * num_cv)
        sklt = jnp.dot(cp2t, joint.T, precision=precision)  # [4c*S*F, P]
        rows = sklt.reshape(4, num_s, num_f, num_p)
        return [rows[c] for c in range(4)]  # 4 x [S, F, P]

    value = derivative_surface(0, 0)
    du = derivative_surface(1, 0)[:3]
    dv = derivative_surface(0, 1)[:3]
    inv_weights = 1.0 / value[3]
    point = [value[c] * inv_weights for c in range(3)]

    # normals = normalize(cross(du, dv)), component-wise.
    cross = [
        du[1] * dv[2] - du[2] * dv[1],
        du[2] * dv[0] - du[0] * dv[2],
        du[0] * dv[1] - du[1] * dv[0],
    ]
    norm = jnp.sqrt(cross[0] ** 2 + cross[1] ** 2 + cross[2] ** 2)
    norm = jnp.maximum(norm, 1e-12)  # _normalize semantics
    normal = [c / norm for c in cross]

    if canting is not None:
        # Row-vector forward canting (data @ R^T), expanded component-wise:
        # out_c = sum_j data_j * R[c, j]; R is per-(surface, facet).
        rotation = canting_rotation_matrices(canting)[..., :3, :3]  # [S,F,3,3]

        def cant(vector):
            return [
                vector[0] * rotation[:, :, c, 0][..., None]
                + vector[1] * rotation[:, :, c, 1][..., None]
                + vector[2] * rotation[:, :, c, 2][..., None]
                for c in range(3)
            ]

        point = cant(point)
        point = [
            point[c] + facet_translations[:, :, c][..., None] for c in range(3)
        ]
        normal = cant(normal)

    points4 = jnp.stack(point + [jnp.ones_like(point[0])], axis=-1)
    normals4 = jnp.stack(normal + [jnp.zeros_like(normal[0])], axis=-1)
    return points4, normals4


@functools.partial(jax.jit, static_argnames=("degrees",))
def evaluate_nurbs_surfaces(
    control_points: jnp.ndarray,
    degrees: tuple[int, int],
    evaluation_points: jnp.ndarray,
    canting: jnp.ndarray | None = None,
    facet_translations: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Surface points and normals of batched NURBS surfaces (A3.6).

    reference: artist/nurbs/surfaces.py:475-689.

    Parameters
    ----------
    control_points : jnp.ndarray
        Shape ``[S, F, Cu, Cv, 3]``.
    degrees : tuple[int, int]
        Spline degrees (u, v) - static.
    evaluation_points : jnp.ndarray
        Shape ``[S, F, P, 2]`` or ``[P, 2]`` (broadcast to all surfaces).
    canting : jnp.ndarray | None
        Canting vectors ``[S, F, 2, 4]``; if given, points/normals are canted
        and translated into the heliostat frame.
    facet_translations : jnp.ndarray | None
        Facet translations ``[S, F, 4]``.

    Returns
    -------
    tuple of jnp.ndarray
        Homogeneous surface points and unit normals, each ``[S, F, P, 4]``.
    """
    degree_u, degree_v = int(degrees[0]), int(degrees[1])
    num_s, num_f, num_cu, num_cv, _ = control_points.shape

    if evaluation_points.ndim == 2:
        # Shared evaluation grid (the reconstruction hot path): the joint
        # basis tensor is independent of (surface, facet), so the whole
        # evaluation is ONE [P*4, Cu*Cv] @ [Cu*Cv, S*F*4] matmul instead of
        # a million batched [2, d+1] contractions (measured 61 ms -> ~2 ms
        # forward at the 100-heliostat production shape on v5e).
        return _evaluate_shared_grid(
            control_points,
            (degree_u, degree_v),
            evaluation_points,
            canting,
            facet_translations,
        )

    t_u = evaluation_points[..., 0]
    t_v = evaluation_points[..., 1]
    spans_u = find_spans_uniform(t_u, num_cu, degree_u)
    spans_v = find_spans_uniform(t_v, num_cv, degree_v)

    basis_u = basis_functions_and_derivatives(t_u, spans_u, num_cu, degree_u, 1)
    basis_v = basis_functions_and_derivatives(t_v, spans_v, num_cv, degree_v, 1)

    # Homogeneous control points: weight channel fixed to 1
    # (reference: artist/nurbs/surfaces.py:524-537).
    cp_h = jnp.concatenate(
        [control_points, jnp.ones(control_points.shape[:-1] + (1,), control_points.dtype)],
        axis=-1,
    )

    # Stack the basis values into [S, F, P, order, basis_index] tensors.
    bu = jnp.stack(
        [jnp.stack(basis_u[k], axis=-1) for k in range(2)], axis=-2
    )  # [S, F, P, 2, du+1]
    bv = jnp.stack(
        [jnp.stack(basis_v[k], axis=-1) for k in range(2)], axis=-2
    )  # [S, F, P, 2, dv+1]

    # Scatter the (degree+1) nonzero basis values onto the full control-point
    # axes with one-hot contractions, then contract densely with the whole
    # control grid. Control grids are tiny (Cu, Cv ~ 7-20), so the dense
    # [P, Cu] x [Cu, Cv, C] einsums are a few hundred MFLOP of MXU-friendly
    # work - whereas the equivalent per-point windowed gather lowers to a
    # serialized TPU gather that costs ~1000x more wall clock (measured:
    # 3 s -> 3 ms forward for a 500k-point field).
    window_u = (spans_u - degree_u)[..., None] + jnp.arange(degree_u + 1)
    window_v = (spans_v - degree_v)[..., None] + jnp.arange(degree_v + 1)
    onehot_u = (window_u[..., None] == jnp.arange(num_cu)).astype(cp_h.dtype)
    onehot_v = (window_v[..., None] == jnp.arange(num_cv)).astype(cp_h.dtype)
    # True-f32 contraction: TPU default matmul precision (bf16 passes) would
    # lose ~1e-3 on surface coordinates, which alignment then amplifies.
    precision = jax.lax.Precision.HIGHEST
    bu_full = jnp.einsum(
        "sfpka,sfpai->sfpki", bu, onehot_u, precision=precision
    )  # [S, F, P, 2, Cu]
    bv_full = jnp.einsum(
        "sfplb,sfpbj->sfplj", bv, onehot_v, precision=precision
    )  # [S, F, P, 2, Cv]
    temp = jnp.einsum(
        "sfplj,sfijc->sfplic", bv_full, cp_h, precision=precision
    )
    skl = jnp.einsum(
        "sfpki,sfplic->sfpklc", bu_full, temp, precision=precision
    )  # [S, F, P, k, l, 4]

    return _finalize_skl(skl, canting, facet_translations)
