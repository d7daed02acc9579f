"""Pallas splat kernel vs the XLA scatter baseline: values and gradients.

Two precisions: fp32 MXU inputs are bit-faithful to the scatter path;
bfloat16 (the TPU default - single MXU pass) rounds the fractional offsets
and weights to ~2^-8 relative, which must stay within the reference's own
golden tolerance (1%).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_tpu.kernels.splat_pallas import bilinear_splat_pallas
from artist_tpu.raytracing.splatting import bilinear_splat

PRECISIONS = [
    pytest.param(jnp.float32, dict(atol=1e-4), id="fp32"),
    pytest.param(jnp.bfloat16, dict(rtol=8e-3, atol=5e-3), id="bf16"),
]


def _random_rays(num=3, n=700, width=64, height=48, seed=0):
    rng = np.random.RandomState(seed)
    # Mix of interior, boundary, and out-of-range coordinates.
    e = rng.uniform(-4, width + 4, size=(num, n)).astype(np.float32)
    u = rng.uniform(-4, height + 4, size=(num, n)).astype(np.float32)
    w = rng.rand(num, n).astype(np.float32)
    return jnp.asarray(e), jnp.asarray(u), jnp.asarray(w)


@pytest.mark.parametrize("resolution", [(64, 48), (256, 256)])
@pytest.mark.parametrize("dtype,tol", PRECISIONS)
def test_pallas_matches_scatter(resolution, dtype, tol):
    width, height = resolution
    e, u, w = _random_rays(width=width, height=height)
    ours = np.asarray(bilinear_splat_pallas(e, u, w, resolution, dtype))
    baseline = np.asarray(
        bilinear_splat(e, u, w, resolution, flip_up_down=False, method="scatter")
    )
    np.testing.assert_allclose(ours, baseline, **tol)
    assert ours.sum() > 0


@pytest.mark.parametrize("dtype,tol", PRECISIONS)
def test_pallas_gradients_match_scatter(dtype, tol):
    resolution = (64, 48)
    e, u, w = _random_rays(width=64, height=48, n=500)
    target = jnp.asarray(
        np.random.RandomState(1).rand(3, 48, 64).astype(np.float32)
    )

    def loss_pallas(e, u, w):
        return jnp.sum(bilinear_splat_pallas(e, u, w, resolution, dtype) * target)

    def loss_scatter(e, u, w):
        return jnp.sum(
            bilinear_splat(e, u, w, resolution, flip_up_down=False, method="scatter")
            * target
        )

    grads_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(e, u, w)
    grads_scatter = jax.grad(loss_scatter, argnums=(0, 1, 2))(e, u, w)
    for mine, theirs, name in zip(grads_pallas, grads_scatter, "euw"):
        np.testing.assert_allclose(
            np.asarray(mine), np.asarray(theirs), err_msg=f"grad {name}", **tol
        )


def test_pallas_padding_consistency():
    # Non-multiple-of-block ray counts must agree with padded-out zeros.
    resolution = (32, 32)
    e, u, w = _random_rays(num=2, n=1025, width=32, height=32)
    full = np.asarray(bilinear_splat_pallas(e, u, w, resolution, jnp.float32))
    truncated = np.asarray(
        bilinear_splat_pallas(
            e[:, :1024], u[:, :1024], w[:, :1024], resolution, jnp.float32
        )
    )
    delta = np.asarray(
        bilinear_splat_pallas(
            e[:, 1024:], u[:, 1024:], w[:, 1024:], resolution, jnp.float32
        )
    )
    np.testing.assert_allclose(full, truncated + delta, atol=1e-5)


# --------------------------------------------------------------------------- #
# Windowed splat (per-heliostat window, dynamic offset).
# --------------------------------------------------------------------------- #


def _compact_spots(num=3, rays=400, width=96, height=80, spread=9.0, seed=11):
    key = jax.random.PRNGKey(seed)
    ke, ku, kw, kc = jax.random.split(key, 4)
    centers_e = jax.random.uniform(kc, (num,), minval=12.0, maxval=width - 12.0)
    centers_u = jnp.linspace(14.0, height - 14.0, num)
    e = centers_e[:, None] + spread * (jax.random.uniform(ke, (num, rays)) - 0.5)
    u = centers_u[:, None] + spread * (jax.random.uniform(ku, (num, rays)) - 0.5)
    w = jax.random.uniform(kw, (num, rays), minval=0.1, maxval=1.0)
    return e, u, w


def test_windowed_matches_full_when_spots_fit():
    from artist_tpu.kernels.splat_pallas import windowed_drop_fraction

    e, u, w = _compact_spots()
    resolution = (96, 80)
    assert float(windowed_drop_fraction(e, u, w, resolution, 32)) == 0.0
    full = bilinear_splat(e, u, w, resolution, flip_up_down=False, method="pallas_fp32")
    windowed = bilinear_splat(
        e, u, w, resolution, flip_up_down=False, method="pallas_fp32", window=32
    )
    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(full), rtol=0, atol=1e-5
    )


def test_windowed_gradients_match_full():
    e, u, w = _compact_spots()
    resolution = (96, 80)
    target = jax.random.uniform(jax.random.PRNGKey(3), (3, 80, 96))

    def loss(window):
        def f(e_, u_, w_):
            flux = bilinear_splat(
                e_, u_, w_, resolution, flip_up_down=False,
                method="pallas_fp32", window=window,
            )
            return jnp.sum(flux * target)
        return jax.grad(f, argnums=(0, 1, 2))(e, u, w)

    for a, b, name in zip(loss(None), loss(32), ("e", "u", "w")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=1e-4, err_msg=name
        )


def test_windowed_edge_clamping():
    """Spots near the bitmap border: offsets clamp, result still exact."""
    rays = 200
    key = jax.random.PRNGKey(5)
    e = jax.random.uniform(key, (2, rays), minval=0.0, maxval=14.0)
    u = jax.random.uniform(key, (2, rays), minval=66.0, maxval=79.0)
    w = jnp.ones((2, rays))
    resolution = (96, 80)
    full = bilinear_splat(e, u, w, resolution, flip_up_down=False, method="pallas_fp32")
    windowed = bilinear_splat(
        e, u, w, resolution, flip_up_down=False, method="pallas_fp32", window=32
    )
    np.testing.assert_allclose(np.asarray(windowed), np.asarray(full), atol=1e-5)


def test_windowed_drop_fraction_reports_outliers():
    from artist_tpu.kernels.splat_pallas import windowed_drop_fraction

    e, u, w = _compact_spots(spread=9.0)
    # inject one far outlier per heliostat
    e = e.at[:, 0].set(2.0)
    u = u.at[:, 0].set(2.0)
    frac = float(windowed_drop_fraction(e, u, w, (96, 80), 32))
    # at most all three outliers drop; at least one lies outside its clamped
    # window (exactly which depends on each spot's weighted center)
    upper = float(jnp.sum(w[:, 0]) / jnp.sum(w))
    assert 0.0 < frac <= upper * 1.05


@pytest.mark.parametrize(
    "resolution,rays",
    [
        ((33, 47), 77),     # odd sizes, nothing tile-aligned
        ((128, 64), 1000),  # rectangular
        ((8, 8), 5),        # tiny bitmap, fewer rays than a block
        ((100, 100), 513),  # PAINT-calibration-like odd square
    ],
)
def test_splat_shape_sweep_parity(resolution, rays):
    """Pallas splat == scatter across non-tile-aligned shapes.

    The production shapes are 64/256-square; this guards the kernel's
    padding/masking logic for arbitrary RenderConfig resolutions and ray
    counts that are not block multiples."""
    from artist_tpu.raytracing.splatting import bilinear_splat

    rng = np.random.RandomState(hash(resolution) % 2**31)
    num = 3
    width, height = resolution
    e = jnp.asarray(
        rng.uniform(-2, width + 2, (num, rays)).astype(np.float32)
    )
    u = jnp.asarray(
        rng.uniform(-2, height + 2, (num, rays)).astype(np.float32)
    )
    w = jnp.asarray(rng.rand(num, rays).astype(np.float32))
    reference = bilinear_splat(
        e, u, w, resolution, flip_up_down=False, method="scatter"
    )
    got = bilinear_splat(
        e, u, w, resolution, flip_up_down=False, method="pallas_fp32"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(reference), atol=1e-5
    )
    # Gradient parity at the same shapes.
    def loss(method, e_, u_, w_):
        return jnp.sum(
            bilinear_splat(e_, u_, w_, resolution, flip_up_down=False,
                           method=method) ** 2
        )

    ref_grads = jax.grad(loss, argnums=(1, 2, 3))("scatter", e, u, w)
    got_grads = jax.grad(loss, argnums=(1, 2, 3))("pallas_fp32", e, u, w)
    for name, mine, theirs in zip(("de", "du", "dw"), got_grads, ref_grads):
        scale = max(float(jnp.abs(theirs).max()), 1e-9)
        np.testing.assert_allclose(
            np.asarray(mine) / scale,
            np.asarray(theirs) / scale,
            atol=1e-5,
            err_msg=f"{name} at {resolution}",
        )
