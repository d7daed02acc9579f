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
