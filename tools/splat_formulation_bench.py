"""Head-to-head splat FORMULATION experiments on the real chip (round 5).

Round-4 verdict item 3 asked for a "binned VMEM scatter" attempt against
the one-hot-matmul splat (kernels/splat_pallas.py), with the measurement
recorded either way. This harness measures, at the flagship shape
(32M rays, 256x256 bitmaps, point-tile-ordered ray layout):

1. one-hot full-bitmap matmul (production kernel), fwd and fwd+bwd;
2. row dynamic-window (production kernel, window=96);
3. a 2D dynamic-window FORWARD prototype (row AND column windows, ~7x
   fewer matmul FLOPs than 1.) - measures the ceiling of "binning";
4. a literal per-ray VMEM accumulate kernel (the "vector scatter") at
   reduced ray counts - on TPU a dynamic single-element accumulate
   rewrites a whole (8,128) tile, so this is expected to lose by orders
   of magnitude; measured to close the question empirically;
5. jax.lax.sort of 32M pixel keys - the entry cost of any sort+segment
   formulation.

Run on the TPU (no JAX_PLATFORMS override): python tools/splat_formulation_bench.py
Writes one JSON line; the verdict goes into kernels/splat_pallas.py notes
and docs/performance.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artist_tpu.kernels import splat_pallas
from artist_tpu.raytracing.splatting import bilinear_splat, point_tile_order

HELIOSTATS = int(os.environ.get("SPLATX_HELIOSTATS", 100))
RAYS = int(os.environ.get("SPLATX_RAYS", 32))
POINTS = int(os.environ.get("SPLATX_POINTS", 50))  # per facet side, x4 facets
RES = (256, 256)
STEPS = 10
BLOCK = 1024


def _flagship_rays():
    """Synthetic coordinates statistically matching the flagship geometry:
    per-heliostat spots spanning ~185 px with per-point sun-cone jitter
    ~15 px, rays ordered point-major over spatial tiles."""
    rng = np.random.default_rng(0)
    points = POINTS * POINTS * 4
    order = np.asarray(point_tile_order(POINTS, POINTS, 4, 10))
    # Per-point spot centers: a smooth field over the mirror (scaled to
    # ~185 px spread), then per-ray jitter of ~6 px std (60 px max cone).
    # Decode (facet, row, col) from the tile-order permutation so the
    # center map is geometrically smooth (facets tile a 2x2 mirror grid).
    facet = order // (POINTS * POINTS)
    row = (order % (POINTS * POINTS)) // POINTS
    col = order % POINTS
    pu = ((facet // 2) * POINTS + row) / (2 * POINTS)
    pv = ((facet % 2) * POINTS + col) / (2 * POINTS)
    center_u = 35 + 185 * pu
    center_e = 35 + 185 * pv
    u = center_u[None, None, :] + 6.0 * rng.standard_normal(
        (HELIOSTATS, RAYS, points)
    )
    e = center_e[None, None, :] + 6.0 * rng.standard_normal(
        (HELIOSTATS, RAYS, points)
    )
    w = rng.random((HELIOSTATS, RAYS, points)).astype(np.float32)
    # POINT-MAJOR layout (points outer, rays inner per point is wrong too -
    # production orders rays so consecutive entries share spatial tiles):
    # transpose to (H, points, RAYS) so a 1024-ray block covers ~32
    # consecutive tile-ordered points x 32 rays - compact deposit spans.
    reshape = lambda x: jnp.asarray(
        np.swapaxes(x, 1, 2).reshape(HELIOSTATS, RAYS * points).astype(np.float32)
    )
    return reshape(e), reshape(u), reshape(w)


_SALT = [0]


def _time(fn_factory, *args, chains=(2, 8)):
    """Slope timing through the tunnel, with SALTED inputs.

    Two failure modes measured here: (a) ``block_until_ready`` can return
    early for queued calls (0.07 "ms" for a 54 ms kernel), fixed by
    chaining data-dependent iterations inside ONE jit; (b) the tunnel
    MEMOIZES identical (executable, input) executions - a repeat call of
    an already-run program with the same buffers returned in 0.4 ms while
    a fresh one took 290 ms - fixed by salting one input per call (the
    salt perturbs values at 1e-6, irrelevant for timing). The slope
    between two chain lengths cancels dispatch and fixed overheads.
    ``fn_factory(n)`` must return a jitted ``run(*args, salt)`` running n
    data-dependent iterations."""
    times = []
    for n in chains:
        fn = fn_factory(n)
        _SALT[0] += 1
        jax.block_until_ready(fn(*args, jnp.float32(_SALT[0] * 1e-6)))
        best = float("inf")
        for _ in range(2):
            _SALT[0] += 1
            salt = jnp.float32(_SALT[0] * 1e-6)
            start = time.perf_counter()
            jax.block_until_ready(fn(*args, salt))
            best = min(best, time.perf_counter() - start)
        times.append(best)
    return (times[1] - times[0]) / (chains[1] - chains[0])


def _chained_splat(kwargs):
    """fn_factory for forward splat: n data-dependent splat calls."""

    def factory(n):
        @jax.jit
        def run(e, u, w, salt):
            w = w + salt
            def body(_, carry):
                acc, feed = carry
                out = bilinear_splat(
                    e + feed, u, w, RES, flip_up_down=False, **kwargs
                )
                return out, out[0, 0, 0] * 1e-30

            out, _ = jax.lax.fori_loop(
                0, n, body, (jnp.zeros((e.shape[0], RES[1], RES[0])), 0.0)
            )
            return out

        return run

    return factory


def _chained_splat_grad(kwargs):
    """fn_factory for fwd+bwd: n data-dependent grad-of-splat calls."""

    def factory(n):
        def loss(e, u, w):
            return jnp.sum(
                bilinear_splat(e, u, w, RES, flip_up_down=False, **kwargs)
            )

        @jax.jit
        def run(e, u, w, salt):
            w = w + salt
            def body(_, carry):
                grads, feed = carry
                grads = jax.grad(loss, argnums=(0, 1, 2))(e + feed, u, w)
                return grads, grads[0][0, 0] * 1e-30

            grads, _ = jax.lax.fori_loop(
                0, n, body, ((jnp.zeros_like(e),) * 3, 0.0)
            )
            return grads

        return run

    return factory


# ----------------------------------------------------------------------- #
# 3. 2D dynamic-window forward prototype
# ----------------------------------------------------------------------- #


def _dyn2d_fwd_kernel(
    ou_ref,
    oe_ref,
    fits_ref,
    e_ref,
    u_ref,
    w_ref,
    out_ref,
    *,
    height: int,
    width: int,
    window_u: int,
    window_e: int,
    blocks_per_map: int,
):
    block = e_ref.shape[0]
    e, u = e_ref[:], u_ref[:]
    _, _, _, _, w, _ = splat_pallas._weights(e, u, w_ref[:], height, width)

    @pl.when(pl.program_id(0) % blocks_per_map == 0)
    def _():
        out_ref[0] = jnp.zeros((height, width), jnp.float32)

    i = pl.program_id(0)
    fits = fits_ref[i]
    ou = pl.multiple_of(ou_ref[i], 8)
    oe = pl.multiple_of(oe_ref[i], 128)

    rows_w = jax.lax.broadcasted_iota(jnp.int32, (window_u, block), 0).astype(
        jnp.float32
    )
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (block, window_e), 1).astype(
        jnp.float32
    )

    @pl.when(fits == 1)
    def _():
        a0_t = (
            jnp.maximum(
                0.0, 1.0 - jnp.abs(rows_w + jnp.float32(ou) - u[None, :])
            )
            * w[None, :]
        ).astype(jnp.bfloat16)
        c0 = jnp.maximum(
            0.0, 1.0 - jnp.abs(cols_w + jnp.float32(oe) - e[:, None])
        ).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            a0_t,
            c0,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, pl.ds(ou, window_u), pl.ds(oe, window_e)] += acc

    @pl.when(fits == 0)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (height, block), 0).astype(
            jnp.float32
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, width), 1).astype(
            jnp.float32
        )
        a0_t = (
            jnp.maximum(0.0, 1.0 - jnp.abs(rows - u[None, :])) * w[None, :]
        ).astype(jnp.bfloat16)
        c0 = jnp.maximum(0.0, 1.0 - jnp.abs(cols - e[:, None])).astype(
            jnp.bfloat16
        )
        out_ref[0] += jax.lax.dot_general(
            a0_t,
            c0,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def dyn2d_forward(e, u, w, resolution, window_u=96, window_e=128):
    width, height = resolution
    num = e.shape[0]
    e = splat_pallas._pad_rays(e.astype(jnp.float32), -10.0, BLOCK)
    u = splat_pallas._pad_rays(u.astype(jnp.float32), -10.0, BLOCK)
    w = splat_pallas._pad_rays(w.astype(jnp.float32), 0.0, BLOCK)
    blocks_per_map = e.shape[1] // BLOCK

    eb = e.reshape(num, blocks_per_map, BLOCK)
    ub = u.reshape(num, blocks_per_map, BLOCK)
    lower_e = jnp.floor(eb)
    lower_u = jnp.floor(ub)
    valid = (
        (lower_e >= 0)
        & (lower_e <= width - 2)
        & (lower_u >= 0)
        & (lower_u <= height - 2)
    )
    big = jnp.float32(1e9)
    min_u = jnp.min(jnp.where(valid, ub, big), axis=2)
    max_u = jnp.max(jnp.where(valid, ub, -big), axis=2)
    min_e = jnp.min(jnp.where(valid, eb, big), axis=2)
    max_e = jnp.max(jnp.where(valid, eb, -big), axis=2)
    any_valid = jnp.any(valid, axis=2)
    ou = jnp.clip(
        (jnp.floor(min_u).astype(jnp.int32) // 8) * 8, 0, height - window_u
    )
    oe = jnp.clip(
        (jnp.floor(min_e).astype(jnp.int32) // 128) * 128, 0, width - window_e
    )
    fits = (~any_valid) | (
        (max_u <= ou.astype(jnp.float32) + window_u - 2)
        & (max_e <= oe.astype(jnp.float32) + window_e - 2)
    )
    ou = jnp.where(any_valid, ou, 0).reshape(-1)
    oe = jnp.where(any_valid, oe, 0).reshape(-1)
    fits_flags = fits.astype(jnp.int32).reshape(-1)

    kernel = functools.partial(
        _dyn2d_fwd_kernel,
        height=height,
        width=width,
        window_u=window_u,
        window_e=window_e,
        blocks_per_map=blocks_per_map,
    )
    ray_spec = pl.BlockSpec((BLOCK,), lambda i, *_: (i,), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num * blocks_per_map,),
        in_specs=[ray_spec, ray_spec, ray_spec],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda i, *_: (i // blocks_per_map, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num, height, width), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(ou, oe, fits_flags, e.reshape(-1), u.reshape(-1), w.reshape(-1))
    return out, jnp.mean(fits_flags.astype(jnp.float32))


# ----------------------------------------------------------------------- #
# 4. literal per-ray VMEM accumulate ("vector scatter")
# ----------------------------------------------------------------------- #


def _scatter_kernel(e_ref, u_ref, w_ref, out_ref, *, height, width, blocks_per_map):
    block = e_ref.shape[0]

    @pl.when(pl.program_id(0) % blocks_per_map == 0)
    def _():
        out_ref[0] = jnp.zeros((height, width), jnp.float32)

    def body(i, _):
        e = e_ref[i]
        u = u_ref[i]
        w = w_ref[i]
        le = jnp.floor(e).astype(jnp.int32)
        lu = jnp.floor(u).astype(jnp.int32)
        fe = e - le.astype(jnp.float32)
        fu = u - lu.astype(jnp.float32)
        valid = (le >= 0) & (le <= width - 2) & (lu >= 0) & (lu <= height - 2)
        le = jnp.clip(le, 0, width - 2)
        lu = jnp.clip(lu, 0, height - 2)
        wv = jnp.where(valid, w, 0.0)
        out_ref[0, lu, le] += wv * (1 - fu) * (1 - fe)
        out_ref[0, lu, le + 1] += wv * (1 - fu) * fe
        out_ref[0, lu + 1, le] += wv * fu * (1 - fe)
        out_ref[0, lu + 1, le + 1] += wv * fu * fe
        return 0

    jax.lax.fori_loop(0, block, body, 0)


def scatter_forward(e, u, w, resolution):
    width, height = resolution
    num = e.shape[0]
    e = splat_pallas._pad_rays(e.astype(jnp.float32), -10.0, BLOCK)
    u = splat_pallas._pad_rays(u.astype(jnp.float32), -10.0, BLOCK)
    w = splat_pallas._pad_rays(w.astype(jnp.float32), 0.0, BLOCK)
    blocks_per_map = e.shape[1] // BLOCK
    kernel = functools.partial(
        _scatter_kernel, height=height, width=width, blocks_per_map=blocks_per_map
    )
    ray_spec = pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(num * blocks_per_map,),
        in_specs=[ray_spec, ray_spec, ray_spec],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda i: (i // blocks_per_map, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num, height, width), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(e.reshape(-1), u.reshape(-1), w.reshape(-1))


def main() -> None:
    from artist_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    e, u, w = _flagship_rays()
    total_rays = e.shape[0] * e.shape[1]
    result = {"total_rays": total_rays, "resolution": list(RES)}

    # 1. production one-hot
    result["onehot_fwd_ms"] = round(
        _time(_chained_splat(dict(method="pallas")), e, u, w) * 1e3, 2
    )
    result["onehot_fwdbwd_ms"] = round(
        _time(_chained_splat_grad(dict(method="pallas")), e, u, w) * 1e3, 2
    )

    # 2. row dynamic-window
    row = dict(method="pallas", block_window=96)
    result["rowwin_fwd_ms"] = round(_time(_chained_splat(row), e, u, w) * 1e3, 2)
    result["rowwin_fwdbwd_ms"] = round(
        _time(_chained_splat_grad(row), e, u, w) * 1e3, 2
    )

    # 3. 2D dynamic-window forward prototype (+ parity check)
    reference = np.asarray(
        bilinear_splat(e, u, w, RES, flip_up_down=False, method="scatter")
    )
    got, fit_fraction = jax.jit(lambda e, u, w: dyn2d_forward(e, u, w, RES))(
        e, u, w
    )
    err = float(np.abs(np.asarray(got) - reference).max() / reference.max())
    result["dyn2d_max_rel_err"] = round(err, 6)
    result["dyn2d_fit_fraction"] = round(float(fit_fraction), 4)

    def dyn2d_factory(n):
        @jax.jit
        def run(e, u, w, salt):
            w = w + salt
            def body(_, carry):
                acc, feed = carry
                out, _ = dyn2d_forward(e + feed, u, w, RES)
                return out, out[0, 0, 0] * 1e-30

            out, _ = jax.lax.fori_loop(
                0, n, body, (jnp.zeros((e.shape[0], RES[1], RES[0])), 0.0)
            )
            return out

        return run

    result["dyn2d_fwd_ms"] = round(_time(dyn2d_factory, e, u, w) * 1e3, 2)

    # 4. literal per-ray accumulate (the "vector scatter"), 1/32 of the rays
    small = (
        e[:, : e.shape[1] // 32],
        u[:, : u.shape[1] // 32],
        w[:, : w.shape[1] // 32],
    )

    def scatter_factory(n):
        @jax.jit
        def run(e, u, w, salt):
            w = w + salt
            def body(_, carry):
                acc, feed = carry
                out = scatter_forward(e + feed, u, w, RES)
                return out, out[0, 0, 0] * 1e-30

            out, _ = jax.lax.fori_loop(
                0, n, body, (jnp.zeros((e.shape[0], RES[1], RES[0])), 0.0)
            )
            return out

        return run

    try:
        ms = _time(scatter_factory, *small) * 1e3
        result["per_ray_accumulate_fwd_ms_at_1_32_rays"] = round(ms, 2)
        result["per_ray_accumulate_extrapolated_fwd_ms"] = round(ms * 32, 1)
    except Exception as error:  # noqa: BLE001
        result["per_ray_accumulate_error"] = str(error)[:200]

    # 5. sort cost of a sort+segment formulation
    keys = jnp.asarray(
        np.random.default_rng(1).integers(0, RES[0] * RES[1], total_rays),
        jnp.int32,
    )

    def sort_factory(n):
        @jax.jit
        def run(k, salt):
            k = k + (salt * 1e9).astype(jnp.int32) % 7
            def body(_, carry):
                return jax.lax.sort(carry)

            return jax.lax.fori_loop(0, n, body, k)

        return run

    result["sort_32m_keys_ms"] = round(_time(sort_factory, keys) * 1e3, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
