"""Pallas TPU kernel for differentiable bilinear splatting.

The bilinear splat of a ray batch is a sum of rank-1 outer products: ray b
deposits ``w_b * a_b (x) c_b`` where ``a_b`` holds the two nonzero row
weights (1-fu at lu, fu at lu+1) and ``c_b`` the two column weights. Summing
over a block of rays is therefore ONE matmul ``A^T C`` - MXU work instead of
the serialized XLA scatter-add (measured 5.6x faster end-to-end on v5e at
production shapes). The one-hot factors are built in VMEM per block and
never touch HBM.

Performance notes (measured on v5e, 32M rays, 256x256 bitmaps):
- The row factor is built TRANSPOSED (``[H, B]``) so both matmul operands
  are contraction-minor; building ``[B, H]`` and contracting dim 0 forces a
  Mosaic relayout that doubles the forward time (182 -> 92 ms).
- Each factor is the tent function ``max(0, 1 - |cell - coord|)`` - ONE
  vector expression instead of two one-hot compares combined (a further
  ~35%: 11.2 -> 7.3 ms per 4M-ray chunk forward).
- Factors are built in bf16 (the fractional weights round at ~2^-8
  relative, which cancels in the thousands-of-rays-per-pixel sums) and
  feed the MXU in a single pass. Accumulation stays fp32.
- Forward blocks are 8192 rays; backward keeps 2048 (its ``g1/g2``
  intermediates are fp32 and VMEM-bound; 1024-4096 measured within noise,
  and bf16 ``c0/cd`` bought nothing - the backward is bound by factor
  construction, not the MXU or VMEM).
- Ceiling (measured, v5e, 32M rays): forward ~54 ms, backward ~60 ms.
  Decomposition: factor construction alone ~30 ms, the dot alone ~52 ms
  (the [256, 8192] @ [8192, 256] shape - tiny 4-tile output, long
  contraction - runs at ~0.5 of nominal bf16 peak both here and as a pure
  XLA dot), so Mosaic already overlaps a good fraction of VPU build with
  MXU work. Variants that did NOT help: native-bf16 factor arithmetic
  (63 ms - bf16 VPU ops are not packed 2x on v5e), 2/4/8-way straight-line
  sub-chunk unrolling (57 ms - no extra MXU/VPU overlap), fori_loop
  sub-chunks (58 ms), 4096-ray blocks (72 ms). Halving the factor H only
  bought 11%, confirming the dot, not the build, is the binding cost.
  Lower cost requires shrinking the formulation (windowed splat below) -
  but see bench.py's honesty note: wide sun-cone spread makes windows
  unsound for bitmap-filling production geometries.
- FORMULATION CEILING (measured round 5, tools/splat_formulation_bench.py,
  flagship shape, ~192 TFLOP/s calibration): the one-hot matmul is bound
  by per-ray operand STREAMING through the MXU contraction (~1.1 ns/ray
  fwd), not by FLOPs - a 2D dynamic-window prototype (96x128 windows,
  72% of point-tile-ordered blocks fit, ~2.4x fewer matmul FLOPs)
  measured the SAME ~36 ms forward as the full-bitmap kernel, matching
  the earlier row-window result (end-to-end neutral) and the "halving H
  bought 11%" note above. The alternatives are closed out empirically:
  a literal per-ray VMEM accumulate is not expressible (Mosaic rejects
  scalar stores to VMEM; the closest expressible form of scatter IS this
  one-hot matmul), and a sort+segment formulation pays 79 ms just to
  sort 32M pixel keys - more than the entire splat fwd+bwd. This kernel
  is the TPU-native optimum for bitmap-filling geometries at this shape.

The backward pass is two more matmuls per block (``A0 @ g`` and
``Ad @ g``), wired up via ``jax.custom_vjp``.

reference semantics: artist/raytracing/heliostat_ray_tracer.py:610-778
(4-neighbor bilinear scatter-add with strict bounds).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FWD_RAY_BLOCK = int(os.environ.get("ARTIST_SPLAT_FWD_RAY_BLOCK", 8192))
BWD_RAY_BLOCK = int(os.environ.get("ARTIST_SPLAT_BWD_RAY_BLOCK", 2048))


def _interpret() -> bool:
    """Interpreter mode off-TPU (testing on the CPU mesh)."""
    return jax.default_backend() == "cpu"


def _dot_precision(compute_dtype):
    """MXU precision matching the requested compute dtype.

    On the real chip fp32 ``dot_general`` operands are TRUNCATED to bf16 at
    the default precision (one MXU pass) - interpret mode on CPU keeps true
    fp32, so without HIGHEST the "fp32" path silently returns bf16-accurate
    results on hardware only (caught by the on-chip lane, round 5). bf16
    operands are single-pass either way, so DEFAULT is kept there.
    """
    if compute_dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _weights(e, u, w, height: int, width: int):
    """Shared: integer cells, fractional offsets, validity-masked weight."""
    lower_e = jnp.floor(e)
    lower_u = jnp.floor(u)
    frac_e = e - lower_e
    frac_u = u - lower_u
    valid = (
        (lower_e >= 0)
        & (lower_e <= width - 2)
        & (lower_u >= 0)
        & (lower_u <= height - 2)
    )
    return (
        lower_e.astype(jnp.int32),
        lower_u.astype(jnp.int32),
        frac_e,
        frac_u,
        jnp.where(valid, w, 0.0),
        valid,
    )


def _splat_fwd_kernel(
    e_ref,
    u_ref,
    w_ref,
    out_ref,
    *,
    height: int,
    width: int,
    blocks_per_map: int,
    compute_dtype,
):
    """One ray block -> rank-1-sum matmul, accumulated into its bitmap.

    Inputs are flattened over (heliostat, ray); ``blocks_per_map``
    consecutive grid steps share one output bitmap (the grid's row-major
    order keeps the bitmap block resident in VMEM across them).
    """
    block = e_ref.shape[0]
    e, u = e_ref[:], u_ref[:]
    _, _, _, _, w, _ = _weights(e, u, w_ref[:], height, width)
    # Row factor built transposed [H, B]: both matmul operands become
    # contraction-minor (no Mosaic relayout). Weights fold into the rows.
    # The bilinear weights ARE the tent function max(0, 1 - |row - u|):
    # (1-fu) at lu and fu at lu+1 in one vector expression - ~35% faster
    # than building two one-hot compares and combining (measured on v5e).
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, block), 0).astype(
        jnp.float32
    )
    a0_t = (
        jnp.maximum(0.0, 1.0 - jnp.abs(rows - u[None, :])) * w[None, :]
    ).astype(compute_dtype)

    cols = jax.lax.broadcasted_iota(jnp.int32, (block, width), 1).astype(
        jnp.float32
    )
    c0 = jnp.maximum(0.0, 1.0 - jnp.abs(cols - e[:, None])).astype(compute_dtype)

    acc = jax.lax.dot_general(
        a0_t,
        c0,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(compute_dtype),
    )  # [H, W]

    @pl.when(pl.program_id(0) % blocks_per_map == 0)
    def _():
        out_ref[0] = acc

    @pl.when(pl.program_id(0) % blocks_per_map != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _splat_bwd_kernel(
    e_ref,
    u_ref,
    w_ref,
    gt_ref,
    de_ref,
    du_ref,
    dw_ref,
    *,
    height: int,
    width: int,
    compute_dtype,
):
    """Backward in fully TRANSPOSED orientation: rays live on LANES.

    Every factor ([H, B] rows, [W, B] cols) broadcasts the 1D ray vectors
    across sublanes for free - building them [B, H]/[B, W] instead forces a
    Mosaic relayout of every ray vector per block. The cotangent arrives
    pre-transposed ([W, H], one cheap XLA transpose per map outside the
    kernel) so both matmuls have the same lhs-contraction-minor /
    rhs-contraction-major shape as the forward. The final reductions run
    over sublanes, landing the [B] outputs lane-major.
    """
    block = e_ref.shape[0]
    e, u = e_ref[:], u_ref[:]
    lower_e, lower_u, _, _, w, valid = _weights(e, u, w_ref[:], height, width)
    # Value factors via the tent identity (see forward kernel); the
    # DERIVATIVE factors ad/cd keep the one-hot compares - the tent's
    # derivative is undefined at exact-integer coordinates, where the
    # reference's two-cell form still assigns (-1, +1) to (lu, lu+1).
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, block), 0)
    a0_t = jnp.maximum(
        0.0, 1.0 - jnp.abs(rows.astype(jnp.float32) - u[None, :])
    ).astype(compute_dtype)
    ad_t = (rows == lower_u[None, :] + 1).astype(compute_dtype) - (
        rows == lower_u[None, :]
    ).astype(compute_dtype)

    cols = jax.lax.broadcasted_iota(jnp.int32, (width, block), 0)
    c0_t = jnp.maximum(
        0.0, 1.0 - jnp.abs(cols.astype(jnp.float32) - e[None, :])
    ).astype(jnp.float32)
    cd_t = (
        (cols == lower_e[None, :] + 1).astype(compute_dtype)
        - (cols == lower_e[None, :]).astype(compute_dtype)
    ).astype(jnp.float32)

    gt = gt_ref[0].astype(compute_dtype)  # [W, H]
    # g1_t[c, b] = sum_r gt[c, r] a0_t[r, b]; g2_t likewise.
    g1_t = jax.lax.dot_general(
        gt,
        a0_t,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(compute_dtype),
    )
    g2_t = jax.lax.dot_general(
        gt,
        ad_t,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(compute_dtype),
    )
    # Invalid rays deposited nothing in the forward pass: their one-hot
    # factors must not leak gradient into dw.
    dw_ref[:] = jnp.where(valid, jnp.sum(g1_t * c0_t, axis=0), 0.0)
    de_ref[:] = w * jnp.sum(g1_t * cd_t, axis=0)
    du_ref[:] = w * jnp.sum(g2_t * c0_t, axis=0)


def _pad_rays(x: jnp.ndarray, value: float, block: int) -> jnp.ndarray:
    n = x.shape[1]
    padded = pl.cdiv(n, block) * block
    if padded == n:
        return x
    return jnp.pad(x, ((0, 0), (0, padded - n)), constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bilinear_splat_pallas(
    bitmap_e: jnp.ndarray,
    bitmap_u: jnp.ndarray,
    intensities: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Differentiable bilinear splat via the Pallas outer-product kernel.

    Parameters
    ----------
    bitmap_e, bitmap_u : jnp.ndarray
        Continuous pixel coordinates. Shape ``[M, N]``.
    intensities : jnp.ndarray
        Ray weights, same shape.
    bitmap_resolution : tuple[int, int]
        (width_e, height_u), static.
    compute_dtype
        MXU input dtype for the one-hot matmuls (accumulation is always
        fp32). ``bfloat16`` (default) runs the MXU in one pass - the one-hot
        structure makes the rounding error ~2^-8 per ray, which cancels in
        the per-pixel sums (validated < 0.1% vs the fp32 path at production
        shapes). Pass ``jnp.float32`` for bit-faithful splats.

    Returns
    -------
    jnp.ndarray
        Flux bitmaps. Shape ``[M, height_u, width_e]``.
    """
    return _splat_forward(
        bitmap_e, bitmap_u, intensities, bitmap_resolution, compute_dtype
    )


def _splat_forward(bitmap_e, bitmap_u, intensities, bitmap_resolution, compute_dtype):
    width, height = int(bitmap_resolution[0]), int(bitmap_resolution[1])
    num = bitmap_e.shape[0]
    # fp32 factors are 2x the VMEM of bf16 and the HIGHEST-precision matmul
    # adds decomposition temporaries: at the default 8192-ray block the
    # fp32 kernel exceeds the 16M scoped-VMEM limit on the real chip
    # (36.8M measured, caught by the round-5 flagship-shape lane test) -
    # cap the fp32 block at 2048 (measured ~9M).
    block = FWD_RAY_BLOCK if compute_dtype != jnp.float32 else min(FWD_RAY_BLOCK, 2048)
    # Out-of-range padding: lands in the invalid mask, contributes zero.
    # Flattening over (heliostat, ray) keeps ray blocks 1D (TPU tiling wants
    # the last dim % 128 == 0); padded per-heliostat counts stay block
    # multiples, so no block straddles two heliostats.
    e = _pad_rays(bitmap_e.astype(jnp.float32), -10.0, block)
    u = _pad_rays(bitmap_u.astype(jnp.float32), -10.0, block)
    w = _pad_rays(intensities.astype(jnp.float32), 0.0, block)
    blocks_per_map = e.shape[1] // block

    kernel = functools.partial(
        _splat_fwd_kernel,
        height=height,
        width=width,
        blocks_per_map=blocks_per_map,
        compute_dtype=compute_dtype,
    )
    ray_spec = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)
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
        interpret=_interpret(),
    )(e.reshape(-1), u.reshape(-1), w.reshape(-1))


def _splat_fwd(bitmap_e, bitmap_u, intensities, bitmap_resolution, compute_dtype):
    out = _splat_forward(
        bitmap_e, bitmap_u, intensities, bitmap_resolution, compute_dtype
    )
    return out, (bitmap_e, bitmap_u, intensities)


def _splat_bwd(bitmap_resolution, compute_dtype, residuals, g):
    bitmap_e, bitmap_u, intensities = residuals
    width, height = int(bitmap_resolution[0]), int(bitmap_resolution[1])
    num, n = bitmap_e.shape
    # Same scoped-VMEM headroom cap as the forward: fp32 factors + the
    # HIGHEST-precision matmul decomposition need a smaller ray block.
    block = BWD_RAY_BLOCK if compute_dtype != jnp.float32 else min(BWD_RAY_BLOCK, 1024)
    e = _pad_rays(bitmap_e.astype(jnp.float32), -10.0, block)
    u = _pad_rays(bitmap_u.astype(jnp.float32), -10.0, block)
    w = _pad_rays(intensities.astype(jnp.float32), 0.0, block)
    blocks_per_map = e.shape[1] // block
    padded = e.shape[1]

    kernel = functools.partial(
        _splat_bwd_kernel, height=height, width=width, compute_dtype=compute_dtype
    )
    ray_spec = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)
    grad_spec = pl.BlockSpec(
        (1, width, height),
        lambda i: (i // blocks_per_map, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((num * padded,), jnp.float32)
    # One XLA transpose of the cotangent per map; the kernel's matmuls then
    # match the forward's lhs-contraction-minor shape (see kernel docstring).
    g_transposed = jnp.swapaxes(g.astype(jnp.float32), 1, 2)
    de, du, dw = pl.pallas_call(
        kernel,
        grid=(num * blocks_per_map,),
        in_specs=[ray_spec, ray_spec, ray_spec, grad_spec],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(e.reshape(-1), u.reshape(-1), w.reshape(-1), g_transposed)
    return (
        de.reshape(num, padded)[:, :n],
        du.reshape(num, padded)[:, :n],
        dw.reshape(num, padded)[:, :n],
    )


bilinear_splat_pallas.defvjp(_splat_fwd, _splat_bwd)


DYN_RAY_BLOCK = int(os.environ.get("ARTIST_SPLAT_DYN_RAY_BLOCK", 1024))


def _window_plan(height: int, window: int) -> tuple[tuple[int, int, int], ...]:
    """Static fallback sub-windows covering [0, height) without double count.

    Each entry is (start, own_lo, own_hi): the sub-window's store offset and
    the EXCLUSIVE ownership row range its factors are masked to (windows may
    overlap when ``window`` does not divide ``height``; the ownership mask
    keeps each global row in exactly one sub-window)."""
    plan = []
    k = 0
    while k * window < height:
        own_lo = k * window
        own_hi = min((k + 1) * window, height)
        start = min(k * window, height - window)
        plan.append((start, own_lo, own_hi))
        k += 1
    return tuple(plan)


def _dyn_fwd_kernel(
    ou_ref,
    fits_ref,
    e_ref,
    u_ref,
    w_ref,
    out_ref,
    *,
    height: int,
    width: int,
    window: int,
    blocks_per_map: int,
    compute_dtype,
):
    """Dynamic-window forward: one ray block -> [window, W] matmul.

    Per block the row factor spans only ``window`` rows at the block's
    precomputed 8-aligned offset (EXACT: the offset is derived from the
    block's own min/max deposit rows, so a fitting block loses nothing);
    blocks whose deposit extent exceeds the window take the full-height
    fallback as ``ceil(H/window)`` ownership-masked sub-windows - same
    semantics, full cost, no double counting."""
    block = e_ref.shape[0]
    e, u = e_ref[:], u_ref[:]
    _, _, _, _, w, _ = _weights(e, u, w_ref[:], height, width)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, width), 1).astype(
        jnp.float32
    )
    c0 = jnp.maximum(0.0, 1.0 - jnp.abs(cols - e[:, None])).astype(compute_dtype)
    base_rows = jax.lax.broadcasted_iota(jnp.int32, (window, block), 0).astype(
        jnp.float32
    )

    def accumulate(offset, extra_mask=None):
        rows = base_rows + jnp.float32(offset)
        a0_t = jnp.maximum(0.0, 1.0 - jnp.abs(rows - u[None, :])) * w[None, :]
        if extra_mask is not None:
            a0_t = a0_t * extra_mask
        acc = jax.lax.dot_general(
            a0_t.astype(compute_dtype),
            c0,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        out_ref[0, pl.ds(offset, window), :] += acc

    @pl.when(pl.program_id(0) % blocks_per_map == 0)
    def _():
        out_ref[0] = jnp.zeros((height, width), jnp.float32)

    i = pl.program_id(0)
    fits = fits_ref[i]
    ou = pl.multiple_of(ou_ref[i], 8)

    @pl.when(fits == 1)
    def _():
        accumulate(ou)

    @pl.when(fits == 0)
    def _():
        for start, own_lo, own_hi in _window_plan(height, window):
            rows = base_rows + jnp.float32(start)
            own = ((rows >= own_lo) & (rows < own_hi)).astype(jnp.float32)
            accumulate(start, extra_mask=own)


def _dyn_bwd_kernel(
    ou_ref,
    fits_ref,
    e_ref,
    u_ref,
    w_ref,
    gt_ref,
    de_ref,
    du_ref,
    dw_ref,
    *,
    height: int,
    width: int,
    window: int,
    compute_dtype,
):
    """Dynamic-window backward: both cotangent matmuls contract over the window.

    The cotangent map stays [H, W] (VMEM-resident per map); the fast branch
    slices its ``window`` rows at the 8-aligned sublane offset, the fallback
    sums the static sub-window slices with ownership masks."""
    block = e_ref.shape[0]
    e, u = e_ref[:], u_ref[:]
    lower_e, lower_u, _, _, w, valid = _weights(e, u, w_ref[:], height, width)
    base_rows = jax.lax.broadcasted_iota(jnp.int32, (window, block), 0)

    cols = jax.lax.broadcasted_iota(jnp.int32, (width, block), 0)
    c0_t = jnp.maximum(
        0.0, 1.0 - jnp.abs(cols.astype(jnp.float32) - e[None, :])
    ).astype(jnp.float32)
    cd_t = (
        (cols == lower_e[None, :] + 1).astype(compute_dtype)
        - (cols == lower_e[None, :]).astype(compute_dtype)
    ).astype(jnp.float32)

    def window_products(offset, extra_mask=None):
        rows = base_rows + offset
        a0_t = jnp.maximum(
            0.0, 1.0 - jnp.abs(rows.astype(jnp.float32) - u[None, :])
        )
        ad_t = (rows == lower_u[None, :] + 1).astype(jnp.float32) - (
            rows == lower_u[None, :]
        ).astype(jnp.float32)
        if extra_mask is not None:
            a0_t = a0_t * extra_mask
            ad_t = ad_t * extra_mask
        gt_win = gt_ref[0, pl.ds(offset, window), :].astype(compute_dtype)
        g1 = jax.lax.dot_general(
            gt_win,
            a0_t.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )  # [W, B]
        g2 = jax.lax.dot_general(
            gt_win,
            ad_t.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(compute_dtype),
        )
        return g1, g2

    def write_outputs(g1, g2):
        dw_ref[:] = jnp.where(valid, jnp.sum(g1 * c0_t, axis=0), 0.0)
        de_ref[:] = w * jnp.sum(g1 * cd_t, axis=0)
        du_ref[:] = w * jnp.sum(g2 * c0_t, axis=0)

    i = pl.program_id(0)
    fits = fits_ref[i]
    ou = pl.multiple_of(ou_ref[i], 8)

    @pl.when(fits == 1)
    def _():
        g1, g2 = window_products(ou)
        write_outputs(g1, g2)

    @pl.when(fits == 0)
    def _():
        g1 = jnp.zeros((width, block), jnp.float32)
        g2 = jnp.zeros((width, block), jnp.float32)
        for start, own_lo, own_hi in _window_plan(height, window):
            rows = base_rows + start
            own = ((rows >= own_lo) & (rows < own_hi)).astype(jnp.float32)
            p1, p2 = window_products(start, extra_mask=own)
            g1 = g1 + p1
            g2 = g2 + p2
        write_outputs(g1, g2)


def _dyn_offsets(
    e: jnp.ndarray,
    u: jnp.ndarray,
    height: int,
    width: int,
    window: int,
    block: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block window offsets and fit flags (stop-gradient, int32).

    ``e``/``u`` are the PADDED [M, Np] coordinate arrays. A block fits when
    every IN-BOUNDS deposit row lies inside [ou, ou + window): deposit rows
    are floor(u) and floor(u)+1, so the condition is max_u <= ou + window - 2
    with ou = align8(floor(min_u)) clamped into the bitmap. Validity is the
    kernel's in-bounds check (NOT ``w > 0``): the intensity gradient dw of a
    zero-weight in-bounds ray is weight-independent, so such rays must still
    land inside the window or dw silently drops (advisor finding, round 4).
    Padding carries the -10 sentinel and fails the bounds check. Blocks with
    no valid rays trivially fit at offset 0."""
    e = jax.lax.stop_gradient(e)
    u = jax.lax.stop_gradient(u)
    num = u.shape[0]
    blocks = u.shape[1] // block
    u_blocks = u.reshape(num, blocks, block)
    lower_e = jnp.floor(e).reshape(num, blocks, block)
    lower_u = jnp.floor(u_blocks)
    valid = (
        (lower_e >= 0)
        & (lower_e <= width - 2)
        & (lower_u >= 0)
        & (lower_u <= height - 2)
    )
    big = jnp.float32(1e9)
    min_u = jnp.min(jnp.where(valid, u_blocks, big), axis=2)
    max_u = jnp.max(jnp.where(valid, u_blocks, -big), axis=2)
    any_valid = jnp.any(valid, axis=2)
    raw = jnp.floor(min_u).astype(jnp.int32)
    ou = jnp.clip((raw // 8) * 8, 0, height - window)
    fits = (~any_valid) | (max_u <= ou.astype(jnp.float32) + window - 2)
    ou = jnp.where(any_valid, ou, 0)
    return ou.reshape(-1), fits.astype(jnp.int32).reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bilinear_splat_dynamic_window(
    bitmap_e: jnp.ndarray,
    bitmap_u: jnp.ndarray,
    intensities: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
    window: int = 96,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """EXACT bilinear splat with per-ray-block dynamic row windows.

    The full-bitmap splat pays a [H, B] @ [B, W] matmul per ray block no
    matter how few rows the block's deposits span. Measured at production
    geometry (100 heliostats, 50x50 points/facet, point-major ray order),
    per-1024-ray-block row extents are p50 ~60 px of 256 - so this kernel
    computes each block's deposit-row window up front (stop-gradient
    min/max, 8-aligned offset) and pays [window, B] @ [B, W]; the ~3-5% of
    blocks that exceed the window take an ownership-masked full-height
    fallback INSIDE the kernel. No ray is ever dropped - unlike
    :func:`bilinear_splat_windowed`, this path is exact for every input,
    making it safe as a default on TPU.

    Best used with rays ordered point-major over spatially tiled surface
    points (see artist_tpu.raytracing.splatting.point_tile_order) so
    consecutive rays share compact deposit spans.

    reference semantics: artist/raytracing/heliostat_ray_tracer.py:610-778.
    """
    return _dyn_forward(
        bitmap_e, bitmap_u, intensities, bitmap_resolution, window, compute_dtype
    )


def _dyn_forward(bitmap_e, bitmap_u, intensities, resolution, window, compute_dtype):
    width, height = int(resolution[0]), int(resolution[1])
    if window % 8 or window > height:
        raise ValueError(f"window ({window}) must be a multiple of 8 and <= height")
    num = bitmap_e.shape[0]
    e = _pad_rays(bitmap_e.astype(jnp.float32), -10.0, DYN_RAY_BLOCK)
    u = _pad_rays(bitmap_u.astype(jnp.float32), -10.0, DYN_RAY_BLOCK)
    w = _pad_rays(intensities.astype(jnp.float32), 0.0, DYN_RAY_BLOCK)
    blocks_per_map = e.shape[1] // DYN_RAY_BLOCK
    ou, fits = _dyn_offsets(e, u, height, width, window, DYN_RAY_BLOCK)

    kernel = functools.partial(
        _dyn_fwd_kernel,
        height=height,
        width=width,
        window=window,
        blocks_per_map=blocks_per_map,
        compute_dtype=compute_dtype,
    )
    ray_spec = pl.BlockSpec(
        (DYN_RAY_BLOCK,), lambda i, *_: (i,), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num * blocks_per_map,),
        in_specs=[ray_spec, ray_spec, ray_spec],
        out_specs=pl.BlockSpec(
            (1, height, width),
            lambda i, *_: (i // blocks_per_map, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num, height, width), jnp.float32),
        interpret=_interpret(),
    )(ou, fits, e.reshape(-1), u.reshape(-1), w.reshape(-1))


def _dyn_fwd(bitmap_e, bitmap_u, intensities, resolution, window, compute_dtype):
    out = _dyn_forward(
        bitmap_e, bitmap_u, intensities, resolution, window, compute_dtype
    )
    return out, (bitmap_e, bitmap_u, intensities)


def _dyn_bwd(resolution, window, compute_dtype, residuals, g):
    bitmap_e, bitmap_u, intensities = residuals
    width, height = int(resolution[0]), int(resolution[1])
    num, n = bitmap_e.shape
    e = _pad_rays(bitmap_e.astype(jnp.float32), -10.0, DYN_RAY_BLOCK)
    u = _pad_rays(bitmap_u.astype(jnp.float32), -10.0, DYN_RAY_BLOCK)
    w = _pad_rays(intensities.astype(jnp.float32), 0.0, DYN_RAY_BLOCK)
    blocks_per_map = e.shape[1] // DYN_RAY_BLOCK
    padded = e.shape[1]
    ou, fits = _dyn_offsets(e, u, height, width, window, DYN_RAY_BLOCK)

    kernel = functools.partial(
        _dyn_bwd_kernel,
        height=height,
        width=width,
        window=window,
        compute_dtype=compute_dtype,
    )
    ray_spec = pl.BlockSpec(
        (DYN_RAY_BLOCK,), lambda i, *_: (i,), memory_space=pltpu.VMEM
    )
    grad_spec = pl.BlockSpec(
        (1, height, width),
        lambda i, *_: (i // blocks_per_map, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((num * padded,), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num * blocks_per_map,),
        in_specs=[ray_spec, ray_spec, ray_spec, grad_spec],
        out_specs=(ray_spec, ray_spec, ray_spec),
    )
    de, du, dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(ou, fits, e.reshape(-1), u.reshape(-1), w.reshape(-1), g.astype(jnp.float32))
    return (
        de.reshape(num, padded)[:, :n],
        du.reshape(num, padded)[:, :n],
        dw.reshape(num, padded)[:, :n],
    )


bilinear_splat_dynamic_window.defvjp(_dyn_fwd, _dyn_bwd)


def bilinear_splat_windowed(
    bitmap_e: jnp.ndarray,
    bitmap_u: jnp.ndarray,
    intensities: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
    window: int,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Windowed splat: pay ``window``-wide matmuls instead of bitmap-wide.

    The full-bitmap splat's per-ray cost is Theta(H * W) regardless of how
    few pixels the flux spot covers (each ray's 4-pixel deposit rides a
    bitmap-wide one-hot matmul). When a heliostat's spot is compact -
    focused fields, calibration images, large target planes - splatting
    into a per-heliostat window of static size ``window`` (dynamic offset,
    intensity-weighted center, stop-gradient) cuts both the MXU and the
    factor-construction cost by ``(H W) / window^2``.

    EXACT for rays inside the window; rays farther than ``window/2`` pixels
    from their heliostat's intensity-weighted spot center are dropped (use
    :func:`windowed_drop_fraction` to validate a window choice; the
    full-bitmap path remains the default).

    reference semantics: artist/raytracing/heliostat_ray_tracer.py:610-778.
    """
    width, height = int(bitmap_resolution[0]), int(bitmap_resolution[1])
    window = int(window)
    if window >= max(width, height):
        return bilinear_splat_pallas(
            bitmap_e, bitmap_u, intensities, bitmap_resolution, compute_dtype
        )
    offset_e, offset_u = _window_offsets(
        bitmap_e, bitmap_u, intensities, (width, height), window
    )
    local_e = bitmap_e - offset_e[:, None].astype(bitmap_e.dtype)
    local_u = bitmap_u - offset_u[:, None].astype(bitmap_u.dtype)
    windows = bilinear_splat_pallas(
        local_e, local_u, intensities, (window, window), compute_dtype
    )  # [M, window, window]

    def place(window_map, ou, oe):
        return jax.lax.dynamic_update_slice(
            jnp.zeros((height, width), window_map.dtype), window_map, (ou, oe)
        )

    return jax.vmap(place)(windows, offset_u, offset_e)


def _window_offsets(bitmap_e, bitmap_u, intensities, resolution, window):
    """Per-heliostat window origins (int32, stop-gradient, clamped inside)."""
    width, height = resolution
    w = jax.lax.stop_gradient(intensities)
    e = jax.lax.stop_gradient(bitmap_e)
    u = jax.lax.stop_gradient(bitmap_u)
    total = jnp.sum(w, axis=1) + 1e-12
    center_e = jnp.sum(e * w, axis=1) / total
    center_u = jnp.sum(u * w, axis=1) / total
    offset_e = jnp.clip(
        jnp.floor(center_e - window / 2), 0, width - window
    ).astype(jnp.int32)
    offset_u = jnp.clip(
        jnp.floor(center_u - window / 2), 0, height - window
    ).astype(jnp.int32)
    return offset_e, offset_u


def windowed_drop_fraction(
    bitmap_e: jnp.ndarray,
    bitmap_u: jnp.ndarray,
    intensities: jnp.ndarray,
    bitmap_resolution: tuple[int, int],
    window: int,
) -> jnp.ndarray:
    """Fraction of (in-bitmap) intensity a windowed splat would drop.

    Validation helper for choosing ``window``: 0.0 means the windowed splat
    is exact for this batch.
    """
    width, height = int(bitmap_resolution[0]), int(bitmap_resolution[1])
    offset_e, offset_u = _window_offsets(
        bitmap_e, bitmap_u, intensities, (width, height), int(window)
    )
    def in_bounds(e, u, w_limit, h_limit):
        lower_e = jnp.floor(e)
        lower_u = jnp.floor(u)
        return (
            (lower_e >= 0)
            & (lower_e <= w_limit - 2)
            & (lower_u >= 0)
            & (lower_u <= h_limit - 2)
        )

    full = in_bounds(bitmap_e, bitmap_u, width, height)
    local = in_bounds(
        bitmap_e - offset_e[:, None],
        bitmap_u - offset_u[:, None],
        window,
        window,
    )
    w = jnp.where(full, intensities, 0.0)
    kept = jnp.where(local, w, 0.0)
    return 1.0 - jnp.sum(kept) / (jnp.sum(w) + 1e-12)
