"""Sample-axis microbatching: gradient accumulation under a remat scan.

Plant-scale fields (4,000+ heliostats) exceed a single chip's HBM not
through the per-ray streams (``RenderConfig.ray_chunk`` bounds those) but
through the O(heliostats x surface_points) intermediates - aligned points,
normals, NURBS backward buffers - which XLA materializes field-wide for
the backward pass. Chunking the HELIOSTAT axis under a ``lax.scan`` with
``jax.checkpoint`` bounds them to one chunk: the backward re-runs each
chunk's forward (remat) and accumulates parameter gradients across chunks
automatically, exactly like multi-chip data parallelism with the mesh axis
replaced by a sequential scan. Losses that reduce per-sample (all of
:mod:`artist_tpu.optim.losses`) split exactly.

The reference bounds memory only through its ray-batching DataLoader
(reference: artist/raytracing/heliostat_ray_tracer.py:206-258, batch_size);
it has no sample-axis accumulation - a field that does not fit device
memory simply fails there.

Used by ``bench.py``'s 4,000-heliostat ``xl_field`` entry (blocking stays
field-wide across chunks: phase 1 maps every chunk to its 4-corner
blocking primitives - a tiny [H, 4, 4] output - and phase 2 traces each
chunk against the FULL primitive set, so cross-chunk blocking and its
gradients are exact).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _reshape_chunks(xs: Any, chunk: int) -> Any:
    def reshape(x):
        x = jnp.asarray(x)
        if x.shape[0] % chunk:
            raise ValueError(
                f"leading axis {x.shape[0]} is not divisible by chunk {chunk}"
            )
        return x.reshape(x.shape[0] // chunk, chunk, *x.shape[1:])
    return jax.tree.map(reshape, xs)


def chunked_map(
    fn: Callable[[Any], Any], xs: Any, chunk: int, remat: bool = True
) -> Any:
    """Apply ``fn`` to leading-axis chunks of ``xs``; concatenate outputs.

    ``fn`` maps a chunk-sized pytree slice to a pytree whose leaves have
    the chunk on their leading axis; the result stitches chunks back to
    the full leading axis. With ``remat`` (default), each chunk's forward
    is rematerialized in the backward pass, so peak memory holds ONE
    chunk's intermediates plus the (small) outputs.
    """
    body_fn = jax.checkpoint(fn) if remat else fn

    def body(carry, x):
        return carry, body_fn(x)

    _, ys = jax.lax.scan(body, None, _reshape_chunks(xs, chunk))
    return jax.tree.map(lambda y: y.reshape(-1, *y.shape[2:]), ys)


def chunked_sum(
    fn: Callable[[Any], Any], xs: Any, chunk: int, remat: bool = True
) -> Any:
    """Sum of ``fn`` over leading-axis chunks of ``xs`` (grad accumulation).

    The scan carry accumulates ``fn``'s (pytree) output across chunks;
    under ``jax.grad`` the parameter cotangents accumulate the same way -
    sequential data parallelism on one device. Per-sample-reducing losses
    split exactly: ``mean = chunked_sum(sum_of_chunk) / N``.
    """
    xs_chunked = _reshape_chunks(xs, chunk)
    body_fn = jax.checkpoint(fn) if remat else fn
    first = jax.tree.map(lambda x: x[0], xs_chunked)
    zero = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(fn, first)
    )

    def body(carry, x):
        return jax.tree.map(jnp.add, carry, body_fn(x)), None

    total, _ = jax.lax.scan(body, zero, xs_chunked)
    return total


def chunked_sum_and_map(
    fn: Callable[[Any], tuple[Any, Any]], xs: Any, chunk: int, remat: bool = True
) -> tuple[Any, Any]:
    """One scan returning BOTH an accumulated sum and concatenated outputs.

    ``fn`` maps a chunk slice to ``(sum_part, map_part)``: the first pytree
    is accumulated across chunks (e.g. the field's total flux bitmap), the
    second is stitched back along the leading axis (e.g. per-heliostat
    intercept factors). Saves re-running the chunk forward when a loss
    needs both a field-level reduction and per-sample diagnostics.
    """
    xs_chunked = _reshape_chunks(xs, chunk)
    body_fn = jax.checkpoint(fn) if remat else fn
    first = jax.tree.map(lambda x: x[0], xs_chunked)
    sum_shape, _ = jax.eval_shape(fn, first)
    zero = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sum_shape)

    def body(carry, x):
        sum_part, map_part = body_fn(x)
        return jax.tree.map(jnp.add, carry, sum_part), map_part

    total, ys = jax.lax.scan(body, zero, xs_chunked)
    return total, jax.tree.map(lambda y: y.reshape(-1, *y.shape[2:]), ys)
