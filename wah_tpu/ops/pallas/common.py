"""In-kernel (Mosaic/VPU) lane-wise primitives shared by the fused WAH
kernels: masked shifts, Hillis-Steele scans, and monotone log-shift
routing over the last axis of a (rows, lanes) VMEM tile.

These re-express, inside one Pallas grid step, what the reference does
with warp shuffles and shared memory (kernels.cu:13-28, 53-61): every
primitive is a short sequence of lane rolls + selects — pure VPU work on
VMEM-resident tiles, no lane-crossing shuffles, no shared-memory
barriers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lane_iota",
    "shift_right",
    "shift_left",
    "cumsum_lanes",
    "cummax_lanes",
    "compact_lanes",
    "expand_lanes",
]


def lane_iota(shape, dtype=jnp.int32):
    """Per-lane column index (2-D iota; 1-D iota is unsupported on TPU)."""
    return jax.lax.broadcasted_iota(dtype, shape, len(shape) - 1)


def shift_right(x, k: int, fill, col=None):
    """y[..., i] = x[..., i-k]; first k lanes become `fill` (static k).

    Boolean inputs round-trip through int32: Mosaic's lane rotate and
    vector selects only support 32-bit elements, so masks are shifted as
    0/1 ints and turned back into predicates with a compare.
    `col` lets callers pass a precomputed lane iota.
    """
    if k == 0:
        return x
    as_bool = x.dtype == jnp.bool_
    if as_bool:
        x, fill = x.astype(jnp.int32), jnp.int32(bool(fill))
    if col is None:
        col = lane_iota(x.shape)
    y = jnp.where(col >= k, pltpu.roll(x, shift=k, axis=x.ndim - 1), fill)
    return y != 0 if as_bool else y


def shift_left(x, k: int, fill, col=None):
    """y[..., i] = x[..., i+k]; last k lanes become `fill` (static k)."""
    if k == 0:
        return x
    as_bool = x.dtype == jnp.bool_
    if as_bool:
        x, fill = x.astype(jnp.int32), jnp.int32(bool(fill))
    n = x.shape[-1]
    if col is None:
        col = lane_iota(x.shape)
    y = jnp.where(
        col < n - k, pltpu.roll(x, shift=n - k, axis=x.ndim - 1), fill
    )
    return y != 0 if as_bool else y


def cumsum_lanes(x, nbits: int, col=None):
    """Inclusive prefix sum along lanes (Hillis-Steele, nbits steps)."""
    for b in range(nbits):
        x = x + shift_right(x, 1 << b, jnp.zeros((), x.dtype), col)
    return x


def cummax_lanes(x, nbits: int, neutral, col=None):
    """Inclusive prefix max along lanes."""
    for b in range(nbits):
        x = jnp.maximum(x, shift_right(x, 1 << b, neutral, col))
    return x


def compact_lanes(vals, ok, d, nbits: int):
    """Move element i LEFT by d[i] lanes (monotone routing, LSB->MSB).

    Same contract as ops.compact.compact: d >= 0, non-decreasing over
    live elements. Returns (moved vals list, moved ok mask).
    """
    vals = list(vals)
    F = jnp.zeros((), jnp.int32)
    for b in range(nbits):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_left(moving, k, False)
        vals = [
            jnp.where(src, shift_left(v, k, jnp.zeros((), v.dtype)), v)
            for v in vals
        ]
        d = jnp.where(src, shift_left(d, k, F), d)
        ok = src | (ok & ~moving)
    return vals, ok


def expand_lanes(vals, ok, d, nbits: int):
    """Move element i RIGHT by d[i] lanes (monotone routing, MSB->LSB)."""
    vals = list(vals)
    F = jnp.zeros((), jnp.int32)
    for b in reversed(range(nbits)):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_right(moving, k, False)
        vals = [
            jnp.where(src, shift_right(v, k, jnp.zeros((), v.dtype)), v)
            for v in vals
        ]
        d = jnp.where(src, shift_right(d, k, F), d)
        ok = src | (ok & ~moving)
    return vals, ok
