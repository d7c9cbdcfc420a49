"""Gather/scatter-free stream compaction and expansion for TPUs.

The reference implements compaction with a gap-skipping scatter
(moveData, kernels.cu:273-280) and fill expansion with per-thread serial
scatter loops (decompressWords, kernels.cu:321-359). Neither pattern maps
to the TPU's vector units. Both are monotone routings — every element
moves by a displacement d[i] that is non-negative and non-decreasing in i
— so they are re-expressed here as log-step butterfly shifts: at step b,
elements whose displacement has bit b set move by 2^b. Monotonicity of d
guarantees no two live elements ever collide at any intermediate step
(moves left / compaction: process bits LSB->MSB; moves right / expansion:
MSB->LSB).

Each step is a static slice + select over the whole array — pure VPU work,
fully fusable by XLA, no dynamic indexing anywhere.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

__all__ = ["shift_left", "shift_right", "compact", "expand", "ceil_log2"]


def ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


def shift_right(x: jnp.ndarray, k: int, fill=0) -> jnp.ndarray:
    """y[..., i] = x[..., i-k]; the first k positions become `fill`."""
    if k == 0:
        return x
    pad = jnp.full((*x.shape[:-1], k), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def shift_left(x: jnp.ndarray, k: int, fill=0) -> jnp.ndarray:
    """y[..., i] = x[..., i+k]; the last k positions become `fill`."""
    if k == 0:
        return x
    pad = jnp.full((*x.shape[:-1], k), fill, dtype=x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def compact(
    vals: Sequence[jnp.ndarray], ok: jnp.ndarray, d: jnp.ndarray, nbits: int
) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Move element i LEFT by d[i] positions along the last axis.

    Requires: d >= 0 and, restricted to positions where ok, the target
    positions i - d[i] are strictly increasing (equivalently d is
    non-decreasing over live elements). Bits processed LSB -> MSB.
    Returns (moved vals, moved ok); positions with ok=False are garbage.
    """
    vals = list(vals)
    for b in range(nbits):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_left(moving, k, False)  # element arrives from i+k
        vals = [jnp.where(src, shift_left(v, k), v) for v in vals]
        d = jnp.where(src, shift_left(d, k), d)
        ok = src | (ok & ~moving)
    return vals, ok


def expand(
    vals: Sequence[jnp.ndarray], ok: jnp.ndarray, d: jnp.ndarray, nbits: int
) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Move element i RIGHT by d[i] positions along the last axis.

    Requires: d >= 0 and non-decreasing over live elements (targets
    i + d[i] strictly increasing). Bits processed MSB -> LSB.
    """
    vals = list(vals)
    for b in reversed(range(nbits)):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_right(moving, k, False)  # element arrives from i-k
        vals = [jnp.where(src, shift_right(v, k), v) for v in vals]
        d = jnp.where(src, shift_right(d, k), d)
        ok = src | (ok & ~moving)
    return vals, ok
