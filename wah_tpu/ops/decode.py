"""Pure-JAX (XLA) WAH decoder.

TPU-native inversion of the reference decode pipeline
(getCounts -> scan -> decompressWords -> mergeWords,
decompress.cu:18-141, kernels.cu:291-385). The reference's load-imbalanced
per-thread fill loops (kernels.cu:346-348) become a monotone log-shift
expansion (each compressed word routed to its output start position)
followed by a cummax forward-fill that recovers the covering word's fill
type at every output chunk — O(log n) vector passes, perfectly balanced.

Shapes are static: the caller supplies a chunk capacity (>= total expanded
chunks); true sizes are returned as traced scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import BIT31, BIT3130, LEN_MASK, ONES31
from . import bits
from .compact import ceil_log2, expand

__all__ = ["word_counts", "decode_chunks", "decode"]

_U = jnp.uint32
_I = jnp.int32

# forward-fill type codes packed into the low 2 bits of the cummax key
_T_ZERO, _T_ONES, _T_LIT = 1, 2, 3


def word_counts(words: jnp.ndarray, m) -> jnp.ndarray:
    """Expanded chunk count per compressed word: fill -> run length,
    literal -> 1 (reference getCounts, kernels.cu:291-309); words at or
    beyond index m count 0."""
    i = jnp.arange(words.shape[0], dtype=_I)
    is_fill = (words & _U(BIT31)) != 0
    c = jnp.where(is_fill, (words & _U(LEN_MASK)).astype(_I), _I(1))
    return jnp.where(i < m, c, _I(0))


def decode_chunks(
    words: jnp.ndarray, m, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand words[:m] into 31-bit chunks.

    Returns (chunks (chunk_capacity,), n_chunks). Requires
    chunk_capacity >= n_chunks and >= words.shape[0]; chunks beyond
    n_chunks are zero. Fill words with zero run length are not produced
    by any WAH encoder and are unsupported here (the golden model and
    api layer validate streams).
    """
    M = words.shape[0]
    C = chunk_capacity
    assert C >= M, (C, M)
    words = words.astype(_U)
    counts = word_counts(words, m)
    offsets = jnp.cumsum(counts, dtype=_I) - counts
    n_chunks = offsets[-1] + counts[-1]

    i = jnp.arange(M, dtype=_I)
    ok = (i < m) & (offsets < C)
    is_fill = (words & _U(BIT31)) != 0
    is_ones = (words & _U(BIT3130)) == _U(BIT3130)
    # chunk value at the word's start position (fills cover it too)
    val0 = jnp.where(is_fill, jnp.where(is_ones, _U(ONES31), _U(0)), words)
    t = jnp.where(is_fill, jnp.where(is_ones, _I(_T_ONES), _I(_T_ZERO)), _I(_T_LIT))
    # cummax key: start offset in the high bits, fill type in the low 2
    key = (offsets << 2) | t

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((C - M,), fill, dtype=x.dtype)], axis=-1
        )

    d = offsets - i  # >= 0, non-decreasing (counts >= 1)
    (val_d, key_d), ok_d = expand(
        [pad(val0, 0), pad(key, 0)],
        pad(ok, False),
        pad(d, 0),
        ceil_log2(C),
    )
    val_d = jnp.where(ok_d, val_d, _U(0))
    key_d = jnp.where(ok_d, key_d, _I(0))

    cm = jax.lax.cummax(key_d, axis=0)
    col = jnp.arange(C, dtype=_I)
    is_start = (cm >> 2) == col
    covered_ones = (cm & 3) == _T_ONES
    chunks = jnp.where(
        is_start, val_d, jnp.where(covered_ones, _U(ONES31), _U(0))
    )
    chunks = jnp.where(col < n_chunks, chunks, _U(0))
    return chunks, n_chunks


def decode(
    words: jnp.ndarray, m, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decompress words[:m] -> (ints (chunk_capacity//32*31,), n_ints).

    n_ints = ceil(31 * n_chunks / 32) (reference: decompress.cu:82-92);
    ints beyond n_ints are zero. chunk_capacity must be a multiple of 32.
    """
    assert chunk_capacity % 32 == 0, chunk_capacity
    chunks, n_chunks = decode_chunks(words, m, chunk_capacity)
    ints = bits.merge_chunks(chunks)
    n_ints = (31 * n_chunks + 31) // 32
    return ints, n_ints
