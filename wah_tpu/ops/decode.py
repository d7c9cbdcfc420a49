"""Pure-JAX (XLA) WAH decoder.

TPU-native inversion of the reference decode pipeline
(getCounts -> scan -> decompressWords -> mergeWords,
decompress.cu:18-141, kernels.cu:291-385). The reference's load-imbalanced
per-thread fill loops (kernels.cu:346-348) become a monotone log-shift
expansion (each compressed word routed to its output start position)
followed by a cummax forward-fill that recovers the covering word's fill
type at every output chunk — O(log n) vector passes, perfectly balanced.

The core primitive is `decode_span`: expand an arbitrary window
[base, base + chunk_capacity) of the stream's chunk space. Because every
compressed word expands to >= 1 chunk, at most `chunk_capacity` words can
cover a span of that many chunks, so the span decoder windows the stream
with a dynamic slice of static size `chunk_capacity` — this is what makes
both the sharded multi-chip decoder (each shard owns a chunk range) and
the Pallas block decoder possible with fully static shapes.

Shapes are static: the caller supplies a chunk capacity; true sizes are
returned as traced scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import BIT31, BIT3130, LEN_MASK, ONES31
from . import bits
from .compact import ceil_log2, expand

__all__ = [
    "word_counts",
    "decode_span",
    "decode_chunks",
    "decode",
    "decode_batch",
]

_U = jnp.uint32
_I = jnp.int32

# forward-fill type codes packed into the low 2 bits of the cummax key
_T_ZERO, _T_ONES, _T_LIT = 1, 2, 3

# offset sentinel for padded window slots: larger than any valid chunk
# offset (max stream 2^30 chunks) but safe against int32 overflow
_FAR = 1 << 30


def word_counts(words: jnp.ndarray, m) -> jnp.ndarray:
    """Expanded chunk count per compressed word: fill -> run length,
    literal -> 1 (reference getCounts, kernels.cu:291-309); words at or
    beyond index m count 0."""
    i = jnp.arange(words.shape[0], dtype=_I)
    is_fill = (words & _U(BIT31)) != 0
    c = jnp.where(is_fill, (words & _U(LEN_MASK)).astype(_I), _I(1))
    return jnp.where(i < m, c, _I(0))


def expand_window(
    win_words: jnp.ndarray, off_local: jnp.ndarray, ok: jnp.ndarray
) -> jnp.ndarray:
    """Expand a word window into the (C,) chunk span it covers.

    win_words: (C,) compressed words; off_local: (C,) their start chunk
    positions relative to the span, clamped to [0, C] (non-decreasing,
    strictly increasing over live words except a single 0-clamp at the
    head); ok: live mask (a prefix). Returns chunks (C,) with garbage
    beyond the covered range (caller masks by span length).
    """
    C = win_words.shape[0]
    is_fill = (win_words & _U(BIT31)) != 0
    is_ones = (win_words & _U(BIT3130)) == _U(BIT3130)
    # chunk value at the word's start position (fills cover it too)
    val0 = jnp.where(
        is_fill, jnp.where(is_ones, _U(ONES31), _U(0)), win_words
    )
    t = jnp.where(
        is_fill, jnp.where(is_ones, _I(_T_ONES), _I(_T_ZERO)), _I(_T_LIT)
    )
    # cummax key: start offset in the high bits, fill type in the low 2
    key = (off_local << 2) | t

    i = jnp.arange(C, dtype=_I)
    d = off_local - i  # >= 0 and non-decreasing over live words
    (val_d, key_d), ok_d = expand([val0, key], ok, d, ceil_log2(C))
    val_d = jnp.where(ok_d, val_d, _U(0))
    key_d = jnp.where(ok_d, key_d, _I(0))

    cm = jax.lax.cummax(key_d, axis=0)
    is_start = (cm >> 2) == i
    covered_ones = (cm & 3) == _T_ONES
    return jnp.where(
        is_start, val_d, jnp.where(covered_ones, _U(ONES31), _U(0))
    )


def decode_span(
    words: jnp.ndarray, m, base, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand chunks [base, base + chunk_capacity) of the stream words[:m].

    Returns (chunks (chunk_capacity,), n_chunks_total) where
    n_chunks_total is the full expanded length of the stream; span chunks
    at or beyond n_chunks_total - base are zero. `base` may be a traced
    scalar — this is the unit of work one shard (or one Pallas grid step)
    owns in the distributed decoder.
    """
    M = words.shape[0]
    C = chunk_capacity
    words = words.astype(_U)
    base = jnp.asarray(base, dtype=_I)
    counts = word_counts(words, m)
    offsets = jnp.cumsum(counts, dtype=_I) - counts
    n_chunks = offsets[-1] + counts[-1]

    # last word starting at or before `base` (covers the span head)
    lo = jnp.clip(
        jnp.searchsorted(offsets, base, side="right").astype(_I) - 1,
        0,
        jnp.maximum(M - 1, 0),
    )

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((C,), fill, dtype=x.dtype)], axis=-1
        )

    win_words = jax.lax.dynamic_slice(pad(words, 0), (lo,), (C,))
    win_off = jax.lax.dynamic_slice(pad(offsets, _FAR), (lo,), (C,))
    win_cnt = jax.lax.dynamic_slice(pad(counts, 0), (lo,), (C,))
    idx = lo + jnp.arange(C, dtype=_I)

    ok = (idx < m) & (win_off < base + C) & (win_off + win_cnt > base)
    off_local = jnp.clip(win_off - base, 0, C)
    chunks = expand_window(win_words, off_local, ok)
    i = jnp.arange(C, dtype=_I)
    chunks = jnp.where(i < n_chunks - base, chunks, _U(0))
    return chunks, n_chunks


def decode_chunks(
    words: jnp.ndarray, m, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand words[:m] into 31-bit chunks.

    Returns (chunks (chunk_capacity,), n_chunks). Requires
    chunk_capacity >= n_chunks; chunks beyond n_chunks are zero. Fill
    words with zero run length are not produced by any WAH encoder and
    are unsupported here (the golden model and api layer validate
    streams).
    """
    return decode_span(words, m, 0, chunk_capacity)


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
    # ceil(31*n/32) = n - n//32, overflow-free: 31*n_chunks wraps int32
    # past n_chunks = 69,273,666 (~268 MB bitmaps; see pallas/decode_kernel)
    n_ints = n_chunks - n_chunks // 32
    return ints, n_ints


def decode_batch(
    words: jnp.ndarray, ms: jnp.ndarray, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decompress a batch of streams (bitmap-index columns).

    words: (C, M) uint32, row c holding stream c as a prefix of ms[c]
    words. Returns (ints (C, chunk_capacity//32*31), n_ints (C,)).
    """
    f = jax.vmap(lambda w, m: decode(w, m, chunk_capacity))
    return f(words.astype(_U), ms.astype(_I))
