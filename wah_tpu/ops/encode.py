"""Pure-JAX (XLA) WAH encoder.

TPU-native pipeline replacing the reference's warp/shared-memory hierarchy
(compressData, kernels.cu:51-262) with vectorized masks and scans over a
(num_blocks, 1024) chunk array:

  repartition -> classify -> run-start mask -> cumsum word index ->
  cummax covering-start -> run lengths -> word values ->
  per-block log-shift compaction -> block-count scan -> global stitch.

Semantics match the reference kernel exactly: complete run-length
coalescing of fill chunks within each 1024-chunk block, never across
blocks; literals always emitted verbatim (see golden.py and SURVEY.md
section 0.1). Output is (capacity,) uint32 plus a word count — all shapes
static, the compressed stream is the valid prefix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    BIT31,
    BIT3130,
    BLOCK_CHUNKS,
    BLOCK_INTS,
    ONES31,
    WORD_LITERAL,
    WORD_ONES,
    WORD_ZEROS,
)
from . import bits
from .compact import ceil_log2, compact, shift_left, shift_right
from ..golden import chunk_count

__all__ = ["classify", "encode_blocks", "stitch", "encode", "encode_batch"]

_U = jnp.uint32
_I = jnp.int32


def classify(chunks: jnp.ndarray) -> jnp.ndarray:
    """Chunk type: WORD_ZEROS / WORD_ONES / WORD_LITERAL
    (reference: kernels.cu:93-112)."""
    return jnp.where(
        chunks == _U(0),
        _I(WORD_ZEROS),
        jnp.where(chunks == _U(ONES31), _I(WORD_ONES), _I(WORD_LITERAL)),
    )


def encode_blocks(
    chunks: jnp.ndarray, n_valid_chunks=None, chunk_base=0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (nb, 1024) chunks -> (staging (nb, 1024) uint32, counts (nb,) int32).

    Each staging row holds that block's compressed words as a dense prefix
    of `counts[b]` words, zero elsewhere (zero is never a valid word).
    `n_valid_chunks` (static or traced scalar) marks trailing padding
    chunks as non-emitting; `chunk_base` is the global chunk index of
    chunks[0, 0] (nonzero on shards of a distributed encode, where
    validity is judged against the global position).
    """
    nb, C = chunks.shape
    assert C == BLOCK_CHUNKS, chunks.shape
    if n_valid_chunks is None:
        n_valid_chunks = nb * C

    t = classify(chunks)
    col = jnp.arange(C, dtype=_I)
    gpos = (
        jnp.asarray(chunk_base, dtype=_I)
        + jnp.arange(nb, dtype=_I)[:, None] * C
        + col[None, :]
    )
    v = gpos < jnp.asarray(n_valid_chunks, dtype=_I)

    # run starts (reference run-end flags inverted; kernels.cu:126-141)
    prev_t = shift_right(t, 1, fill=-1)  # block-local: col 0 always starts
    start = v & ((t != prev_t) | (t == WORD_LITERAL))

    widx = jnp.cumsum(start, axis=-1, dtype=_I) - 1  # word slot of covering run
    counts = jnp.sum(start, axis=-1, dtype=_I)

    # run ends: next chunk starts a new run, or is invalid / past block end
    nv = shift_left(v, 1, fill=False)
    end = v & (shift_left(start, 1, fill=True) | ~nv)

    # covering run start position via cummax (replaces the per-lane
    # backward walk at kernels.cu:155-162 and the warp-merge machinery)
    run_start = jax.lax.cummax(jnp.where(start, col, _I(-1)), axis=1)
    run_len = (col - run_start + 1).astype(_U)

    value = jnp.where(
        t == WORD_LITERAL,
        chunks,
        jnp.where(
            t == WORD_ONES, _U(BIT3130) | run_len, _U(BIT31) | run_len
        ),
    )

    # per-block compaction: word at chunk-position i goes to slot widx[i]
    d = col[None, :] - widx
    (staging,), ok = compact([value], end, d, ceil_log2(C))
    staging = jnp.where(ok, staging, _U(0))
    return staging, counts


def stitch(
    staging: jnp.ndarray, counts: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate per-block word streams into one dense stream.

    Replaces thrust::exclusive_scan + moveData (compress.cu:133-166,
    kernels.cu:273-280) with a block-count scan and a global monotone
    log-shift compaction. Returns (words (nb*1024,), total int32).
    """
    nb, C = staging.shape
    offsets = jnp.cumsum(counts, dtype=_I) - counts  # exclusive scan
    total = offsets[-1] + counts[-1]
    col = jnp.arange(C, dtype=_I)
    ok = (col[None, :] < counts[:, None]).reshape(-1)
    d = jnp.broadcast_to(
        (jnp.arange(nb, dtype=_I) * C - offsets)[:, None], (nb, C)
    ).reshape(-1)
    (words,), okf = compact([staging.reshape(-1)], ok, d, ceil_log2(nb * C))
    return jnp.where(okf, words, _U(0)), total


def encode_padded(
    ints: jnp.ndarray, n_valid_chunks
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compress a block-aligned (nb*992,) uint32 bitmap whose first
    `n_valid_chunks` (traced scalar allowed) chunks are live; trailing
    padding emits no words. Returns (words (nb*1024,), total_count)."""
    assert ints.shape[0] % BLOCK_INTS == 0, ints.shape
    nb = ints.shape[0] // BLOCK_INTS
    chunks = bits.repartition_chunks(ints.astype(_U)).reshape(nb, BLOCK_CHUNKS)
    staging, counts = encode_blocks(chunks, n_valid_chunks)
    return stitch(staging, counts)


def encode_batch(
    ints: jnp.ndarray, n_valid_chunks
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compress a batch of equal-length bitmap columns (the bitmap-index
    workload: one bitmap per indexed value).

    ints: (C, nb*992) uint32, each row a block-aligned column;
    n_valid_chunks applies to every column. Returns
    (words (C, nb*1024), totals (C,)). Columns are fully independent —
    the reference has no batched mode (one compress() call per column,
    compress.h:12); here the column axis is just a vmapped leading dim.
    """
    f = jax.vmap(lambda x: encode_padded(x, n_valid_chunks))
    words, totals = f(ints.astype(_U))
    return words, totals


def encode(ints: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compress a (n,) uint32 bitmap -> (words (capacity,), total_count).

    capacity = ceil(chunk_count(n) / 1024) * 1024; the stream is
    words[:total_count]. Mirrors the reference host driver compress()
    (compress.cu:41-209) as a single fused XLA computation.
    """
    n = ints.shape[0]
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    ints = ints.astype(_U)
    padded = jnp.zeros(nb * BLOCK_INTS, dtype=_U).at[:n].set(ints)
    return encode_padded(padded, nv)
