"""Fused Pallas TPU decode kernel.

One grid step expands a tile of 8 output blocks (8 x 1024 chunks)
entirely in VMEM. This inverts the reference decode pipeline
(decompressWords + mergeWords, kernels.cu:321-385) the TPU way: instead
of per-thread serial fill loops (load-imbalanced for long fills,
kernels.cu:346-348), each output block gathers its covering word window,
routes each word to its in-block start with a monotone lane expansion,
and forward-fills covering runs with a cummax scan. Work per output
chunk is O(log) lane ops regardless of fill lengths — perfectly
balanced.

Window mechanics: every compressed word expands to >= 1 chunk, so <=
1024 words cover a 1024-chunk block; the covering window [lo, lo+1024)
starts at an arbitrary word index, but Mosaic DMA slices must be
tile-aligned — so each row DMAs the TWO aligned 1024-word tiles
containing its window ((lo//1024)*1024 .. +2048, one dynamic
leading-index copy from a (T, 8, 128) view) and rotates the window into
phase in VMEM with a vectorized log-shift rotation (lo mod 1024).

The word offsets (exclusive scan of expanded counts, reference
decompress.cu:66-93) and the per-block window starts (searchsorted) are
tiny XLA precomputations prefetched as scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import BIT31, BIT3130, BLOCK_CHUNKS, LEN_MASK, ONES31
from .. import bits
from ..decode import word_counts
from .common import cummax_lanes, expand_lanes, lane_iota

__all__ = ["decode_blocks", "decode"]

_U = jnp.uint32
_I = jnp.int32

TILE_BLOCKS = 8
L = BLOCK_CHUNKS
W = 2 * L
_FAR = 1 << 30  # offset sentinel for out-of-stream window slots
_T_ZERO, _T_ONES, _T_LIT = 1, 2, 3  # cummax key type codes (low 2 bits)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rotate_left_rows(x, s, nbits: int):
    """Rotate row i of x left by s[i] lanes (s: (rows, 1) int32)."""
    n = x.shape[-1]
    rs = (n - s) % n
    for k in range(nbits):
        bit = ((rs >> k) & 1) != 0
        x = jnp.where(bit, pltpu.roll(x, shift=1 << k, axis=1), x)
    return x


def _decode_body(
    lo_ref, nc_ref, words_ref, offs_ref, locol_ref, chunks_ref,
    wscr, oscr, sems
):
    pid = pl.program_id(0)
    B, _ = chunks_ref.shape

    def dmas(r):
        t0 = lo_ref[pid * B + r] // L
        return (
            pltpu.make_async_copy(
                words_ref.at[pl.ds(t0, 2)], wscr.at[pl.ds(2 * r, 2)],
                sems.at[0, r],
            ),
            pltpu.make_async_copy(
                offs_ref.at[pl.ds(t0, 2)], oscr.at[pl.ds(2 * r, 2)],
                sems.at[1, r],
            ),
        )

    for r in range(B):
        w, o = dmas(r)
        w.start()
        o.start()
    for r in range(B):
        w, o = dmas(r)
        w.wait()
        o.wait()

    # rotate each row's 2-tile window so lane 0 == word lo (lo mod 1024)
    s = locol_ref[:] % L  # (B, 1)
    win_w = _rotate_left_rows(wscr[...].reshape(B, W), s, 11)[:, :L]
    win_off = _rotate_left_rows(oscr[...].reshape(B, W), s, 11)[:, :L]

    col = lane_iota((B, L))
    row = jax.lax.broadcasted_iota(_I, (B, L), 0)
    base = (pid * B + row) * L

    is_fill = (win_w & _U(BIT31)) != 0
    is_ones = (win_w & _U(BIT3130)) == _U(BIT3130)
    cnt = jnp.where(is_fill, (win_w & _U(LEN_MASK)).astype(_I), _I(1))

    rel = win_off - base  # sentinel slots are far positive, never live
    ok = (rel < L) & (rel + cnt > 0)
    off_local = jnp.clip(rel, 0, L)

    val0 = jnp.where(is_fill, jnp.where(is_ones, _U(ONES31), _U(0)), win_w)
    t = jnp.where(
        is_fill,
        jnp.where(is_ones, _I(_T_ONES), _I(_T_ZERO)),
        _I(_T_LIT),
    )
    key = (off_local << 2) | t

    d = off_local - col
    (val_d, key_d), ok_d = expand_lanes([val0, key], ok, d, 10)
    zero_u = jnp.zeros((B, L), _U)
    val_d = jnp.where(ok_d, val_d, zero_u)
    key_d = jnp.where(ok_d, key_d, _I(0))

    cm = cummax_lanes(key_d, 10, _I(0))
    is_start = (cm >> 2) == col
    covered_ones = (cm & 3) == _I(_T_ONES)
    chunks = jnp.where(
        is_start, val_d, jnp.where(covered_ones, _U(ONES31), zero_u)
    )
    chunks_ref[:] = jnp.where(base + col < nc_ref[0], chunks, zero_u)


def decode_blocks(
    words: jnp.ndarray, m, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand words[:m] -> (chunks (chunk_capacity,), n_chunks).

    chunk_capacity must be a multiple of 1024. Fused-kernel equivalent
    of ops.decode.decode_chunks.
    """
    assert chunk_capacity % L == 0, chunk_capacity
    M = words.shape[0]
    B = TILE_BLOCKS
    words = words.astype(_U)
    m = jnp.asarray(m, dtype=_I)

    counts = word_counts(words, m)
    offsets = jnp.cumsum(counts, dtype=_I) - counts
    n_chunks = offsets[-1] + counts[-1]
    i = jnp.arange(M, dtype=_I)
    offs_masked = jnp.where(i < m, offsets, _I(_FAR))

    nbo = chunk_capacity // L
    nbo_p = -(-nbo // B) * B
    g = jnp.arange(nbo_p, dtype=_I) * L
    lo_arr = jnp.clip(
        jnp.searchsorted(offs_masked, g, side="right").astype(_I) - 1,
        0,
        max(M - 1, 0),
    )
    # pad the stream to whole tiles + one extra tile so every 2-tile
    # window DMA is in bounds, then view as (T, 8, 128) tiles
    Mp = (-(-M // L) + 2) * L
    pad = Mp - M
    words_t = jnp.concatenate([words, jnp.zeros((pad,), _U)]).reshape(
        -1, 8, 128
    )
    offs_t = jnp.concatenate(
        [offs_masked, jnp.full((pad,), _FAR, _I)]
    ).reshape(-1, 8, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbo_p // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((B, 1), lambda i, lo, nc: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, L), lambda i, lo, nc: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * B, 8, 128), _U),
            pltpu.VMEM((2 * B, 8, 128), _I),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    chunks2d = pl.pallas_call(
        _decode_body,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nbo_p, L), _U)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(
        lo_arr,
        n_chunks.reshape(1),
        words_t,
        offs_t,
        lo_arr.reshape(nbo_p, 1),
    )[0]
    return chunks2d.reshape(-1)[:chunk_capacity], n_chunks


def decode(
    words: jnp.ndarray, m, chunk_capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel equivalent of ops.decode.decode: words[:m] ->
    (ints (chunk_capacity//32*31,), n_ints)."""
    chunks, n_chunks = decode_blocks(words, m, chunk_capacity)
    ints = bits.merge_chunks(chunks)
    n_ints = (31 * n_chunks + 31) // 32
    return ints, n_ints
