"""Fused Pallas TPU encode kernel.

One grid step encodes a tile of 8 independent 1024-chunk blocks entirely
in VMEM — the fusion of the reference's compressData kernel stages
(kernels.cu:51-262: repartition, classify, run detection, merge, emit)
plus the moveData compaction (kernels.cu:273-280), re-expressed as lane
rolls + selects on (8, 1024) tiles:

  992-int repartition  -> monotone lane expansion (d = j//31) + bit shifts
  warp OR-reduce/scan  -> lane-wise Hillis-Steele scans (no warp level)
  cross-warp merge     -> cummax covering-run scan over the whole block
  gapped emit + move   -> in-VMEM monotone compaction to a dense prefix

The stitch kernel then assembles the dense stream with a *streaming
tile accumulator* (Mosaic DMA offsets must be tile-aligned, so the
word-granular scatter of the reference's moveData becomes:) each
block's dense word prefix is rotated to its global bit-stream phase
(offset mod 1024, vectorized log-shift rotation), OR-accumulated into a
2048-word pending window, and flushed to HBM one aligned 1024-word tile
at a time with double-buffered DMAs. The invariant `tiles_flushed ==
block_offset // 1024` holds because block counts are <= 1024. Output
words beyond `total` are zero.

HBM traffic per block: read 3968 B input + write 4096 B staging + 4 B
count, then stitch reads staging once and writes ~compressed size — ~3
passes total, vs ~30 materialized intermediates on the pure-XLA path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import BIT31, BIT3130, BLOCK_CHUNKS, BLOCK_INTS, ONES31
from .common import (
    compact_lanes,
    cummax_lanes,
    cumsum_lanes,
    expand_lanes,
    lane_iota,
    shift_left,
    shift_right,
)

__all__ = ["encode_tiles", "stitch_tiles", "encode_padded"]

_U = jnp.uint32
_I = jnp.int32

TILE_BLOCKS = 8  # blocks (rows) per grid step: fills the 8 VPU sublanes
L = BLOCK_CHUNKS  # 1024 words per block row
W = 2 * L  # pending-window lanes


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# block encoder
# ---------------------------------------------------------------------------

def _encode_body(nv_ref, ints_ref, staging_ref, counts_ref):
    B, _ = staging_ref.shape
    pid = pl.program_id(0)
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    # --- 32->31-bit repartition (reference: kernels.cu:72-79) ---------
    # source int j lands at lane j + j//31; lanes with col%32 == 31 stay 0
    ints_pad = jnp.concatenate(
        [ints_ref[:].astype(_U), jnp.zeros((B, L - BLOCK_INTS), _U)], axis=1
    )
    live = col < BLOCK_INTS
    (a,), ok_a = expand_lanes([ints_pad], live, col // 31, 5)
    a = jnp.where(ok_a, a, zero_u)
    xl = (col % 32).astype(_U)
    b_ = shift_right(a, 1, jnp.zeros((), _U))
    b_ = jnp.where(xl == _U(0), zero_u, b_)
    chunk = (((b_ >> (_U(31) - xl)) >> _U(1)) | (a << xl)) & _U(ONES31)

    # --- classify (reference: kernels.cu:93-112) ----------------------
    t = jnp.where(
        chunk == _U(0), _I(0), jnp.where(chunk == _U(ONES31), _I(1), _I(2))
    )

    # --- validity: global chunk position < n_valid_chunks -------------
    row = jax.lax.broadcasted_iota(_I, (B, L), 0)
    gpos = (pid * B + row) * L + col
    v = gpos < nv_ref[0]

    # --- run starts/ends + word slots (reference: kernels.cu:126-174,
    # 184-235 — the warp metadata + cross-warp merge machinery collapses
    # into two block-wide scans) --------------------------------------
    prev_t = shift_right(t, 1, _I(-1))
    start = v & ((t != prev_t) | (t == _I(2)))
    incl = cumsum_lanes(start.astype(_I), 10)
    widx = incl - 1
    counts_ref[:] = incl[:, L - 1 : L]

    nv_next = shift_left(v, 1, False)
    end = v & (shift_left(start, 1, True) | ~nv_next)

    run_start = cummax_lanes(jnp.where(start, col, _I(-1)), 10, _I(-1))
    run_len = (col - run_start + 1).astype(_U)

    # --- emit words (reference: kernels.cu:237-259) -------------------
    value = jnp.where(
        t == _I(2),
        chunk,
        jnp.where(t == _I(1), _U(BIT3130) | run_len, _U(BIT31) | run_len),
    )

    # --- in-VMEM compaction to a dense prefix (replaces moveData) -----
    (vals,), okf = compact_lanes([value], end, col - widx, 10)
    staging_ref[:] = jnp.where(okf, vals, zero_u)


def encode_tiles(
    ints2d: jnp.ndarray, nv: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nb, 992) uint32 + (1,) valid-chunk count ->
    (staging (nb, 1024) uint32, counts (nb, 1) int32). nb % 8 == 0."""
    nb = ints2d.shape[0]
    assert ints2d.shape == (nb, BLOCK_INTS) and nb % TILE_BLOCKS == 0
    B = TILE_BLOCKS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // B,),
        in_specs=[
            pl.BlockSpec(
                (B, BLOCK_INTS), lambda i, nv: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (B, L), lambda i, nv: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, 1), lambda i, nv: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _encode_body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, L), _U),
            jax.ShapeDtypeStruct((nb, 1), _I),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(nv.astype(_I).reshape(1), ints2d.astype(_U))


# ---------------------------------------------------------------------------
# streaming stitch
# ---------------------------------------------------------------------------

def _rotate_right_rows(x, s, nbits: int):
    """Rotate row i of x right by s[i] lanes (s: (rows, 1) int32)."""
    for k in range(nbits):
        bit = ((s >> k) & 1) != 0
        x = jnp.where(bit, pltpu.roll(x, shift=1 << k, axis=1), x)
    return x


def _stitch_body(
    offs_ref, staging_ref, offcol_ref, out_ref, pend, fb, state, sems
):
    """Streaming accumulator (see module docstring).

    offs_ref: SMEM-prefetched exclusive offsets, length nb+1 (last = total).
    staging_ref: (8, 1024) VMEM block rows. offcol_ref: (8, 1) VMEM copy of
    this tile's offsets (vector form for the rotation masks).
    pend: (1, 2048) pending window; fb: (2, 8, 128) flush double-buffer;
    state: (1,) SMEM = tiles flushed; sems: 2 DMA semaphores.
    """
    pid = pl.program_id(0)
    B = TILE_BLOCKS
    nsteps = pl.num_programs(0)

    @pl.when(pid == 0)
    def _():
        state[0] = 0
        pend[...] = jnp.zeros((1, W), _U)

    # rotate every block row to its global stream phase (offset mod 1024)
    s = offcol_ref[:] % L  # (8, 1)
    contrib = jnp.concatenate(
        [staging_ref[:], jnp.zeros((B, L), _U)], axis=1
    )
    contrib = _rotate_right_rows(contrib, s, 10)

    def flush_wait(f):
        # reconstruct the descriptor of flush f to wait on its semaphore
        pltpu.make_async_copy(
            fb.at[f % 2], out_ref.at[f], sems.at[f % 2]
        ).wait()

    def flush_start(f):
        slot = f % 2
        fb[pl.ds(slot, 1)] = pend[...][:, :L].reshape(1, 8, 128)
        pltpu.make_async_copy(
            fb.at[slot], out_ref.at[f], sems.at[slot]
        ).start()

    col = lane_iota((1, W))
    for r in range(B):
        b = pid * B + r
        pend[...] = pend[...] | contrib[r : r + 1, :]
        f = state[0]
        # flush when this block's words crossed the tile boundary
        # (invariant: f == offs[b] // 1024 since counts <= 1024)
        @pl.when(offs_ref[b + 1] - f * L >= L)
        def _():
            @pl.when(f >= 2)
            def _():
                flush_wait(f - 2)

            flush_start(f)
            pend[...] = jnp.where(
                col < L, pltpu.roll(pend[...], shift=L, axis=1), _U(0)
            )
            state[0] = f + 1

    @pl.when(pid == nsteps - 1)
    def _():
        total = offs_ref[nsteps * B]
        f = state[0]

        # final partial tile (pend zeros beyond the remainder -> clean tail)
        @pl.when(total - f * L > 0)
        def _():
            @pl.when(f >= 2)
            def _():
                flush_wait(f - 2)

            flush_start(f)
            state[0] = f + 1

        fz = state[0]

        @pl.when(fz >= 2)
        def _():
            flush_wait(fz - 2)

        @pl.when(fz >= 1)
        def _():
            flush_wait(fz - 1)


def stitch_tiles(staging: jnp.ndarray, offsets_ext: jnp.ndarray) -> jnp.ndarray:
    """Assemble the dense stream from (nb, 1024) staging + exclusive
    offsets (nb+1, last entry = total). Returns (nb*1024,) uint32 with
    zeros beyond the total word count."""
    nb = staging.shape[0]
    B = TILE_BLOCKS
    assert nb % B == 0, nb
    assert offsets_ext.shape == (nb + 1,), offsets_ext.shape
    T = nb + 2  # output tiles: <= nb used + 1 partial + slack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // B,),
        in_specs=[
            pl.BlockSpec((B, L), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((1, W), _U),
            pltpu.VMEM((2, 8, 128), _U),
            pltpu.SMEM((1,), _I),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _stitch_body,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, 8, 128), _U)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        offsets_ext.astype(_I),
        staging,
        offsets_ext[:nb].reshape(nb, 1).astype(_I),
    )[0]
    return out.reshape(-1)[: nb * L]


def encode_padded(
    ints: jnp.ndarray, n_valid_chunks
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel equivalent of ops.encode.encode_padded: compress a
    block-aligned (nb*992,) uint32 bitmap. Returns (words (nb*1024,),
    total); words beyond total are zero."""
    assert ints.shape[0] % BLOCK_INTS == 0, ints.shape
    nb = ints.shape[0] // BLOCK_INTS
    nbp = -(-nb // TILE_BLOCKS) * TILE_BLOCKS
    ints2d = ints.reshape(nb, BLOCK_INTS)
    if nbp != nb:
        ints2d = jnp.concatenate(
            [ints2d, jnp.zeros((nbp - nb, BLOCK_INTS), _U)], axis=0
        )
    nv = jnp.asarray(n_valid_chunks, dtype=_I).reshape(1)
    staging, counts = encode_tiles(ints2d, nv)
    counts = counts[:, 0]
    offsets_ext = jnp.concatenate(
        [jnp.zeros((1,), _I), jnp.cumsum(counts, dtype=_I)]
    )
    total = offsets_ext[-1]
    words = stitch_tiles(staging, offsets_ext)
    return words[: nb * L], total
