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
words beyond `total` are UNSPECIFIED (only tiles 0..ceil(total/1024)-1
are ever written on compiled TPU; the interpreter zero-fills) — callers
must slice/mask by the returned total, unlike ops.encode whose XLA
stitch does zero the tail.

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
    rebase_exclusive_per_col,
    cummax_lanes,
    cummax_lanes_wide,
    cumsum_lanes,
    cumsum_lanes_mxu,
    cumsum_lanes_wide,
    lane_iota,
    shift_left,
    shift_right,
    tri128,
)

__all__ = [
    "encode_tiles",
    "stitch_tiles",
    "encode_padded",
    "encode_padded_batch",
    "encode_rows_batch",
]

_U = jnp.uint32
_I = jnp.int32

# blocks (rows) per grid step: >= 8 fills the VPU sublanes; larger tiles
# amortize per-step overhead. Measured on v5e (130 MB, density 2^-4):
# 8 -> 8.7 GB/s, 16 -> 12.5, 32 -> 13.6, 128 -> 15.1, 256 -> 16.0
# (512 exceeds VMEM). Interpreter mode (CPU tests) keeps small tiles —
# tiny inputs are padded to a whole tile. Env override for tuning.
import os as _os

TILE_BLOCKS = int(
    _os.environ.get("WAH_TILE_BLOCKS", "0")
) or (8 if jax.default_backend() == "cpu" else 256)
L = BLOCK_CHUNKS  # 1024 words per block row
W = 2 * L  # pending-window lanes


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# 2-D decomposed scans (common.cumsum_lanes_wide) measured SLOWER on
# v5e than the flat Hillis-Steele forms (benchmarks/micro.py, 130 MB
# density 2^-4: tiles 4.21 ms wide vs 3.08 ms flat; decode 10.43 vs
# 9.28) — the (B, W) <-> (B, W//128, 128) relayouts cost more than the
# cross-register rolls they avoid. Kept opt-in via WAH_WIDE_SCANS=1.
WIDE_SCANS = _os.environ.get("WAH_WIDE_SCANS", "0") == "1"
# MXU prefix sums: measured slower (see decode_kernel.MXU_SCANS)
MXU_SCANS = _os.environ.get("WAH_MXU_SCANS", "0") == "1"
# Data-adaptive pass skipping (static kernel variant, selected on the
# host): per-tile scalar bounds gate the log-shift pass families with
# in-kernel lax.cond (Mosaic scf.if), so tiles whose routing
# displacement / stream phase doesn't reach a pass's stride skip it.
# An incompressible tile (every chunk its own run) collapses to a
# single select and a phase-0 stitch. Measured v5e protocol sweep,
# 130 MB: density 2^-1 encode 24.3 -> 39.3 GB/s — but at 2^-4 the
# TAKEN cond regions cost more than the skipped passes save (24.3 ->
# 21.6), so `adaptive` is a STATIC parameter chosen host-side from a
# sample of the raw data (WahCodec._adaptive_hint, the same pattern as
# the stitch hint), not an always-on in-kernel branch. Both variants
# are bit-exact for any input. WAH_ADAPTIVE=0/1 force-overrides for
# A/B timing. The override is resolved ONCE at import time: WahCodec's
# jit caches key on the adaptive flag only, so a mid-process env flip
# would silently return kernels compiled under the old override.
_ADAPTIVE_ENV = _os.environ.get("WAH_ADAPTIVE", "")


def _resolve_adaptive(flag: bool) -> bool:
    if _ADAPTIVE_ENV in ("0", "1"):
        return _ADAPTIVE_ENV == "1"
    return bool(flag)


def _cumsum(x, nbits: int, col):
    if WIDE_SCANS:
        return cumsum_lanes_wide(x)
    return cumsum_lanes(x, nbits, col)


def _cummax(x, nbits: int, neutral, col):
    if WIDE_SCANS:
        return cummax_lanes_wide(x, neutral)
    return cummax_lanes(x, nbits, neutral, col)


def _repart_masks():
    """Static push schedule for the 992->1024 repartition expansion:
    source j moves right by d(j) = j//31, bits processed MSB->LSB; the
    destination-lane mask of each step is a compile-time constant
    (passed to the kernel as a (5, 1024) int32 input — Pallas does not
    allow captured array constants)."""
    import numpy as _np

    j = _np.arange(BLOCK_INTS)
    d = j // 31
    cur = j.copy()
    masks = _np.zeros((5, L), dtype=_np.int32)
    for k in reversed(range(5)):
        moving = (d >> k) & 1
        masks[k, cur[moving == 1] + (1 << k)] = 1
        cur = cur + (moving << k)
    return masks


_REPART_MASKS = _repart_masks()


# ---------------------------------------------------------------------------
# block encoder
# ---------------------------------------------------------------------------

def _encode_body(nv_ref, masks_ref, tri_ref, ints_ref, staging_ref,
                 counts_ref, *, adaptive: bool, route_bits: int = 10):
    B, _ = staging_ref.shape
    pid = pl.program_id(0)
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    # --- 32->31-bit repartition (reference: kernels.cu:72-79) ---------
    # source int j lands at lane j + j//31 (a[c] = ints[c - c//32] for
    # c%32 < 31). The routing is static, so the whole push schedule —
    # which lanes receive an element at each log-shift step — is
    # precomputed as constant masks: 5 rolls + 5 constant selects,
    # no per-element displacement bookkeeping.
    a = jnp.concatenate(
        [ints_ref[:].astype(_U), jnp.zeros((B, L - BLOCK_INTS), _U)], axis=1
    )
    for k in reversed(range(5)):
        a = jnp.where(
            masks_ref[k : k + 1, :] != 0,
            pltpu.roll(a, shift=1 << k, axis=1),
            a,
        )
    a = jnp.where(col % 32 == 31, zero_u, a)
    xl = (col % 32).astype(_U)
    b_ = shift_right(a, 1, jnp.zeros((), _U))
    b_ = jnp.where(xl == _U(0), zero_u, b_)
    chunk = (((b_ >> (_U(31) - xl)) >> _U(1)) | (a << xl)) & _U(ONES31)

    # --- classify (reference: kernels.cu:93-112) ----------------------
    t = jnp.where(
        chunk == _U(0), _I(0), jnp.where(chunk == _U(ONES31), _I(1), _I(2))
    )

    # --- validity: global chunk position < n_valid_chunks -------------
    # nv_ref[2] is a position mask: 0x7FFFFFFF (identity) for a single
    # stream; col_chunks-1 (power of two) for flattened batched columns,
    # where validity wraps per column (every column has the same valid
    # count and a pow2 block capacity — api.compress_batch buckets).
    row = jax.lax.broadcasted_iota(_I, (B, L), 0)
    gpos = nv_ref[1] + (pid * B + row) * L + col  # chunk_base + local pos
    v = (gpos & nv_ref[2]) < nv_ref[0]

    # --- run starts/ends + word slots (reference: kernels.cu:126-174,
    # 184-235 — the warp metadata + cross-warp merge machinery collapses
    # into two block-wide scans) --------------------------------------
    prev_t = shift_right(t, 1, _I(-1), col)
    start = v & ((t != prev_t) | (t == _I(2)))

    def _slow(_):
        if MXU_SCANS:
            incl = cumsum_lanes_mxu(start.astype(_I), tri_ref[...])
        else:
            # (cumsum_lanes_packed_rows — 2 rows per int32, halved scan
            # width — measured SLOWER here: 2.77 vs 2.65 ms tile kernel
            # at 130 MB 2^-4; the pack + (B,1024) concat overhead
            # exceeds the halved roll work. Kept in common.py as a
            # documented negative result.)
            incl = _cumsum(start.astype(_I), 10, col)
        widx = incl - 1
        cnt_col = incl[:, L - 1 : L]

        nv_next = shift_left(v, 1, False, col)
        end = v & (shift_left(start, 1, True, col) | ~nv_next)

        # --- emit words (reference: kernels.cu:237-259) ----------------
        # Fill words carry only their type header here; the run length is
        # recovered AFTER compaction as the adjacent difference of run end
        # columns (runs tile the block, so run w starts where run w-1
        # ended). This replaces a second 10-step scan (cummax of start
        # columns) with one roll + subtract on the compacted lanes.
        value = jnp.where(
            t == _I(2),
            chunk,
            jnp.where(t == _I(1), _U(BIT3130), _U(BIT31)),
        )

        # --- in-VMEM compaction to a dense prefix (replaces moveData) --
        # Monotone left-routing without live-mask bookkeeping: dead lanes
        # get d = 0 (stationary) and are either overwritten by an arriving
        # word (every lane < count receives exactly its word — monotone
        # routing admits no overtaking) or masked out by the count below.
        # Raw rotations for the data moves: wrapped lanes are never
        # selected (the source mask is edge-masked). The displacement
        # channel's high bits carry the run's end column for free (the
        # step masks test only bits 0..9, and d rides along unmodified).
        d = jnp.where(end, (col - widx) | (col << 10), col << 10)
        vals = value

        def _move(k):
            kk = 1 << k

            def f(args):
                # one shared roll of d serves both the receive mask and
                # the d update (the naive shift_left(d & kk, kk) form
                # rolls d twice — 8 vector ops/pass instead of 7)
                vals, d = args
                sd = jnp.where(
                    col < L - kk,
                    pltpu.roll(d, shift=L - kk, axis=1),
                    _I(0),
                )
                src = (sd & kk) != 0
                return (
                    jnp.where(
                        src, pltpu.roll(vals, shift=L - kk, axis=1), vals
                    ),
                    jnp.where(src, sd, d),
                )

            return f

        def _route(n: int):
            # n passes route any displacement < 2^n (LSB->MSB monotone)
            def f(args):
                vals, d = args
                for k in range(n):
                    vals, d = _move(k)((vals, d))
                return vals, d

            return f

        if route_bits < 10:
            # optimistic static pass count (host-hinted, branch-free —
            # the in-kernel cond alternative costs more than the skipped
            # passes save at mid densities, see the adaptive note):
            # any tile whose max displacement needs more passes raises
            # the violation bit (carried in counts bit 16 — Mosaic
            # rejects a (1,1)-block output); the host re-runs the full
            # 10-pass variant (api.WahCodec.compress fallback).
            viol = ((jnp.max(d & 1023) >> route_bits) != 0).astype(_I)
            vals, d = _route(route_bits)((vals, d))
        elif adaptive:
            # one cond over whole variants, not one per pass (decode
            # measured ~0.2-0.35 ms per taken scf region): tiles whose
            # max displacement is small — any data with ratio near 1 —
            # take the 6-pass variant (non-end lanes have zero low bits)
            dmax = jnp.max(d & 1023)
            vals, d = jax.lax.cond(
                dmax < 64, _route(6), _route(10), (vals, d)
            )
            viol = _I(0)
        else:
            vals, d = _route(10)((vals, d))
            viol = _I(0)
        endcol = d >> 10
        run_len = (endcol - shift_right(endcol, 1, _I(-1), col)).astype(_U)
        vals = jnp.where((vals & _U(BIT31)) != 0, vals | run_len, vals)
        return vals, cnt_col, viol.reshape(1, 1)

    def _fast(_):
        # every valid lane starts its own run and the tile is fully
        # valid: word w IS chunk w (scan = identity, compaction = no-op,
        # all run lengths 1) — the incompressible-data fast path; a
        # density-0.5 tile is all-literal with prob ~1-2^-21
        value = jnp.where(
            t == _I(2),
            chunk,
            jnp.where(t == _I(1), _U(BIT3130 | 1), _U(BIT31 | 1)),
        )
        return value, jnp.full((B, 1), L, _I), jnp.zeros((1, 1), _I)

    if adaptive:
        vals, cnt_col, viol = jax.lax.cond(jnp.all(start), _fast, _slow, None)
    else:
        vals, cnt_col, viol = _slow(None)
    if route_bits < 10:  # violation bit rides counts (stripped by caller)
        counts_ref[:] = cnt_col | (viol << 16)
    else:
        counts_ref[:] = cnt_col
    staging_ref[:] = jnp.where(col < cnt_col, vals, zero_u)


def encode_tiles(
    ints2d: jnp.ndarray, nv: jnp.ndarray, adaptive: bool = False,
    route_bits: int = 10,
):
    """(nb, 992) uint32 + (2,) [valid-chunk count, global chunk base]
    (or (3,) with a trailing position mask — see _encode_body) ->
    (staging (nb, 1024) uint32, counts (nb, 1) int32). nb % TILE == 0.
    chunk_base is nonzero on shards of a distributed encode (validity is
    judged against the global chunk position).

    route_bits < 10 selects the optimistic static compaction variant
    (see _encode_body): the returned counts carry a violation bit at
    bit 16 (counts & 0xFFFF = true counts; counts >> 16 nonzero where a
    tile's routing displacement exceeded 2^route_bits — staging for
    that step is then garbage and the caller must re-run with
    route_bits=10). Mutually exclusive with `adaptive` (whose in-kernel
    tiers cover the same regime for all-literal data)."""
    nb = ints2d.shape[0]
    assert ints2d.shape == (nb, BLOCK_INTS) and nb % TILE_BLOCKS == 0
    assert not (adaptive and route_bits < 10), (adaptive, route_bits)
    nv = nv.astype(_I).reshape(-1)
    if nv.shape[0] == 2:  # no mask: identity on non-negative positions
        nv = jnp.concatenate([nv, jnp.full((1,), 0x7FFFFFFF, _I)])
    assert nv.shape == (3,), nv.shape
    B = TILE_BLOCKS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // B,),
        in_specs=[
            pl.BlockSpec((5, L), lambda i, nv: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, nv: (0, 0),
                         memory_space=pltpu.VMEM),
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
    from functools import partial as _partial

    return pl.pallas_call(
        _partial(_encode_body, adaptive=_resolve_adaptive(adaptive),
                 route_bits=route_bits),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, L), _U),
            jax.ShapeDtypeStruct((nb, 1), _I),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(
        nv,
        jnp.asarray(_REPART_MASKS),
        jnp.asarray(tri128()),
        ints2d.astype(_U),
    )


# ---------------------------------------------------------------------------
# streaming stitch
# ---------------------------------------------------------------------------

def _rotate_right_rows(x, s, nbits: int, adaptive: bool = False):
    """Rotate row i of x right by s[i] lanes (s: (rows, 1) int32).

    Adaptive mode gates each pass on whether ANY row's shift has that
    bit set: an incompressible stream has counts == 1024 per block, so
    every phase is 0 and the whole rotation vanishes; when phases DO
    vary every pass is taken and the conds only cost, which is why
    adaptive is a host-selected static variant."""
    for k in range(nbits):
        bit = ((s >> k) & 1) != 0

        def _rot(xx, bit=bit, k=k):
            return jnp.where(bit, pltpu.roll(xx, shift=1 << k, axis=1), xx)

        if adaptive:
            x = jax.lax.cond(jnp.any(bit), _rot, lambda xx: xx, x)
        else:
            x = _rot(x)
    return x


def _stitch_body(
    ft_ref, meta_ref, staging_ref, offcol_ref, out_ref, pend, fb, sems,
    *, adaptive: bool,
):
    """Streaming accumulator (see module docstring).

    The flush schedule is fully precomputed on the XLA side and
    scalar-prefetched: ft_ref[b] = tile_index+1 if block b completes an
    output tile else 0 (a block can complete at most one tile since
    counts <= 1024); meta_ref = [total_words, total_flushes]. The flush
    index IS the completed tile index (tiles flush in order), so no
    kernel-side state is needed.

    staging_ref: (8, 1024) VMEM block rows; offcol_ref: (8, 1) offsets
    (vector form for the rotation masks); pend: (1, 2048) pending
    window; fb: (2, 1, 1024) flush double-buffer; sems: 2 DMA sems.
    """
    pid = pl.program_id(0)
    B = TILE_BLOCKS
    nsteps = pl.num_programs(0)

    @pl.when(pid == 0)
    def _():
        pend[...] = jnp.zeros((1, W), _U)

    # rotate every block row to its global stream phase (offset mod 1024)
    s = offcol_ref[:] % L  # (B, 1)
    contrib = jnp.concatenate(
        [staging_ref[:], jnp.zeros((B, L), _U)], axis=1
    )
    contrib = _rotate_right_rows(contrib, s, 10, adaptive)

    def flush_wait(f):
        # reconstruct the descriptor of flush f to wait on its semaphore
        pltpu.make_async_copy(
            fb.at[f % 2], out_ref.at[f], sems.at[f % 2]
        ).wait()

    def flush_start(f):
        slot = f % 2
        # (1, 1024) lane-for-lane copy — no sublane relayout
        fb[pl.ds(slot, 1)] = pend[...][:, :L][None]
        pltpu.make_async_copy(
            fb.at[slot], out_ref.at[f], sems.at[slot]
        ).start()

    col = lane_iota((1, W))
    for r in range(B):
        b = pid * B + r
        pend[...] = pend[...] | contrib[r : r + 1, :]
        ft = ft_ref[b]

        @pl.when(ft > 0)
        def _():
            f = ft - 1

            @pl.when(f >= 2)
            def _():
                flush_wait(f - 2)

            flush_start(f)
            pend[...] = jnp.where(
                col < L, pltpu.roll(pend[...], shift=L, axis=1), _U(0)
            )

    @pl.when(pid == nsteps - 1)
    def _():
        total = meta_ref[0]
        fz = meta_ref[1]
        f_full = total // L

        # final partial tile (pend zeros beyond the remainder -> clean tail)
        @pl.when(total - f_full * L > 0)
        def _():
            @pl.when(f_full >= 2)
            def _():
                flush_wait(f_full - 2)

            flush_start(f_full)

        @pl.when(fz >= 2)
        def _():
            flush_wait(fz - 2)

        @pl.when(fz >= 1)
        def _():
            flush_wait(fz - 1)


def stitch_tiles(
    staging: jnp.ndarray, offsets_ext: jnp.ndarray, adaptive: bool = False
) -> jnp.ndarray:
    """Assemble the dense stream from (nb, 1024) staging + exclusive
    offsets (nb+1, last entry = total). Returns (nb*1024,) uint32;
    words beyond the total count are unspecified (see module docstring)."""
    nb = staging.shape[0]
    B = TILE_BLOCKS
    assert nb % B == 0, nb
    assert offsets_ext.shape == (nb + 1,), offsets_ext.shape
    T = nb + 2  # output tiles: <= nb used + 1 partial + slack
    offsets_ext = offsets_ext.astype(_I)
    tiles = offsets_ext // L
    # block b completes tile tiles[b] iff the offset crosses a tile edge
    ft = jnp.where(tiles[1:] > tiles[:-1], tiles[:-1] + 1, 0)
    total = offsets_ext[-1]
    meta = jnp.stack([total, (total + L - 1) // L])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb // B,),
        in_specs=[
            pl.BlockSpec((B, L), lambda i, ft, mt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, ft, mt: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((1, W), _U),
            pltpu.VMEM((2, 1, L), _U),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    from functools import partial as _partial

    out = pl.pallas_call(
        _partial(_stitch_body, adaptive=_resolve_adaptive(adaptive)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, 1, L), _U)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        ft,
        meta,
        staging,
        offsets_ext[:nb].reshape(nb, 1),
    )[0]
    return out.reshape(-1)[: nb * L]


# ---------------------------------------------------------------------------
# fully fused encode+stitch (single sequential kernel)
#
# DEMOTED to a test-only reference: measured on v5e (benchmarks/micro.py,
# 130 MB density 2^-4) at 14.4 ms vs 8.5 ms for the two-kernel path and
# 7.2 ms with the v2 stitch — the fully sequential grid forfeits the
# parallel block-encode phase. Kept because it is a structurally
# independent implementation of the whole pipeline (valuable as a
# differential cross-check in tests/tpu_differential.py), NOT an API
# path: WahCodec never selects it.
# ---------------------------------------------------------------------------

def _sublane_excl_cumsum(x, rows: int):
    """Exclusive prefix sum along axis 0 of (rows, 1) via log shifts."""
    ri = jax.lax.broadcasted_iota(_I, x.shape, 0)
    incl = x
    k = 1
    while k < rows:
        sh = jnp.where(ri >= k, pltpu.roll(incl, shift=k, axis=0), _I(0))
        incl = incl + sh
        k <<= 1
    return incl - x, incl


def _fused_body(
    nv_ref, masks_ref, ints_ref, out_ref, counts_ref,
    pend, fb, endlvl, state, sems
):
    """One pass: encode B blocks in VMEM and stream their words straight
    into the dense output (same accumulator as _stitch_body, but the
    word offsets come from a running SMEM total instead of a prescan —
    the sequential grid IS the scan). state: (1,) absolute word count."""
    pid = pl.program_id(0)
    B = TILE_BLOCKS
    nsteps = pl.num_programs(0)
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    @pl.when(pid == 0)
    def _():
        state[0] = 0
        pend[...] = jnp.zeros((1, W), _U)

    # --- block encode (same pipeline as _encode_body) -----------------
    a = jnp.concatenate(
        [ints_ref[:].astype(_U), jnp.zeros((B, L - BLOCK_INTS), _U)], axis=1
    )
    for k in reversed(range(5)):
        a = jnp.where(
            masks_ref[k : k + 1, :] != 0,
            pltpu.roll(a, shift=1 << k, axis=1),
            a,
        )
    a = jnp.where(col % 32 == 31, zero_u, a)
    xl = (col % 32).astype(_U)
    b_ = shift_right(a, 1, jnp.zeros((), _U), col)
    b_ = jnp.where(xl == _U(0), zero_u, b_)
    chunk = (((b_ >> (_U(31) - xl)) >> _U(1)) | (a << xl)) & _U(ONES31)

    t = jnp.where(
        chunk == _U(0), _I(0), jnp.where(chunk == _U(ONES31), _I(1), _I(2))
    )
    row = jax.lax.broadcasted_iota(_I, (B, L), 0)
    gpos = nv_ref[1] + (pid * B + row) * L + col
    v = gpos < nv_ref[0]

    prev_t = shift_right(t, 1, _I(-1), col)
    start = v & ((t != prev_t) | (t == _I(2)))
    incl = _cumsum(start.astype(_I), 10, col)
    widx = incl - 1
    cnt_col = incl[:, L - 1 : L]  # (B, 1)
    counts_ref[:] = cnt_col

    nv_next = shift_left(v, 1, False, col)
    end = v & (shift_left(start, 1, True, col) | ~nv_next)
    run_start = _cummax(jnp.where(start, col, _I(-1)), 10, _I(-1), col)
    run_len = (col - run_start + 1).astype(_U)
    value = jnp.where(
        t == _I(2),
        chunk,
        jnp.where(t == _I(1), _U(BIT3130) | run_len, _U(BIT31) | run_len),
    )
    d = jnp.where(end, col - widx, _I(0))
    vals = value
    for k in range(10):
        kk = 1 << k
        src = shift_left(d & kk, kk, _I(0), col) != 0
        vals = jnp.where(src, shift_left(vals, kk, jnp.zeros((), _U), col), vals)
        d = jnp.where(src, shift_left(d, kk, _I(0), col), d)
    staged = jnp.where(col < cnt_col, vals, zero_u)

    # --- stream phase ------------------------------------------------
    lvl0 = state[0]
    excl, incl_rows = _sublane_excl_cumsum(cnt_col, B)
    s_vec = (lvl0 + excl) % L
    endlvl[...] = lvl0 + incl_rows  # absolute level after each row
    contrib = jnp.concatenate([staged, jnp.zeros((B, L), _U)], axis=1)
    contrib = _rotate_right_rows(contrib, s_vec, 10)

    def flush_wait(f):
        pltpu.make_async_copy(
            fb.at[f % 2], out_ref.at[f], sems.at[f % 2]
        ).wait()

    def flush_start(f):
        slot = f % 2
        fb[pl.ds(slot, 1)] = pend[...][:, :L][None]
        pltpu.make_async_copy(
            fb.at[slot], out_ref.at[f], sems.at[slot]
        ).start()

    colw = lane_iota((1, W))
    prior = lvl0
    for r in range(B):
        pend[...] = pend[...] | contrib[r : r + 1, :]
        e = endlvl[r, 0]  # scalar read of VMEM scratch

        @pl.when(e // L > prior // L)
        def _():
            f = prior // L

            @pl.when(f >= 2)
            def _():
                flush_wait(f - 2)

            flush_start(f)
            pend[...] = jnp.where(
                colw < L, pltpu.roll(pend[...], shift=L, axis=1), _U(0)
            )

        prior = e
    state[0] = prior

    @pl.when(pid == nsteps - 1)
    def _():
        total = state[0]
        f_full = total // L

        @pl.when(total - f_full * L > 0)
        def _():
            @pl.when(f_full >= 2)
            def _():
                flush_wait(f_full - 2)

            flush_start(f_full)

        fz = (total + L - 1) // L

        @pl.when(fz >= 2)
        def _():
            flush_wait(fz - 2)

        @pl.when(fz >= 1)
        def _():
            flush_wait(fz - 1)


def encode_fused(
    ints2d: jnp.ndarray, nv: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nb, 992) + (1,) -> (words (nb*1024,), counts (nb, 1)).

    Single-kernel encode+stitch; words beyond the total are
    unspecified (see module docstring)."""
    nb = ints2d.shape[0]
    B = TILE_BLOCKS
    assert ints2d.shape == (nb, BLOCK_INTS) and nb % B == 0
    T = nb + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // B,),
        in_specs=[
            pl.BlockSpec((5, L), lambda i, nv: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BLOCK_INTS), lambda i, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((B, 1), lambda i, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, W), _U),
            pltpu.VMEM((2, 1, L), _U),
            pltpu.VMEM((B, 1), _I),
            pltpu.SMEM((1,), _I),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, counts = pl.pallas_call(
        _fused_body,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, L), _U),
            jax.ShapeDtypeStruct((nb, 1), _I),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        nv.astype(_I).reshape(2),
        jnp.asarray(_REPART_MASKS),
        ints2d.astype(_U),
    )
    return out.reshape(-1)[: nb * L], counts


def _clamped_nv(n_valid_chunks, chunk_base, nb: int) -> jnp.ndarray:
    """(2,) [validity bound, chunk base] for the kernels, with the bound
    clamped to the caller's true block range. Without the clamp, the
    rows padding nb up to a TILE_BLOCKS multiple would count as valid on
    non-final shards of a distributed encode (their global position is
    below the *global* n_valid_chunks) and emit spurious zero-fill
    words into the shard total."""
    base = jnp.asarray(chunk_base, dtype=_I)
    bound = jnp.minimum(
        jnp.asarray(n_valid_chunks, dtype=_I), base + _I(nb * L)
    )
    return jnp.stack([bound, base])


def encode_padded_fused(
    ints: jnp.ndarray, n_valid_chunks, chunk_base=0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """encode_padded via the single fused kernel."""
    assert ints.shape[0] % BLOCK_INTS == 0, ints.shape
    nb = ints.shape[0] // BLOCK_INTS
    nbp = -(-nb // TILE_BLOCKS) * TILE_BLOCKS
    ints2d = ints.reshape(nb, BLOCK_INTS)
    if nbp != nb:
        ints2d = jnp.concatenate(
            [ints2d, jnp.zeros((nbp - nb, BLOCK_INTS), _U)], axis=0
        )
    nv = _clamped_nv(n_valid_chunks, chunk_base, nb)
    words, counts = encode_fused(ints2d, nv)
    total = jnp.sum(counts[:, 0], dtype=_I)
    return words[: nb * L], total


def encode_padded(
    ints: jnp.ndarray, n_valid_chunks, chunk_base=0, stitch: str = "auto",
    adaptive: bool = False, adaptive_stitch: bool | None = None,
    route_bits: int = 10,
):
    """Fused-kernel equivalent of ops.encode.encode_padded: compress a
    block-aligned (nb*992,) uint32 bitmap. Returns (words (nb*1024,),
    total); words beyond total are unspecified (see module docstring).
    chunk_base: see encode_tiles.

    stitch: "v1" (flush-count-proportional accumulator, fastest when
    the stream compresses), "v3" (constant-cost vreg RMW stitch,
    fastest for incompressible data), or "auto" (in-graph lax.cond on
    the compressed ratio). adaptive selects the data-adaptive tile
    encoder (see _encode_body); adaptive_stitch the gated stitch
    rotation (defaults to `adaptive` — split so compressible data can
    take the tiered tile compaction, whose conds pay off, without the
    per-pass rotation conds, which only pay when phases are all 0). Callers that can estimate density on the
    host (api.WahCodec samples the raw input) should pass a static
    choice: the cond variant costs several ms extra per call on TPU
    when the v1 branch is taken (measured benchmarks/micro.py,
    130 MB @ 2^-16: cond 11.7 ms vs static-v1 components ~4.7 ms).

    route_bits < 10 (host-hinted, see api.WahCodec._route_bits_hint)
    selects the optimistic static compaction and appends a scalar
    `violated` int32 to the return: (words, total, violated). Nonzero
    violated means the stream is garbage — re-run with route_bits=10."""
    assert ints.shape[0] % BLOCK_INTS == 0, ints.shape
    nb = ints.shape[0] // BLOCK_INTS
    nbp = -(-nb // TILE_BLOCKS) * TILE_BLOCKS
    ints2d = ints.reshape(nb, BLOCK_INTS)
    if nbp != nb:
        ints2d = jnp.concatenate(
            [ints2d, jnp.zeros((nbp - nb, BLOCK_INTS), _U)], axis=0
        )
    if adaptive_stitch is None:
        adaptive_stitch = adaptive
    nv = _clamped_nv(n_valid_chunks, chunk_base, nb)
    staging, counts = encode_tiles(ints2d, nv, adaptive, route_bits)
    counts = counts[:, 0]
    if route_bits < 10:  # violation bit rides counts bit 16 (scalar)
        violated = jnp.max(counts >> 16)
        counts = counts & 0xFFFF
    offsets_ext = jnp.concatenate(
        [jnp.zeros((1,), _I), jnp.cumsum(counts, dtype=_I)]
    )
    total = offsets_ext[-1]
    # density-adaptive stitch (measured on v5e, benchmarks/micro.py,
    # 130 MB): the v1 accumulator's cost scales with flush count (5.7 ms
    # sparse -> 10.3 ms dense) while the branchless v2 RMW stitch is
    # constant (~7.1 ms); select on the compressed ratio.
    from .stitch2 import stitch_tiles_v2

    if stitch == "v1":
        words = stitch_tiles(staging, offsets_ext, adaptive_stitch)
    elif stitch == "v3":
        words = stitch_tiles_v2(
            staging, offsets_ext, adaptive=adaptive_stitch
        )
    else:
        assert stitch == "auto", stitch
        nbp2 = staging.shape[0]
        words = jax.lax.cond(
            total * 8 > _I(nbp2 * L * 3),
            lambda args: stitch_tiles_v2(*args),
            lambda args: stitch_tiles(*args),
            (staging, offsets_ext),
        )
    if route_bits < 10:
        return words[: nb * L], total, violated
    return words[: nb * L], total


def encode_padded_batch(
    cols: jnp.ndarray, n_valid_chunks, group_rows: int = 1 << 19,
    adaptive: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched-column encode: C equal-length columns in ONE flattened
    kernel pipeline instead of C sequential dispatches (the reference's
    model is one compress() call per column, compress.h:12; a lax.map of
    per-column kernels pays per-dispatch fixed cost C times and reached
    only ~13 GB/s aggregate vs ~24 single-stream on v5e).

    cols: (C, nb*992) uint32 with nb a power of two, nb % TILE == 0.
    Returns (words_flat (C*nb*1024,), totals (C,)): column c's stream
    is words_flat[c*nb*1024:][:totals[c]], bit-identical to
    encode_padded(cols[c]). The flat form is deliberate: reshaping the
    sliced stitch output to (C, cap) on device costs a full
    layout-changing copy (~55 ms for 2.1 GB on v5e, measured); callers
    at the host boundary reshape the fetched numpy array for free.

    How the flattening works:
      * validity wraps per column via a pow2 position mask in the block
        kernel (every column has the same n_valid_chunks);
      * per-column exclusive word offsets are rebased to the column's
        capacity base c*nb*1024 (tile-aligned), so one stitch pass lays
        every column's dense stream into its own output slice — offset
        jumps at column boundaries land on step boundaries and are
        handled by the stitch's fresh/clamped-carry logic;
      * columns are processed in groups of <= group_rows block rows per
        call, bounding peak HBM (a group materializes ~3x its block
        bytes: staging + stitch output + sliced result; the 2^19-row
        default is ~2.1 GB of blocks -> ~8.5 GB peak, measured fine on
        16 GB v5e). One group skips lax.map entirely — map's per-group
        input/output copies cost ~45% on top of the kernels (measured
        18.9 vs 10.4 ms per 267 MB group), so prefer one big call.
    """
    C, width = cols.shape
    nb = width // BLOCK_INTS
    assert width == nb * BLOCK_INTS, (C, width)
    return encode_rows_batch(
        cols.reshape(C * nb, BLOCK_INTS), C, n_valid_chunks,
        group_rows=group_rows, adaptive=adaptive,
    )


def encode_rows_batch(
    ints2d: jnp.ndarray, C: int, n_valid_chunks, group_rows: int = 1 << 19,
    adaptive: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched-column encode over a ROWS-layout input: (C*nb, 992)
    uint32 block rows, column-major in the leading axis (column c owns
    rows [c*nb, (c+1)*nb)). This is the native entry point: a (C, nb*992)
    device array must first be reshaped to block rows, and that reshape
    is a full layout-changing HBM copy on TPU (~22 ms/GB measured —
    benchmarks/batch_bench.py round 3); callers holding host arrays
    reshape for free and `jax.device_put` the rows form directly.

    Same contract as encode_padded_batch otherwise."""
    rows, w = ints2d.shape
    assert w == BLOCK_INTS and rows % C == 0, (ints2d.shape, C)
    nb = rows // C
    assert nb % TILE_BLOCKS == 0, (nb, TILE_BLOCKS)
    assert nb & (nb - 1) == 0, f"nb must be a power of two, got {nb}"
    from .stitch2 import stitch_tiles_v2

    col_chunks = nb * L
    nv3 = jnp.stack(
        [
            jnp.asarray(n_valid_chunks, dtype=_I),
            _I(0),
            _I(col_chunks - 1),
        ]
    )
    G = max(1, min(C, group_rows // nb))
    Cp = -(-C // G) * G
    if Cp != C:
        ints2d = jnp.concatenate(
            [ints2d, jnp.zeros(((Cp - C) * nb, BLOCK_INTS), _U)], axis=0
        )

    def group_fn(rows_g):
        staging, counts = encode_tiles(rows_g.astype(_U), nv3, adaptive)
        rc = counts[:, 0]
        offsets, totals_g = rebase_exclusive_per_col(
            rc, G, nb, col_chunks
        )
        offsets_ext = jnp.concatenate([offsets, offsets[-1:] + rc[-1:]])
        words = stitch_tiles_v2(
            staging, offsets_ext, counts=rc, adaptive=adaptive
        )
        return words, totals_g

    if Cp // G == 1:  # lax.map of one step still copies in/out; skip it
        words, totals = group_fn(ints2d)
    else:
        words, totals = jax.lax.map(
            group_fn, ints2d.reshape(Cp // G, G * nb, BLOCK_INTS)
        )
        words = words.reshape(Cp * col_chunks)
        totals = totals.reshape(Cp)
    if Cp != C:  # guard: even an equal-length slice of the big output
        words = words[: C * col_chunks]  # materializes a slow HBM copy
        totals = totals[:C]
    return words, totals
