"""Fused Pallas TPU decode kernel.

One grid step expands a tile of output blocks (B x 1024 chunks) entirely
in VMEM and emits bitmap words directly (the 31->32-bit merge is fused —
chunks never round-trip through HBM). This inverts the reference decode
pipeline (decompressWords + mergeWords, kernels.cu:321-385) the TPU way:
instead of per-thread serial fill loops (load-imbalanced for long fills,
kernels.cu:346-348), each output block gathers a word window, routes
each covering word to its in-block start with a monotone lane expansion,
and forward-fills runs with a cummax scan — O(log) lane ops per output
chunk regardless of fill lengths.

Window mechanics (self-locating, granule-granular): the host prescan
is only *granule*-granular — an exclusive scan over per-128-word-
granule expanded sizes and one small searchsorted mapping each grid
STEP to the granule containing its first covering word (tables of
M/128 entries; the reference scans every word, decompress.cu:66-93,
and an element-granular scan + searchsorted on TPU costs more than the
whole kernel). One bulk DMA of 8*(B+2) granules per grid step covers
all B windows (the covering granule advances at most 8 per output
block — a block consumes <= 1024 words); each block then copies its
9-granule window (1152 words) VMEM->VMEM starting at its own covering
granule, reconstructs word offsets locally (in-window count scan + the
granule's base offset), and rotates the window into phase. Because the
first covering word lies in the window's FIRST granule, the phase
rotation is < 128 lanes (7 steps, vs 11 over a 2048-lane tile window
in the round-2 kernel) and every in-window scan narrows from 2048 to
1152 lanes. DMA slice starts must be tile-aligned, which the 8-aligned
bulk start guarantees on the (G, 128) word view; the per-block
unaligned 9-granule copies are VMEM dynamic-sublane-start slices
(supported by Mosaic, probed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import (
    BIT31,
    BIT3130,
    BLOCK_CHUNKS,
    BLOCK_INTS,
    LEN_MASK,
    ONES31,
)
from .common import (
    cummax_lanes,
    rebase_exclusive_per_col,
    cummax_lanes_wide,
    cumsum_lanes,
    cumsum_lanes_mxu,
    cumsum_lanes_wide,
    lane_iota,
    shift_right,
    tri128,
)

__all__ = ["decode", "decode_batch"]

_U = jnp.uint32
_I = jnp.int32

# output blocks per grid step (see encode_kernel: large tiles amortize
# per-step overhead; interpreter mode keeps small tiles for test speed)
import os as _os

TILE_BLOCKS = int(
    _os.environ.get("WAH_DECODE_TILE_BLOCKS", "0")
) or (8 if jax.default_backend() == "cpu" else 128)
L = BLOCK_CHUNKS
GW = 9  # granules per block window (127 max phase + 1024 consumed words)
WG = GW * 128  # window width in words (lanes)
_T_ONES = 2  # cummax key type code for the all-ones filler


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# see encode_kernel.WIDE_SCANS (same measured selection: flat wins)
WIDE_SCANS = _os.environ.get("WAH_WIDE_SCANS", "0") == "1"
# MXU prefix sums (common.cumsum_lanes_mxu): measured SLOWER on v5e
# (130 MB: decode 9.33 vs 8.58 ms, tiles 2.79 vs 2.65 ms) — the int8
# limb packing + (B, W) <-> (B*G, 128) relayouts cost more than the
# log2(W) VPU roll/select/add passes they replace. Kept opt-in.
MXU_SCANS = _os.environ.get("WAH_MXU_SCANS", "0") == "1"
# perf probes (e.g. WAH_DEC_PROBE=noexp): disable the expansion /
# cummax families to attribute kernel time; output is WRONG under them
_PROBE = set(_os.environ.get("WAH_DEC_PROBE", "").split(","))
# data-adaptive tier selection (static kernel variant, selected on the
# host via WahCodec hints — see encode_kernel._resolve_adaptive): per-
# tile scalar bounds choose between trivial / small / full expansion +
# forward-fill variants with ONE in-kernel lax.cond. Per-pass gating
# measured SLOWER (each taken scf region cost ~0.2-0.35 ms in this
# kernel), and even the tiered conds lose ~7% when the small/full tier
# is consistently taken (protocol sweep, 130 MB 2^-4: 23.5 -> 21.8
# GB/s) while winning +49% when windows are all-literal (2^-1: 21.0 ->
# 31.3 GB/s) — hence a host-selected static variant, not always-on.


def _cumsum(x, nbits: int, col):
    if WIDE_SCANS:
        return cumsum_lanes_wide(x)
    return cumsum_lanes(x, nbits, col)


def _cummax(x, nbits: int, neutral, col):
    if WIDE_SCANS:
        return cummax_lanes_wide(x, neutral)
    return cummax_lanes(x, nbits, neutral, col)


def _merge_masks():
    """Static pull-out schedule for the 1024->992 merge compaction:
    valid lanes (col % 32 != 31) move LEFT by col//32, bits LSB->MSB;
    the destination-lane mask of each step is a compile-time constant
    (mirror of encode's repartition push schedule)."""
    import numpy as _np

    j = _np.arange(L)
    valid = (j % 32) != 31
    d = j // 32
    cur = j.copy()
    masks = _np.zeros((5, L), dtype=_np.int32)
    for k in range(5):
        moving = ((d >> k) & 1) == 1
        mv = moving & valid
        masks[k, cur[mv] - (1 << k)] = 1
        cur = cur - (mv << k)
    return masks


_MERGE_MASKS = _merge_masks()


def _rotate_left_rows(x, s, nbits: int):
    """Rotate row i of x LEFT by s[i] lanes (s: (rows, 1) int32,
    0 <= s < 2^nbits). Decomposes s directly — a left roll by 2^k is a
    constant right roll by n - 2^k — so the step count follows the
    MAGNITUDE of s, not the row width (the granule-window design caps
    s < 128, making this 7 steps on 1152 lanes instead of 11 on 2048).
    """
    n = x.shape[-1]
    for k in range(nbits):
        bit = ((s >> k) & 1) != 0
        x = jnp.where(
            bit, pltpu.roll(x, shift=n - (1 << k), axis=1), x
        )
    return x


def _decode_body(
    rbase_ref, meta_ref, words_ref, rbt_ref, mmasks_ref, tri_ref,
    ints_ref, *rest, adaptive: bool,
    route: tuple[int, int] | None = None,
):
    if route is not None:
        (viol_ref, wbulk, rbw, wscr, rloc_ref, rloc_s, sem, sem2) = rest
    else:
        (wbulk, rbw, wscr, rloc_ref, rloc_s, sem, sem2) = rest
    pid = pl.program_id(0)
    B = ints_ref.shape[0]
    m = meta_ref[1]

    # SELF-LOCATING, GRANULE WINDOWS: word offsets are tabulated per
    # 128-word GRANULE (not per 1024-word tile), so each block's window
    # is the 9 granules (1152 words) from its first covering granule —
    # the first covering word always lies in that granule, capping the
    # alignment rotation at 7 steps and narrowing every in-window scan
    # from 2048 to 1152 lanes (the two 11-step 2048-lane rotations were
    # 25% of round-2 decode time, the top probe target; measured at
    # 130 MB: 8.58 -> 5.02 ms, 25.9 GB/s at density 2^-4). One bulk
    # DMA of (B+2)*8 granules starting at this step's first covering
    # granule's tile covers every window: the covering granule advances
    # at most 8 per output block (a block consumes <= 1024 words).
    g_start = rbase_ref[pid]
    tb = g_start // 8
    g0 = tb * 8
    cp = pltpu.make_async_copy(
        words_ref.at[pl.ds(8 * tb, 8 * (B + 2))], wbulk, sem
    )
    cp.start()
    q = g0 // 1024
    cpr = pltpu.make_async_copy(rbt_ref.at[pl.ds(q, 3)], rbw, sem2)
    cpr.start()
    cpr.wait()

    # rotate the 3072-lane granule_base window so lane j == granule
    # g0 + j, then find each block's covering granule:
    # max{j : granule_base[j] <= base}
    lbl = _rotate_left_rows(
        rbw[...].reshape(1, 3 * 1024), jnp.reshape(g0 - 1024 * q, (1, 1)),
        10,
    )
    li = lane_iota((1, 3 * 1024))
    baset = meta_ref[2] + (
        pid * B + jax.lax.broadcasted_iota(_I, (B, 1), 0)
    ) * L
    okb = (lbl <= baset) & (li < 8 * B + 16)  # (B, 3072)
    # live blocks always land in [0, 8B-1] (granule advance <= 8/block);
    # the clamp only bounds dead blocks past the stream end, whose
    # output is masked by n_chunks below
    r_loc = jnp.minimum(
        jnp.max(jnp.where(okb, li, _I(0)), axis=1, keepdims=True),
        _I(8 * B + 7),
    )
    coff_t = jnp.max(jnp.where(okb, lbl, _I(0)), axis=1, keepdims=True)
    rloc_ref[:, :] = r_loc

    # stage the per-block granule indices through SMEM: a dynamic VMEM
    # slice indexed by a VECTOR-read scalar lowers to a full-array
    # select per row (measured: 72 MB of compile-time stack), while a
    # scalar-core index from SMEM slices for free. The wbulk slices
    # start at arbitrary granules (sublane rows) — Mosaic supports
    # dynamic sublane-start VMEM slicing.
    cps = pltpu.make_async_copy(rloc_ref, rloc_s, sem2)
    cps.start()
    cps.wait()
    cp.wait()
    for r in range(B):
        gr = rloc_s[r, 0]
        wscr[pl.ds(GW * r, GW)] = wbulk[pl.ds(gr, GW)]
    win = wscr[...].reshape(B, WG)

    colw = lane_iota((B, WG))
    roww = jax.lax.broadcasted_iota(_I, (B, WG), 0)
    base_w = meta_ref[2] + (pid * B + roww) * L
    idx = (g0 + r_loc) * 128 + colw  # global word index per window lane

    # in-window offset reconstruction (reference getCounts + scan,
    # kernels.cu:291-309 / decompress.cu:66-93, done per window)
    is_fill_w = (win & _U(BIT31)) != 0
    cnt = jnp.where(is_fill_w, (win & _U(LEN_MASK)).astype(_I), _I(1))
    cnt = jnp.where(idx < m, cnt, _I(0))
    if MXU_SCANS:
        off = coff_t + cumsum_lanes_mxu(cnt, tri_ref[...]) - cnt
    else:
        off = coff_t + _cumsum(cnt, 11, colw) - cnt

    rel = off - base_w
    ok = (rel < L) & (rel + cnt > 0) & (idx < m)
    tgt = jnp.clip(rel, 0, L)

    # rotate the window so lane 0 == the first covering word (the live
    # set is contiguous, so alignment is a pure rotation — no routing;
    # the first covering word is in the window's FIRST granule, so the
    # rotation amount is < 128: 7 steps)
    lo_local = jnp.min(jnp.where(ok, colw, _I(WG)), axis=1, keepdims=True)
    lo_local = jnp.minimum(lo_local, _I(127))
    tok = jnp.where(ok, tgt * 2 + 1, _I(0))  # target | live bit
    win = _rotate_left_rows(win, lo_local, 7)
    tok = _rotate_left_rows(tok, lo_local, 7)

    win1 = win[:, :L]
    tok1 = tok[:, :L]
    col = lane_iota((B, L))
    row = jax.lax.broadcasted_iota(_I, (B, L), 0)
    base = meta_ref[2] + (pid * B + row) * L
    zero_u = jnp.zeros((B, L), _U)
    zi = jnp.zeros((), _I)

    is_fill = (win1 & _U(BIT31)) != 0
    is_ones = (win1 & _U(BIT3130)) == _U(BIT3130)
    val_d = jnp.where(
        (tok1 & 1) != 0,
        jnp.where(is_fill, jnp.where(is_ones, _U(ONES31), _U(0)), win1),
        zero_u,
    )

    # --- lean monotone expansion: route (value, target|live) ----------
    # dok = 2*(target - lane) + live; moved/cleared lanes only feed
    # selects through the edge-masked source mask, so the value shifts
    # are raw rotations. Arrivals land exactly at their target, so the
    # cummax key is reconstructed afterwards from (lane, payload).
    #
    # Adaptive TIERS (measured v5e, 130 MB: per-pass lax.cond gating of
    # the same families cost ~0.2-0.35 ms per TAKEN region — 6.05 ->
    # 7.8 ms at 2^-4 — so the choice is one cond over whole variants):
    #   trivial — every covering word covers one chunk (incompressible):
    #     no routing, no forward fill, chunks = arrivals;
    #   small   — displacement < 64 and runs <= 64 (ratio~1 data):
    #     6 expansion + 6 cummax passes;
    #   full    — 10 + 10.
    dok = jnp.where((tok1 & 1) != 0, tok1 - 2 * col, zi)

    def _exp(b):
        k = 1 << b

        def f(args):
            val_d, dok = args
            gated = jnp.where((dok & 1) != 0, dok & (2 * k), zi)
            srcm = shift_right(gated, k, zi, col)
            src = srcm != 0
            return (
                jnp.where(src, pltpu.roll(val_d, shift=k, axis=1), val_d),
                jnp.where(
                    src,
                    pltpu.roll(dok - 2 * k, shift=k, axis=1),
                    jnp.where(gated != 0, zi, dok),
                ),
            )

        return f

    def _route_fill(ne: int, nc: int):
        """Expansion with ne passes (valid while max displacement
        < 2^ne) + cummax forward fill with nc passes (valid while every
        covering run <= 2^nc; nc=0 means every live lane is an arrival).
        """

        def f(args):
            val_d, dok = args
            if "noexp" not in _PROBE:
                for b in reversed(range(ne)):
                    val_d, dok = _exp(b)((val_d, dok))
            ok_d = (dok & 1) != 0
            val_d = jnp.where(ok_d, val_d, zero_u)
            if nc == 0:
                return val_d
            # key reconstruction: the offset at an arrival lane IS the
            # lane index; only the all-ones filler forward-fills ONES
            # (an expanded ONES31 can only be a one-fill payload —
            # literal chunks 0/ONES31 never occur in a valid stream).
            t_d = jnp.where(val_d == _U(ONES31), _I(_T_ONES), _I(1))
            key_d = jnp.where(ok_d, (col << 2) | t_d, _I(0))
            cm = _cummax(
                key_d, nc if "nocummax" not in _PROBE else 0, _I(0), col
            )
            is_start = (cm >> 2) == col
            covered_ones = (cm & 3) == _I(_T_ONES)
            return jnp.where(
                is_start, val_d, jnp.where(covered_ones, _U(ONES31), zero_u)
            )

        return f

    if route is not None:
        # optimistic static tier (host-hinted from a stream sample,
        # branch-free — the taken-cond tiers cost ~7% when consistently
        # taken): violations are exact (emax/gmax are the same scalars
        # the adaptive conds test) and flagged per step; the host
        # re-runs the full variant (api.WahCodec.decompress fallback).
        ne, nc = route
        emax = jnp.max(dok) >> 1  # max (target - lane) over the tile
        gmax = jnp.max(jnp.where(ok, cnt, zi))  # longest covering run
        chunks = _route_fill(ne, nc)((val_d, dok))
        viol = ((emax >> ne) != 0) | (gmax > (1 << nc))
        viol_ref[:] = jnp.zeros((B, 1), _I) + viol.astype(_I)
    elif adaptive:
        emax = jnp.max(dok) >> 1  # max (target - lane) over the tile
        gmax = jnp.max(jnp.where(ok, cnt, zi))  # longest covering run
        chunks = jax.lax.cond(
            (emax == 0) & (gmax <= 1),
            _route_fill(0, 0),
            lambda a: jax.lax.cond(
                (emax < 64) & (gmax <= 64),
                _route_fill(6, 6),
                _route_fill(10, 10),
                a,
            ),
            (val_d, dok),
        )
    else:
        chunks = _route_fill(10, 10)((val_d, dok))
    # meta[3] is a position mask: 0x7FFFFFFF (identity) for a single
    # stream, col_chunk_capacity-1 for flattened batched columns (each
    # column decodes the same valid count at its own pow2-aligned base)
    chunks = jnp.where(
        ((base + col) & meta_ref[3]) < meta_ref[0], chunks, zero_u
    )

    # --- fused 31->32-bit merge (reference mergeWords, kernels.cu:369-385)
    # int[x] = (c[x] >> x) | (c[x+1] << (31-x)) within each 32-chunk
    # warp (blocks are warp-aligned, so no cross-row carry), then the
    # 992 valid lanes compact left over a static mask schedule.
    xl = (col % 32).astype(_U)
    cnext = jnp.where(
        col < L - 1, pltpu.roll(chunks, shift=L - 1, axis=1), zero_u
    )
    ints = (chunks >> xl) | (cnext << (_U(31) - xl))
    for k in range(5):
        ints = jnp.where(
            mmasks_ref[k : k + 1, :] != 0,
            pltpu.roll(ints, shift=L - (1 << k), axis=1),
            ints,
        )
    ints_ref[:] = ints[:, :BLOCK_INTS]


def decode(
    words: jnp.ndarray, m, chunk_capacity: int, chunk_base=0,
    adaptive: bool = False, route: tuple[int, int] | None = None,
):
    """Fused-kernel equivalent of ops.decode.decode: words[:m] ->
    (ints (chunk_capacity//32*31,), n_ints). chunk_capacity must be a
    multiple of 1024. chunk_base (a block-aligned traced scalar) decodes
    the span [chunk_base, chunk_base + chunk_capacity) instead — the
    unit of work one shard owns in the distributed decoder; n_ints is
    still the stream's global total.

    route=(ne, nc) (host-hinted, see api.WahCodec._decode_route_hint)
    selects the optimistic static expansion/forward-fill tier
    (_route_fill(ne, nc)) and appends a scalar `violated` int32 to the
    return: (ints, n_ints, violated). Nonzero violated means some tile
    needed more passes — the output is garbage and the caller must
    re-run with route=None. Mutually exclusive with `adaptive`."""
    assert chunk_capacity % L == 0, chunk_capacity
    assert route is None or not adaptive, (route, adaptive)
    M = words.shape[0]
    B = TILE_BLOCKS
    words = words.astype(_U)
    m = jnp.asarray(m, dtype=_I)

    # granule-granular prescan, now ONE fused Pallas pass
    # (prescan_words): per-granule expanded sizes + masked/zero-padded
    # word rows in a single read+write (the XLA form materialized the
    # mask select, the count reduce and the padded concat separately —
    # ~2.5x the traffic). The per-BLOCK mapping — which as an XLA
    # scatter-max + cummax + take cost ~2.3 ms at 130 MB — happens
    # inside the decode kernel from a DMA'd window of g_base.
    Mr = -(-M // L) * L
    if Mr != M:  # unaligned callers pay the pad copy the old path paid
        words = jnp.concatenate([words, jnp.zeros((Mr - M,), _U)])
    rows_needed = Mr // 128 + (B + 4) * 8
    vc = jnp.clip(
        m - 128 * jnp.arange(rows_needed, dtype=_I), 0, 128
    )
    words_t, g_sums = prescan_words(words, vc, rows_needed)
    g_base = jnp.cumsum(g_sums, dtype=_I) - g_sums
    n_chunks = g_base[-1] + g_sums[-1]

    nbo = chunk_capacity // L
    nbo_p = -(-nbo // B) * B
    nsteps = nbo_p // B
    base_i = jnp.asarray(chunk_base, dtype=_I)
    step_bases = base_i + jnp.arange(nsteps, dtype=_I) * (B * L)
    rbase = jnp.clip(
        jnp.searchsorted(g_base, step_bases, side="right").astype(_I)
        - 1,
        0,
        _I(words_t.shape[0] - 8 * (B + 2)),
    )
    # g_base padded with INT32_MAX (never selected as covering) and
    # viewed as (Tr, 1, 1024) for granule-table window DMA; the kernel
    # reads rows q..q+2 for q <= n_granules//1024
    Rr = g_base.shape[0]
    Rp = (words_t.shape[0] // 1024 + 3) * 1024
    rbt = jnp.concatenate(
        [g_base, jnp.full((Rp - Rr,), jnp.iinfo(jnp.int32).max, _I)]
    ).reshape(-1, 1, 1024)

    meta = jnp.stack(
        [n_chunks, m, base_i, jnp.full((), 0x7FFFFFFF, _I)]
    )
    res = _run_decode(rbase, meta, words_t, rbt, nbo_p, adaptive, route)
    ints2d = res[0] if route is not None else res
    ints = ints2d.reshape(-1)[: nbo * BLOCK_INTS]
    # ceil(31*n/32) written overflow-free as n - n//32: 31*n_chunks
    # wraps int32 past n_chunks = 69,273,666 (~268 MB of bitmap; the
    # 496 MB s=128 sweep config decoded a NEGATIVE n_ints and the host
    # sliced the output short)
    n_ints = n_chunks - n_chunks // 32
    if route is not None:
        return ints, n_ints, jnp.max(res[1])
    return ints, n_ints


def _run_decode(rbase, meta, words_t, rbt, nbo_p, adaptive=False,
                route=None):
    """Launch _decode_body over nbo_p output blocks -> (nbo_p, 992)
    (plus per-block violation flags (nbo_p, 1) when `route` is set)."""
    from functools import partial as _partial

    from .encode_kernel import _resolve_adaptive

    B = TILE_BLOCKS
    out_specs = [
        pl.BlockSpec((B, BLOCK_INTS), lambda i, rba, mt: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((nbo_p, BLOCK_INTS), _U)]
    if route is not None:
        out_specs.append(
            pl.BlockSpec((B, 1), lambda i, rba, mt: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nbo_p, 1), _I))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbo_p // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((5, L), lambda i, rba, mt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, rba, mt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((8 * (B + 2), 128), _U),
            pltpu.VMEM((3, 1, 1024), _I),
            pltpu.VMEM((GW * B, 128), _U),
            pltpu.VMEM((B, 1), _I),
            pltpu.SMEM((B, 1), _I),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    res = pl.pallas_call(
        _partial(_decode_body, adaptive=_resolve_adaptive(adaptive),
                 route=route),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(
        rbase,
        meta,
        words_t,
        rbt,
        jnp.asarray(_MERGE_MASKS),
        jnp.asarray(tri128()),
    )
    if route is not None:
        return res[0], res[1]
    return res[0]


def decode_batch(
    words2d: jnp.ndarray, ms: jnp.ndarray, col_chunk_capacity: int,
    adaptive: bool = False,
) -> jnp.ndarray:
    """Flattened batched-column decode: C equal-capacity streams in ONE
    kernel launch (the inverse of encode_padded_batch; the reference
    would call decompress per column, decompress.h).

    words2d: (C, Mcap) uint32, Mcap % 1024 == 0; column c's stream is
    words2d[c, :ms[c]]; words beyond ms[c] may be arbitrary (masked to
    zero in the word-view pass — zero padding words count as literals
    in the in-window offset reconstruction, but they sit after every
    valid word of their column, so valid offsets are unaffected and
    their arrivals land at per-column positions >= the column's chunk
    count, which the position-mask validity kills).
    ms: (C,) int32 per-column word counts.
    col_chunk_capacity: pow2, multiple of TILE_BLOCKS*1024; every
    column must expand to <= this many chunks.

    Returns ints_flat ((C * cap//1024 * 992,) uint32): column c's
    bitmap is ints_flat[c*cap//1024*992:][:out_ints] (callers know
    out_ints; trailing words up to the capacity are zero).

    Construction: column streams are laid out at pow2 word bases and
    their row_base tables rebased to per-column chunk bases c*cap (flat
    cumsum + rebase, same trick as encode_padded_batch), so the flat
    OUTPUT block axis is contiguous and one step-base searchsorted +
    the unmodified self-locating kernel decode everything. Column
    boundaries land on grid-step boundaries (cap % (TILE*1024) == 0),
    so the <=1-row-per-block window-advance invariant holds within
    every step."""
    C, Mcap = words2d.shape
    return decode_rows_batch(
        words2d.reshape(C * Mcap), C, ms, col_chunk_capacity, adaptive
    )


def decode_rows_batch(
    words_flat: jnp.ndarray, C: int, ms: jnp.ndarray,
    col_chunk_capacity: int, adaptive: bool = False,
) -> jnp.ndarray:
    """decode_batch over the FLAT words layout: (C*Mcap,) uint32 with
    column c's stream at words_flat[c*Mcap:][:ms[c]]. The native entry
    point — a (C, Mcap) device array must relayout to feed the kernel's
    flat word-tile view (a full HBM copy on TPU); callers with host
    arrays flatten for free (see encode_rows_batch).

    Words beyond ms[c] may be ARBITRARY (the TPU stitch leaves
    unspecified tails past each column's total): they are zeroed in the
    same fused pass that materializes the kernel's word-tile view, so
    in-window offset reconstruction only ever sees the benign
    zero-literal padding the window analysis assumes. (A garbage fill
    word in a tail could otherwise overflow the in-window int32 offset
    cumsum and alias a wrapped arrival into a live lane.)"""
    cap = col_chunk_capacity
    B = TILE_BLOCKS
    total = words_flat.shape[0]
    assert total % C == 0, (total, C)
    Mcap = total // C
    assert Mcap % L == 0, Mcap
    assert cap % (B * L) == 0 and cap & (cap - 1) == 0, (cap, B)
    wf = words_flat.astype(_U)
    ms = jnp.asarray(ms, dtype=_I)

    # per-column masked counts + masked word rows in ONE fused Pallas
    # pass (prescan_words; granules never straddle columns because
    # Mcap % 1024 == 0), then flat granule sums -> rebased g_base
    gpc = Mcap // 128  # granules per column
    # broadcast, not gather: a 4.4M-element jnp.take cost ~30 ms on TPU
    rel = 128 * jnp.arange(gpc, dtype=_I)
    vc = jnp.clip(ms[:, None] - rel[None, :], 0, 128).reshape(-1)
    rows_needed = C * gpc + (B + 4) * 8
    words_t, g_sums_full = prescan_words(wf, vc, rows_needed)
    g_sums = g_sums_full[: C * gpc]
    g_base, col_totals = rebase_exclusive_per_col(g_sums, C, gpc, cap)

    nbo = cap // L  # blocks per column
    nbo_t = C * nbo
    nsteps = nbo_t // B
    step_bases = jnp.arange(nsteps, dtype=_I) * (B * L)
    rbase = jnp.clip(
        jnp.searchsorted(g_base, step_bases, side="right").astype(_I)
        - 1,
        0,
        _I(words_t.shape[0] - 8 * (B + 2)),
    )
    Rr = g_base.shape[0]
    Rp = (words_t.shape[0] // 1024 + 3) * 1024
    rbt = jnp.concatenate(
        [g_base, jnp.full((Rp - Rr,), jnp.iinfo(jnp.int32).max, _I)]
    ).reshape(-1, 1, 1024)

    # every column expands the same chunk count (equal-length columns);
    # in-kernel word masking is disabled (idx < m with m = all words) —
    # the zero-padding analysis above makes it redundant
    meta = jnp.stack(
        [
            col_totals[0],
            _I(C * Mcap),
            _I(0),
            _I(cap - 1),
        ]
    )
    ints2d = _run_decode(rbase, meta, words_t, rbt, nbo_t, adaptive)
    return ints2d.reshape(-1)


# ---------------------------------------------------------------------------
# fused word prescan
# ---------------------------------------------------------------------------

def _prescan_body(vc_ref, words_ref, out_ref, gsum_ref, *, dense: bool):
    """One pass over the stream words: per-lane validity mask (lane <
    row's valid count), masked word write-through, and per-granule
    expanded-size sums. Replaces the XLA prescan's three materialized
    passes (mask select, count reduce, padded concat) — measured
    20.4 ms of a 106.9 ms 2.1 GB batch decode (2.5x the theoretical
    traffic; XLA does not fuse the select into both consumers).

    dense: the per-row metadata rides as (R//128, 128) int32 blocks —
    a (R, 1) VMEM block pads its lane axis to 128, which at R = 4096
    is 2 MB of VMEM per metadata buffer and blew the 16 MB scoped
    limit. The words regroup (R, 128) <-> (R//128, 128, 128) so the
    compare broadcasts against the dense metadata; the regroup only
    moves a sublane index into an untiled leading dim (identical
    linear vreg order — the direct (R//128,128) -> (R,1) tpu.reshape
    is an unsupported shape cast)."""
    w = words_ref[:]
    R = w.shape[0]
    if dense:
        g = R // 128
        w3 = w.reshape(g, 128, 128)
        valid = (
            jax.lax.broadcasted_iota(_I, (g, 128, 128), 2)
            < vc_ref[:][:, :, None]
        )
        wm3 = jnp.where(valid, w3, _U(0))
        isf = (wm3 & _U(BIT31)) != 0
        cnt = jnp.where(valid, jnp.where(
            isf, (wm3 & _U(LEN_MASK)).astype(_I), _I(1)), _I(0))
        out_ref[:] = wm3.reshape(R, 128)
        gsum_ref[:] = jnp.sum(cnt, axis=2)
        return
    valid = lane_iota(w.shape) < vc_ref[:]
    wm = jnp.where(valid, w, _U(0))
    isf = (wm & _U(BIT31)) != 0
    cnt = jnp.where(valid, jnp.where(
        isf, (wm & _U(LEN_MASK)).astype(_I), _I(1)), _I(0))
    out_ref[:] = wm
    gsum_ref[:] = jnp.sum(cnt, axis=1, keepdims=True)


def prescan_words(words: jnp.ndarray, vc: jnp.ndarray, out_rows: int):
    """(M,) uint32 words + (out_rows,) per-granule valid counts ->
    (masked+zero-padded words_t (out_rows, 128), g_sums (out_rows,)).

    M % 1024 == 0; out_rows >= M//128 is the PADDED granule-row count
    (rows beyond the stream carry vc == 0 and come out zeroed, giving
    the decode kernel its benign zero-literal tail without a concat).
    vc[r] = clip(valid_words_after_row_start, 0, 128) — per column for
    the batch layout, clip(m - 128*r, 0, 128) for a single stream."""
    from functools import partial as _partial

    M = words.shape[0]
    assert M % 1024 == 0, M
    rows_in = M // 128
    # rows/step: largest pow2 divisor of rows_in up to 4096 (2 MB in +
    # 2 MB out per step; small steps are per-step-overhead-bound —
    # 1024-row steps measured 19.2 ms for 2.2 GB, ~3.5x the traffic
    # bound, with 4228 steps of unoverlapped DMA latency)
    R = 8
    while R < 4096 and rows_in % (2 * R) == 0:
        R *= 2
    assert rows_in % R == 0, (rows_in, R)
    # dense meta needs a (R//128, 128) block with leading dim >= 8
    # (Mosaic block divisibility); smaller steps keep the padded (R, 1)
    # form — their streams are tiny and VMEM is not a concern there
    dense = R >= 1024
    rows_out = -(-out_rows // R) * R
    if vc.shape[0] != rows_out:
        vc = jnp.concatenate(
            [vc.astype(_I), jnp.zeros((rows_out - vc.shape[0],), _I)]
        )
    in_tiles = rows_in // R
    mshape = (R // 128, 128) if dense else (R, 1)
    mrows = rows_out // 128 if dense else rows_out
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(rows_out // R,),
        in_specs=[
            pl.BlockSpec(mshape, lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (R, 128),
                lambda i, it=in_tiles: (jnp.minimum(i, it - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mshape, lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    words_t, gsum = pl.pallas_call(
        _partial(_prescan_body, dense=dense),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_out, 128), _U),
            jax.ShapeDtypeStruct((mrows, mshape[1]), _I),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(vc.astype(_I).reshape(mrows, mshape[1]), words.reshape(rows_in, 128))
    return words_t, gsum.reshape(rows_out)
