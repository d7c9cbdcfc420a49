"""Branchless streaming stitch (v2) — dynamic-tile RMW accumulator.

Replaces the v1 stitch (encode_kernel._stitch_body) whose per-row
`@pl.when` flush conditionals dominate dense-data cost (~120 ns of
scalar-unit serialization per block row). v2 removes every per-row
branch:

  * each block row is rotated to its stream phase p = offset mod 1024
    within a 1024-lane window (half the width, half the rotation cost of
    v1's 2048-lane windows) and split into a low tile part (lanes >= p)
    and a high tile part (lanes < p + count - 1024, when it crosses);
  * the step owns a (B+1)-tile VMEM accumulator indexed by the row's
    LOCAL tile t = offset//1024 - step_base; each row does two
    read-modify-writes at dynamic tile indexes — straight-line code, no
    conditionals;
  * garbage initialization is handled by *first-touch clobber* instead
    of zeroing: a row whose offset is tile-aligned and advances the tile
    overwrites (fresh bit); a row crossing into the next tile always
    overwrites it (a crossing row is provably the tile's first toucher:
    rows sharing a start tile cannot both cross). All later touches OR.
  * one (B+1)-tile DMA per step writes the window to HBM (tiles past the
    step's last touched tile carry garbage and are overwritten by later
    steps or lie beyond `total` — same unspecified-tail contract as v1);
    the partial boundary tile is copied to slot 0 as the next step's
    carry.

The fresh/cross first-touch proof: offsets are non-decreasing with
per-row count <= 1024, so consecutive start tiles differ by at most 1.
If row r crosses (p_r + c_r > 1024), the next row starts in tile t_r+1,
hence any row sharing start tile t with an earlier row cannot follow a
crossing row of the same tile — exactly one high part per tile, and it
precedes every low part OR-ed into that tile. (reference analog: the
thrust scan + moveData compaction, compress.cu:133-166, which scatters
word-granularly; Mosaic DMA needs tile-aligned stores, hence the
phase-rotation + tile RMW formulation.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import BLOCK_CHUNKS
from .common import lane_iota

__all__ = ["stitch_tiles_v2"]

_U = jnp.uint32
_I = jnp.int32
L = BLOCK_CHUNKS

# Streams up to this many block rows keep per-row meta in SMEM (512 KB
# of the 1 MB v5e budget); larger ones scalar-read meta from VMEM.
SMEM_META_MAX_ROWS = 1 << 17


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rotate_right_rows(x, s, nbits: int, adaptive: bool = False):
    # gated per pass in adaptive mode — see encode_kernel._rotate_right_rows
    from .encode_kernel import _rotate_right_rows as _rrr

    return _rrr(x, s, nbits, adaptive)


def _body(*refs, poison: bool, smem_meta: bool, adaptive: bool):
    # meta packs p | t_loc<<10 | fresh<<20 | cross<<21 per row. Two
    # static layouts (chosen by stream size):
    #   smem_meta: meta is also scalar-prefetched whole into SMEM
    #     (packed_ref) — fastest per-row scalar reads, but SMEM is 1 MB
    #     on v5e, capping the stream at ~500 MB;
    #   else: the per-row loop scalar-reads the VMEM meta block (a few
    #     extra ns per row) — unbounded stream size. The 992 MB sweep
    #     config overflowed the SMEM-only variant (262144 rows).
    if smem_meta:
        (packed_ref, tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
    else:
        (tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
        packed_ref = None
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = staging_ref.shape[0]
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    p_vec = meta_ref[:] & 0x3FF

    # rotate every row to phase, split into low/high tile parts
    rot = _rotate_right_rows(staging_ref[:], p_vec, 10, adaptive)
    low = jnp.where(col >= p_vec, rot, zero_u)
    high = jnp.where(col < hbcol_ref[:], rot, zero_u)

    # per-row RMW into the local tile window (branchless)
    for r in range(B):
        pk = (packed_ref[pid * B + r] if smem_meta
              else meta_ref[r, 0])
        t = (pk >> 10) & 0x3FF
        fresh = (pk >> 20) & 1
        cross = (pk >> 21) & 1
        lo = low[r : r + 1][None]
        hi = high[r : r + 1][None]
        o1 = buf[pl.ds(t, 1)]
        buf[pl.ds(t, 1)] = jnp.where(fresh == 1, lo, o1 | lo)
        o2 = buf[pl.ds(t + 1, 1)]
        buf[pl.ds(t + 1, 1)] = jnp.where(cross == 1, hi, o2 | hi)

    # flush the window; carry the boundary tile to slot 0
    tb = tb_ref[pid] & 0x3FFFFFFF
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(tb, B + 1)], sem)
    cp.start()
    cp.wait()

    @pl.when(pid < nsteps - 1)
    def _():
        # clamp: at batched-column boundaries tb jumps by up to a whole
        # column capacity; the landing row is fresh (tile-aligned column
        # base), so any in-range tile serves as the (ignored) carry
        te = jnp.minimum((tb_ref[pid + 1] & 0x3FFFFFFF) - tb, B)
        carry = buf[pl.ds(te, 1)]
        if poison:  # interpreter-only: make first-touch bugs visible
            buf[...] = jnp.full_like(buf[...], 0xDEADBEEF)
        buf[pl.ds(0, 1)] = carry


def _body_v3(*refs, poison: bool, smem_meta: bool, adaptive: bool):
    """v3 = v2 with the accumulator in (tiles, 8, 128) vreg layout.

    A 1024-word output tile stored as (1, 1024) pads to 8 sublanes in
    VMEM, so every tile RMW moves 8 vregs; stored as (8, 128) it is
    exactly ONE vreg-shaped unit. The rotated contributions are built in
    lane space (rolls need lanes) and reshaped once to (B, 16, 128)
    (sublane<->lane reshape is in-kernel legal), then the per-row RMW
    loop touches single (1, 8, 128) slices. smem_meta: see _body.
    """
    if smem_meta:
        (packed_ref, tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
    else:
        (tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
        packed_ref = None
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = staging_ref.shape[0]
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    p_vec = meta_ref[:] & 0x3FF
    rot = _rotate_right_rows(staging_ref[:], p_vec, 10, adaptive)
    low = jnp.where(col >= p_vec, rot, zero_u)
    high = jnp.where(col < hbcol_ref[:], rot, zero_u)
    w3 = jnp.concatenate([low, high], axis=1).reshape(B, 16, 128)

    for r in range(B):
        pk = (packed_ref[pid * B + r] if smem_meta
              else meta_ref[r, 0])
        t = (pk >> 10) & 0x3FF
        fresh = (pk >> 20) & 1
        cross = (pk >> 21) & 1
        lo = w3[r, 0:8, :][None]
        hi = w3[r, 8:16, :][None]
        o1 = buf[pl.ds(t, 1)]
        buf[pl.ds(t, 1)] = jnp.where(fresh == 1, lo, o1 | lo)
        o2 = buf[pl.ds(t + 1, 1)]
        buf[pl.ds(t + 1, 1)] = jnp.where(cross == 1, hi, o2 | hi)

    tb = tb_ref[pid] & 0x3FFFFFFF
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(tb, B + 1)], sem)
    cp.start()
    cp.wait()

    @pl.when(pid < nsteps - 1)
    def _():
        # clamp: at batched-column boundaries tb jumps by up to a whole
        # column capacity; the landing row is fresh (tile-aligned column
        # base), so any in-range tile serves as the (ignored) carry
        te = jnp.minimum((tb_ref[pid + 1] & 0x3FFFFFFF) - tb, B)
        carry = buf[pl.ds(te, 1)]
        if poison:  # interpreter-only: make first-touch bugs visible
            buf[...] = jnp.full_like(buf[...], 0xDEADBEEF)
        buf[pl.ds(0, 1)] = carry


def _body_v4(*refs, smem_meta: bool, adaptive: bool):
    """v4 = v3 with a pre-zeroed window and one fused 2-tile RMW.

    v3's per-row loop did two dynamic-index RMWs (tiles t and t+1) with
    fresh/cross first-touch selects — the scalar addressing work of
    that loop dominates the stitch at high flush rates (~50 ns/row of
    the ~2.4 ms 130 MB stitch). Zeroing the window up front (one vector
    store of the B tiles past the carry slot) makes every touch a plain
    OR, and tiles t, t+1 are adjacent, so the two RMWs fuse into ONE
    dynamic (2, 8, 128) read-OR-write per row. The fresh/cross meta
    bits become unnecessary; the one case that relied on fresh-clobber
    — a batched-column boundary jump landing on a stale carry slot —
    is handled by the step-base vector's bit 30 (set when the next
    step's first row starts a fresh tile), which zeroes the carry
    instead of forwarding it."""
    if smem_meta:
        (packed_ref, tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
    else:
        (tb_ref, staging_ref, meta_ref, hbcol_ref,
         out_ref, buf, sem) = refs
        packed_ref = None
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = staging_ref.shape[0]
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    p_vec = meta_ref[:] & 0x3FF
    rot = _rotate_right_rows(staging_ref[:], p_vec, 10, adaptive)
    low = jnp.where(col >= p_vec, rot, zero_u)
    high = jnp.where(col < hbcol_ref[:], rot, zero_u)
    w3 = jnp.concatenate([low, high], axis=1).reshape(2 * B, 8, 128)

    @pl.when(pid == 0)
    def _():
        buf[pl.ds(0, 1)] = jnp.zeros((1, 8, 128), _U)

    buf[pl.ds(1, B)] = jnp.zeros((B, 8, 128), _U)

    for r in range(B):
        pk = (packed_ref[pid * B + r] if smem_meta
              else meta_ref[r, 0])
        t = (pk >> 10) & 0x3FF
        buf[pl.ds(t, 2)] = buf[pl.ds(t, 2)] | w3[2 * r : 2 * r + 2]

    tb = tb_ref[pid] & 0x3FFFFFFF
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(tb, B + 1)], sem)
    cp.start()
    cp.wait()

    @pl.when(pid < nsteps - 1)
    def _():
        nxt = tb_ref[pid + 1]
        te = jnp.minimum((nxt & 0x3FFFFFFF) - tb, B)
        fresh0 = (nxt >> 30) & 1
        buf[pl.ds(0, 1)] = jnp.where(
            fresh0 == 0, buf[pl.ds(te, 1)], jnp.zeros((1, 8, 128), _U)
        )


def stitch_tiles_v2(
    staging: jnp.ndarray,
    offsets_ext: jnp.ndarray,
    tile_blocks: int | None = None,
    poison: bool = False,
    layout3d: bool = True,
    counts: jnp.ndarray | None = None,
    adaptive: bool = False,
    fused_rmw: bool = True,
) -> jnp.ndarray:
    """Assemble the dense stream from (nb, 1024) staging rows + exclusive
    word offsets (nb+1,). Returns (nb*1024,) uint32; words beyond
    offsets_ext[-1] are unspecified. Drop-in for encode_kernel.stitch_tiles.

    counts: optional per-row word counts. When omitted they are the
    offset differences (a single contiguous stream). Batched columns
    (encode_padded_batch) pass them explicitly: there the offsets JUMP
    at column boundaries (each column's stream restarts at its own
    tile-aligned capacity base), so differences would over-count the
    boundary rows. Offset jumps are supported as long as every jump
    lands on a step boundary (column capacity % tile_blocks == 0): the
    landing row is tile-aligned and fresh, so the (clamped) carry tile
    is never OR-ed with stale content.
    """
    from . import encode_kernel as _ek

    B = tile_blocks or _ek.TILE_BLOCKS
    nb = staging.shape[0]
    assert nb % B == 0, (nb, B)
    assert offsets_ext.shape == (nb + 1,), offsets_ext.shape
    nsteps = nb // B

    off = offsets_ext[:nb].astype(_I)
    if counts is None:
        counts = (offsets_ext[1:] - offsets_ext[:-1]).astype(_I)
    else:
        assert counts.shape == (nb,), counts.shape
        counts = counts.astype(_I)
    p = off % L
    t_glob = off // L
    tb = t_glob[::B]  # (nsteps,) step base tiles
    t_loc = t_glob - jnp.repeat(tb, B)
    prev_t = jnp.concatenate([jnp.full((1,), -1, _I), t_glob[:-1]])
    fresh = ((t_glob > prev_t) & (p == 0)).astype(_I)
    cross = (p + counts > L).astype(_I)
    meta = p | (t_loc << 10) | (fresh << 20) | (cross << 21)
    hb = jnp.maximum(p + counts - L, 0)
    # bit 30 of the step-base vector: the step's first row starts a
    # fresh tile (v4 zeroes the carry slot instead of forwarding it —
    # the batched-column boundary case; v2/v3 mask the bit off)
    tb = tb | (fresh[::B] << 30)

    T = nb + B + 2
    buf_shape = (B + 1, 8, 128) if layout3d else (B + 1, 1, L)
    out_shape3 = (T, 8, 128) if layout3d else (T, 1, L)
    # SMEM-resident per-row meta is the fast path for per-row scalar
    # reads but SMEM is 1 MB on v5e; beyond ~2^17 rows the loop reads
    # the VMEM meta block instead (see _body).
    smem_meta = nb <= SMEM_META_MAX_ROWS
    idx = (lambda i, pk, tb_: (i, 0)) if smem_meta else (
        lambda i, tb_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if smem_meta else 1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((B, L), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM(buf_shape, _U),
            pltpu.SemaphoreType.DMA,
        ],
    )
    from functools import partial

    meta = meta.reshape(nb, 1)
    args = (meta[:, 0], tb) if smem_meta else (tb,)
    from .encode_kernel import _resolve_adaptive

    if layout3d and fused_rmw:
        body = partial(_body_v4, smem_meta=smem_meta,
                       adaptive=_resolve_adaptive(adaptive))
    else:
        body = partial(_body_v3 if layout3d else _body, poison=poison,
                       smem_meta=smem_meta,
                       adaptive=_resolve_adaptive(adaptive))
    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(out_shape3, _U)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        *args,
        staging,
        meta,
        hb.reshape(nb, 1),
    )[0]
    return out.reshape(-1)[: nb * L]
