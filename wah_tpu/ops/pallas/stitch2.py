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


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rotate_right_rows(x, s, nbits: int):
    for k in range(nbits):
        bit = ((s >> k) & 1) != 0
        x = jnp.where(bit, pltpu.roll(x, shift=1 << k, axis=1), x)
    return x


def _body(packed_ref, tb_ref, staging_ref, pcol_ref, hbcol_ref,
          out_ref, buf, sem, *, poison: bool):
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = staging_ref.shape[0]
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    # rotate every row to phase, split into low/high tile parts
    rot = _rotate_right_rows(staging_ref[:], pcol_ref[:], 10)
    low = jnp.where(col >= pcol_ref[:], rot, zero_u)
    high = jnp.where(col < hbcol_ref[:], rot, zero_u)

    # per-row RMW into the local tile window (branchless)
    for r in range(B):
        pk = packed_ref[pid * B + r]
        t = pk & 0x3FF
        fresh = (pk >> 10) & 1
        cross = (pk >> 11) & 1
        lo = low[r : r + 1][None]
        hi = high[r : r + 1][None]
        o1 = buf[pl.ds(t, 1)]
        buf[pl.ds(t, 1)] = jnp.where(fresh == 1, lo, o1 | lo)
        o2 = buf[pl.ds(t + 1, 1)]
        buf[pl.ds(t + 1, 1)] = jnp.where(cross == 1, hi, o2 | hi)

    # flush the window; carry the boundary tile to slot 0
    tb = tb_ref[pid]
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(tb, B + 1)], sem)
    cp.start()
    cp.wait()

    @pl.when(pid < nsteps - 1)
    def _():
        te = tb_ref[pid + 1] - tb
        carry = buf[pl.ds(te, 1)]
        if poison:  # interpreter-only: make first-touch bugs visible
            buf[...] = jnp.full_like(buf[...], 0xDEADBEEF)
        buf[pl.ds(0, 1)] = carry


def _body_v3(packed_ref, tb_ref, staging_ref, pcol_ref, hbcol_ref,
             out_ref, buf, sem, *, poison: bool):
    """v3 = v2 with the accumulator in (tiles, 8, 128) vreg layout.

    A 1024-word output tile stored as (1, 1024) pads to 8 sublanes in
    VMEM, so every tile RMW moves 8 vregs; stored as (8, 128) it is
    exactly ONE vreg-shaped unit. The rotated contributions are built in
    lane space (rolls need lanes) and reshaped once to (B, 16, 128)
    (sublane<->lane reshape is in-kernel legal), then the per-row RMW
    loop touches single (1, 8, 128) slices.
    """
    pid = pl.program_id(0)
    nsteps = pl.num_programs(0)
    B = staging_ref.shape[0]
    col = lane_iota((B, L))
    zero_u = jnp.zeros((B, L), _U)

    rot = _rotate_right_rows(staging_ref[:], pcol_ref[:], 10)
    low = jnp.where(col >= pcol_ref[:], rot, zero_u)
    high = jnp.where(col < hbcol_ref[:], rot, zero_u)
    w3 = jnp.concatenate([low, high], axis=1).reshape(B, 16, 128)

    for r in range(B):
        pk = packed_ref[pid * B + r]
        t = pk & 0x3FF
        fresh = (pk >> 10) & 1
        cross = (pk >> 11) & 1
        lo = w3[r, 0:8, :][None]
        hi = w3[r, 8:16, :][None]
        o1 = buf[pl.ds(t, 1)]
        buf[pl.ds(t, 1)] = jnp.where(fresh == 1, lo, o1 | lo)
        o2 = buf[pl.ds(t + 1, 1)]
        buf[pl.ds(t + 1, 1)] = jnp.where(cross == 1, hi, o2 | hi)

    tb = tb_ref[pid]
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(tb, B + 1)], sem)
    cp.start()
    cp.wait()

    @pl.when(pid < nsteps - 1)
    def _():
        te = tb_ref[pid + 1] - tb
        carry = buf[pl.ds(te, 1)]
        if poison:  # interpreter-only: make first-touch bugs visible
            buf[...] = jnp.full_like(buf[...], 0xDEADBEEF)
        buf[pl.ds(0, 1)] = carry


def stitch_tiles_v2(
    staging: jnp.ndarray,
    offsets_ext: jnp.ndarray,
    tile_blocks: int | None = None,
    poison: bool = False,
    layout3d: bool = True,
) -> jnp.ndarray:
    """Assemble the dense stream from (nb, 1024) staging rows + exclusive
    word offsets (nb+1,). Returns (nb*1024,) uint32; words beyond
    offsets_ext[-1] are unspecified. Drop-in for encode_kernel.stitch_tiles.
    """
    from . import encode_kernel as _ek

    B = tile_blocks or _ek.TILE_BLOCKS
    nb = staging.shape[0]
    assert nb % B == 0, (nb, B)
    assert offsets_ext.shape == (nb + 1,), offsets_ext.shape
    nsteps = nb // B

    off = offsets_ext[:nb].astype(_I)
    counts = (offsets_ext[1:] - offsets_ext[:-1]).astype(_I)
    p = off % L
    t_glob = off // L
    tb = t_glob[::B]  # (nsteps,) step base tiles
    t_loc = t_glob - jnp.repeat(tb, B)
    prev_t = jnp.concatenate([jnp.full((1,), -1, _I), t_glob[:-1]])
    fresh = ((t_glob > prev_t) & (p == 0)).astype(_I)
    cross = (p + counts > L).astype(_I)
    packed = t_loc | (fresh << 10) | (cross << 11)
    hb = jnp.maximum(p + counts - L, 0)

    T = nb + B + 2
    buf_shape = (B + 1, 8, 128) if layout3d else (B + 1, 1, L)
    out_shape3 = (T, 8, 128) if layout3d else (T, 1, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((B, L), lambda i, pk, tb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, pk, tb_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, pk, tb_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM(buf_shape, _U),
            pltpu.SemaphoreType.DMA,
        ],
    )
    from functools import partial

    out = pl.pallas_call(
        partial(_body_v3 if layout3d else _body, poison=poison),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(out_shape3, _U)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        packed,
        tb,
        staging,
        p.reshape(nb, 1),
        hb.reshape(nb, 1),
    )[0]
    return out.reshape(-1)[: nb * L]
