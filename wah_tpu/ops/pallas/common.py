"""In-kernel (Mosaic/VPU) lane-wise primitives shared by the fused WAH
kernels: masked shifts, Hillis-Steele scans, and monotone log-shift
routing over the last axis of a (rows, lanes) VMEM tile.

These re-express, inside one Pallas grid step, what the reference does
with warp shuffles and shared memory (kernels.cu:13-28, 53-61): every
primitive is a short sequence of lane rolls + selects — pure VPU work on
VMEM-resident tiles, no lane-crossing shuffles, no shared-memory
barriers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lane_iota",
    "shift_right",
    "shift_left",
    "cumsum_lanes",
    "cumsum_lanes_mxu",
    "cumsum_lanes_packed_rows",
    "cummax_lanes",
    "compact_lanes",
    "expand_lanes",
    "tri128",
]


def lane_iota(shape, dtype=jnp.int32):
    """Per-lane column index (2-D iota; 1-D iota is unsupported on TPU)."""
    return jax.lax.broadcasted_iota(dtype, shape, len(shape) - 1)


def shift_right(x, k: int, fill, col=None):
    """y[..., i] = x[..., i-k]; first k lanes become `fill` (static k).

    Boolean inputs round-trip through int32: Mosaic's lane rotate and
    vector selects only support 32-bit elements, so masks are shifted as
    0/1 ints and turned back into predicates with a compare.
    `col` lets callers pass a precomputed lane iota.
    """
    if k == 0:
        return x
    as_bool = x.dtype == jnp.bool_
    if as_bool:
        x, fill = x.astype(jnp.int32), jnp.int32(bool(fill))
    if col is None:
        col = lane_iota(x.shape)
    y = jnp.where(col >= k, pltpu.roll(x, shift=k, axis=x.ndim - 1), fill)
    return y != 0 if as_bool else y


def shift_left(x, k: int, fill, col=None):
    """y[..., i] = x[..., i+k]; last k lanes become `fill` (static k)."""
    if k == 0:
        return x
    as_bool = x.dtype == jnp.bool_
    if as_bool:
        x, fill = x.astype(jnp.int32), jnp.int32(bool(fill))
    n = x.shape[-1]
    if col is None:
        col = lane_iota(x.shape)
    y = jnp.where(
        col < n - k, pltpu.roll(x, shift=n - k, axis=x.ndim - 1), fill
    )
    return y != 0 if as_bool else y


def cumsum_lanes(x, nbits: int, col=None):
    """Inclusive prefix sum along lanes (Hillis-Steele, nbits steps)."""
    for b in range(nbits):
        x = x + shift_right(x, 1 << b, jnp.zeros((), x.dtype), col)
    return x


def cummax_lanes(x, nbits: int, neutral, col=None):
    """Inclusive prefix max along lanes."""
    for b in range(nbits):
        x = jnp.maximum(x, shift_right(x, 1 << b, neutral, col))
    return x


def cumsum_lanes_packed_rows(x, nbits: int):
    """Inclusive lane prefix sum of (B, L) int32 whose per-row totals
    stay < 2^15 (WAH block scans cap at 1024), with rows r and r+B/2
    packed into the lo/hi 16-bit fields of one int32 row: the nbits
    roll+add passes run on (B/2, L), halving the scan's roll work for
    one pack (shift+or) and one unpack (mask/shift+concat). Field sums
    cannot carry across the 16-bit boundary (values < 2^15), and the
    shift fill is 0 in both fields. Falls back to the flat scan for odd
    B. NEGATIVE RESULT on v5e (130 MB 2^-4 encode tile kernel): 2.65 ->
    2.77 ms — the pack and the (B, L) concat cost more than the halved
    rolls save. Kept for documentation / other-shape experiments; the
    kernels use the flat scans."""
    B = x.shape[0]
    if B % 2:
        return cumsum_lanes(x, nbits)
    h = B // 2
    packed = x[:h] | (x[h:] << 16)
    col = lane_iota(packed.shape)
    packed = cumsum_lanes(packed, nbits, col)
    return jnp.concatenate([packed & 0xFFFF, packed >> 16], axis=0)


# -- 2-D decomposed scans ----------------------------------------------------
# A roll by k < 128 over a W-lane axis crosses native 128-lane register
# boundaries (2-3 instructions per register); decomposing the scan into
# 128-lane segments (7 in-register steps) + a sublane-axis scan of the
# per-segment totals keeps every lane roll inside one register and turns
# the combine into cheap sublane rolls. Same op count, cheaper ops.
# Requires an in-kernel (B, W) <-> (B, W//128, 128) relayout (supported
# by Mosaic; its cost is why this is selected by measurement, see
# benchmarks/micro.py).

def rebase_exclusive_per_col(counts_flat, cols: int, percol: int,
                             colcap: int):
    """Flat per-row counts -> per-column EXCLUSIVE offsets rebased to
    column capacity bases c*colcap, plus per-column totals. Host-graph
    helper shared by the flattened batch encode/decode: ONE 1-D cumsum
    + elementwise rebasing (XLA lowers a 2-D axis=1 cumsum ~250x slower
    on TPU — ~50 ms for (256, 2048), measured)."""
    cf = jnp.cumsum(counts_flat, dtype=jnp.int32).reshape(cols, percol)
    ends = cf[:, -1]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    base = jnp.arange(cols, dtype=jnp.int32) * jnp.int32(colcap)
    off = (cf - counts_flat.reshape(cols, percol)
           + (base - starts)[:, None])
    return off.reshape(-1), ends - starts


def tri128() -> "np.ndarray":
    """(128, 128) int8 upper-triangular ones: x @ tri128 is the
    inclusive 128-lane prefix sum. Kernel input constant for the MXU
    scan (Pallas kernels cannot capture array constants)."""
    import numpy as np

    i = np.arange(128)
    return (i[:, None] <= i[None, :]).astype(np.int8)


def cumsum_lanes_mxu(x, tri):
    """Inclusive prefix sum along the last axis of (B, W) int32 with
    values in [0, 16383], W % 128 == 0, on the MXU.

    A W-lane Hillis-Steele scan costs log2(W) cross-register roll+
    select+add passes on the VPU — the single largest op family in the
    decode window (11 steps over (B, 2048)). Prefix sum is linear, so
    the 128-lane segment scan becomes ONE matmul with a triangular ones
    matrix: the values are split into two 7-bit limbs (int8 x int8 ->
    int32 is MXU-native), each limb multiplied by `tri` (tri128()), and
    recombined; segment totals then combine with a log-shift scan over
    the W/128 per-row segments. Measured v5e (130 MB decode): SLOWER
    than the flat VPU scan (9.33 vs 8.58 ms decode, 2.79 vs 2.65 ms
    encode tiles) — the int8 limb packing and (B, W) <-> (B*G, 128)
    relayouts cost more than the rolls they replace. Kept opt-in
    (WAH_MXU_SCANS=1) as a documented negative result.
    """
    B, W = x.shape
    G = W // 128
    y = x.reshape(B * G, 128)
    lo = (y & 127).astype(jnp.int8)
    hi = (y >> 7).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    slo = jax.lax.dot_general(
        lo, tri, dn, preferred_element_type=jnp.int32
    )
    shi = jax.lax.dot_general(
        hi, tri, dn, preferred_element_type=jnp.int32
    )
    seg = (slo + (shi << 7)).reshape(B, G, 128)
    tot = seg[:, :, 127]  # (B, G) per-segment totals
    ri = lane_iota((B, G))
    acc = tot
    zero = jnp.zeros((), x.dtype)
    k = 1
    while k < G:
        acc = acc + jnp.where(ri >= k, pltpu.roll(acc, shift=k, axis=1), zero)
        k <<= 1
    return (seg + (acc - tot)[:, :, None]).reshape(B, W)


def _seg_view(x):
    B, W = x.shape
    assert W % 128 == 0, W
    return x.reshape(B, W // 128, 128)


def cumsum_lanes_wide(x):
    """Inclusive prefix sum along the last axis of (B, W), W % 128 == 0,
    via the 128-segment decomposition."""
    B, W = x.shape
    G = W // 128
    y = _seg_view(x)
    c = lane_iota(y.shape)
    zero = jnp.zeros((), x.dtype)
    for b in range(7):
        k = 1 << b
        y = y + jnp.where(c >= k, pltpu.roll(y, shift=k, axis=2), zero)
    tot = y[:, :, 127:128]  # (B, G, 1) per-segment totals
    ri = jax.lax.broadcasted_iota(jnp.int32, (B, G, 1), 1)
    acc = tot
    k = 1
    while k < G:
        acc = acc + jnp.where(ri >= k, pltpu.roll(acc, shift=k, axis=1), zero)
        k <<= 1
    y = y + (acc - tot)  # add exclusive segment prefix, broadcast on lanes
    return y.reshape(B, W)


def cummax_lanes_wide(x, neutral):
    """Inclusive prefix max along the last axis of (B, W), decomposed."""
    B, W = x.shape
    G = W // 128
    y = _seg_view(x)
    c = lane_iota(y.shape)
    for b in range(7):
        k = 1 << b
        y = jnp.maximum(
            y, jnp.where(c >= k, pltpu.roll(y, shift=k, axis=2), neutral)
        )
    tot = y[:, :, 127:128]
    ri = jax.lax.broadcasted_iota(jnp.int32, (B, G, 1), 1)
    acc = tot
    k = 1
    while k < G:
        acc = jnp.maximum(
            acc,
            jnp.where(ri >= k, pltpu.roll(acc, shift=k, axis=1), neutral),
        )
        k <<= 1
    excl = jnp.where(ri >= 1, pltpu.roll(acc, shift=1, axis=1), neutral)
    return jnp.maximum(y, excl).reshape(B, W)


def compact_lanes(vals, ok, d, nbits: int):
    """Move element i LEFT by d[i] lanes (monotone routing, LSB->MSB).

    Same contract as ops.compact.compact: d >= 0, non-decreasing over
    live elements. Returns (moved vals list, moved ok mask).
    """
    vals = list(vals)
    F = jnp.zeros((), jnp.int32)
    for b in range(nbits):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_left(moving, k, False)
        vals = [
            jnp.where(src, shift_left(v, k, jnp.zeros((), v.dtype)), v)
            for v in vals
        ]
        d = jnp.where(src, shift_left(d, k, F), d)
        ok = src | (ok & ~moving)
    return vals, ok


def expand_lanes(vals, ok, d, nbits: int):
    """Move element i RIGHT by d[i] lanes (monotone routing, MSB->LSB)."""
    vals = list(vals)
    F = jnp.zeros((), jnp.int32)
    for b in reversed(range(nbits)):
        k = 1 << b
        moving = ok & ((d & k) != 0)
        src = shift_right(moving, k, False)
        vals = [
            jnp.where(src, shift_right(v, k, jnp.zeros((), v.dtype)), v)
            for v in vals
        ]
        d = jnp.where(src, shift_right(d, k, F), d)
        ok = src | (ok & ~moving)
    return vals, ok
