"""Fused Pallas kernel tests (interpreter mode on CPU; compiled on TPU).

Differential against the golden model and the pure-XLA ops — the same
oracle strategy the reference uses (tests.cpp pinned vectors +
roundtrips), applied to the fused kernels.
"""
import jax
import numpy as np
import pytest

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import golden
from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
from wah_tpu.golden import chunk_count
from wah_tpu.ops.pallas import decode_kernel, encode_kernel


def _encode(data: np.ndarray):
    n = len(data)
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data
    words, total = jax.jit(encode_kernel.encode_padded)(
        padded, np.int32(nv)
    )
    return np.asarray(words)[: int(total)]


def _decode(words: np.ndarray, cap: int):
    M = max(1024, -(-len(words) // 1024) * 1024)
    padded = np.zeros(M, dtype=np.uint32)
    padded[: len(words)] = words
    ints, n_ints = jax.jit(
        decode_kernel.decode, static_argnums=(2,)
    )(padded, np.int32(len(words)), cap)
    return np.asarray(ints)[: int(n_ints)]


CASES = [
    ("random_sparse", lambda: random_bitmap(4 * BLOCK_INTS, 1 / 64)),
    ("random_mid", lambda: random_bitmap(9 * BLOCK_INTS, 1 / 16, seed=3)),
    ("random_dense", lambda: random_bitmap(8 * BLOCK_INTS, 0.5, seed=4)),
    ("clustered", lambda: clustered_bitmap(8 * BLOCK_INTS, seed=5)),
    ("all_zeros", lambda: np.zeros(8 * BLOCK_INTS, dtype=np.uint32)),
    ("all_ones", lambda: np.full(8 * BLOCK_INTS, 0xFFFFFFFF, np.uint32)),
    ("odd_size", lambda: random_bitmap(3 * BLOCK_INTS + 345, 0.1, seed=6)),
    ("tiny", lambda: np.array([0x1, 0, 0, 0xFFFFFFFF], dtype=np.uint32)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_pallas_encode_matches_golden(name, gen):
    data = gen()
    np.testing.assert_array_equal(_encode(data), golden.encode(data))


@pytest.mark.parametrize("stitch", ["v1", "v3"])
@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_pallas_encode_static_stitch_matches_golden(name, gen, stitch):
    """Both host-selected stitch variants (api._stitch_hint picks one
    statically; the in-graph cond is the 'auto' fallback) are bit-exact."""
    data = gen()
    n = len(data)
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data
    words, total = jax.jit(
        lambda p, v: encode_kernel.encode_padded(p, v, stitch=stitch)
    )(padded, np.int32(nv))
    np.testing.assert_array_equal(
        np.asarray(words)[: int(total)], golden.encode(data)
    )


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_pallas_fused_encode_matches_golden(name, gen):
    data = gen()
    n = len(data)
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data
    words, total = jax.jit(encode_kernel.encode_padded_fused)(
        padded, np.int32(nv)
    )
    np.testing.assert_array_equal(
        np.asarray(words)[: int(total)], golden.encode(data)
    )


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_pallas_decode_roundtrip(name, gen):
    data = gen()
    stream = golden.encode(data)
    nv = chunk_count(len(data))
    cap = -(-nv // BLOCK_CHUNKS) * BLOCK_CHUNKS
    out = _decode(stream, cap)
    np.testing.assert_array_equal(out[: len(data)], data)


def test_pallas_long_fills_decode():
    """Fill runs of max length (1024) stress the window DMA path: many
    output blocks covered by few words."""
    data = np.zeros(64 * BLOCK_INTS, dtype=np.uint32)
    stream = golden.encode(data)
    assert len(stream) == 64  # one BIT31|1024 word per block
    cap = 64 * BLOCK_CHUNKS
    out = _decode(stream, cap)
    np.testing.assert_array_equal(out[: len(data)], data)


def test_pallas_decode_granule_window_extremes():
    """Adversarial granule-window case: a hand-built stream where one
    block's covering word sits at the MAXIMUM phase (offset 127 inside
    its granule — the decode kernel's 7-step rotation bound) AND that
    block consumes the full 1024 distinct words, touching lane 1150 of
    the 1152-lane window (its capacity bound).

    Construction: 127 literal words (chunks 0..126), a 770-chunk zero
    fill (chunks 127..896), then 1151 literals (chunks 897..2047).
    Block 1 (base 1024) is covered first by literal word
    128 + (1024 - 897) = 255, and 255 % 128 == 127; it then consumes
    words 255..1278 — 1024 literals from phase 127."""
    rng = np.random.default_rng(77)
    lits = rng.integers(1, golden.ONES31 - 1, size=1278, dtype=np.uint32)
    stream = np.concatenate(
        [
            lits[:127],
            np.array([golden.BIT31 | 770], dtype=np.uint32),
            lits[127:],
        ]
    ).astype(np.uint32)
    # sanity of the construction itself (offsets as described)
    is_fill = (stream & golden.BIT31) != 0
    counts = np.where(is_fill, stream & golden.LEN_MASK, 1)
    offs = np.cumsum(counts) - counts
    w_cov = int(np.searchsorted(offs, 1024, side="right")) - 1
    assert w_cov == 255 and w_cov % 128 == 127
    assert counts[w_cov:].sum() >= 1024  # block 1 consumes 1024 words

    chunks = np.zeros(2048, dtype=np.uint32)
    chunks[:127] = lits[:127]
    chunks[897:] = lits[127:]
    expected = golden.merge_chunks(chunks)
    out = _decode(stream, 2 * BLOCK_CHUNKS)
    np.testing.assert_array_equal(out, expected[: len(out)])


def test_pallas_stitch_dense_prefix_garbage_contract():
    """Words beyond `total` are unspecified; everything before is exact."""
    data = random_bitmap(16 * BLOCK_INTS, 1 / 8, seed=9)
    ref = golden.encode(data)
    got = _encode(data)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_pallas_shard_padding_emits_no_spurious_words():
    """Regression (round-1 advisor, high): on a non-final shard of a
    distributed encode, chunk_base + local padding positions are below
    the GLOBAL n_valid_chunks; without clamping to the local block
    range, rows padding nb up to TILE_BLOCKS emitted spurious
    BIT31|1024 words into the shard total."""
    nb = 4  # < TILE_BLOCKS (8 in interpreter mode) -> padding rows exist
    assert nb < encode_kernel.TILE_BLOCKS
    data = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    nv_global = np.int32(8 * nb * BLOCK_CHUNKS)  # simulates 8 shards
    for base in (0, nb * BLOCK_CHUNKS):
        for fn in (encode_kernel.encode_padded,
                   encode_kernel.encode_padded_fused):
            words, total = jax.jit(fn)(data, nv_global, np.int32(base))
            assert int(total) == nb, (fn.__name__, base, int(total))
            np.testing.assert_array_equal(
                np.asarray(words)[:nb],
                np.full(nb, 0x80000000 | 1024, np.uint32),
            )


def test_wide_scans_match_flat():
    """cumsum_lanes_wide / cummax_lanes_wide (2-D decomposed scans) are
    drop-in equal to the flat Hillis-Steele forms."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from wah_tpu.ops.pallas import common

    rng = np.random.default_rng(17)
    x = rng.integers(0, 100, size=(4, 2048), dtype=np.int32)

    def ker(x_ref, s_ref, m_ref):
        s_ref[:] = common.cumsum_lanes_wide(x_ref[:])
        m_ref[:] = common.cummax_lanes_wide(x_ref[:], jnp.int32(-1))

    s, m = pl.pallas_call(
        ker,
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.int32),
            jax.ShapeDtypeStruct(x.shape, jnp.int32),
        ],
        interpret=True,
    )(x)
    np.testing.assert_array_equal(np.asarray(s), np.cumsum(x, axis=1))
    np.testing.assert_array_equal(
        np.asarray(m), np.maximum.accumulate(x, axis=1)
    )


def test_stitch_vmem_meta_path_matches_golden(monkeypatch):
    """Streams larger than SMEM_META_MAX_ROWS switch the stitch's
    per-row metadata from scalar-prefetch SMEM to VMEM scalar reads
    (v5e SMEM is 1 MB; the 992 MB sweep config overflowed it). Force
    the switch with a tiny threshold and check bit-exactness."""
    from wah_tpu.ops.pallas import stitch2

    monkeypatch.setattr(stitch2, "SMEM_META_MAX_ROWS", 4)
    for name, gen in CASES:
        data = gen()
        n = len(data)
        nv = chunk_count(n)
        nb = -(-nv // BLOCK_CHUNKS)
        padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
        padded[:n] = data
        words, total = jax.jit(
            lambda p, v: encode_kernel.encode_padded(p, v, stitch="v3")
        )(padded, np.int32(nv))
        np.testing.assert_array_equal(
            np.asarray(words)[: int(total)], golden.encode(data), err_msg=name
        )


# ---------------------------------------------------------------------------
# adaptive pass-skipping boundaries (encode_kernel.ADAPTIVE)
# ---------------------------------------------------------------------------

def _bitmap_of_chunks(chunks: np.ndarray) -> np.ndarray:
    """Inverse of the 32->31 repartition: craft a bitmap whose chunk
    sequence is exactly `chunks` (len % 1024 == 0)."""
    return golden.merge_chunks(np.asarray(chunks, dtype=np.uint32))


def _encode_adaptive(data: np.ndarray):
    n = len(data)
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    padded = np.zeros(nb * encode_kernel.BLOCK_INTS
                      if hasattr(encode_kernel, "BLOCK_INTS")
                      else nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data
    words, total = jax.jit(
        lambda p, v: encode_kernel.encode_padded(p, v, adaptive=True)
    )(padded, np.int32(nv))
    return np.asarray(words)[: int(total)]


def _decode_adaptive(words: np.ndarray, cap: int):
    M = max(1024, -(-len(words) // 1024) * 1024)
    padded = np.zeros(M, dtype=np.uint32)
    padded[: len(words)] = words
    ints, n_ints = jax.jit(
        lambda w, m: decode_kernel.decode(w, m, cap, adaptive=True),
        static_argnums=(),
    )(padded, np.int32(len(words)))
    return np.asarray(ints)[: int(n_ints)]


def _adaptive_roundtrip(chunks_plan):
    """Both kernel variants (adaptive and plain) must produce the golden
    stream and roundtrip the bitmap."""
    data = _bitmap_of_chunks(chunks_plan)
    want = golden.encode(data)
    nv = chunk_count(len(data))
    cap = -(-nv // BLOCK_CHUNKS) * BLOCK_CHUNKS
    np.testing.assert_array_equal(_encode(data), want)
    np.testing.assert_array_equal(_encode_adaptive(data), want)
    np.testing.assert_array_equal(_decode(want, cap)[: len(data)], data)
    np.testing.assert_array_equal(
        _decode_adaptive(want, cap)[: len(data)], data
    )


@pytest.mark.parametrize("b", range(10))
def test_adaptive_run_length_boundaries(b):
    """One zero run of exactly 2^b chunks and one of 2^b + 1, embedded
    in literals: pins the per-pass gating thresholds — the encode
    compaction displacement, the decode expansion displacement, and the
    decode cummax forward-fill distance all sit exactly at a pass's
    stride (the off-by-one failure mode of lax.cond-gated log passes)."""
    rng = np.random.default_rng(100 + b)
    n = 2 * BLOCK_CHUNKS
    chunks = rng.integers(1, golden.ONES31 - 1, size=n, dtype=np.uint32)
    k = 1 << b
    chunks[10 : 10 + k] = 0  # run of exactly 2^b
    start2 = BLOCK_CHUNKS + 5
    chunks[start2 : start2 + k + 1] = golden.ONES31  # run of 2^b + 1
    _adaptive_roundtrip(chunks)


def test_adaptive_fast_path_all_start_with_fills():
    """Every chunk its own run (alternating literal / zero / ones):
    takes the all-start fast path with length-1 fill words."""
    rng = np.random.default_rng(7)
    n = 2 * BLOCK_CHUNKS
    chunks = rng.integers(1, golden.ONES31 - 1, size=n, dtype=np.uint32)
    chunks[0::3] = 0
    chunks[1::3] = golden.ONES31
    _adaptive_roundtrip(chunks)


def test_adaptive_mixed_tile_rows():
    """Blocks with wildly different profiles share one grid tile: an
    all-literal block, an all-zero block (displacement 1023), and a
    boundary-run block — the tile-wide max gates must serve all three."""
    rng = np.random.default_rng(8)
    n = 4 * BLOCK_CHUNKS
    chunks = rng.integers(1, golden.ONES31 - 1, size=n, dtype=np.uint32)
    chunks[BLOCK_CHUNKS : 2 * BLOCK_CHUNKS] = 0
    chunks[2 * BLOCK_CHUNKS + 100 : 2 * BLOCK_CHUNKS + 612] = golden.ONES31
    _adaptive_roundtrip(chunks)


def test_adaptive_matches_plain_on_clustered():
    """The adaptive and plain kernel variants produce bit-identical
    streams on clustered (Zipfian) data — the in-kernel tier conds only
    gate no-op passes."""
    data = clustered_bitmap(8 * BLOCK_INTS, seed=11)
    want = _encode(data)
    np.testing.assert_array_equal(_encode_adaptive(data), want)
    np.testing.assert_array_equal(want, golden.encode(data))


def test_adaptive_hints():
    """Host hints pick the adaptive variants exactly for fill-free
    samples."""
    from wah_tpu.api import WahCodec

    rng = np.random.default_rng(3)
    # block-multiple size: a partial tail block would append a zero
    # fill for the padding chunks and (correctly) disable the hint
    dense = rng.integers(
        1, 2**32 - 1, size=4 * BLOCK_INTS, dtype=np.uint64
    ).astype(np.uint32)
    assert WahCodec._adaptive_hint(dense)
    sparse = np.zeros(4096, np.uint32)
    assert not WahCodec._adaptive_hint(sparse)
    allones = np.full(4096, 0xFFFFFFFF, np.uint32)
    assert not WahCodec._adaptive_hint(allones)

    lit_stream = golden.encode(dense)
    assert WahCodec._decode_adaptive_hint(lit_stream)
    fill_stream = golden.encode(np.zeros(992 * 4, np.uint32))
    assert not WahCodec._decode_adaptive_hint(fill_stream)
