"""Batched-columns (bitmap-index) API tests: each column must produce
exactly the stream the golden model produces for it alone."""
import numpy as np

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import WahCodec, golden
from wah_tpu.constants import BLOCK_INTS


def _columns(n_ints, densities, seed0=100):
    return np.stack(
        [
            random_bitmap(n_ints, d, seed=seed0 + i)
            for i, d in enumerate(densities)
        ]
    )


def test_batch_compress_matches_per_column_golden():
    data = _columns(2 * BLOCK_INTS + 100, [1 / 64, 1 / 8, 0.5, 0.0])
    codec = WahCodec(kernel="xla")
    words, totals = codec.compress_batch(data)
    for c in range(data.shape[0]):
        ref = golden.encode(data[c])
        assert totals[c] == len(ref), c
        np.testing.assert_array_equal(words[c, : totals[c]], ref)


def test_batch_roundtrip():
    data = _columns(3 * BLOCK_INTS, [1 / 32, 0.2, 1 / 1024])
    codec = WahCodec(kernel="xla")
    words, totals = codec.compress_batch(data)
    out = codec.decompress_batch(words, totals, out_ints=data.shape[1])
    np.testing.assert_array_equal(out, data)


def test_batch_mixed_extremes():
    n = BLOCK_INTS
    data = np.stack(
        [
            np.zeros(n, np.uint32),
            np.full(n, 0xFFFFFFFF, np.uint32),
            clustered_bitmap(n, seed=9),
        ]
    )
    codec = WahCodec(kernel="xla")
    words, totals = codec.compress_batch(data)
    assert totals[0] == 1 and totals[1] == 1  # single fill word each
    out = codec.decompress_batch(words, totals, out_ints=n)
    np.testing.assert_array_equal(out, data)


def test_batch_pallas_path_matches_golden():
    """The TPU batch route (lax.map over fused Pallas kernels), in
    interpreter mode: exact per-column streams + roundtrip."""
    data = _columns(2 * BLOCK_INTS + 100, [1 / 64, 0.5, 0.0], seed0=7)
    codec = WahCodec(kernel="pallas")
    words, totals = codec.compress_batch(data)
    for c in range(data.shape[0]):
        ref = golden.encode(data[c])
        assert totals[c] == len(ref), c
        np.testing.assert_array_equal(words[c, : totals[c]], ref)
    out = codec.decompress_batch(words, totals, out_ints=data.shape[1])
    np.testing.assert_array_equal(out, data)


def test_batch_flattened_kernel_direct():
    """encode_padded_batch (one flattened kernel pipeline): per-column
    streams bit-exact vs golden across densities, including a column
    whose stream fills its capacity exactly (incompressible data ->
    every boundary/carry path in the batched stitch)."""
    import jax

    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel

    nb = 8  # CPU TILE_BLOCKS; pow2
    n = nb * BLOCK_INTS  # block-aligned: full-capacity column possible
    rng = np.random.default_rng(42)
    cols = np.stack(
        [
            random_bitmap(n, 1 / 64, seed=11),
            rng.integers(1, 2**32, size=n, dtype=np.uint64).astype(
                np.uint32
            ),  # no zero/ones words: total == nb*1024 exactly
            np.zeros(n, np.uint32),
            random_bitmap(n, 0.5, seed=12),
            np.full(n, 0xFFFFFFFF, np.uint32),
        ]
    )
    nv = np.int32(chunk_count(n))
    words, totals = jax.jit(encode_kernel.encode_padded_batch)(cols, nv)
    words = np.asarray(words).reshape(cols.shape[0], -1)  # flat return
    totals = np.asarray(totals)
    assert totals[1] == nb * 1024  # capacity-filling column
    for c in range(cols.shape[0]):
        ref = golden.encode(cols[c])
        assert totals[c] == len(ref), c
        np.testing.assert_array_equal(words[c, : totals[c]], ref)


def test_batch_flattened_kernel_groups_and_tail():
    """group_rows smaller than the batch forces multiple lax.map groups
    plus a padded partial group; a non-block-multiple column length
    exercises the per-column validity mask's tail."""
    import jax
    from functools import partial

    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel

    nb = 8
    n = (nb - 2) * BLOCK_INTS + 123  # tail: last valid block partial
    cols = np.stack(
        [random_bitmap(n, d, seed=20 + i) for i, d in enumerate(
            [1 / 512, 0.3, 0.0, 1.0, 1 / 16])]
    )
    padded = np.zeros((cols.shape[0], nb * BLOCK_INTS), np.uint32)
    padded[:, :n] = cols
    nv = np.int32(chunk_count(n))
    # 2 columns per group -> 3 groups, last padded from 5 to 6 columns
    fn = jax.jit(
        partial(encode_kernel.encode_padded_batch, group_rows=2 * nb)
    )
    words, totals = fn(padded, nv)
    words = np.asarray(words).reshape(cols.shape[0], -1)
    totals = np.asarray(totals)
    assert totals.shape[0] == cols.shape[0]  # padding stripped
    for c in range(cols.shape[0]):
        ref = golden.encode(cols[c])
        assert totals[c] == len(ref), c
        np.testing.assert_array_equal(words[c, : totals[c]], ref)


def test_batch_flattened_decode_direct():
    """decode_batch (one flattened kernel): roundtrip vs golden for
    mixed columns — all-zeros (max-length fills, covering row jumps),
    incompressible (capacity-filling stream), dense, sparse, tail."""
    import jax

    from wah_tpu.constants import BLOCK_CHUNKS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel

    nbo = 8  # CPU decode TILE_BLOCKS; pow2
    n = (nbo - 1) * BLOCK_INTS + 200  # tail: nv < capacity
    rng = np.random.default_rng(77)
    cols = np.stack(
        [
            np.zeros(n, np.uint32),
            rng.integers(1, 2**32, size=n, dtype=np.uint64).astype(
                np.uint32
            ),
            random_bitmap(n, 0.5, seed=31),
            random_bitmap(n, 1 / 512, seed=32),
            np.full(n, 0xFFFFFFFF, np.uint32),
            clustered_bitmap(n, seed=33),
        ]
    )
    streams = [golden.encode(c) for c in cols]
    ms = np.array([len(s) for s in streams], np.int32)
    Mcap = max(1024, -(-int(ms.max()) // 1024) * 1024)
    w2 = np.zeros((len(streams), Mcap), np.uint32)
    for i, s in enumerate(streams):
        w2[i, : len(s)] = s
    cap = nbo * BLOCK_CHUNKS
    flat = jax.jit(
        lambda w, m: decode_kernel.decode_batch(w, m, cap)
    )(w2, ms)
    flat = np.asarray(flat).reshape(len(streams), -1)
    nv = chunk_count(n)
    out_ints = (31 * nv + 31) // 32
    for c in range(cols.shape[0]):
        np.testing.assert_array_equal(
            flat[c, :out_ints][:n], cols[c], err_msg=str(c)
        )


def test_batch_decompress_pallas_route():
    """api.decompress_batch takes the flattened Pallas kernel on the
    pallas route and stays bit-exact."""
    data = _columns(3 * BLOCK_INTS + 41, [1 / 64, 0.5, 0.0, 1 / 4096])
    codec = WahCodec(kernel="pallas")
    words, totals = codec.compress_batch(data)
    out = codec.decompress_batch(words, totals, out_ints=data.shape[1])
    np.testing.assert_array_equal(out, data)
