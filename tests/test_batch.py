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
