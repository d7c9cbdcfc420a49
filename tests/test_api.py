"""End-to-end tests of the host API (compress/decompress with timings)."""
import numpy as np
import pytest

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import WahCodec, compress, decompress, golden, validate_stream

U = np.uint32


@pytest.mark.parametrize(
    "n,density",
    [(992 * 4, 0.01), (992 * 4, 0.5), (31, 0.2), (1000, 0.1), (992 * 7 + 5, 0.003)],
)
def test_compress_matches_golden(n, density):
    data = random_bitmap(n, density, seed=n)
    stream, t = compress(data)
    np.testing.assert_array_equal(stream, golden.encode(data))
    validate_stream(stream)
    assert t.kernel_ms >= 0.0


def test_roundtrip_api():
    for gen in (
        lambda: random_bitmap(992 * 8, 0.02),
        lambda: clustered_bitmap(992 * 6),
        lambda: np.zeros(992 * 2, dtype=U),
    ):
        data = gen()
        stream, _ = compress(data)
        out, _ = decompress(stream, out_ints=data.shape[0])
        np.testing.assert_array_equal(out, data)


def test_decompress_default_size():
    data = random_bitmap(31 * 5, 0.2, seed=42)
    stream, _ = compress(data)
    out, _ = decompress(stream)
    assert out.shape[0] == 31 * 5  # ceil(31 * chunks / 32)
    np.testing.assert_array_equal(out, data)


def test_empty_input():
    stream, _ = compress(np.zeros(0, dtype=U))
    assert stream.shape == (0,)
    out, _ = decompress(stream)
    assert out.shape == (0,)


def test_jit_cache_reuse():
    codec = WahCodec(kernel="xla")
    for seed in range(3):
        data = random_bitmap(992 * 2, 0.05, seed=seed)
        stream, _ = codec.compress(data)
        out, _ = codec.decompress(stream, out_ints=data.shape[0])
        np.testing.assert_array_equal(out, data)
    assert len(codec._encode_fns) == 1  # bucketed: one compile for all three


def test_validate_stream_rejects_bad():
    with pytest.raises(ValueError):
        validate_stream(np.array([0], dtype=U))
    with pytest.raises(ValueError):
        validate_stream(np.array([0x7FFFFFFF], dtype=U))
    with pytest.raises(ValueError):
        validate_stream(np.array([0x80000000], dtype=U))  # zero-length fill
