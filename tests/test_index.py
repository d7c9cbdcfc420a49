"""Bitmap-index layer: build + query differential against numpy."""
import numpy as np
import pytest

from wah_tpu import WahCodec
from wah_tpu.index import BitmapIndex


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    n = 100_000
    values = rng.integers(0, 8, size=n)
    # skew: long constant stretches exercise fills
    values[20_000:45_000] = 3
    values[60_000:61_000] = 7
    idx = BitmapIndex.build(values, cardinality=8, codec=WahCodec("xla"))
    return values, idx


def test_query_eq(data):
    values, idx = data
    for v in (0, 3, 7):
        np.testing.assert_array_equal(
            idx.rows(idx.query_eq(v)), np.flatnonzero(values == v)
        )


def test_query_in_and_range(data):
    values, idx = data
    np.testing.assert_array_equal(
        idx.rows(idx.query_in([1, 4, 6])),
        np.flatnonzero(np.isin(values, [1, 4, 6])),
    )
    np.testing.assert_array_equal(
        idx.rows(idx.query_range(2, 5)),
        np.flatnonzero((values >= 2) & (values <= 5)),
    )


def test_query_not_and_count(data):
    values, idx = data
    assert idx.count(idx.query_not(3)) == int((values != 3).sum())
    assert idx.count(idx.query_eq(3)) == int((values == 3).sum())


def test_columns_partition_rows(data):
    values, idx = data
    total = sum(idx.count(idx.query_eq(v)) for v in range(idx.cardinality))
    assert total == len(values)


def test_compression_wins_on_skew(data):
    _, idx = data
    assert idx.compressed_bytes() < idx.uncompressed_bytes()


def test_non_multiple_of_32_rows():
    rng = np.random.default_rng(1)
    values = rng.integers(0, 3, size=1000 * 32 + 17)
    idx = BitmapIndex.build(values, codec=WahCodec("xla"))
    for v in range(3):
        np.testing.assert_array_equal(
            idx.rows(idx.query_eq(v)), np.flatnonzero(values == v)
        )
