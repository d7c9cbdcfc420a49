"""Native C++ host codec tests: differential vs the NumPy golden model.

The native codec (csrc/wah_core.cpp via wah_tpu.native) is the host-side
runtime counterpart of the device kernels; it must agree with the golden
model on every stream (same oracle the device kernels are pinned to).
"""
import numpy as np
import pytest

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import golden, native
from wah_tpu.constants import BLOCK_INTS

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

CASES = [
    ("random_sparse", lambda: random_bitmap(4 * BLOCK_INTS, 1 / 64)),
    ("random_mid", lambda: random_bitmap(9 * BLOCK_INTS, 1 / 16, seed=3)),
    ("random_dense", lambda: random_bitmap(2 * BLOCK_INTS, 0.5, seed=4)),
    ("clustered", lambda: clustered_bitmap(8 * BLOCK_INTS, seed=5)),
    ("all_zeros", lambda: np.zeros(8 * BLOCK_INTS, dtype=np.uint32)),
    ("all_ones", lambda: np.full(4 * BLOCK_INTS, 0xFFFFFFFF, np.uint32)),
    ("odd_size", lambda: random_bitmap(3 * BLOCK_INTS + 345, 0.1, seed=6)),
    ("tiny", lambda: np.array([0x1, 0, 0, 0xFFFFFFFF], dtype=np.uint32)),
    ("empty", lambda: np.zeros(0, dtype=np.uint32)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_native_encode_matches_golden(name, gen):
    data = gen()
    np.testing.assert_array_equal(native.encode(data), golden.encode(data))


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_native_decode_roundtrip(name, gen):
    data = gen()
    stream = golden.encode(data)
    out = native.decode(stream, out_ints=len(data))
    np.testing.assert_array_equal(out, data)
    full = native.decode(stream)
    np.testing.assert_array_equal(full, golden.decode(stream))


def test_native_chunk_count():
    for n in (0, 1, 30, 31, 32, 992, 993, 12345):
        assert native.chunk_count(n) == golden.chunk_count(n)


def test_native_validate():
    native.validate(golden.encode(random_bitmap(BLOCK_INTS, 0.1)))
    with pytest.raises(ValueError):
        native.validate(np.array([0x0], dtype=np.uint32))
    with pytest.raises(ValueError):
        native.validate(np.array([0x7FFFFFFF], dtype=np.uint32))
    with pytest.raises(ValueError):
        native.validate(np.array([0x80000000], dtype=np.uint32))  # len 0
    with pytest.raises(ValueError):
        native.validate(np.array([0x80000800], dtype=np.uint32))  # len 2048


def test_native_rejects_zero_fill_decode():
    with pytest.raises(ValueError):
        native.decode(np.array([0x80000000], dtype=np.uint32))
