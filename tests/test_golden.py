"""Golden-model tests against the reference's pinned test vectors.

Each vector is re-derived from the reference test suite (tests.cpp) and
pins the exact compressed words, so the golden model doubles as a
bit-exactness oracle for the JAX/Pallas paths without running the CUDA
binary.
"""
import numpy as np
import pytest

import ref_sim
from conftest import clustered_bitmap, random_bitmap
from wah_tpu import golden
from wah_tpu.constants import BIT31, BIT3130, ONES, ONES31

U = np.uint32


def warp_pattern() -> np.ndarray:
    """Crafted warp pattern (reference: tests.cpp:23-31)."""
    d = np.zeros(31, dtype=U)
    d[0] = 8
    d[3] = U(4) << 28
    d[5] = U(63) << 26
    d[6] = ONES
    d[7] = U(ONES) >> 8
    return d


def wandering_pattern(blocks: int = 1) -> np.ndarray:
    """Single set bit sliding through each warp (reference: tests.cpp:33-39)."""
    d = np.zeros(992 * blocks, dtype=U)
    for b in range(blocks):
        base = 992 * b
        d[base] = 1
        d[base + 31] = U(1) << 31
        for i in range(30):
            d[base + 31 + (i + 1) * 32] = U(1) << (30 - i)
    return d


def test_repartition_formula():
    """Pins the 32->31-bit repartition (reference: tests.cpp:94-97)."""
    data = np.arange(1, 32, dtype=U)
    chunks = golden.repartition_chunks(data)
    expected = np.empty(32, dtype=U)
    expected[0] = U(ONES31) & data[0]
    for i in range(1, 32):
        lo = (int(data[i - 1]) >> (32 - i)) if i < 32 else 0
        expected[i] = U(ONES31 & ((int(data[i]) << i) | lo)) if i < 31 else U(
            ONES31 & (int(data[30]) >> 1)
        )
    np.testing.assert_array_equal(chunks, expected)


def test_merge_is_inverse_of_repartition(rng):
    data = rng.integers(0, 2**32, size=992 * 3, dtype=U)
    chunks = golden.repartition_chunks(data)
    back = golden.merge_chunks(chunks)
    np.testing.assert_array_equal(back, data)


def test_warp_compression():
    """reference: tests.cpp:134-152 (warpCompressionTest)."""
    expected = np.array(
        [8, 3 | BIT31, 4, 1 | BIT31, 2 | BIT3130, 24 | BIT31], dtype=U
    )
    np.testing.assert_array_equal(golden.encode(warp_pattern()), expected)


def test_block_compression():
    """32 warps compress independently when runs don't cross warps
    (reference: tests.cpp:154-164)."""
    data = np.tile(warp_pattern(), 32)
    res = golden.encode(data)
    pat = np.array([8, 3 | BIT31, 4, 1 | BIT31, 2 | BIT3130, 24 | BIT31], dtype=U)
    np.testing.assert_array_equal(res, np.tile(pat, 32))


def test_block_merge_all_zeros():
    """Full-block zero run -> single fill word (reference: tests.cpp:166-172)."""
    res = golden.encode(np.zeros(992, dtype=U))
    np.testing.assert_array_equal(res, np.array([BIT31 | 1024], dtype=U))


def test_block_merge_ones_starts():
    """Alternating one-fill/literal/zero-fill cross-warp merge
    (reference: tests.cpp:174-185)."""
    data = np.zeros(992, dtype=U)
    for i in range(0, 32, 2):
        data[31 * i] = ONES
    res = golden.encode(data)
    pat = np.array([BIT3130 | 1, 1, BIT31 | 62], dtype=U)
    np.testing.assert_array_equal(res, np.tile(pat, 16))


def test_block_merge_alternating():
    """64-chunk zero / 64-chunk one alternation (reference: tests.cpp:187-199)."""
    data = np.zeros(992, dtype=U)
    for i in range(2, 32, 4):
        data[31 * i : 31 * i + 62] = ONES
    res = golden.encode(data)
    pat = np.array([BIT31 | 64, BIT3130 | 64], dtype=U)
    np.testing.assert_array_equal(res, np.tile(pat, 8))


def test_block_merge_final_literals():
    """Warps ending in literals block merging (reference: tests.cpp:201-211)."""
    data = np.zeros(992, dtype=U)
    for i in range(32):
        data[31 * (i + 1) - 1] = 88
    res = golden.encode(data)
    pat = np.array([BIT31 | 31, 44], dtype=U)
    np.testing.assert_array_equal(res, np.tile(pat, 32))


def test_wandering_literals_matches_kernel_simulation():
    """The committed expected vector at tests.cpp:66-77 (93 words) is STALE:
    a faithful lockstep simulation of compressData (ref_sim.py) yields the
    complete-RLE 63-word stream. We pin the kernel's actual behavior."""
    data = wandering_pattern()
    sim = ref_sim.encode(data)
    res = golden.encode(data)
    np.testing.assert_array_equal(res, sim)
    # complete RLE: lit, (zfill32, lit) x 31 = 63 words
    assert res.shape[0] == 63
    expected = np.empty(63, dtype=U)
    expected[0] = 1
    expected[1::2] = BIT31 | 32
    expected[2::2] = 1
    np.testing.assert_array_equal(res, expected)


def test_multi_block_no_cross_block_merge():
    """Blocks compress independently (reference: tests.cpp:227-239)."""
    one = golden.encode(wandering_pattern(1))
    two = golden.encode(wandering_pattern(2))
    np.testing.assert_array_equal(two, np.tile(one, 2))
    # and an all-zero 2-block bitmap gives two separate fills, not one
    res = golden.encode(np.zeros(992 * 2, dtype=U))
    np.testing.assert_array_equal(res, np.array([BIT31 | 1024] * 2, dtype=U))


def test_golden_vs_kernel_simulation_random():
    """Differential: golden == faithful kernel simulation on random data."""
    for density in (0.001, 0.0625, 0.5):
        data = random_bitmap(992 * 4, density, seed=int(density * 1e6) + 7)
        np.testing.assert_array_equal(golden.encode(data), ref_sim.encode(data))


def test_golden_vs_kernel_simulation_clustered():
    data = clustered_bitmap(992 * 4)
    np.testing.assert_array_equal(golden.encode(data), ref_sim.encode(data))


@pytest.mark.parametrize("density", [0.0, 0.0001, 0.01, 0.5, 1.0])
def test_roundtrip_density(density):
    n = 992 * 3 + 31  # non-block-multiple (defined padding semantics)
    if density in (0.0, 1.0):
        data = np.full(n, 0 if density == 0.0 else ONES, dtype=U)
    else:
        data = random_bitmap(n, density)
    words = golden.encode(data)
    out = golden.decode(words)
    np.testing.assert_array_equal(out[:n], data)
    # fills never produce literal-looking words
    assert not np.any(words == 0)
    assert not np.any(words == ONES31)


def test_roundtrip_clustered():
    data = clustered_bitmap(992 * 5)
    out = golden.decode(golden.encode(data))
    np.testing.assert_array_equal(out[: data.shape[0]], data)


def test_decode_output_size_formula():
    """realSize = ceil(31 * chunks / 32) (reference: decompress.cu:82-92)."""
    data = np.zeros(992, dtype=U)
    words = golden.encode(data)
    assert golden.decode(words).shape[0] == 992
    # partial warp: 31 ints -> 32 chunks -> 31 ints back
    words = golden.encode(warp_pattern())
    assert golden.decode(words).shape[0] == 31
