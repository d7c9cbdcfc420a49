"""rechunk_stream: ingesting general WAH streams (full format envelope).

A test-local "foreign" encoder emits format-valid but non-canonical
streams — fill lengths up to 2^30-1 (no block limit, reference decoder
envelope: kernels.cu:300,334), randomly fragmented runs, and degenerate
0x0/0x7FFFFFFF literals. rechunk_stream must map every such stream to
EXACTLY the canonical stream golden.encode produces for the same
bitmap (merge-then-split yields maximal in-block runs)."""
from __future__ import annotations

import numpy as np
import pytest

from wah_tpu import decompress, golden, validate_stream
from wah_tpu.constants import BIT30, BIT31, BIT3130, BLOCK_CHUNKS, ONES31
from wah_tpu.interop import rechunk_stream

U = np.uint32


def foreign_encode(
    bitmap: np.ndarray, rng: np.random.Generator | None = None
) -> np.ndarray:
    """General WAH encoder: maximal runs with NO block-boundary limit.
    With an rng, adversarially de-canonicalizes: splits fills into
    random fragments and emits some lone all-zero/all-one chunks as the
    degenerate literals 0x0 / 0x7FFFFFFF."""
    chunks = golden.repartition_chunks(bitmap)
    out: list[int] = []
    i = 0
    while i < len(chunks):
        c = int(chunks[i])
        if c != 0 and c != ONES31:
            out.append(c)
            i += 1
            continue
        j = i
        while j < len(chunks) and int(chunks[j]) == c:
            j += 1
        n = j - i
        head = BIT3130 if c == ONES31 else BIT31
        if rng is not None and n == 1 and rng.random() < 0.5:
            out.append(c)  # degenerate literal
        elif rng is not None and n > 1:
            left = n
            while left:  # random fragmentation (still format-valid)
                take = int(rng.integers(1, left + 1))
                out.append(head | take)
                left -= take
        else:
            out.append(head | n)
        i = j
    return np.array(out, dtype=U)


def _bernoulli(n_ints: int, p: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    bits = rng.random((n_ints, 32)) < p
    return (
        np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
        .view(U)
        .reshape(-1)
    )


@pytest.mark.parametrize("p", [0.0, 1e-4, 0.01, 0.5, 1.0])
@pytest.mark.parametrize("fragment", [False, True])
def test_rechunk_matches_canonical(p, fragment):
    n = 5 * 992 + 317  # crosses block seams, non-block-multiple tail
    bitmap = _bernoulli(n, p, seed=7)
    rng = np.random.default_rng(11) if fragment else None
    foreign = foreign_encode(bitmap, rng)
    got = rechunk_stream(foreign)
    want = golden.encode(bitmap)
    np.testing.assert_array_equal(got, want)
    validate_stream(got)


def test_long_fill_split_exact():
    # one 5000-chunk zero fill starting at chunk 0: 4x1024 + 904
    foreign = np.array([BIT31 | 5000, 0x1234], dtype=U)
    got = rechunk_stream(foreign)
    want = np.array(
        [BIT31 | 1024] * 4 + [BIT31 | 904, 0x1234], dtype=U
    )
    np.testing.assert_array_equal(got, want)


def test_unaligned_long_fill_split():
    # a literal shifts the fill start to chunk 1: pieces 1023+1024+1024+529
    foreign = np.array([0x5555, BIT3130 | 3600], dtype=U)
    got = rechunk_stream(foreign)
    want = np.array(
        [0x5555, BIT3130 | 1023, BIT3130 | 1024, BIT3130 | 1024,
         BIT3130 | 529],
        dtype=U,
    )
    np.testing.assert_array_equal(got, want)


def test_degenerate_literals_merge_with_fills():
    # 0x0 literal between two zero fills must merge into one run
    foreign = np.array([BIT31 | 3, 0, BIT31 | 2, ONES31, ONES31], dtype=U)
    got = rechunk_stream(foreign)
    want = np.array([BIT31 | 6, BIT3130 | 2], dtype=U)
    np.testing.assert_array_equal(got, want)


def test_zero_length_fill_rejected():
    with pytest.raises(ValueError, match="zero-length fill"):
        rechunk_stream(np.array([0x42, BIT31], dtype=U))


def test_empty_stream():
    out = rechunk_stream(np.array([], dtype=U))
    assert out.size == 0 and out.dtype == U


def test_decompress_accepts_rechunked_foreign():
    n = 3 * 992
    bitmap = _bernoulli(n, 0.003, seed=3)
    foreign = foreign_encode(bitmap, np.random.default_rng(5))
    with pytest.raises(ValueError):
        decompress(foreign, out_ints=n)  # foreign stream rejected as-is
    out, _ = decompress(rechunk_stream(foreign), out_ints=n)
    np.testing.assert_array_equal(out, bitmap)
