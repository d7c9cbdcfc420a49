"""Differential tests for the branchless v2 stitch (stitch2.py) against
the XLA stitch oracle, with poison=True so first-touch clobber bugs are
visible despite the interpreter's zero-initialized scratch."""
import jax
import numpy as np
import pytest

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import golden
from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
from wah_tpu.golden import chunk_count
from wah_tpu.ops import bits
from wah_tpu.ops.encode import encode_blocks
from wah_tpu.ops.pallas.stitch2 import stitch_tiles_v2


def _run(data: np.ndarray, B=8, fused_rmw=True):
    n = len(data)
    nv = chunk_count(n)
    nb = -(-nv // BLOCK_CHUNKS)
    nbp = -(-nb // B) * B
    padded = np.zeros(nbp * BLOCK_INTS, np.uint32)
    padded[:n] = data
    chunks = bits.repartition_chunks(padded).reshape(nbp, BLOCK_CHUNKS)
    staging, counts = encode_blocks(chunks, np.int32(nv))
    offsets_ext = np.concatenate(
        [[0], np.cumsum(np.asarray(counts))]
    ).astype(np.int32)
    total = int(offsets_ext[-1])
    # poison=True keeps first-touch clobber bugs visible in the v3 body
    # (the v4 body pre-zeroes and ignores poison)
    words = jax.jit(
        stitch_tiles_v2,
        static_argnames=("tile_blocks", "poison", "fused_rmw"),
    )(staging, offsets_ext, tile_blocks=B, poison=True,
      fused_rmw=fused_rmw)
    return np.asarray(words)[:total]


CASES = [
    ("sparse", lambda: random_bitmap(16 * BLOCK_INTS, 1 / 512, seed=2)),
    ("mid", lambda: random_bitmap(16 * BLOCK_INTS, 1 / 16, seed=3)),
    ("dense", lambda: random_bitmap(16 * BLOCK_INTS, 0.5, seed=4)),
    ("clustered", lambda: clustered_bitmap(16 * BLOCK_INTS, seed=5)),
    ("all_zeros", lambda: np.zeros(16 * BLOCK_INTS, np.uint32)),
    ("all_ones", lambda: np.full(16 * BLOCK_INTS, 0xFFFFFFFF, np.uint32)),
    ("odd", lambda: random_bitmap(9 * BLOCK_INTS + 345, 0.1, seed=6)),
    ("tiny", lambda: np.array([0x1, 0, 0, 0xFFFFFFFF], dtype=np.uint32)),
    # tile-aligned seams: all-zero blocks produce exactly 1 word/block,
    # dense blocks ~1024 words/block -> exercises fresh/cross paths
    ("mixed_blocks", lambda: np.where(
        (np.arange(16 * BLOCK_INTS) // BLOCK_INTS) % 2 == 0,
        np.uint32(0),
        random_bitmap(16 * BLOCK_INTS, 0.4, seed=7),
    )),
]


@pytest.mark.parametrize("fused_rmw", [True, False],
                         ids=["v4-fused", "v3-poisoned"])
@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_stitch2_matches_golden(name, gen, fused_rmw):
    data = gen()
    np.testing.assert_array_equal(
        _run(data, fused_rmw=fused_rmw), golden.encode(data)
    )
