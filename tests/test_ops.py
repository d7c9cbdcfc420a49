"""Differential tests: pure-JAX encode/decode vs the NumPy golden model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import clustered_bitmap, random_bitmap
from wah_tpu import golden
from wah_tpu.constants import ONES
from wah_tpu.ops import bits, decode as jdec, encode as jenc
from wah_tpu.ops.compact import compact, expand, ceil_log2

U = np.uint32


# ---------- primitives ----------

def test_repartition_matches_golden(rng):
    data = rng.integers(0, 2**32, size=992 * 2, dtype=U)
    out = np.asarray(bits.repartition_chunks(jnp.asarray(data)))
    np.testing.assert_array_equal(out, golden.repartition_chunks(data))


def test_merge_matches_golden(rng):
    chunks = rng.integers(0, 2**31, size=1024 * 2, dtype=U)
    out = np.asarray(bits.merge_chunks(jnp.asarray(chunks)))
    np.testing.assert_array_equal(out, golden.merge_chunks(chunks))


def test_compact_random(rng):
    n = 512
    for trial in range(5):
        ok = rng.random(n) < 0.4
        vals = rng.integers(0, 2**31, size=n, dtype=U)
        targets = np.cumsum(ok) - 1
        d = np.arange(n) - targets
        (out,), okf = compact(
            [jnp.asarray(vals)],
            jnp.asarray(ok),
            jnp.asarray(d.astype(np.int32)),
            ceil_log2(n),
        )
        k = int(ok.sum())
        np.testing.assert_array_equal(np.asarray(out)[:k], vals[ok])
        np.testing.assert_array_equal(np.asarray(okf)[:k], True)
        assert not np.asarray(okf)[k:].any()


def test_expand_random(rng):
    n, m = 512, 100
    for trial in range(5):
        lens = rng.integers(1, 6, size=m)
        offs = np.cumsum(lens) - lens
        assert offs[-1] + lens[-1] <= n
        vals = rng.integers(0, 2**31, size=m, dtype=U)
        d = (offs - np.arange(m)).astype(np.int32)
        pad = lambda x, f: np.concatenate([x, np.full(n - m, f, x.dtype)])
        (out,), okf = expand(
            [jnp.asarray(pad(vals, U(0)))],
            jnp.asarray(pad(np.ones(m, bool), False)),
            jnp.asarray(pad(d, np.int32(0))),
            ceil_log2(n),
        )
        out, okf = np.asarray(out), np.asarray(okf)
        np.testing.assert_array_equal(out[offs], vals)
        expected_ok = np.zeros(n, bool)
        expected_ok[offs] = True
        np.testing.assert_array_equal(okf, expected_ok)


# ---------- encode ----------

ENCODE_CASES = [
    ("zeros", lambda: np.zeros(992 * 2, dtype=U)),
    ("ones", lambda: np.full(992 * 2, ONES, dtype=U)),
    ("sparse", lambda: random_bitmap(992 * 4, 0.01)),
    ("half", lambda: random_bitmap(992 * 4, 0.5)),
    ("dense0", lambda: random_bitmap(992 * 4, 0.999, seed=3)),
    ("clustered", lambda: clustered_bitmap(992 * 4)),
    ("partial_warp", lambda: random_bitmap(31, 0.3, seed=5)),
    ("partial_block", lambda: random_bitmap(992 + 31 * 7, 0.05, seed=9)),
    ("unaligned", lambda: random_bitmap(1000, 0.1, seed=11)),
]


@pytest.mark.parametrize("name,gen", ENCODE_CASES, ids=[c[0] for c in ENCODE_CASES])
def test_encode_matches_golden(name, gen):
    data = gen()
    words, total = jax.jit(jenc.encode)(jnp.asarray(data))
    total = int(total)
    expected = golden.encode(data)
    assert total == expected.shape[0]
    np.testing.assert_array_equal(np.asarray(words)[:total], expected)
    # capacity tail is zeroed
    assert not np.asarray(words)[total:].any()


def test_encode_batched_vmap():
    """Bitmap-index batch: vmapped encode over column bitmaps."""
    cols = np.stack([random_bitmap(992, 0.02, seed=s) for s in range(4)])
    words, totals = jax.jit(jax.vmap(jenc.encode))(jnp.asarray(cols))
    for c in range(4):
        exp = golden.encode(cols[c])
        assert int(totals[c]) == exp.shape[0]
        np.testing.assert_array_equal(np.asarray(words)[c, : exp.shape[0]], exp)


# ---------- decode ----------

@pytest.mark.parametrize("name,gen", ENCODE_CASES, ids=[c[0] for c in ENCODE_CASES])
def test_decode_matches_golden(name, gen):
    data = gen()
    stream = golden.encode(data)
    cap_chunks = golden.chunk_count(data.shape[0])
    cap_chunks = -(-cap_chunks // 1024) * 1024
    M = max(stream.shape[0], 8)
    padded = np.zeros(M, dtype=U)
    padded[: stream.shape[0]] = stream
    ints, n_ints = jax.jit(jdec.decode, static_argnums=2)(
        jnp.asarray(padded), stream.shape[0], cap_chunks
    )
    expected = golden.decode(stream)
    assert int(n_ints) == expected.shape[0]
    np.testing.assert_array_equal(np.asarray(ints)[: int(n_ints)], expected)


def test_roundtrip_jax_only():
    data = random_bitmap(992 * 8, 0.03, seed=21)
    words, total = jax.jit(jenc.encode)(jnp.asarray(data))
    cap = -(-golden.chunk_count(data.shape[0]) // 1024) * 1024
    ints, n_ints = jax.jit(jdec.decode, static_argnums=2)(words, total, cap)
    assert int(n_ints) == data.shape[0]
    np.testing.assert_array_equal(np.asarray(ints)[: data.shape[0]], data)


def test_decode_n_ints_past_int32_bit_count():
    """31*n_chunks overflows int32 once n_chunks > 69,273,666 (a 268 MB
    bitmap): the s=128 sweep config (496 MB, density 0.5) decoded a
    NEGATIVE n_ints and the host sliced the output short. n_ints must
    use the overflow-free form n - n//32."""
    from wah_tpu.constants import BIT31

    nb = 67_652  # n_chunks = nb*1024 = 69,275,648, past the threshold
    words = np.full(nb, np.uint32(BIT31 | 1024))
    cap = nb * 1024
    ints, n_ints = jax.jit(jdec.decode, static_argnums=2)(
        jnp.asarray(words), np.int32(nb), cap
    )
    nc = nb * 1024
    assert int(n_ints) == nc - nc // 32 == (31 * nc + 31) // 32
    assert int(jnp.count_nonzero(ints)) == 0
