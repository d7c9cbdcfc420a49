"""Headline benchmark: single-chip WAH encode throughput.

Protocol mirrors the reference benchmark main (source.cpp:29-148): a
Bernoulli random bitmap (seed 1337, density 2^-4), device-resident
encode timed separately from transfers, roundtrip-asserted. Prints ONE
JSON line:
  {"metric": ..., "value": ..., "unit": "GB/s", "vs_baseline": ...}
vs_baseline is measured against the 10 GB/s/chip north-star
(BASELINE.md).

Kernel timing method: the reference times kernels with cudaEvents,
excluding PCIe transfers (compress.cu:125-172). The equivalent here —
robust to host<->device link overhead dominating a single dispatch — is
the amortized in-device loop of utils.profiling.amortized_seconds:
iterations serialized through a carried checksum, the loop bound a
traced argument, the published slope measured between two LARGE
iteration counts and cross-checked against the low-count slope (round-3
methodology; the old two-point (t_K - t_1)/(K - 1) form was noise-prone
through the ~100 ms tunnel dispatch).
"""
from __future__ import annotations

import json
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wah_tpu import WahCodec, golden
    from wah_tpu.api import _next_pow2
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops import encode as _xla_encode

    nb = 32768  # ~130 MB bitmap: 32768 blocks * 992 uint32
    n = nb * BLOCK_INTS
    rng = np.random.default_rng(1337)
    # P(bit set) = 2^-4 (reference sweep midpoint, source.cpp:57)
    bits = rng.integers(0, 16, size=(n, 32), dtype=np.uint8) == 0
    data = (
        np.packbits(bits, axis=1, bitorder="little")
        .view(np.uint32)
        .reshape(-1)
    )

    # correctness gate (reference asserts roundtrip each iteration,
    # source.cpp:103) through the public API with the auto kernel
    codec = WahCodec()
    stream, _ = codec.compress(data)
    out, _ = codec.decompress(stream, out_ints=n)
    assert np.array_equal(out, data), "roundtrip mismatch"
    ref_head = golden.encode(data[: 4 * BLOCK_INTS])
    assert np.array_equal(stream[: len(ref_head)], ref_head[:]), (
        "stream mismatch vs golden model"
    )

    # amortized device-kernel timing of the full encode pipeline
    if jax.default_backend() == "cpu":
        encode_padded = _xla_encode.encode_padded
    else:
        from wah_tpu.ops.pallas import encode_kernel

        # same static stitch selection the API applies from its
        # host-side density sample (api.WahCodec._stitch_hint)
        encode_padded = partial(
            encode_kernel.encode_padded,
            stitch=WahCodec._stitch_hint(data),
            adaptive=WahCodec._adaptive_hint(data),
        )

    nv = np.int32(chunk_count(n))
    dev = jax.device_put(data)

    from wah_tpu.utils.profiling import amortized_seconds

    def enc_step(p, ints, nvv):
        # the {0,1} perturbation feeds the valid-chunk count, defeating
        # loop-invariant hoisting without copying the input
        words, total = encode_padded(ints, nvv - p)
        return total + words[1].astype(jnp.int32)

    kernel_s = amortized_seconds(enc_step, dev, nv, iters=5)
    gbps = data.nbytes / kernel_s / 1e9
    print(
        json.dumps(
            {
                "metric": "encode_throughput_1chip",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
