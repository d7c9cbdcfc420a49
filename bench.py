"""Headline benchmark: single-chip WAH encode throughput.

Protocol mirrors the reference benchmark main (source.cpp:29-148): a
Bernoulli random bitmap (seed 1337, density 2^-4), device-resident encode
timed separately from transfers, roundtrip-asserted. Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "GB/s", "vs_baseline": ...}
vs_baseline is measured against the 10 GB/s/chip north-star (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from wah_tpu import WahCodec, golden
    from wah_tpu.constants import BLOCK_INTS

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

    codec = WahCodec()
    # warmup: compile + first run
    stream, _ = codec.compress(data)
    # correctness gate (reference asserts roundtrip each iteration,
    # source.cpp:103)
    out, _ = codec.decompress(stream, out_ints=n)
    assert np.array_equal(out, data), "roundtrip mismatch"

    reps = 5
    kernel_s = []
    for _ in range(reps):
        _, t = codec.compress(data)
        kernel_s.append(t.kernel_ms / 1e3)
    best = min(kernel_s)
    gbps = data.nbytes / best / 1e9
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
