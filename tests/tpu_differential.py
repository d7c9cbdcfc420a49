"""On-hardware differential fuzz: every execution path vs the golden
model, on the real TPU (the pytest suite runs the kernels in interpreter
mode on CPU; this drives the compiled Mosaic kernels).

Run manually / from CI with a TPU attached:
    python tests/tpu_differential.py [n_cases]
"""
from __future__ import annotations

import sys

import numpy as np


def main(n_cases: int = 12) -> None:
    import jax

    from wah_tpu import WahCodec, golden, native
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel, encode_kernel

    assert jax.default_backend() != "cpu", "needs a TPU backend"
    rng = np.random.default_rng(20260817)
    codec = WahCodec()  # auto -> pallas

    fails = 0
    for case in range(n_cases):
        kind = case % 4
        n = int(rng.integers(1, 40)) * BLOCK_INTS + int(rng.integers(0, 992))
        if kind == 0:
            data = (rng.random(n) < rng.choice([0.5, 0.05, 0.001])).astype(
                np.uint32
            )
        elif kind == 1:
            data = np.zeros(n, np.uint32)
            data[rng.integers(0, n, size=max(1, n // 100))] = 0xFFFFFFFF
        elif kind == 2:
            data = np.full(n, 0xFFFFFFFF, np.uint32)
            data[rng.integers(0, n, size=max(1, n // 100))] = 0
        else:
            # long alternating runs crossing block seams
            bits = np.zeros(n * 32, np.uint8)
            pos, val = 0, 1
            while pos < n * 32:
                ln = int(rng.integers(31, 200000))
                bits[pos : pos + ln] = val
                val ^= 1
                pos += ln
            data = np.packbits(bits, bitorder="little").view(np.uint32)[:n]

        ref = golden.encode(data)

        # path 1: public API (pallas kernels under the hood)
        stream, _ = codec.compress(data)
        ok1 = np.array_equal(stream, ref)
        out, _ = codec.decompress(stream, out_ints=n)
        ok2 = np.array_equal(out, data)

        # path 2: fused single-kernel encode
        nv = chunk_count(n)
        nb = -(-nv // BLOCK_CHUNKS)
        padded = np.zeros(nb * BLOCK_INTS, np.uint32)
        padded[:n] = data
        w3, t3 = jax.jit(encode_kernel.encode_padded_fused)(
            padded, np.int32(nv)
        )
        ok3 = np.array_equal(np.asarray(w3)[: int(t3)], ref)

        # path 3: native C++ host codec
        ok4 = (not native.available()) or np.array_equal(
            native.encode(data), ref
        )

        status = all([ok1, ok2, ok3, ok4])
        fails += not status
        print(
            f"case {case:2d} kind={kind} n={n:8d} words={len(ref):7d} "
            f"api_enc={ok1} api_dec={ok2} fused={ok3} native={ok4}",
            flush=True,
        )

    if fails:
        sys.exit(f"{fails}/{n_cases} differential cases FAILED")
    print(f"all {n_cases} differential cases bit-exact across paths")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
