"""Batched-columns (bitmap-index) benchmark — BASELINE configs[3]:
many column bitmaps encoded in one batched call on one chip.

The reference has no batched mode: its model is one compress() call per
column (compress.h:12). Here the column axis is a sequential lax.map
over the fused Pallas kernels (api.compress_batch's TPU route); this
harness measures aggregate GB/s and compares against the single-stream
rate so the batch path is proven not to regress.

Data is generated ON DEVICE (jax PRNG): 256 columns x 64 Mbit is 2 GB,
which would take ~7 min to ship through the host tunnel; correctness of
the batch route vs golden is pinned separately (tests/tpu_differential).

    python -m benchmarks.batch_bench [--cols 256] [--mbit 64] [-K 3]
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=256)
    ap.add_argument("--mbit", type=int, default=64,
                    help="logical Mbit per column (rounded to blocks)")
    ap.add_argument("--log2density", type=int, default=4,
                    help="P(bit)=2^-k via AND of k random words (exact)")
    ap.add_argument("-K", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from wah_tpu.constants import BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel

    C = args.cols
    # pow2 blocks per column (the api's bucketing policy; the flattened
    # batch kernel's per-column validity mask requires it)
    nb = max(1, (args.mbit * 1_000_000) // (BLOCK_INTS * 32))
    nb = max(encode_kernel.TILE_BLOCKS, 1 << (nb - 1).bit_length())
    n = nb * BLOCK_INTS
    nv = np.int32(chunk_count(n))
    nbytes = C * n * 4

    k = args.log2density

    @jax.jit
    def gen(key):
        # device-resident columns, no host transfer: AND of k random
        # words gives P(bit set) = 2^-k exactly
        def body(i, acc):
            return acc & jax.random.bits(
                jax.random.fold_in(key, i), (C, n), jnp.uint32
            )

        acc0 = jax.random.bits(key, (C, n), jnp.uint32)
        return jax.lax.fori_loop(1, k, body, acc0)

    cols = gen(jax.random.PRNGKey(1337))
    cols.block_until_ready()

    @partial(jax.jit, static_argnums=(2,))
    def batch_loop(cols, nvv, K):
        def body(i, acc):
            words, totals = encode_kernel.encode_padded_batch(
                cols, nvv - (acc & 1)
            )
            return acc + jnp.sum(totals, dtype=jnp.int32) + words[
                1
            ].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    def best(K, reps=3):
        int(batch_loop(cols, nv, K))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(batch_loop(cols, nv, K))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    K = args.K
    secs = (best(K) - best(1)) / (K - 1)
    gbps = nbytes / secs / 1e9
    print(
        json.dumps(
            {
                "metric": "batch_encode_throughput_1chip",
                "cols": C,
                "mbit_per_col": round(n * 32 / 1e6, 1),
                "density": 2.0 ** -args.log2density,
                "value": round(gbps, 3),
                "unit": "GB/s",
                "per_call_ms": round(secs * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
