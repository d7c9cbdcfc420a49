"""Batched-columns (bitmap-index) benchmark — BASELINE configs[3]:
many column bitmaps encoded in one batched call on one chip.

The reference has no batched mode: its model is one compress() call per
column (compress.h:12). Here the column axis flattens into the block
axis of ONE fused kernel pipeline (encode_rows_batch). This harness
measures aggregate encode AND decode GB/s, and can also time the legacy
(C, width)-input path whose device reshape to block rows is a full
layout-changing HBM copy (--legacy2d; that copy was the round-2 batch
gap: 15.9 vs 24 GB/s single-stream).

Data is generated ON DEVICE in the rows layout (jax PRNG): 256 columns
x 64 Mbit is 2 GB, which would take minutes to ship through the host
tunnel; correctness of the batch route vs golden is pinned separately
(tests/tpu_differential).

    python -m benchmarks.batch_bench [--cols 256] [--mbit 64] [--legacy2d]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=256)
    ap.add_argument("--mbit", type=int, default=64,
                    help="logical Mbit per column (rounded to blocks)")
    ap.add_argument("--log2density", type=int, default=4,
                    help="P(bit)=2^-k via AND of k random words (exact)")
    ap.add_argument("--legacy2d", action="store_true",
                    help="also time the (C, width)-input path (pays the "
                         "device rows-reshape)")
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args()
    # static adaptive-variant choice, as WahCodec's host hints would
    # make it: the generated data is fill-free iff density is 2^-1
    # (P(zero 32-bit word) = 2^-32; see api._adaptive_hint)
    adaptive = args.log2density <= 1

    import jax
    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel, encode_kernel
    from wah_tpu.utils.profiling import amortized_seconds

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
        # device-resident columns born in the rows layout; AND of k
        # random words gives P(bit set) = 2^-k exactly
        def body(i, acc):
            return acc & jax.random.bits(
                jax.random.fold_in(key, i), (C * nb, BLOCK_INTS),
                jnp.uint32,
            )

        acc0 = jax.random.bits(key, (C * nb, BLOCK_INTS), jnp.uint32)
        return jax.lax.fori_loop(1, k, body, acc0)

    rows = gen(jax.random.PRNGKey(1337))
    rows.block_until_ready()
    out = {
        "metric": "batch_codec_throughput_1chip",
        "cols": C,
        "mbit_per_col": round(n * 32 / 1e6, 1),
        "density": 2.0 ** -args.log2density,
        "unit": "GB/s",
    }

    def enc_step(p, r, nvv):
        words, totals = encode_kernel.encode_rows_batch(
            r, C, nvv - p, adaptive=adaptive
        )
        return jnp.sum(totals, dtype=jnp.int32) + words[1].astype(
            jnp.int32
        )

    secs = amortized_seconds(enc_step, rows, nv)
    out["encode_gbps"] = round(nbytes / secs / 1e9, 3)
    out["encode_ms"] = round(secs * 1e3, 3)
    print(f"encode: {out['encode_gbps']} GB/s", flush=True)

    if args.legacy2d:
        cols2d = rows.reshape(C, nb * BLOCK_INTS)
        cols2d.block_until_ready()

        def enc2d_step(p, c2, nvv):
            words, totals = encode_kernel.encode_padded_batch(
                c2, nvv - p
            )
            return jnp.sum(totals, dtype=jnp.int32) + words[1].astype(
                jnp.int32
            )

        s2 = amortized_seconds(enc2d_step, cols2d, nv)
        out["encode_legacy2d_gbps"] = round(nbytes / s2 / 1e9, 3)
        print(f"encode legacy2d: {out['encode_legacy2d_gbps']} GB/s",
              flush=True)
        del cols2d

    if not args.no_decode:
        # build the compressed batch once; the stitch's unspecified
        # tails are legal decode_rows_batch input (masked in-kernel-view)
        enc = jax.jit(
            lambda r, nvv: encode_kernel.encode_rows_batch(
                r, C, nvv, adaptive=adaptive
            )
        )
        words_flat, totals = enc(rows, nv)
        jax.block_until_ready((words_flat, totals))
        del rows
        cap = nb * BLOCK_CHUNKS

        def dec_step(p, wf, t):
            flat = decode_kernel.decode_rows_batch(
                wf, C, t - p, col_chunk_capacity=cap, adaptive=adaptive
            )
            return flat[1].astype(jnp.int32) + flat[-1].astype(jnp.int32)

        sd = amortized_seconds(dec_step, words_flat, totals)
        out["decode_gbps"] = round(nbytes / sd / 1e9, 3)
        out["decode_ms"] = round(sd * 1e3, 3)
        print(f"decode: {out['decode_gbps']} GB/s", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
