"""BASELINE configs[3] at spec scale: 256 column bitmaps of >= 1e9 bits
each, batched encode on ONE chip — 34 GB of logical columns streamed
through a 16 GB part as 33 column-segments of 1024 blocks each
(column-segmented batching: api.compress_batch_segments is the host
API; this harness keeps the data device-resident the way
batch_bench.py does, because 34 GB through the host tunnel is hours).

Per segment, all 256 columns encode in ONE flattened rows-native kernel
call. Segments are block-aligned, so concatenating a column's 33
per-segment streams IS its whole-column WAH stream (fills never cross
block boundaries, SURVEY.md §0.1) — correctness of that identity is
pinned by tests/test_api.py::test_segmented_batch_compress_decompress
and the on-hardware differential; this harness additionally
roundtrips segment 0 on device and golden-checks one column.

    timeout 3000 python -u -m benchmarks.config3_bench
Writes benchmarks/config3_v5e.json.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "config3_v5e.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=256)
    ap.add_argument("--seg-blocks", type=int, default=1024)
    ap.add_argument("--segments", type=int, default=33,
                    help="33 x 1024 blocks = 1.0727e9 bits per column")
    ap.add_argument("--log2density", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wah_tpu import golden
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel, encode_kernel
    from wah_tpu.utils.profiling import amortized_seconds

    C, nb, S = args.cols, args.seg_blocks, args.segments
    n_s = nb * BLOCK_INTS  # ints per column-segment
    nv = np.int32(chunk_count(n_s))
    bits_per_col = S * n_s * 32
    seg_bytes = C * n_s * 4
    k = args.log2density

    def gen(seg: int):
        key = jax.random.fold_in(jax.random.PRNGKey(1337), seg)

        def body(i, acc):
            return acc & jax.random.bits(
                jax.random.fold_in(key, i), (C * nb, BLOCK_INTS),
                jnp.uint32,
            )

        acc0 = jax.random.bits(key, (C * nb, BLOCK_INTS), jnp.uint32)
        return jax.lax.fori_loop(1, k, body, acc0)

    gen_j = jax.jit(gen, static_argnums=())
    enc = jax.jit(
        lambda r, nvv: encode_kernel.encode_rows_batch(r, C, nvv)
    )
    cap = nb * BLOCK_CHUNKS

    # kernel rate: amortized on segment 0 (segments are iid)
    rows0 = gen_j(0)
    jax.block_until_ready(rows0)

    def enc_step(p, r, nvv):
        words, totals = encode_kernel.encode_rows_batch(r, C, nvv - p)
        return jnp.sum(totals, dtype=jnp.int32) + words[1].astype(
            jnp.int32
        )

    enc_s = amortized_seconds(enc_step, rows0, nv)

    def dec_step(p, wf, t):
        flat = decode_kernel.decode_rows_batch(
            wf, C, t - p, col_chunk_capacity=cap
        )
        return flat[1].astype(jnp.int32) + flat[-1].astype(jnp.int32)

    words0, totals0 = enc(rows0, nv)
    dec_s = amortized_seconds(dec_step, words0, totals0)

    # segment-0 correctness: device roundtrip + host golden on column 0
    dec = jax.jit(
        lambda wf, t: decode_kernel.decode_rows_batch(
            wf, C, t, col_chunk_capacity=cap
        )
    )
    flat = dec(words0, totals0)
    rt_ok = bool(
        jnp.all(flat.reshape(C * nb, BLOCK_INTS) == rows0)
    )
    col0 = np.asarray(rows0[:nb]).reshape(-1)
    g0 = golden.encode(col0)
    t0 = int(np.asarray(totals0[0]))
    golden_ok = t0 == g0.shape[0] and np.array_equal(
        np.asarray(words0[: g0.shape[0]]), g0
    )
    del flat, words0, totals0

    # stream the full 34 GB once: every segment generated + encoded on
    # device, compressed totals accumulated (wall time includes the
    # ~100 ms/dispatch tunnel overhead; the kernel rate above does not)
    comp_ints = 0
    t_start = time.perf_counter()
    for seg in range(S):
        rows = gen_j(seg)
        words, totals = enc(rows, nv)
        # int32 is safe per segment (<= C*nb*1024 = 2.7e8 words);
        # the cross-segment accumulation lives in a Python int
        comp_ints += int(jnp.sum(totals, dtype=jnp.int32))
        del rows, words, totals
    stream_wall_s = time.perf_counter() - t_start

    total_bytes = S * seg_bytes
    out = {
        "metric": "config3_batched_columns_1chip",
        "cols": C,
        "bits_per_col": bits_per_col,
        "logical_gb": round(total_bytes / 1e9, 2),
        "segments": S,
        "density": 2.0**-k,
        "compression_ratio": round(comp_ints / (total_bytes // 4), 4),
        "encode_kernel_gbps": round(seg_bytes / enc_s / 1e9, 3),
        "decode_kernel_gbps": round(seg_bytes / dec_s / 1e9, 3),
        "streamed_wall_s": round(stream_wall_s, 1),
        "streamed_wall_gbps": round(total_bytes / stream_wall_s / 1e9, 3),
        "roundtrip_seg0_ok": rt_ok,
        "golden_col0_ok": golden_ok,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
