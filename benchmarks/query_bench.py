"""Bitmap-index query throughput — the workload WAH exists for
(Andrzejewski & Wrembel's DEXA-2010 target; the reference ships only
the codec, SURVEY.md §0). Measures the fused compressed-domain
pipelines on device-resident columns:

  - k-way OR / AND fold (logical_reduce_flat: ONE flattened batch
    decode + tree reduce + ONE encode) at k = 4 / 16
  - pairwise AND (logical_op)
  - decode-free NOT (complement_stream, a pure stream rewrite)

Reported GB/s is LOGICAL bitmap bytes (k x column bytes) per second —
the index-side figure of merit (how much bitmap a query touches).

    timeout 1200 python -u -m benchmarks.query_bench
Writes benchmarks/query_v5e.json.
"""
from __future__ import annotations

import json
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "query_v5e.json")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops import logical as lops
    from wah_tpu.ops.pallas import encode_kernel
    from wah_tpu.utils.profiling import amortized_seconds

    nb = 8192  # 32.5 MB per column
    n = nb * BLOCK_INTS
    nv = np.int32(chunk_count(n))
    k_density = 8  # P(bit) = 2^-8: sparse membership columns

    out = {
        "metric": "bitmap_index_query_throughput_1chip",
        "col_mbytes": round(n * 4 / 1e6, 1),
        "density": 2.0**-k_density,
        "unit": "logical GB/s",
    }

    def gen(C):
        key = jax.random.PRNGKey(42)

        def body(i, acc):
            return acc & jax.random.bits(
                jax.random.fold_in(key, i), (C * nb, BLOCK_INTS),
                jnp.uint32,
            )

        acc0 = jax.random.bits(key, (C * nb, BLOCK_INTS), jnp.uint32)
        return jax.lax.fori_loop(1, k_density, body, acc0)

    enc = jax.jit(
        lambda r, C: encode_kernel.encode_rows_batch(r, C, nv),
        static_argnums=(1,),
    )

    for C in (4, 16):
        rows = jax.jit(gen, static_argnums=(0,))(C)
        words_flat, totals = enc(rows, C)
        jax.block_until_ready((words_flat, totals))
        del rows
        for op in ("or", "and"):
            def step(p, wf, t, C=C, op=op):
                w, tot = lops.logical_reduce_flat(
                    wf, C, t - p, op=op, n_ints=n
                )
                return tot + w[1].astype(jnp.int32)

            s = amortized_seconds(step, words_flat, totals)
            out[f"k{C}_{op}_gbps"] = round(C * n * 4 / s / 1e9, 3)
            print(f"k={C} {op}: {out[f'k{C}_{op}_gbps']} GB/s",
                  flush=True)
        del words_flat, totals

    # pairwise AND through the same fused decode+op+encode pipeline
    rows = jax.jit(gen, static_argnums=(0,))(2)
    words_flat, totals = enc(rows, 2)
    M = words_flat.shape[0] // 2
    wa, wb = words_flat[:M], words_flat[M:]
    ma, mb = totals[0], totals[1]
    jax.block_until_ready((wa, wb))
    del rows, words_flat

    def pair_step(p, a, am, b, bm):
        w, tot = lops.logical_op(a, am - p, b, bm, op="and", n_ints=n)
        return tot + w[1].astype(jnp.int32)

    s = amortized_seconds(pair_step, wa, ma, wb, mb)
    out["pairwise_and_gbps"] = round(2 * n * 4 / s / 1e9, 3)
    print(f"pairwise and: {out['pairwise_and_gbps']} GB/s", flush=True)

    # decode-free NOT: one vectorized pass over the compressed words
    def not_step(p, a, am):
        w = lops.complement_stream(a, am - p)
        return w[1].astype(jnp.int32) + am

    s = amortized_seconds(not_step, wa, ma)
    out["not_gbps_logical"] = round(n * 4 / s / 1e9, 3)
    out["not_gbps_stream"] = round(
        int(ma) * 4 / s / 1e9, 3
    )
    print(f"not: {out['not_gbps_logical']} GB/s", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
