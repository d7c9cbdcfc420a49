"""One-off probe: SMEM prefetch limits + big-shape throughput.

1) single-stream 992 MB encode (sweep s=256 config; 262144 block rows
   -> 1 MB packed prefetch in the stitch)
2) flattened batch 256 x 2048 blocks in ONE stitch call (524288 rows ->
   2 MB packed prefetch)

Data generated on device (AND of k random draws = density 2^-k).
"""
import time
from functools import partial

import numpy as np


def main() -> None:
    import sys
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    def want(k):
        return only is None or k in only

    import jax
    import jax.numpy as jnp
    from jax import lax

    from wah_tpu.constants import BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel

    def gen(shape, k=4, seed=1337):
        @jax.jit
        def g(key):
            def body(i, acc):
                return acc & jax.random.bits(
                    jax.random.fold_in(key, i), shape, jnp.uint32
                )

            return lax.fori_loop(
                1, k, body, jax.random.bits(key, shape, jnp.uint32)
            )

        out = g(jax.random.PRNGKey(seed))
        out.block_until_ready()
        return out

    def amortized(loop, args, K=3, reps=3):
        def best(kk):
            int(loop(*args, kk))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                int(loop(*args, kk))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(K) - best(1)) / (K - 1)

    # --- 1) single stream 992 MB -------------------------------------
    nb = 262144
    n = nb * BLOCK_INTS
    nv = np.int32(chunk_count(n))
    dev = gen((n,)) if want("1") else None

    @partial(jax.jit, static_argnums=(2,))
    def loop1(ints, nvv, K):
        def body(i, acc):
            w, t = encode_kernel.encode_padded(ints, nvv - (acc & 1),
                                               stitch="v3")
            return acc + t + w[1].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    if want("1"):
        s = amortized(loop1, (dev, nv))
        print(f"single 992MB: {s*1e3:.2f} ms  {n*4/s/1e9:.2f} GB/s",
              flush=True)
        del dev

    # --- 2) one-call batch 256 x 2048 blocks -------------------------
    C, nbc = 256, 2048
    nc = nbc * BLOCK_INTS
    nvc = np.int32(chunk_count(nc))
    cols = gen((C, nc)) if (want("2") or want("3") or want("4")
                            or want("6")) else None

    @partial(jax.jit, static_argnums=(2,))
    def loop2(cols, nvv, K):
        def body(i, acc):
            w, t = encode_kernel.encode_padded_batch(
                cols, nvv - (acc & 1), group_rows=C * nbc
            )
            return acc + jnp.sum(t, dtype=jnp.int32) + w[1].astype(
                jnp.int32
            )

        return lax.fori_loop(0, K, body, jnp.int32(0))

    if want("2"):
        s = amortized(loop2, (cols, nvc))
        print(f"batch 1-call 2.1GB: {s*1e3:.2f} ms  "
              f"{C*nc*4/s/1e9:.2f} GB/s", flush=True)

    # --- 3) batch pieces: tiles-only on the flattened shape ----------
    @partial(jax.jit, static_argnums=(2,))
    def loop3(cols, nvv, K):
        ints2d = cols.reshape(C * nbc, BLOCK_INTS)
        nv3 = jnp.stack(
            [nvv, jnp.int32(0), jnp.int32(nbc * 1024 - 1)]
        )

        def body(i, acc):
            st, cnt = encode_kernel.encode_tiles(
                ints2d, nv3.at[0].add(acc & 1)
            )
            return acc + cnt[0, 0] + st[0, 0].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    if want("3"):
        s = amortized(loop3, (cols, nvc))
        print(f"batch tiles-only: {s*1e3:.2f} ms  "
              f"{C*nc*4/s/1e9:.2f} GB/s", flush=True)

    # --- 4) batch stitch-only (staging/offsets precomputed) ----------
    from wah_tpu.ops.pallas.stitch2 import stitch_tiles_v2

    nbf = C * nbc
    colcap = nbc * 1024

    @jax.jit
    def mk(cols, nvv):
        ints2d = cols.reshape(nbf, BLOCK_INTS)
        nv3 = jnp.stack([nvv, jnp.int32(0), jnp.int32(colcap - 1)])
        st, cnt = encode_kernel.encode_tiles(ints2d, nv3)
        counts2 = cnt[:, 0].reshape(C, nbc)
        csum = jnp.cumsum(counts2, axis=1, dtype=jnp.int32)
        base = (jnp.arange(C, dtype=jnp.int32) * colcap)[:, None]
        off = (base + csum - counts2).reshape(-1)
        rc = counts2.reshape(-1)
        return st, jnp.concatenate([off, off[-1:] + rc[-1:]]), rc

    if want("4") or want("6"):
        st_d, oe_d, rc_d = (jax.device_put(np.asarray(x))
                            for x in mk(cols, nvc))
    del cols

    @partial(jax.jit, static_argnums=(3,))
    def loop4(st, oe, rc, K):
        def body(i, acc):
            # perturb a REAL input (first offset) so the stitch cannot
            # be hoisted out of the loop
            w = stitch_tiles_v2(
                st, oe.at[0].add(acc & 1), counts=rc
            )
            return acc + w[1].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    if want("4"):
        s = amortized(loop4, (st_d, oe_d, rc_d))
        print(f"batch stitch-only: {s*1e3:.2f} ms", flush=True)

    # --- 6) control: same staging, single-stream offsets -------------
    @jax.jit
    def mk6(rc):
        off = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(rc, dtype=jnp.int32)]
        )
        return off

    oe6_d = (jax.device_put(np.asarray(mk6(rc_d)))
             if want("6") else None)

    @partial(jax.jit, static_argnums=(2,))
    def loop6(st, oe, K):
        def body(i, acc):
            w = stitch_tiles_v2(st, oe.at[0].add(acc & 1))
            return acc + w[1].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    if want("6"):
        s = amortized(loop6, (st_d, oe6_d))
        print(f"stitch-only single-offsets: {s*1e3:.2f} ms", flush=True)
    if want("4") or want("6"):
        del st_d, oe_d, rc_d
    del oe6_d

    # --- 7) composed tiles+prep+stitch, no reshape tail ---------------
    if want("7"):
        cols7 = gen((C, nc))

        @partial(jax.jit, static_argnums=(2,))
        def loop7(cols, nvv, K):
            ints2d = cols.reshape(nbf, BLOCK_INTS)

            def body(i, acc):
                nv3 = jnp.stack(
                    [nvv - (acc & 1), jnp.int32(0),
                     jnp.int32(colcap - 1)]
                )
                st, cnt = encode_kernel.encode_tiles(ints2d, nv3)
                rc = cnt[:, 0]
                cf = jnp.cumsum(rc, dtype=jnp.int32).reshape(C, nbc)
                ends = cf[:, -1]
                starts = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), ends[:-1]]
                )
                base = jnp.arange(C, dtype=jnp.int32) * colcap
                off = (cf - rc.reshape(C, nbc)
                       + (base - starts)[:, None]).reshape(-1)
                oe = jnp.concatenate([off, off[-1:] + rc[-1:]])
                w = stitch_tiles_v2(st, oe, counts=rc)
                return acc + w[1].astype(jnp.int32) + ends[-1] - ends[-1]

            return lax.fori_loop(0, K, body, jnp.int32(0))

        s = amortized(loop7, (cols7, nvc))
        print(f"composed no-tail: {s*1e3:.2f} ms  "
              f"{C*nc*4/s/1e9:.2f} GB/s", flush=True)
        del cols7

    # --- 5) single stream at the same 2.1 GB size --------------------
    nb5 = C * nbc
    n5 = nb5 * BLOCK_INTS
    nv5 = np.int32(chunk_count(n5))

    if want("5"):
        dev5 = gen((n5,))
        s = amortized(loop1, (dev5, nv5))
        print(f"single 2.1GB: {s*1e3:.2f} ms  {n5*4/s/1e9:.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
