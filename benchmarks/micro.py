"""Kernel microbenchmarks on the real chip — the measurement harness
behind the encode/decode tuning decisions (tile sizes, scan shapes,
fused-vs-two-kernel selection). Amortized in-device loop timing (see
bench.py docstring: per-dispatch wall clock is invalid through the
remote tunnel).

    python -m benchmarks.micro [--nb 32768] [--density 0.0625] \
        [--which enc2,encf,tiles,dec] [-K 5]

Prints one line per variant: name, per-call device ms, GB/s of logical
bitmap (nb*3968 bytes input for encode; same bitmap decoded for dec).
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def _bitmap(nb, density, seed=1337):
    from wah_tpu.constants import BLOCK_INTS

    n = nb * BLOCK_INTS
    rng = np.random.default_rng(seed)
    bits = rng.random((n, 32)) < density
    return (
        np.packbits(bits, axis=1, bitorder="little").view(np.uint32).reshape(-1)
    )


def amortized(loop_fn, dev_args, K, reps=3):
    """Marginal per-iteration time of the jitted loop_fn(*dev_args, K).

    Round-4 rework: the original two-point (t_K - t_1)/(K - 1) form is
    noise-limited through the ~100 ms remote-dispatch tunnel once
    kernels dropped under ~5 ms — it published 2.55 ms for a config the
    robust harness measures at 3.1, and even negative marginals. Now
    measured as the (K, 2K) slope with escalation until the loop body
    dominates dispatch, cross-checked against the (1, K) slope — the
    same methodology as utils.profiling.amortized_seconds (kept local
    because micro loops take K as a STATIC argument)."""

    def best(k):
        int(loop_fn(*dev_args, k))  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(loop_fn(*dev_args, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    b1 = best(1)
    k, bk = max(K, 2), best(max(K, 2))
    while bk < 4.0 * b1 and k < (1 << 12):
        slope = max((bk - b1) / (k - 1), 1e-12)
        k = min(1 << 12, max(2 * k, int(3.2 * b1 / slope) + 1),
                max(2 * k, int(2.5 / slope)))
        bk = best(k)
        if bk > b1 + 2.5:
            break
    for _ in range(3):
        b2k = best(2 * k)
        s_hi = max(b2k - bk, 1e-12) / k
        s_lo = max(bk - b1, 1e-12) / (k - 1)
        if abs(s_hi - s_lo) <= 0.15 * max(s_hi, s_lo) or b2k > b1 + 6.0:
            return s_hi
        k, bk = 2 * k, b2k
    return s_hi


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=32768)
    ap.add_argument("--density", type=float, nargs="+", default=[2.0**-4])
    ap.add_argument("--which", default="enc2,encf,tiles,dec")
    ap.add_argument("-K", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from wah_tpu.constants import BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel, encode_kernel

    nb = args.nb
    which = args.which.split(",")

    from wah_tpu import golden
    from wah_tpu.ops.pallas.stitch2 import stitch_tiles_v2

    def enc_loop(enc):
        @partial(jax.jit, static_argnums=(2,))
        def loop(ints, nvv, K):
            def body(i, acc):
                words, total = enc(ints, nvv - (acc & 1))
                return acc + total + words[1].astype(jnp.int32)

            return lax.fori_loop(0, K, body, jnp.int32(0))

        return loop

    def enc_v2(ints, nvv, B=None, v1=False):
        nb_ = ints.shape[0] // BLOCK_INTS
        st, cnt = encode_kernel.encode_tiles(
            ints.reshape(nb_, BLOCK_INTS),
            jnp.stack([nvv, jnp.int32(0)]),
        )
        counts = cnt[:, 0]
        offsets_ext = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
        )
        if v1:
            return encode_kernel.stitch_tiles(st, offsets_ext), offsets_ext[-1]
        return stitch_tiles_v2(st, offsets_ext, B), offsets_ext[-1]

    @partial(jax.jit, static_argnums=(2,))
    def tiles_loop(ints, nvv, K):
        ints2d = ints.reshape(nb, BLOCK_INTS)

        def body(i, acc):
            st, cnt = encode_kernel.encode_tiles(
                ints2d, jnp.stack([nvv - (acc & 1), jnp.int32(0)])
            )
            return acc + cnt[0, 0] + st[0, 0].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    cap = nb * 1024

    @partial(jax.jit, static_argnums=(2,))
    def dec_loop(words, mm, K):
        def body(i, acc):
            ints, _ = decode_kernel.decode(words, mm - (acc & 1), cap)
            return acc + ints[1].astype(jnp.int32)

        return lax.fori_loop(0, K, body, jnp.int32(0))

    loops = {
        "enc2": enc_loop(encode_kernel.encode_padded),
        "encf": enc_loop(encode_kernel.encode_padded_fused),
        "encv2": enc_loop(enc_v2),
        "encv1": enc_loop(lambda i, nvv: enc_v2(i, nvv, v1=True)),
        "encv2b": enc_loop(lambda i, nvv: enc_v2(i, nvv, 512)),
        "encv2c": enc_loop(lambda i, nvv: enc_v2(i, nvv, 1024)),
    }

    for density in args.density:
        data = _bitmap(nb, density)
        n = len(data)
        nv = np.int32(chunk_count(n))
        nbytes = data.nbytes
        dev = jax.device_put(data)
        print(f"--- density {density:g} ---", flush=True)

        def report(name, secs, nbytes_=None):
            b = nbytes_ or nbytes
            print(
                f"{name:10s} {secs*1e3:8.3f} ms  {b/secs/1e9:7.2f} GB/s",
                flush=True,
            )

        for name in ("enc2", "encf", "encv2", "encv1", "encv2b", "encv2c"):
            if name in which:
                report(name, amortized(loops[name], (dev, nv), args.K))
        if "tiles" in which:
            report("tiles", amortized(tiles_loop, (dev, nv), args.K))
        if "stv1" in which or "stv2" in which:
            # stitch alone: staging/offsets precomputed once on device
            @jax.jit
            def mk(ints, nvv):
                st, cnt = encode_kernel.encode_tiles(
                    ints.reshape(nb, BLOCK_INTS),
                    jnp.stack([nvv, jnp.int32(0)]),
                )
                off = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32),
                     jnp.cumsum(cnt[:, 0], dtype=jnp.int32)]
                )
                return st, off

            st_d, off_d = mk(dev, nv)
            st_d, off_d = jax.device_put(np.asarray(st_d)), jax.device_put(
                np.asarray(off_d)
            )

            def st_loop(fn):
                @partial(jax.jit, static_argnums=(2,))
                def loop(st, off, K):
                    def body(i, acc):
                        # perturb a REAL input (first offset): nothing
                        # in the kernel depends on offsets_ext[-1], so
                        # perturbing it lets XLA hoist the whole stitch
                        # out of the loop (measured: bogus timings)
                        out = fn(st, off.at[0].add(acc & 1))
                        return acc + out[1].astype(jnp.int32)

                    return lax.fori_loop(0, K, body, jnp.int32(0))

                return loop

            if "stv1" in which:
                report(
                    "stv1",
                    amortized(
                        st_loop(encode_kernel.stitch_tiles),
                        (st_d, off_d), args.K,
                    ),
                )
            if "stv2" in which:
                report(
                    "stv2",
                    amortized(
                        st_loop(
                            partial(stitch_tiles_v2, layout3d=False)
                        ),
                        (st_d, off_d), args.K,
                    ),
                )
            if "stv3" in which:
                report(
                    "stv3",
                    amortized(
                        st_loop(
                            partial(stitch_tiles_v2, layout3d=True)
                        ),
                        (st_d, off_d), args.K,
                    ),
                )
        if "dec" in which or "decs" in which or "decpre" in which:
            stream = golden.encode(data)
            m = np.int32(len(stream))
        if "dec" in which:
            M = cap + 1024  # fixed bucket: no recompile across densities
            padded = np.zeros(M, np.uint32)
            padded[: len(stream)] = stream
            sdev = jax.device_put(padded)
            report("dec", amortized(dec_loop, (sdev, m), args.K))
        if "decpre" in which:
            # XLA prescan alone (decode() lines before the pallas_call)
            Ms = -(-len(stream) // 1024) * 1024 + 1024
            padded = np.zeros(Ms, np.uint32)
            padded[: len(stream)] = stream
            sdev = jax.device_put(padded)
            L_ = 1024

            @partial(jax.jit, static_argnums=(2,))
            def pre_loop(words, mm, K):
                from wah_tpu.constants import BIT31, LEN_MASK

                def body(i, acc):
                    m2 = mm - (acc & 1)
                    wpad = words
                    ii = jnp.arange(wpad.shape[0], dtype=jnp.int32)
                    isf = (wpad & jnp.uint32(BIT31)) != 0
                    cnts = jnp.where(
                        isf, (wpad & jnp.uint32(LEN_MASK)).astype(jnp.int32), 1
                    )
                    cnts = jnp.where(ii < m2, cnts, 0)
                    rs = jnp.sum(cnts.reshape(-1, 128), axis=1, dtype=jnp.int32)
                    rb_ = jnp.cumsum(rs, dtype=jnp.int32) - rs
                    nbo_p = cap // 1024
                    slot = (rb_ + (L_ - 1)) // L_
                    nrows = rb_.shape[0]
                    A = (
                        jnp.full((nbo_p + 1,), -1, jnp.int32)
                        .at[jnp.clip(slot, 0, nbo_p)]
                        .max(jnp.arange(nrows, dtype=jnp.int32))[:nbo_p]
                    )
                    r_arr = jnp.maximum(jax.lax.cummax(A), 0)
                    coff = jnp.take(rb_, r_arr, fill_value=0)
                    return acc + r_arr[1] + coff[1] + rb_[-1]

                return lax.fori_loop(0, K, body, jnp.int32(0))

            report("decpre", amortized(pre_loop, (sdev, m), args.K))
        if "decs" in which:
            # true-size bucket (the API path): prescan over ~m words
            Ms = -(-len(stream) // 1024) * 1024 + 1024
            padded = np.zeros(Ms, np.uint32)
            padded[: len(stream)] = stream
            sdev = jax.device_put(padded)

            @partial(jax.jit, static_argnums=(2,))
            def decs_loop(words, mm, K):
                def body(i, acc):
                    ints, _ = decode_kernel.decode(words, mm - (acc & 1), cap)
                    return acc + ints[1].astype(jnp.int32)

                return lax.fori_loop(0, K, body, jnp.int32(0))

            report("decs", amortized(decs_loop, (sdev, m), args.K))


if __name__ == "__main__":
    main()
