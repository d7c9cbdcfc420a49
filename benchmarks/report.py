"""Benchmark report generator — TPU equivalent of the reference's
benchmark main (reference: source.cpp:29-148).

Reproduces the same protocol: a size x density sweep (sizes s*1024
blocks with s doubling, densities 2^-i), `reps` repetitions per config
averaged, roundtrip asserted every iteration (source.cpp:103), rows
appended to a CSV with the reference's 11 columns (source.cpp:38-48)
plus derived GB/s columns. Append mode makes interrupted sweeps
resumable: completed (size, density) configs found in the existing
report are skipped (the reference's partial results survive the same
way through its append-mode results.txt, source.cpp:36).

Usage:
  python -m benchmarks.report --sizes 1 2 4 --densities 1 2 3 4 \
      --reps 3 --out results.txt [--kernel auto|xla|pallas]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

HEADER = [
    "Original size [Int]",
    "Compressed size [Int]",
    "Decompressed size [Int]",
    "Density",
    "Compression Ratio",
    "Compression transfer to device [ms]",
    "Compression time [ms]",
    "Compression transfer from device [ms]",
    "Decompression transfer to device [ms]",
    "Decompression time [ms]",
    "Decompression transfer from device [ms]",
    # extensions beyond the reference schema:
    "Compression throughput [GB/s]",
    "Decompression throughput [GB/s]",
]


def generate_random_data(n_ints: int, every_n: int, seed: int = 1337) -> np.ndarray:
    """Bernoulli bitmap with P(bit set) = 1/every_n (reference
    generateRandomData, tests.cpp:42-64, fixed seed 1337).

    Generated in slabs: the naive (n, 32) int64 draw would need ~66 GB
    for the 992 MB sweep config. PCG64 consumes its bit stream value by
    value, so slab-wise draws produce the identical bitmap (pinned by
    tests/test_report.py)."""
    rng = np.random.default_rng(seed)
    out = np.empty(n_ints, dtype=np.uint32)
    slab = 1 << 21
    for lo in range(0, n_ints, slab):
        hi = min(lo + slab, n_ints)
        bits = rng.integers(0, every_n, size=(hi - lo, 32), dtype=np.int64) == 0
        out[lo:hi] = (
            np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
            .view(np.uint32)
            .reshape(-1)
        )
    return out


_LOOP_CACHE: dict = {}


def _device_kernel_seconds(data: np.ndarray, stream: np.ndarray):
    """Amortized on-device times for one encode and one decode of this
    config (marginal cost of extra in-device iterations; see
    wah_tpu.utils.profiling.amortized_seconds). Timing loops are cached
    across configs: the 16 densities of each sweep size share shapes,
    and a fresh compile through the remote tunnel (~1-2 min) would
    otherwise dominate every config (measured: 2.7 min/config, ~12 h
    for the 144-config protocol)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.utils.profiling import amortized_seconds

    if jax.default_backend() == "cpu":
        from wah_tpu.ops.decode import decode as dec_fn
        from wah_tpu.ops.encode import encode_padded as enc_fn

        hint = "xla"
    else:
        from wah_tpu.api import WahCodec
        from wah_tpu.ops.pallas.decode_kernel import decode as dec_fn
        from wah_tpu.ops.pallas.encode_kernel import encode_padded

        # same static stitch + adaptive + route-bits selection the API
        # applies host-side
        ad = WahCodec._adaptive_hint(data)
        rb = 10 if ad else WahCodec._route_bits_hint(data)
        hint = (WahCodec._stitch_hint(data), ad, rb)
        enc_fn = partial(encode_padded, stitch=hint[0], adaptive=ad,
                         route_bits=rb)

    n = data.shape[0]
    nv = np.int32(chunk_count(n))
    nb = -(-int(nv) // BLOCK_CHUNKS)
    padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data
    dev = jax.device_put(padded)

    if jax.default_backend() != "cpu" and hint[2] < 10:
        # a violated route hint means the API pays the optimistic
        # launch AND the full fallback; timing the optimistic kernel
        # alone would publish the throughput of a launch whose output
        # is garbage. Check the flag once and time the full variant
        # instead (what compress() ends up paying, minus the wasted
        # launch).
        _, _, viol = jax.jit(enc_fn)(dev, nv)
        if int(viol):
            hint = (hint[0], hint[1], 10)
            enc_fn = partial(encode_padded, stitch=hint[0],
                             adaptive=hint[1], route_bits=10)

    # small configs need more in-device iterations for a stable marginal
    iters = 17 if data.nbytes < (1 << 25) else 5

    def enc_step(p, x, nvv):
        r = enc_fn(x, nvv - p)  # (words, total[, violated])
        extra = r[2] if len(r) == 3 else 0
        return r[1] + extra + r[0][1].astype(jnp.int32)

    enc_s = amortized_seconds(
        enc_step, dev, nv, iters=iters,
        cache=_LOOP_CACHE, cache_key=("enc", padded.shape[0], hint),
    )

    m = stream.shape[0]
    cap = nb * BLOCK_CHUNKS
    # pow2 bucket (the API's own policy, api._next_pow2): per-1024
    # rounding gives every density its own shape and a fresh ~1-2 min
    # remote compile; pow2 buckets are shared across densities
    M = max(1024, 1 << (m - 1).bit_length())
    wpad = np.zeros(M, dtype=np.uint32)
    wpad[:m] = stream
    wdev = jax.device_put(wpad)
    if jax.default_backend() == "cpu":
        dfn = partial(dec_fn, chunk_capacity=cap)
        dkey = ("dec", M, cap)
    else:
        from wah_tpu.api import WahCodec as _WC

        dad = _WC._decode_adaptive_hint(stream)
        rt = None if dad else _WC._decode_route_hint(stream)
        if rt is not None:  # see the encode-side violation probe above
            _, _, dviol = jax.jit(
                partial(dec_fn, chunk_capacity=cap, route=rt)
            )(wdev, np.int32(m))
            if int(dviol):
                rt = None
        dfn = partial(dec_fn, chunk_capacity=cap, adaptive=dad, route=rt)
        dkey = ("dec", M, cap, dad, rt)

    def dec_step(p, w, mm):
        r = dfn(w, mm - p)  # (ints, n_ints[, violated])
        extra = r[2] if len(r) == 3 else 0
        return r[1] + extra + r[0][1].astype(jnp.int32)

    dec_s = amortized_seconds(
        dec_step, wdev, np.int32(m), iters=iters,
        cache=_LOOP_CACHE, cache_key=dkey,
    )
    return enc_s, dec_s


def completed_configs(path: str) -> set[tuple[int, float]]:
    done = set()
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].lstrip().startswith(("#", "Original")):
                continue
            try:
                done.add((int(row[0]), float(row[3])))
            except (ValueError, IndexError):
                continue
    return done


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 32, 64, 128, 256],
                   help="s values; input = s*1024 blocks (reference "
                        "source.cpp:54)")
    p.add_argument("--densities", type=int, nargs="+",
                   default=list(range(1, 17)),
                   help="i values; P(bit) = 2^-i (reference source.cpp:57)")
    p.add_argument("--reps", type=int, default=10,
                   help="repetitions per config (reference source.cpp:70)")
    p.add_argument("--out", default="results.txt")
    p.add_argument("--kernel", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--device-timing", action="store_true",
                   help="measure the kernel phase with an amortized "
                        "in-device loop instead of wall clock — the "
                        "equivalent of the reference's cudaEvent kernel "
                        "timers when the host<->device link dominates a "
                        "single dispatch (see bench.py)")
    args = p.parse_args(argv)

    from wah_tpu import WahCodec
    from wah_tpu.constants import BLOCK_INTS

    codec = WahCodec(kernel=args.kernel)
    done = completed_configs(args.out)
    new_file = not os.path.exists(args.out)
    f = open(args.out, "a", newline="")
    w = csv.writer(f)
    if new_file:
        w.writerow(HEADER)
        f.flush()

    for s in args.sizes:
        n = s * 1024 * BLOCK_INTS
        for i in args.densities:
            density = 2.0 ** (-i)
            if (n, density) in done:
                print(f"skip s={s} i={i} (already in {args.out})",
                      file=sys.stderr)
                continue
            data = generate_random_data(n, 1 << i, seed=args.seed)
            # untimed warmup: jit compilation happens per shape bucket
            # (the reference pays no compile cost; cudaEvent timings
            # would otherwise absorb it into the first rep)
            s0, _ = codec.compress(data)
            codec.decompress(s0, out_ints=n)
            acc = np.zeros(6)
            comp_size = 0
            for _ in range(args.reps):
                stream, ct = codec.compress(data)
                out, dt = codec.decompress(stream, out_ints=n)
                # roundtrip assert every iteration (source.cpp:103)
                assert np.array_equal(out, data), (s, i)
                comp_size = stream.shape[0]
                acc += [
                    ct.to_device_ms, ct.kernel_ms, ct.from_device_ms,
                    dt.to_device_ms, dt.kernel_ms, dt.from_device_ms,
                ]
            acc /= args.reps
            if args.device_timing:
                enc_s, dec_s = _device_kernel_seconds(data, stream)
                acc[1] = enc_s * 1e3
                acc[4] = dec_s * 1e3
            ratio = comp_size / n
            enc_gbps = data.nbytes / (acc[1] / 1e3) / 1e9
            dec_gbps = data.nbytes / (acc[4] / 1e3) / 1e9
            w.writerow(
                [n, comp_size, n, density, f"{ratio:.6f}"]
                + [f"{x:.4f}" for x in acc]
                + [f"{enc_gbps:.3f}", f"{dec_gbps:.3f}"]
            )
            f.flush()
            print(f"s={s} i={i}: ratio={ratio:.4f} "
                  f"enc={enc_gbps:.2f} GB/s dec={dec_gbps:.2f} GB/s",
                  file=sys.stderr)
    f.close()


if __name__ == "__main__":
    main()
