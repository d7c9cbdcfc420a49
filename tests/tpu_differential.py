"""On-hardware differential suite: every compiled execution path vs the
golden model, on the real TPU.

The pytest suite runs the Pallas kernels in interpreter mode on CPU
(tests/conftest.py); interpreter mode does not prove Mosaic *lowering*
correctness. This driver compiles and runs the actual kernels on
hardware over the full case matrix — the analog of the reference's
on-device test suite (tests.cpp:83-307 runs everything through the GPU
API; source.cpp:103 asserts roundtrip every benchmark iteration).

Paths exercised per case:
  api_enc / api_dec  — public WahCodec (fused Pallas encode + decode)
  fused              — single-kernel encode variant (encode_padded_fused)
  native             — C++ host codec (when built)
Plus section runs:
  batch              — compress_batch/decompress_batch (lax.map Pallas)
  logical            — compressed-domain and/or/xor/andnot
  sharded            — ShardedCodec on a 1-device TPU mesh (compiles the
                       Pallas-under-shard_map branch of parallel/dist.py)

Emits a JSON artifact (default TPU_DIFF.json) with per-case verdicts:
    python tests/tpu_differential.py [--out TPU_DIFF.json] [--quick]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _bernoulli(n, density, seed):
    g = np.random.default_rng(seed)
    bits = g.random((n, 32)) < density
    return (
        np.packbits(bits, axis=1, bitorder="little").view(np.uint32).reshape(-1)
    )


def _clustered(n, seed, a):
    g = np.random.default_rng(seed)
    total = n * 32
    bits = np.zeros(total, np.uint8)
    pos, val = 0, 0
    while pos < total:
        ln = max(1, min(int(g.zipf(a)) * 31, total - pos))
        bits[pos : pos + ln] = val
        pos += ln
        val ^= 1
    return np.packbits(bits, bitorder="little").view(np.uint32)[:n]


def _alternating(n, period_chunks):
    # alternating zero/one runs of `period_chunks` 31-bit chunks
    nchunks = (n * 32) // 31 + 1
    chunk_vals = (np.arange(nchunks) // period_chunks) % 2
    bits = np.repeat(chunk_vals, 31).astype(np.uint8)[: n * 32]
    return np.packbits(bits, bitorder="little").view(np.uint32)[:n]


def _wandering_literal(n_blocks, BLOCK_INTS):
    # one set bit sliding through each 31-int group (reference
    # tests.cpp:33-39 pattern, extended across blocks)
    n = n_blocks * BLOCK_INTS
    data = np.zeros(n, np.uint32)
    for i in range(n):
        data[i] = np.uint32(1) << (i % 31)
    return data


def build_cases(BLOCK_INTS, quick=False):
    NB = 40  # main size: 40 blocks (~5 MB), bucket 64
    n = NB * BLOCK_INTS
    cases = [
        ("sparse_2^-16", _bernoulli(n, 2.0**-16, 1)),
        ("mid_2^-4", _bernoulli(n, 2.0**-4, 2)),
        ("dense_0.5", _bernoulli(n, 0.5, 3)),
        ("very_dense_0.999", _bernoulli(n, 0.999, 4)),
        ("sparse_2^-10", _bernoulli(n, 2.0**-10, 5)),
        ("clustered_zipf1.5", _clustered(n, 6, 1.5)),
        ("clustered_zipf1.1", _clustered(n, 7, 1.1)),
        ("all_zeros", np.zeros(n, np.uint32)),
        ("all_ones", np.full(n, 0xFFFFFFFF, np.uint32)),
        ("alt_64chunk", _alternating(n, 64)),
        ("alt_1chunk", _alternating(n, 1)),
        ("wandering_literal", _wandering_literal(NB, BLOCK_INTS)),
        ("ones_spikes_in_zeros",
         np.where(np.random.default_rng(8).random(n) < 0.01,
                  np.uint32(0xFFFFFFFF), np.uint32(0))),
        ("zero_spikes_in_ones",
         np.where(np.random.default_rng(9).random(n) < 0.01,
                  np.uint32(0), np.uint32(0xFFFFFFFF))),
        # non-block / non-warp multiples (defined-padding semantics)
        ("odd_nonblock", _bernoulli(17 * BLOCK_INTS + 345, 0.1, 10)),
        ("odd_nonwarp", _bernoulli(20 * BLOCK_INTS + 17, 0.03, 11)),
        ("single_trailing_bit",
         np.concatenate([np.zeros(n - 1, np.uint32),
                         np.array([0x80000000], np.uint32)])),
        ("single_leading_bit",
         np.concatenate([np.array([1], np.uint32),
                         np.zeros(n - 1, np.uint32)])),
        ("tiny_4ints", np.array([0x1, 0, 0, 0xFFFFFFFF], np.uint32)),
        ("tiny_31ints", _bernoulli(31, 0.2, 12)),
        ("block_seam_runs", _alternating(n, 1024)),  # max-length fills
        ("near_block_seam", _alternating(n, 1023)),
    ]
    if quick:
        cases = cases[:6]
    return cases


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_DIFF.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from wah_tpu import WahCodec, golden, native
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel

    backend = jax.default_backend()
    assert backend != "cpu", "needs a TPU backend"
    codec = WahCodec()  # auto -> pallas
    t0 = time.time()
    report = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "cases": [],
        "sections": {},
    }
    fails = 0

    def record(name, checks, extra=None):
        nonlocal fails
        ok = all(checks.values())
        fails += not ok
        row = {"case": name, "ok": ok, **checks}
        if extra:
            row.update(extra)
        report["cases"].append(row)
        print(
            f"{'ok ' if ok else 'FAIL'} {name:24s} "
            + " ".join(f"{k}={v}" for k, v in checks.items()),
            flush=True,
        )

    # ---- single-stream matrix -------------------------------------------
    for name, data in build_cases(BLOCK_INTS, args.quick):
        n = len(data)
        ref = golden.encode(data)
        stream, _ = codec.compress(data)
        out, _ = codec.decompress(stream, out_ints=n)

        nv = chunk_count(n)
        nb = -(-nv // BLOCK_CHUNKS)
        padded = np.zeros(nb * BLOCK_INTS, np.uint32)
        padded[:n] = data
        w3, t3 = jax.jit(encode_kernel.encode_padded_fused)(
            padded, np.int32(nv)
        )
        checks = {
            "api_enc": bool(np.array_equal(stream, ref)),
            "api_dec": bool(np.array_equal(out, data)),
            "fused": bool(np.array_equal(np.asarray(w3)[: int(t3)], ref)),
            "native": (not native.available())
            or bool(np.array_equal(native.encode(data), ref)),
        }
        record(name, checks, {"n_ints": n, "words": len(ref)})

    # ---- batched columns (bitmap-index workload) ------------------------
    cols = np.stack(
        [
            _bernoulli(8 * BLOCK_INTS, d, 20 + i)
            for i, d in enumerate([2.0**-12, 2.0**-4, 0.5, 0.0, 1.0, 0.01])
        ]
    ).astype(np.uint32)
    cols[3, :] = 0
    cols[4, :] = 0xFFFFFFFF
    words_b, totals_b = codec.compress_batch(cols)
    bok = all(
        np.array_equal(words_b[c, : totals_b[c]], golden.encode(cols[c]))
        for c in range(cols.shape[0])
    )
    outs_b = codec.decompress_batch(words_b, totals_b, out_ints=cols.shape[1])
    record(
        "batch_6cols",
        {"batch_enc": bool(bok),
         "batch_dec": bool(np.array_equal(outs_b, cols))},
    )

    # ---- compressed-domain logical ops ----------------------------------
    a = _bernoulli(8 * BLOCK_INTS, 0.05, 30)
    b = _clustered(8 * BLOCK_INTS, 31, 1.4)
    sa, sb = golden.encode(a), golden.encode(b)
    lchecks = {}
    for op, npop in [
        ("and", np.bitwise_and),
        ("or", np.bitwise_or),
        ("xor", np.bitwise_xor),
        ("andnot", lambda x, y: x & ~y),
    ]:
        got = codec.logical(sa, sb, op, n_ints=len(a))
        want = golden.encode(npop(a, b).astype(np.uint32))
        lchecks[op] = bool(np.array_equal(got, want))
    # k-way fused reduce (flattened batch decode + reduce + encode)
    c = _bernoulli(8 * BLOCK_INTS, 0.3, 32)
    got3 = codec.logical_many([sa, sb, golden.encode(c)], "or", len(a))
    lchecks["many_or"] = bool(
        np.array_equal(got3, golden.encode((a | b | c).astype(np.uint32)))
    )
    # k=16 fan-in (pow2 tree, no identity padding) and k=13 (padded)
    kcols = [
        _bernoulli(8 * BLOCK_INTS, d, 100 + i)
        for i, d in enumerate(
            [2.0**-10, 0.4, 0.0, 2.0**-4, 1.0, 0.01] * 3
        )
    ]
    for kk in (16, 13):
        ks = [golden.encode(x) for x in kcols[:kk]]
        want = golden.encode(np.bitwise_or.reduce(kcols[:kk]))
        lchecks[f"many_or_k{kk}"] = bool(
            np.array_equal(
                codec.logical_many(ks, "or", 8 * BLOCK_INTS), want
            )
        )
    wanta = golden.encode(np.bitwise_and.reduce(kcols[:16]))
    lchecks["many_and_k16"] = bool(
        np.array_equal(
            codec.logical_many(
                [golden.encode(x) for x in kcols[:16]],
                "and",
                8 * BLOCK_INTS,
            ),
            wanta,
        )
    )
    record("logical_ops", lchecks)

    # ---- column-segmented batched codec (configs[3] machinery) ----------
    nseg = 3 * BLOCK_INTS + 77
    segcols = np.stack(
        [
            _bernoulli(nseg, 2.0**-6, 50),
            _bernoulli(nseg, 0.5, 51),
            np.zeros(nseg, np.uint32),
            _clustered(nseg, 52, 1.3),
        ]
    )
    seg_streams = codec.compress_batch_segments(
        segcols, segment_ints=BLOCK_INTS
    )
    seg_enc_ok = all(
        np.array_equal(seg_streams[c], golden.encode(segcols[c]))
        for c in range(4)
    )
    seg_out = codec.decompress_batch_segments(
        seg_streams, out_ints=nseg, segment_ints=BLOCK_INTS
    )
    record(
        "batch_segments",
        {"seg_enc": bool(seg_enc_ok),
         "seg_dec": bool(np.array_equal(seg_out, segcols))},
    )

    # ---- sharded codec on a 1-device TPU mesh ---------------------------
    # Compiles the Pallas-kernels-under-shard_map branch of
    # parallel/dist.py (dead code in every CPU-mesh check).
    from wah_tpu.parallel import ShardedCodec, make_mesh

    sc = ShardedCodec(make_mesh(jax.devices()[:1]))
    schecks = {}
    for sname, sdata in [
        ("sparse", _bernoulli(16 * BLOCK_INTS, 2.0**-8, 40)),
        ("dense", _bernoulli(16 * BLOCK_INTS, 0.5, 41)),
        ("clustered", _clustered(16 * BLOCK_INTS, 42, 1.3)),
    ]:
        sref = golden.encode(sdata)
        sstream = sc.compress(sdata)
        sout = sc.decompress(sstream, out_ints=len(sdata))
        schecks[f"enc_{sname}"] = bool(np.array_equal(sstream, sref))
        schecks[f"dec_{sname}"] = bool(np.array_equal(sout, sdata))
    record("sharded_1dev_mesh", schecks)

    # ---- summary --------------------------------------------------------
    n_cases = len(report["cases"])
    report["summary"] = {
        "total_cases": n_cases,
        "failed": fails,
        "elapsed_s": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"{n_cases - fails}/{n_cases} differential cases bit-exact "
        f"({report['summary']['elapsed_s']} s) -> {args.out}",
        flush=True,
    )
    if fails:
        sys.exit(1)
    print("DIFFERENTIAL OK", flush=True)


if __name__ == "__main__":
    main()
