"""Scaling-efficiency model inputs (BASELINE: ">= 80% efficiency from
1 chip to N >= 2 hosts") — every 1-chip-measurable term of the N-chip
projection, recorded so DESIGN.md can state the formula and a pod run
can falsify it later. This rig has ONE chip: what IS measurable is the
shard-path overhead (shard_map + axis_index + chunk-base arithmetic +
the (D,) totals all_gather at D=1), the stitch_global assembly cost,
the all_gather payload sizes, and the D-scaling SHAPE of the collective
graph on an 8-virtual-device CPU mesh (ratios transfer; absolute CPU
times do not).

Usage:
  timeout 580 python -u -m benchmarks.scaling_model            # TPU terms
  JAX_PLATFORMS=cpu python -m benchmarks.scaling_model --backend cpu
Writes/merges benchmarks/scaling_model.json (keyed by backend).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "scaling_model.json")


def _merge(key: str, payload: dict) -> None:
    blob = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            blob = json.load(f)
    blob[key] = payload
    with open(OUT, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps({key: payload}))


def tpu_terms() -> None:
    import jax
    import jax.numpy as jnp

    from wah_tpu.api import WahCodec
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import decode_kernel, encode_kernel
    from wah_tpu.parallel import dist
    from wah_tpu.utils.profiling import amortized_seconds

    from .report import generate_random_data

    nb = 32768  # 130 MB, the headline config
    n = nb * BLOCK_INTS
    data = generate_random_data(n, 16)
    nv = np.int32(chunk_count(n))
    hint = WahCodec._stitch_hint(data)
    dev = jax.device_put(data)
    mesh = dist.make_mesh(jax.devices()[:1])

    # A. plain fused encode vs the 1-device-mesh sharded path
    def enc_plain(p, x, nvv):
        words, total = encode_kernel.encode_padded(x, nvv - p, stitch=hint)
        return total + words[1].astype(jnp.int32)

    def enc_shard(p, x, nvv):
        words, totals = dist.encode_sharded(mesh, x, nvv - p, stitch=hint)
        return totals[0] + words[1].astype(jnp.int32)

    t_plain = amortized_seconds(enc_plain, dev, nv, iters=5)
    t_shard = amortized_seconds(enc_shard, dev, nv, iters=5)

    # B. stitch_global assembly at D=1 + payload sizes vs density
    codec = WahCodec()
    stream, _ = codec.compress(data)
    words_j, totals_j = jax.jit(
        partial(dist.encode_sharded, mesh, stitch=hint)
    )(dev, nv)

    def stitch_step(p, w, t):
        # the returned checksum must read the WHOLE stream: a 1-element
        # read lets XLA dead-code-eliminate the assembly (measured 2 us
        # at D=1, where the landing offsets are p-invariant). Even so,
        # the loop-invariant update-slice copy can be hoisted — this
        # measures the mask+read passes; DESIGN.md adds the copy
        # analytically (2 HBM passes of the padded capacity).
        s, tot, _ = dist.stitch_global(mesh, w, t - p)
        return tot + jnp.sum(s.astype(jnp.int32), dtype=jnp.int32)

    t_stitch = amortized_seconds(stitch_step, words_j, totals_j, iters=5)

    # payload per chip with the word_cap bound: exact totals give
    # stitch_word_cap (ratio-proportional); estimate_word_cap is the
    # no-sync sample bound actually usable inside a fused pipeline
    payloads = {}
    for i in (1, 4, 8):
        d = generate_random_data(n, 1 << i)
        s, _ = codec.compress(d)
        cap_exact = dist.stitch_word_cap(
            np.array([s.shape[0]])
        )  # 1-shard totals = full stream
        cap_est = dist.estimate_word_cap(d, nb)
        payloads[f"2^-{i}"] = {
            "compressed_bytes": int(s.nbytes),
            "capacity_bytes": int(nb * 1024 * 4),
            "allgather_bytes_per_chip_exact_cap": int(cap_exact * 4),
            "allgather_bytes_per_chip_estimate_cap": int(cap_est * 4),
            "ratio": round(s.shape[0] / n, 4),
        }

    # C. plain fused decode vs the sharded span decode (same mesh)
    m = np.int32(stream.shape[0])
    cap = nb * BLOCK_CHUNKS
    # pow2 bucket = the API's own padding policy (api._next_pow2). A
    # plain 1024-rounded M is 2.5x SLOWER (14.6 vs 5.9 ms measured at
    # this config): the fused prescan's dense (R//128, 128) metadata
    # regroup degrades when the word-row count R isn't 128-aligned.
    Mp = 1 << (int(m) - 1).bit_length()
    wpad = np.zeros(Mp, np.uint32)
    wpad[: int(m)] = stream
    wdev = jax.device_put(wpad)

    def dec_plain(p, w, mm):
        ints, nc = decode_kernel.decode(w, mm - p, cap)
        return nc + ints[1].astype(jnp.int32)

    def dec_shard(p, w, mm):
        ints, nc = dist.decode_sharded(mesh, w, mm - p, cap)
        return nc[0] + ints[1].astype(jnp.int32)

    t_dplain = amortized_seconds(dec_plain, wdev, m, iters=5)
    t_dshard = amortized_seconds(dec_shard, wdev, m, iters=5)

    _merge(
        "tpu_v5e_1chip",
        {
            "config": "32768 blocks (130 MB), density 2^-4, seed 1337",
            "encode_plain_ms": round(t_plain * 1e3, 3),
            "encode_sharded_D1_ms": round(t_shard * 1e3, 3),
            "encode_shard_overhead_ms": round((t_shard - t_plain) * 1e3, 3),
            "decode_plain_ms": round(t_dplain * 1e3, 3),
            "decode_sharded_D1_ms": round(t_dshard * 1e3, 3),
            "decode_shard_overhead_ms": round((t_dshard - t_dplain) * 1e3, 3),
            "stitch_global_D1_ms": round(t_stitch * 1e3, 3),
            "stitch_payloads": payloads,
        },
    )


def cpu_shape(max_d: int = 8, every_n: int = 16) -> None:
    import jax

    jax.config.update("jax_num_cpu_devices", max_d)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.parallel import dist

    from .report import generate_random_data

    def bench(fn, *args, reps: int = 5) -> float:
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {"weak": {}, "strong": {}}
    nb_shard = 64  # blocks per shard (weak); total for strong = 512
    nb_strong = 512
    for D in (1, 2, 4, 8):
        mesh = dist.make_mesh(jax.devices()[:D])
        for mode, nb in (("weak", nb_shard * D), ("strong", nb_strong)):
            n = nb * BLOCK_INTS
            data = generate_random_data(n, every_n)
            nv = np.int32(chunk_count(n))
            dev = jax.device_put(
                data,
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(dist.AXIS)
                ),
            )
            enc = jax.jit(partial(dist.encode_sharded, mesh))
            words, totals = enc(dev, nv)
            t_enc = bench(enc, dev, nv)
            # bounded stitch: exact word_cap from the (tiny) totals —
            # the pod-realistic configuration (payload ~ compressed size)
            cap_w = dist.stitch_word_cap(totals)
            st = jax.jit(partial(dist.stitch_global, mesh, word_cap=cap_w))
            t_st = bench(st, words, totals)
            stream, total, ovf = st(words, totals)
            assert not bool(np.asarray(ovf))
            # unbounded variant for comparison (the round-4 behavior)
            st_full = jax.jit(partial(dist.stitch_global, mesh))
            t_st_full = bench(st_full, words, totals)
            cap = nb * BLOCK_CHUNKS
            dec = jax.jit(partial(dist.decode_sharded, mesh, chunk_capacity=cap))
            t_dec = bench(dec, stream, np.int32(int(total)))
            results[mode][f"D={D}"] = {
                "blocks": nb,
                "encode_ms": round(t_enc * 1e3, 2),
                "stitch_global_ms": round(t_st * 1e3, 2),
                "stitch_global_fullcap_ms": round(t_st_full * 1e3, 2),
                "stitch_word_cap": int(cap_w),
                "stitch_capacity_l": int(words.shape[0] // D),
                "decode_ms": round(t_dec * 1e3, 2),
            }
    key = "cpu_mesh_shape" if every_n == 16 else f"cpu_mesh_shape_2^-{every_n.bit_length() - 1}"
    _merge(key, results)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--every-n", type=int, default=16,
                   help="density 1/every_n for the CPU-mesh shape run "
                        "(256 = the 2^-8 regime where the word_cap "
                        "bound shrinks the payload ~4.5x)")
    args = p.parse_args(argv)
    if args.backend == "cpu":
        cpu_shape(every_n=args.every_n)
    else:
        tpu_terms()


if __name__ == "__main__":
    main()
