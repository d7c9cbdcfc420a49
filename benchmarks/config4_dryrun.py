"""BASELINE configs[4] at spec SIZE on the available hardware: a
64e9-bit (8 GB) bitmap sharded over an 8-device mesh, ordered gather,
bit-exact stitched output. The spec'd v5p-16 pod is not reachable from
this rig (one v5e chip): this runs the FULL distributed pipeline —
block-sharded encode, (D,) totals all_gather, ordered stream gather,
span-sharded decode — at the spec'd data size on an 8-virtual-device
CPU mesh. It validates the mechanism and the int32 position envelope
at 64e9 bits (2e9 ints, just under the 2^31-1 chunk cap), NOT pod
throughput; DESIGN.md carries the pod efficiency projection.

    python -u -m benchmarks.config4_dryrun          # ~tens of minutes
Writes benchmarks/config4_cpu_mesh.json.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "config4_cpu_mesh.json")
D = 8
BITS = 64_000_000_000


def main() -> None:
    import jax

    jax.config.update("jax_num_cpu_devices", D)
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wah_tpu import golden
    from wah_tpu.constants import BLOCK_CHUNKS, BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.parallel import dist

    from .report import generate_random_data

    n = BITS // 32  # 2e9 ints
    t0 = time.perf_counter()
    data = generate_random_data(n, 100)  # p = 0.01, configs[0] density
    t_gen = time.perf_counter() - t0

    nv = chunk_count(n)
    nb = -(-(-(-nv // BLOCK_CHUNKS)) // D) * D
    padded = np.zeros(nb * BLOCK_INTS, dtype=np.uint32)
    padded[:n] = data

    mesh = dist.make_mesh(jax.devices())
    t0 = time.perf_counter()
    dev = jax.device_put(padded, NamedSharding(mesh, P(dist.AXIS)))
    jax.block_until_ready(dev)
    t_put = time.perf_counter() - t0

    t0 = time.perf_counter()
    words, totals = dist.encode_sharded(mesh, dev, np.int32(nv))
    jax.block_until_ready((words, totals))
    t_enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    stream = dist.gather_stream(words, totals)
    t_gather = time.perf_counter() - t0

    # bit-exactness 1: stream prefix == golden encode of a block-aligned
    # prefix (fills never cross 1024-chunk block boundaries, so the
    # words of the first kb blocks are identical in both — exact, not
    # fuzzy)
    kb = 2048
    gk = golden.encode(padded[: kb * BLOCK_INTS])
    golden_ok = np.array_equal(stream[: len(gk)], gk)

    # bit-exactness 2: sharded decode of the gathered stream roundtrips
    cap = nb * BLOCK_CHUNKS
    Mp = -(-len(stream) // 1024) * 1024
    wpad = np.zeros(Mp, np.uint32)
    wpad[: len(stream)] = stream
    t0 = time.perf_counter()
    ints, _ = dist.decode_sharded(
        mesh, jax.device_put(wpad), np.int32(len(stream)), cap
    )
    jax.block_until_ready(ints)
    t_dec = time.perf_counter() - t0
    out_ints = dist.gather_bitmap(ints, n)
    rt_ok = np.array_equal(out_ints, data)

    res = {
        "metric": "config4_64e9bit_sharded_mesh_dryrun",
        "backend": "cpu-mesh-8dev (mechanism at spec size; pod perf is "
                   "projected in DESIGN.md)",
        "bits": BITS,
        "ints": n,
        "blocks": int(nb),
        "density": 0.01,
        "compressed_words": int(len(stream)),
        "ratio": round(len(stream) / n, 4),
        "golden_prefix_ok": bool(golden_ok),
        "roundtrip_ok": bool(rt_ok),
        "gen_s": round(t_gen, 1),
        "device_put_s": round(t_put, 1),
        "encode_s": round(t_enc, 1),
        "gather_s": round(t_gather, 1),
        "decode_s": round(t_dec, 1),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    assert golden_ok and rt_ok


if __name__ == "__main__":
    main()
