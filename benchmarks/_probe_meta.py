"""One-off probe: isolate the stitch per-row meta cost across the
SMEM/VMEM meta layouts (stitch2.SMEM_META_MAX_ROWS boundary) by timing
the full encode and the tiles kernel alone at nb = 2^17 (SMEM meta) and
nb = 2^18 (VMEM meta). Data is generated on device (a 1 GB host
transfer through the tunnel costs minutes)."""
from __future__ import annotations

import numpy as np


def gen(nb, k=4):
    import jax
    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_INTS

    n = nb * BLOCK_INTS

    @jax.jit
    def g(key):
        def body(i, acc):
            return acc & jax.random.bits(
                jax.random.fold_in(key, i), (n,), jnp.uint32
            )

        return jax.lax.fori_loop(
            1, k, body, jax.random.bits(key, (n,), jnp.uint32)
        )

    x = g(jax.random.PRNGKey(7))
    x.block_until_ready()
    return x


def main() -> None:
    import argparse

    import jax.numpy as jnp

    from wah_tpu.constants import BLOCK_INTS
    from wah_tpu.golden import chunk_count
    from wah_tpu.ops.pallas import encode_kernel
    from wah_tpu.utils.profiling import amortized_seconds

    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, nargs="+",
                    default=[131072, 262144])
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    for nb in args.nb:
        x = gen(nb, args.k)
        nbytes = nb * BLOCK_INTS * 4
        nv = np.int32(chunk_count(nb * BLOCK_INTS))

        def enc_step(p, ints, nvv):
            w, t = encode_kernel.encode_padded(ints, nvv - p, stitch="v3")
            return t + w[1].astype(jnp.int32)

        def tiles_step(p, ints, nvv):
            st, cnt = encode_kernel.encode_tiles(
                ints.reshape(nb, BLOCK_INTS),
                jnp.stack([nvv - p, jnp.int32(0)]),
            )
            return cnt[0, 0] + st[0, 0].astype(jnp.int32)

        s_t = amortized_seconds(tiles_step, x, nv)
        s_e = amortized_seconds(enc_step, x, nv)
        print(
            f"nb={nb}: enc2 {s_e*1e3:8.3f} ms ({nbytes/s_e/1e9:6.2f} GB/s)"
            f"  tiles {s_t*1e3:8.3f} ms  stitch+scan "
            f"{(s_e-s_t)*1e3:8.3f} ms ({(s_e-s_t)/nb*1e9:6.1f} ns/row)",
            flush=True,
        )
        del x


if __name__ == "__main__":
    main()
