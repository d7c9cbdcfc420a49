import numpy as np, jax, jax.numpy as jnp
from wah_tpu.constants import BLOCK_INTS, BLOCK_CHUNKS
from wah_tpu.golden import chunk_count
from wah_tpu.ops.pallas import decode_kernel, encode_kernel
from wah_tpu.utils.profiling import amortized_seconds

C, nb = 256, 2048
n = nb * BLOCK_INTS; nv = np.int32(chunk_count(n))
@jax.jit
def gen(key):
    def body(i, acc):
        return acc & jax.random.bits(jax.random.fold_in(key, i), (C * nb, BLOCK_INTS), jnp.uint32)
    return jax.lax.fori_loop(1, 4, body, jax.random.bits(key, (C * nb, BLOCK_INTS), jnp.uint32))
rows = gen(jax.random.PRNGKey(1337))
words_flat, totals = jax.jit(lambda r, nvv: encode_kernel.encode_rows_batch(r, C, nvv))(rows, nv)
jax.block_until_ready((words_flat, totals)); del rows
cap = nb * BLOCK_CHUNKS
B = decode_kernel.TILE_BLOCKS
Mcap = words_flat.shape[0] // C
gpc = Mcap // 128
rows_needed = C * gpc + (B + 4) * 8

def ps(p, wf, t):
    ms = (t - p).astype(jnp.int32)
    rel = 128 * jnp.arange(gpc, dtype=jnp.int32)
    vc = jnp.clip(ms[:, None] - rel[None, :], 0, 128).reshape(-1)
    wt, gs = decode_kernel.prescan_words(wf, vc, rows_needed)
    return wt[1, 1].astype(jnp.int32) + gs[1]

s = amortized_seconds(ps, words_flat, totals, iters=5)
print(f"prescan_words: {s*1e3:.3f} ms", flush=True)
