"""Probe: where do batch-decode cycles go at 256x65 Mbit (2.1 GB)?
A = full decode_rows_batch; B = XLA prescan only (everything before
the pallas_call). A-B ~ kernel time. Compare against the single-stream
decode on the same bytes."""
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from wah_tpu.constants import BLOCK_INTS, BLOCK_CHUNKS, BIT31, LEN_MASK
from wah_tpu.golden import chunk_count
from wah_tpu.ops.pallas import decode_kernel, encode_kernel
from wah_tpu.ops.pallas.common import rebase_exclusive_per_col
from wah_tpu.utils.profiling import amortized_seconds

C, nb = 256, 2048
n = nb * BLOCK_INTS
nv = np.int32(chunk_count(n))
k = 4  # density 2^-4

@jax.jit
def gen(key):
    def body(i, acc):
        return acc & jax.random.bits(jax.random.fold_in(key, i), (C * nb, BLOCK_INTS), jnp.uint32)
    return jax.lax.fori_loop(1, k, body, jax.random.bits(key, (C * nb, BLOCK_INTS), jnp.uint32))

rows = gen(jax.random.PRNGKey(1337))
enc = jax.jit(lambda r, nvv: encode_kernel.encode_rows_batch(r, C, nvv))
words_flat, totals = enc(rows, nv)
jax.block_until_ready((words_flat, totals)); del rows
cap = nb * BLOCK_CHUNKS
nbytes = C * n * 4
L = 1024

def full(p, wf, t):
    flat = decode_kernel.decode_rows_batch(wf, C, t - p, col_chunk_capacity=cap)
    return flat[1].astype(jnp.int32) + flat[-1].astype(jnp.int32)

def prescan(p, wf, t):
    ms = (t - p).astype(jnp.int32)
    total = wf.shape[0]; Mcap = total // C
    B = decode_kernel.TILE_BLOCKS
    w2 = wf.reshape(C, Mcap)
    iw = jnp.arange(Mcap, dtype=jnp.int32)
    wvalid = iw[None, :] < ms[:, None]
    w2 = jnp.where(wvalid, w2, jnp.uint32(0))
    isf = (w2 & jnp.uint32(BIT31)) != 0
    cnt = jnp.where(isf, (w2 & jnp.uint32(LEN_MASK)).astype(jnp.int32), 1)
    cnt = jnp.where(wvalid, cnt, 0)
    gpc = Mcap // 128
    g_sums = jnp.sum(cnt.reshape(C * gpc, 128), axis=1, dtype=jnp.int32)
    g_base, col_totals = rebase_exclusive_per_col(g_sums, C, gpc, cap)
    nbo = cap // L; nsteps = C * nbo // B
    words_t = jnp.concatenate([w2.reshape(C * Mcap), jnp.zeros(((B + 4) * L,), jnp.uint32)]).reshape(-1, 128)
    step_bases = jnp.arange(nsteps, dtype=jnp.int32) * (B * L)
    rbase = jnp.clip(jnp.searchsorted(g_base, step_bases, side="right").astype(jnp.int32) - 1, 0, words_t.shape[0] - 8 * (B + 2))
    return (rbase[1] + g_base[1] + col_totals[0] + words_t[1, 1].astype(jnp.int32))

for name, fn in [("full", full), ("prescan", prescan)]:
    s = amortized_seconds(fn, words_flat, totals, iters=5)
    print(f"{name}: {s*1e3:.3f} ms  ({nbytes/s/1e9:.2f} GB/s-of-output)", flush=True)
