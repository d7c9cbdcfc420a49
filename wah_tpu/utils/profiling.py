"""Profiling helpers: device timeline traces + amortized kernel timing.

The reference measures kernels with cudaEvents (timeMeasuring.h:11-28).
The TPU equivalents here are (a) `trace(...)` — a jax.profiler context
writing a TensorBoard-loadable device timeline, and (b)
`amortized_seconds(...)` — per-call device time of a jitted function
measured as the marginal cost of extra in-device iterations, which
stays accurate when the host<->device link cost dominates a single
dispatch (see bench.py).
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "amortized_seconds"]


@contextmanager
def trace(logdir: str = "/tmp/wah_tpu_trace"):
    """Capture a device profile around a block: tensorboard --logdir=..."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def amortized_seconds(
    step: Callable[..., jax.Array],
    *args,
    iters: int = 5,
    reps: int = 3,
) -> float:
    """Marginal per-iteration device time of `step(perturb, *args)`.

    `step` takes a tiny int32 perturbation in {0, 1} (derived from the
    loop carry — thread it into some cheap input so XLA cannot hoist
    the body out of the loop) and returns a scalar that data-depends on
    all work of interest.
    """

    @partial(jax.jit, static_argnums=(0,))
    def loop(k, *a):
        def body(i, acc):
            p = (acc & 1).astype(jnp.int32)
            return acc + step(p, *a).astype(jnp.int64)

        return jax.lax.fori_loop(0, k, body, jnp.int64(0))

    def best(k):
        int(loop(k, *args))  # compile + warm; scalar fetch forces exec
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(loop(k, *args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Dispatch noise (worst over a network-tunneled PJRT link) can
    # exceed the marginal work of a small config, making the naive
    # two-point slope negative. Grow the loop until the extra
    # iterations dominate the single-dispatch baseline.
    b1 = best(1)
    k, bk = iters, best(iters)
    while bk < 2.0 * b1 and k < 1024:
        k *= 4
        bk = best(k)
    return max(bk - b1, 1e-12) / (k - 1)
