"""Test configuration: run on CPU with 8 virtual devices for mesh tests.

Must run before the first `import jax` anywhere in the test session.
Real-TPU tests opt out via the `tpu` marker and are skipped unless a TPU
is actually available (they re-check at runtime).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The execution environment may force JAX_PLATFORMS (e.g. a TPU tunnel
# platform) via a sitecustomize that imports jax before this file runs;
# the config knob still wins as long as no backend has been initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


def random_bitmap(n_ints: int, density: float, seed: int = 1337) -> np.ndarray:
    """Bernoulli random bitmap: P(bit set) = density (reference: tests.cpp:42-64)."""
    g = np.random.default_rng(seed)
    bits = g.random((n_ints, 32)) < density
    return np.packbits(bits, axis=1, bitorder="little").view(np.uint32).reshape(-1)


def clustered_bitmap(n_ints: int, seed: int = 1337, a: float = 1.5) -> np.ndarray:
    """Zipfian clustered-run bitmap: alternating 0/1 runs with heavy-tailed
    lengths, stressing fill merges across warp and block seams."""
    g = np.random.default_rng(seed)
    total_bits = n_ints * 32
    runs = []
    acc = 0
    val = 0
    while acc < total_bits:
        ln = min(int(g.zipf(a)) * 31, total_bits - acc)
        ln = max(ln, 1)
        runs.append((val, ln))
        acc += ln
        val ^= 1
    bits = np.concatenate([np.full(ln, v, dtype=np.uint8) for v, ln in runs])
    return np.packbits(bits, bitorder="little").view(np.uint32).reshape(-1)
