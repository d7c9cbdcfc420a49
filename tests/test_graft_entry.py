"""Driver-contract regression: entry() compiles and runs; the
multi-chip dry run executes the full sharded pipeline bit-exactly on
the virtual CPU mesh (conftest provides 8 devices)."""
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as graft  # noqa: E402

from wah_tpu import golden  # noqa: E402
from wah_tpu.constants import BLOCK_INTS  # noqa: E402


def test_entry_compiles_and_matches_golden():
    fn, args = graft.entry()
    words, total = jax.jit(fn)(*args)
    ints = np.asarray(args[0], dtype=np.uint32)[: 8 * BLOCK_INTS]
    ref = golden.encode(ints)
    assert int(total) == len(ref)
    np.testing.assert_array_equal(np.asarray(words)[: int(total)], ref)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)  # asserts bit-exactness internally
