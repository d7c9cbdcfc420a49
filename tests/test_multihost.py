"""Multi-host helper tests (single-process: the bring-up is a no-op,
the mesh/data-placement helpers are exercised on the virtual CPU mesh)."""
import jax
import numpy as np

from wah_tpu import golden
from wah_tpu.constants import BLOCK_INTS
from wah_tpu.golden import chunk_count
from wah_tpu.parallel import encode_sharded, gather_stream, multihost


def test_initialize_single_process_noop():
    multihost.initialize(num_processes=1)  # must not raise or distribute
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == ("blocks",)


def test_host_shard_bitmap_roundtrip():
    mesh = multihost.global_mesh()
    nb = mesh.size * 2
    data = (
        np.random.default_rng(3).random(nb * BLOCK_INTS) < 0.1
    ).astype(np.uint32)
    arr = multihost.host_shard_bitmap(mesh, data)
    assert arr.shape == data.shape
    np.testing.assert_array_equal(np.asarray(arr), data)
    # placed array feeds the sharded encoder directly
    words, totals = encode_sharded(mesh, arr, chunk_count(len(data)))
    np.testing.assert_array_equal(
        gather_stream(words, totals), golden.encode(data)
    )
