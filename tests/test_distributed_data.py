"""Multi-host data loading path (single-process exercise of the same
code that runs per-host under jax.distributed)."""

import numpy as np
import pytest

from custom_op_benchmark_tpu.data.distributed import (
    memmap_rows,
    padded_rows,
    process_row_range,
    sharded_node_array,
)
from custom_op_benchmark_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("edge",))


def test_process_row_range_covers_all(mesh):
    n = 1000
    lo, hi = process_row_range(n, mesh)
    assert (lo, hi) == (0, padded_rows(n, mesh, "edge"))  # 1 process


def test_sharded_node_array_from_loader(mesh):
    n, d = 1000, 16
    full = np.arange(n * d, dtype=np.float32).reshape(n, d)
    calls = []

    def loader(lo, hi):
        calls.append((lo, hi))
        return full[lo:hi]

    arr = sharded_node_array(loader, n, (d,), mesh)
    n_pad = padded_rows(n, mesh, "edge")
    assert arr.shape == (n_pad, d)
    # Sharded over the axis, one shard per device.
    assert len(arr.sharding.device_set) == 8
    got = np.asarray(arr)
    np.testing.assert_array_equal(got[:n], full)
    assert (got[n:] == 0).all()                      # padding rows
    assert calls == [(0, n)]                         # loader asked once


def test_process_row_range_2d_mesh():
    """Shard index must come from the device's COORDINATE along the
    axis, not its flat position — on a ('edge','head') mesh the flat
    position over-counts by the head-axis size (advisor round-2 finding:
    hi became n_heads*n_pad and sharded_node_array built an oversized
    local buffer)."""
    mesh2 = make_mesh((4, 2), ("edge", "head"))
    n = 100
    n_pad = padded_rows(n, mesh2, "edge")
    lo, hi = process_row_range(n, mesh2, "edge")
    assert (lo, hi) == (0, n_pad)   # single process owns every shard

    full = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
    arr = sharded_node_array(lambda a, b: full[a:b], n, (4,), mesh2)
    assert arr.shape == (n_pad, 4)
    np.testing.assert_array_equal(np.asarray(arr)[:n], full)


def test_memmap_loader_roundtrip(tmp_path, mesh):
    n, d = 256, 8
    full = np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)
    path = str(tmp_path / "feats.npy")
    np.save(path, full)
    arr = sharded_node_array(memmap_rows(path), n, (d,), mesh)
    np.testing.assert_allclose(np.asarray(arr)[:n], full, rtol=1e-7)
