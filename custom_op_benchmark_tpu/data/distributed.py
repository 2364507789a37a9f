"""Multi-host data loading: per-process shards of node-indexed arrays.

papers100M-class feature matrices (100M × 128 f32 ≈ 51 GB) cannot be
materialized on one host and then sharded; each host must load ONLY the
rows its devices own and assemble the global sharded array from local
pieces. This module provides that path on top of
``jax.make_array_from_process_local_data``:

- :func:`process_row_range` — the contiguous global row range the
  calling process's addressable devices own under a 1-D row sharding;
- :func:`sharded_node_array` — build the global row-sharded array from
  a loader callback that reads just ``[lo, hi)`` (a numpy memmap slice,
  an npz chunk, a network fetch, ...);
- :func:`memmap_rows` — loader over an on-disk ``.npy`` via
  ``np.load(mmap_mode="r")``, so host RSS stays at the shard size.

Single-process meshes (including the 8-fake-device CPU test mesh) take
the same code path — the loader is called once for the full range —
so the multi-host story is continuously exercised by the test suite;
on a real multi-host slice, initialize ``jax.distributed`` first and
nothing else changes.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_rows(n_rows: int, mesh: Mesh, axis: str) -> int:
    """Global row count padded so the mesh axis divides it evenly."""
    return _round_up(n_rows, mesh.shape[axis])


def process_row_range(n_rows: int, mesh: Mesh,
                      axis: str = "edge") -> Tuple[int, int]:
    """[lo, hi) of PADDED global rows owned by this process's devices.

    Requires the process's addressable devices to be contiguous along
    ``axis`` (the layout ``make_mesh`` produces); raises otherwise so a
    mis-constructed mesh fails loudly instead of loading wrong rows.
    """
    n_pad = padded_rows(n_rows, mesh, axis)
    per = n_pad // mesh.shape[axis]
    # Shard index = the device's COORDINATE along ``axis`` in the mesh
    # array, not its position in the flattened device list — on a 2-D
    # mesh (e.g. ('edge','head')) the flat position over-counts by the
    # product of the other axes' sizes.
    axis_dim = list(mesh.axis_names).index(axis)
    devs = np.asarray(mesh.devices)
    mine = sorted({
        int(idx[axis_dim]) for idx, d in np.ndenumerate(devs)
        if d.process_index == jax.process_index()
    })
    if not mine:
        return 0, 0
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise ValueError(
            "process's devices are not contiguous along the mesh axis; "
            "build the mesh with make_mesh (device order = process order)"
        )
    return mine[0] * per, (mine[-1] + 1) * per


def sharded_node_array(load_rows: Callable[[int, int], np.ndarray],
                       n_rows: int, trailing_shape: Sequence[int],
                       mesh: Mesh, *, axis: str = "edge",
                       dtype=np.float32) -> jax.Array:
    """Assemble a global (n_pad, *trailing) array row-sharded over
    ``axis``, loading only this process's rows via ``load_rows(lo, hi)``
    (rows past ``n_rows`` are zero padding — the loader is never asked
    for them)."""
    n_pad = padded_rows(n_rows, mesh, axis)
    lo, hi = process_row_range(n_rows, mesh, axis)
    real_hi = min(hi, n_rows)
    local = np.zeros((hi - lo,) + tuple(trailing_shape), dtype)
    if real_hi > lo:
        local[: real_hi - lo] = load_rows(lo, real_hi)
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, local, (n_pad,) + tuple(trailing_shape)
    )


def memmap_rows(npy_path: str) -> Callable[[int, int], np.ndarray]:
    """Row loader over an on-disk .npy (no full materialization)."""
    arr = np.load(npy_path, mmap_mode="r")

    def load(lo: int, hi: int) -> np.ndarray:
        return np.asarray(arr[lo:hi])

    return load
