"""Native (C++) graphcore library vs numpy fallback parity."""

import numpy as np
import pytest

from tests.helpers import assert_array_equal

from custom_op_benchmark_tpu.graph import native, partition_csr


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libgraphcore.so not built"
)


def test_build_dual_csr_matches_numpy():
    rng = np.random.default_rng(0)
    n, e = 37, 500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    out = native.build_dual_csr(src, dst, n)
    src_c, dst_c, indptr_r, csc_perm, csc_perm_inv, indptr_c = out

    order = np.lexsort((dst, src))
    assert_array_equal(src_c, src[order])
    assert_array_equal(dst_c, dst[order])
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(src[order], minlength=n), out=indptr[1:])
    assert_array_equal(indptr_r[: n + 1], indptr)
    assert indptr_r[n + 1] == e
    # CSC is a stable sort of canonical by dst.
    perm_ref = np.argsort(dst_c, kind="stable")
    assert_array_equal(csc_perm, perm_ref)
    assert_array_equal(csc_perm[csc_perm_inv], np.arange(e))
    cptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst_c[csc_perm], minlength=n), out=cptr[1:])
    assert_array_equal(indptr_c[: n + 1], cptr)


def test_partition_csr_native_matches_python():
    rng = np.random.default_rng(1)
    deg = rng.integers(0, 40, 25)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    row_n, ptr_n = native.partition_csr_native(indptr, 8)
    row_p, ptr_p = partition_csr(indptr, 8)
    assert_array_equal(row_n, row_p)
    assert_array_equal(ptr_n, ptr_p)


def test_sample_in_edges_native():
    rng = np.random.default_rng(2)
    n, e = 40, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    from custom_op_benchmark_tpu.graph import from_coo
    import jax

    g = from_coo(src, dst, n)
    indptr_c = np.asarray(jax.device_get(g.indptr_c))[: n + 1]
    indices_c = np.asarray(jax.device_get(g.src_csc))
    seeds = np.arange(10, dtype=np.int32)
    s, d = native.sample_in_edges_native(
        indptr_c, indices_c, n, seeds, fanout=5, seed=7
    )
    # Fanout respected per seed.
    _, counts = np.unique(d, return_counts=True)
    assert counts.max() <= 5
    # Sampled edges exist in the graph.
    real = set(zip(src.tolist(), dst.tolist()))
    for u, v in zip(s.tolist(), d.tolist()):
        assert (u, v) in real
        assert v in set(seeds.tolist())
    # Deterministic given the seed.
    s2, d2 = native.sample_in_edges_native(
        indptr_c, indices_c, n, seeds, fanout=5, seed=7
    )
    assert_array_equal(s, s2)


def test_native_connected_components_matches_python():
    from custom_op_benchmark_tpu.graph import native
    from custom_op_benchmark_tpu.graph import reorder

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    n, e = 200, 600
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    lab_n = native.connected_components_native(src, dst, n)
    # Python reference (bypass the native fast path inside the helper).
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src, dst):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    lab_p = np.array([find(i) for i in range(n)])
    # Same partition (root choice may differ): compare via canonical map.
    import collections
    m1, m2 = {}, {}
    for a, b in zip(lab_n, lab_p):
        m1.setdefault(a, len(m1)); m2.setdefault(b, len(m2))
    assert [m1[a] for a in lab_n] == [m2[b] for b in lab_p]


def test_native_ell_pack_matches_numpy():
    """graphcore_ell_pack produces the exact same packing as the
    vectorized-numpy fallback (rows, cols, eids, inverse permutations)."""
    import jax

    from custom_op_benchmark_tpu.graph import random_graph
    from custom_op_benchmark_tpu.graph import native as _native
    from custom_op_benchmark_tpu.graph.ell import ell_pack

    if not (_native.available()
            and hasattr(_native._load(), "graphcore_ell_pack")):
        pytest.skip("native library unavailable")

    g = random_graph(500, 4000, seed=2, power_law=True)
    for direction in ("src", "dst"):
        eg_nat = ell_pack(g, direction=direction)       # native path
        # Force the numpy fallback by pointing the loader at nothing.
        lib_saved = _native._lib
        _native._lib = False
        try:
            eg_np = ell_pack(g, direction=direction)
        finally:
            _native._lib = lib_saved
        assert eg_nat.total_rows == eg_np.total_rows
        assert eg_nat.total_slots == eg_np.total_slots
        assert len(eg_nat.buckets) == len(eg_np.buckets)
        np.testing.assert_array_equal(np.asarray(eg_nat.row_pos),
                                      np.asarray(eg_np.row_pos))
        np.testing.assert_array_equal(np.asarray(eg_nat.edge_pos),
                                      np.asarray(eg_np.edge_pos))
        for a, b in zip(eg_nat.buckets, eg_np.buckets):
            assert a.width == b.width and a.num_rows == b.num_rows
            np.testing.assert_array_equal(np.asarray(a.rows),
                                          np.asarray(b.rows))
            np.testing.assert_array_equal(np.asarray(a.cols),
                                          np.asarray(b.cols))
            np.testing.assert_array_equal(np.asarray(a.eid),
                                          np.asarray(b.eid))
