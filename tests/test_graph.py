"""Graph container / preprocessing tests (framework L6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import assert_allclose, assert_array_equal

from custom_op_benchmark_tpu.graph import (
    Graph,
    from_coo,
    clique_batch,
    random_graph,
    grid_graph,
    partition_csr,
)
from custom_op_benchmark_tpu.graph.partition import (
    edge_block_rows,
    edge_partition,
)
from custom_op_benchmark_tpu.graph.tiled import tile_graph


def naive_csr(src, dst, n):
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    for u in s:
        indptr[u + 1] += 1
    return s, d, np.cumsum(indptr)


def test_from_coo_canonical_order():
    rng = np.random.default_rng(0)
    n, e = 17, 60
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = from_coo(src, dst, n)
    s, d, indptr = naive_csr(src, dst, n)
    assert_array_equal(g.src, s)
    assert_array_equal(g.dst, d)
    assert_array_equal(np.asarray(g.indptr_r)[: n + 1], indptr)
    assert np.asarray(g.indptr_r)[-1] == e
    # CSC view is sorted by dst and permutes back consistently.
    dst_csc = np.asarray(g.dst_csc)
    assert np.all(np.diff(dst_csc) >= 0)
    assert_array_equal(
        np.asarray(g.csc_perm)[np.asarray(g.csc_perm_inv)], np.arange(e)
    )
    # Edge set preserved.
    got = sorted(zip(np.asarray(g.src).tolist(), np.asarray(g.dst).tolist()))
    want = sorted(zip(src.tolist(), dst.tolist()))
    assert got == want


def test_padding():
    g = from_coo([0, 1, 2], [1, 2, 0], 3, pad_multiple=8)
    assert g.num_edges_padded == 8
    assert g.n_edges == 3
    assert np.all(np.asarray(g.src)[3:] == 3)
    assert np.all(np.asarray(g.dst_csc)[3:] == 3)
    assert_array_equal(
        np.asarray(g.edge_mask), [True] * 3 + [False] * 5
    )
    # indptr includes the dummy padding segment.
    assert np.asarray(g.indptr_r)[-1] == 8
    assert np.asarray(g.indptr_r)[3] == 3


def test_reverse_is_transpose():
    rng = np.random.default_rng(1)
    n, e = 11, 40
    g = from_coo(rng.integers(0, n, e), rng.integers(0, n, e), n,
                 pad_multiple=16)
    r = g.reverse()
    # Reverse canonical order = CSC order of g with endpoints swapped.
    assert_array_equal(np.asarray(r.src), np.asarray(g.dst_csc))
    assert_array_equal(np.asarray(r.dst), np.asarray(g.src_csc))
    # Reverse must itself be canonically sorted by src.
    assert np.all(np.diff(np.asarray(r.src)) >= 0)
    # Double reverse restores the original edge arrays.
    rr = r.reverse()
    assert_array_equal(np.asarray(rr.src), np.asarray(g.src))
    assert_array_equal(np.asarray(rr.dst), np.asarray(g.dst))
    assert_array_equal(
        np.asarray(rr.indptr_r), np.asarray(g.indptr_r)
    )


def test_clique_batch_counts():
    g = clique_batch(4, 5)
    assert g.n_nodes == 20
    assert g.n_edges == 100
    deg = np.asarray(g.out_degrees())
    assert np.all(deg == 5)
    # Canonical order equals the reference's insertion order
    # (wrapper.py:93-101): row-major within blocks.
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    assert src[0] == 0 and dst[0] == 0 and dst[4] == 4
    assert src[5] == 1 and dst[5] == 0


def test_partition_csr_matches_reference_contract():
    # Hand example in the reference's own smoke test (part_csr.py:29-32):
    # indptr [0,3,10,12] with chunk 3 -> rows [0,1,1,1,2],
    # chunk ptr [0,3,6,9,10,12].
    row, ptr = partition_csr(np.array([0, 3, 10, 12]), 3)
    assert_array_equal(row, [0, 1, 1, 1, 2])
    assert_array_equal(ptr, [0, 3, 6, 9, 10, 12])
    # Property check on random CSR.
    rng = np.random.default_rng(2)
    deg = rng.integers(0, 50, 33)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    row, ptr = partition_csr(indptr, 8)
    assert ptr[0] == 0 and ptr[-1] == indptr[-1]
    sizes = np.diff(ptr)
    assert np.all(sizes >= 1) and np.all(sizes <= 8)
    # Chunks of row r exactly tile indptr[r]:indptr[r+1].
    for r in range(33):
        c = ptr[:-1][row == r], ptr[1:][row == r]
        if deg[r] == 0:
            assert len(c[0]) == 0
        else:
            assert c[0][0] == indptr[r] and c[1][-1] == indptr[r + 1]


def test_edge_block_rows():
    indptr = np.array([0, 3, 3, 10, 12])
    bfr = edge_block_rows(indptr, 4)
    # blocks at edge offsets 0,4,8,12
    assert_array_equal(bfr, [0, 2, 2, 3])


def test_edge_partition_covers_all_edges():
    g = random_graph(50, 333, seed=3)
    part = edge_partition(g, 4)
    eids = np.asarray(part.eid)
    real = eids[eids < g.n_edges]
    assert sorted(real.tolist()) == list(range(g.n_edges))
    assert part.src.shape == (4, part.edges_per_part)
    # Padded slots point at the dummy node.
    assert np.all(part.src[eids >= g.n_edges] == g.n_nodes)


def test_tiled_graph_roundtrip():
    g = clique_batch(3, 10, pad_multiple=64)
    tg = tile_graph(g, tile_r=8, tile_c=8)
    assert tg.n_rows_padded >= g.n_nodes
    # Mask has exactly n_edges set bits.
    assert int(np.asarray(tg.mask).sum()) == g.n_edges
    # scatter -> gather is the identity on real edges.
    vals = jnp.arange(g.num_edges_padded, dtype=jnp.float32) + 1.0
    tiles = tg.scatter_edges(vals)
    assert tiles.shape[0] == tg.num_tiles + 1
    back = tg.gather_edges(tiles[: tg.num_tiles])
    assert_allclose(
        np.asarray(back)[: g.n_edges], np.asarray(vals)[: g.n_edges]
    )
    # tile_ptr is a valid CSR over row blocks.
    ptr = np.asarray(tg.tile_ptr)
    assert ptr[-1] == tg.num_tiles
    rows = np.asarray(tg.tile_rows)
    assert np.all(np.diff(rows) >= 0)


def test_graph_is_pytree():
    g = clique_batch(2, 3)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(hasattr(l, "dtype") for l in leaves)

    @jax.jit
    def f(g, x):
        return x[jnp.minimum(g.src, x.shape[0] - 1)].sum()

    out = f(g, jnp.ones((g.n_nodes, 4)))
    assert out.shape == ()


def test_add_self_loops_and_dedup():
    from custom_op_benchmark_tpu.graph import (
        add_self_loops, from_coo, remove_duplicate_edges,
    )

    # 0->1 twice, loop on 2 already present.
    g = from_coo(np.array([0, 0, 2]), np.array([1, 1, 2]), n_nodes=3)
    g2 = add_self_loops(g)
    src = np.asarray(g2.src)[: g2.n_edges]
    dst = np.asarray(g2.dst)[: g2.n_edges]
    loops = set(src[src == dst].tolist())
    assert loops == {0, 1, 2}
    assert g2.n_edges == 3 + 2  # added loops for 0 and 1 only

    g3 = remove_duplicate_edges(g)
    assert g3.n_edges == 2      # (0,1) collapsed, (2,2) kept
