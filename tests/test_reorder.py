"""Tests for tile-aligned node reordering (graph/reorder.py).

Differential discipline (SURVEY.md §4): ops on the reordered graph must
match ops on the original graph exactly up to the node/edge permutations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import (
    clique_batch,
    connected_components,
    random_graph,
    reorder_graph,
    tile_aligned_order,
)
from custom_op_benchmark_tpu.graph.tiled import tile_graph
from custom_op_benchmark_tpu.ops import sddmm, vector_spmm
from custom_op_benchmark_tpu.ops.tiled import tiled_spmm


def test_connected_components_cliques():
    g = clique_batch(5, 4)
    labels = connected_components(
        np.asarray(g.src)[: g.n_edges], np.asarray(g.dst)[: g.n_edges], 20
    )
    # 5 components of 4 nodes each; labels constant within a clique.
    assert len(np.unique(labels)) == 5
    for c in range(5):
        assert len(np.unique(labels[c * 4: (c + 1) * 4])) == 1


def test_aligned_order_no_straddle():
    g = clique_batch(13, 30)  # 30-node cliques, block 128
    ro = tile_aligned_order(g, block=128)
    labels = connected_components(
        np.asarray(g.src)[: g.n_edges], np.asarray(g.dst)[: g.n_edges],
        g.n_nodes,
    )
    # Every component must land inside one 128-block.
    for lab in np.unique(labels):
        new_ids = ro.perm[labels == lab]
        assert new_ids.min() // 128 == new_ids.max() // 128
    # perm is injective.
    assert len(np.unique(ro.perm)) == g.n_nodes
    assert ro.n_new % 128 == 0


def test_aligned_tiling_is_diagonal():
    g = clique_batch(16, 30)
    ro = tile_aligned_order(g, block=128)
    g2, _ = reorder_graph(g, ro)
    tg = tile_graph(g2, 128, 128)
    assert tg.num_tiles == tg.num_row_blocks          # purely diagonal
    assert bool(np.all(np.asarray(tg.tile_rows) == np.asarray(tg.tile_cols)))


@pytest.mark.parametrize("seed", [0, 1])
def test_reordered_ops_match(seed):
    rng = np.random.default_rng(seed)
    g = random_graph(60, 400, seed=seed)
    ro = tile_aligned_order(g, block=16)
    g2, eperm = reorder_graph(g, ro)
    assert g2.n_edges == g.n_edges

    d = 8
    x = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    edata = jnp.asarray(rng.uniform(size=g.n_edges).astype(np.float32))

    y = vector_spmm(g, edata, x)
    x2 = ro.scatter_nodes(x)
    y2 = vector_spmm(g2, edata[jnp.asarray(eperm)], x2)
    np.testing.assert_allclose(
        np.asarray(ro.gather_nodes(y2)), np.asarray(y), rtol=1e-5, atol=1e-5
    )

    A = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    s = sddmm(g, A, B)
    s2 = sddmm(g2, ro.scatter_nodes(A), ro.scatter_nodes(B))
    # New canonical edge k is old edge eperm[k].
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s)[np.asarray(eperm)],
        rtol=1e-5, atol=1e-5,
    )


def test_reordered_tiled_spmm_matches_xla():
    g = clique_batch(6, 30)
    ro = tile_aligned_order(g, block=128)
    g2, eperm = reorder_graph(g, ro)
    tg = tile_graph(g2, 128, 128)
    rng = np.random.default_rng(0)
    d = 128
    x = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    edata = jnp.asarray(rng.uniform(size=g.n_edges).astype(np.float32))

    y_ref = vector_spmm(g, edata, x)
    ed2 = edata[jnp.asarray(eperm)]
    vals = tg.scatter_edges(ed2)[: tg.num_tiles]
    y2 = tiled_spmm(tg, vals, ro.scatter_nodes(x))
    np.testing.assert_allclose(
        np.asarray(ro.gather_nodes(y2)), np.asarray(y_ref),
        rtol=1e-4, atol=1e-4,
    )


def test_degree_balanced_order_cuts_waste():
    """Serpentine degree striping must equalize the halo plan's
    shared-shape packings across shards: per-shard pack_slots at P=8 on
    a power-law graph should sit near (within 15% of) the P=1 slots / 8,
    and beat the same graph's unbalanced (identity-order) plan. Ops on
    the reordered graph still match the oracle (pure relabel)."""
    from custom_op_benchmark_tpu.graph import degree_balanced_order
    from custom_op_benchmark_tpu.parallel.halo import plan_stats

    g = random_graph(2048, 40_000, seed=0, power_law=True)
    p = 8

    def stats(gr):
        src = np.asarray(jax.device_get(gr.src))[: gr.n_edges]
        dst = np.asarray(jax.device_get(gr.dst))[: gr.n_edges]
        return plan_stats(src, dst, gr.n_nodes, gr.n_edges, p,
                          -(-gr.n_nodes // p), gr.num_edges_padded)

    ro = degree_balanced_order(g, p)
    assert len(np.unique(np.asarray(ro.perm))) == g.n_nodes
    g2, _ = reorder_graph(g, ro)

    base = plan_stats(
        np.asarray(jax.device_get(g.src))[: g.n_edges],
        np.asarray(jax.device_get(g.dst))[: g.n_edges],
        g.n_nodes, g.n_edges, 1, g.n_nodes, g.num_edges_padded,
    ).pack_slots
    waste_id = stats(g).pack_slots * p / base
    waste_bal = stats(g2).pack_slots * p / base
    assert waste_bal < waste_id, (waste_bal, waste_id)
    assert waste_bal < 1.5, waste_bal

    # Pure relabel: SpMM on the reordered graph matches the original.
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.n_nodes, 4)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)
    y_ref = vector_spmm(g.reverse(), jnp.asarray(ed)[g.csc_perm],
                        jnp.asarray(x))
    g2b, eperm = reorder_graph(g, ro)
    ed2 = jnp.asarray(ed)[eperm]
    y2 = vector_spmm(g2b.reverse(), ed2[g2b.csc_perm],
                     ro.scatter_nodes(jnp.asarray(x)))
    np.testing.assert_allclose(
        np.asarray(ro.gather_nodes(y2)), np.asarray(y_ref),
        rtol=1e-4, atol=1e-4,
    )
