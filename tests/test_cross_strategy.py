"""Cross-strategy fuzz: all execution strategies must agree on random
graphs (the reference's multiple-independent-implementations discipline,
wrapper.py:148-485, applied as a seed sweep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import (
    block_graph,
    from_coo,
    remove_duplicate_edges,
)
from custom_op_benchmark_tpu.graph.tiled import tile_graph
from custom_op_benchmark_tpu.ops import (
    edge_softmax,
    ell_dual,
    ell_sddmm,
    ell_softmax,
    ell_spmm,
    sddmm,
    vector_spmm,
)
from custom_op_benchmark_tpu.ops.tiled import tiled_sddmm, tiled_spmm


@pytest.mark.parametrize("seed", range(5))
def test_all_strategies_agree(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 120))
    e = int(rng.integers(n, 6 * n))
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = remove_duplicate_edges(from_coo(src, dst, n_nodes=n))
    e = g.n_edges
    d = int(rng.choice([4, 8, 16]))

    A = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ed = jnp.asarray(
        rng.uniform(size=g.num_edges_padded).astype(np.float32))

    se, de = ell_dual(g)
    tg = tile_graph(g, 16, 16)
    bg = block_graph(g, max_block=n)   # one big block is always legal

    with jax.default_matmul_precision("highest"):
        # SDDMM
        s_ref = sddmm(g, A, B)
        np.testing.assert_allclose(
            np.asarray(ell_sddmm(se, de, A, B))[:e],
            np.asarray(s_ref)[:e], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(tg.gather_edges(tiled_sddmm(tg, A, B)))[:e],
            np.asarray(s_ref)[:e], rtol=1e-4, atol=1e-4)

        # softmax both directions
        for by, ell in (("src", se), ("dst", de)):
            np.testing.assert_allclose(
                np.asarray(ell_softmax(ell, s_ref))[:e],
                np.asarray(edge_softmax(g, s_ref, by=by))[:e],
                rtol=1e-4, atol=1e-4)

        # SpMM
        y_ref = vector_spmm(g, ed, A)
        np.testing.assert_allclose(
            np.asarray(ell_spmm(se, de, ed, A)),
            np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        vals = tg.scatter_edges(ed)[: tg.num_tiles]
        np.testing.assert_allclose(
            np.asarray(tiled_spmm(tg, vals, A)),
            np.asarray(y_ref), rtol=1e-4, atol=1e-4)
        if bg is not None:
            from custom_op_benchmark_tpu.ops import block_spmm

            y_blk = bg.gather_nodes(block_spmm(
                bg, bg.scatter_edges(ed), bg.scatter_nodes(A)))
            np.testing.assert_allclose(
                np.asarray(y_blk), np.asarray(y_ref),
                rtol=1e-4, atol=1e-4)
