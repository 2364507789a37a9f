"""Differential tests: dense-block ops vs the XLA segment oracle.

Reference discipline (SURVEY.md §4): the same math computed independent
ways must allclose on forward outputs AND gradients (wrapper.py:174-209).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import block_graph, clique_batch, from_coo
from custom_op_benchmark_tpu.ops import (
    block_attention,
    block_node_mul_edge,
    block_sddmm,
    block_softmax,
    block_spmm,
    edge_softmax,
    node_mul_edge,
    sddmm,
    vector_spmm,
)

RTOL, ATOL = 1e-4, 1e-4


@pytest.fixture(scope="module")
def setup():
    g = clique_batch(7, 9)
    bg = block_graph(g)
    assert bg is not None
    rng = np.random.default_rng(0)
    return g, bg, rng


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_block_graph_detects():
    g = clique_batch(4, 5)
    bg = block_graph(g)
    assert bg is not None
    assert bg.num_blocks == 4 and bg.block_len == 5
    assert int(bg.adj.sum()) == g.n_edges
    # Oversized component refused.
    assert block_graph(g, max_block=4) is None


def test_block_graph_irregular_components():
    # Two components of different sizes: path 0-1-2 and edge 3-4 (+isolated 5).
    src = np.array([0, 1, 1, 2, 3, 4])
    dst = np.array([1, 0, 2, 1, 4, 3])
    g = from_coo(src, dst, n_nodes=6)
    bg = block_graph(g)
    assert bg is not None
    assert bg.block_len == 3
    ed = jnp.arange(g.n_edges, dtype=jnp.float32) + 1.0
    x = jnp.ones((6, 4), jnp.float32)
    y_ref = vector_spmm(g, ed, x)
    y = bg.gather_nodes(block_spmm(bg, bg.scatter_edges(ed),
                                   bg.scatter_nodes(x)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=RTOL, atol=ATOL)


def test_scatter_gather_roundtrip(setup):
    g, bg, rng = setup
    x = _rand(rng, (g.n_nodes, 5))
    np.testing.assert_array_equal(
        np.asarray(bg.gather_nodes(bg.scatter_nodes(x))), np.asarray(x)
    )
    ed = _rand(rng, (g.n_edges,))
    np.testing.assert_array_equal(
        np.asarray(bg.gather_edges(bg.scatter_edges(ed))), np.asarray(ed)
    )


@pytest.mark.parametrize("multihead", [False, True])
def test_block_sddmm(setup, multihead):
    g, bg, rng = setup
    shape = (g.n_nodes, 2, 6) if multihead else (g.n_nodes, 6)
    A, B = _rand(rng, shape), _rand(rng, shape)
    ref = sddmm(g, A, B)
    out = bg.gather_edges(
        block_sddmm(bg, bg.scatter_nodes(A), bg.scatter_nodes(B))
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


def test_block_node_mul_edge(setup):
    g, bg, rng = setup
    A = _rand(rng, (g.n_nodes, 2, 6))
    Be = _rand(rng, (g.n_edges, 6))
    ref = node_mul_edge(g, A, Be)
    out = bg.gather_edges(
        block_node_mul_edge(bg, bg.scatter_nodes(A), bg.scatter_edges(Be))
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("by", ["src", "dst"])
@pytest.mark.parametrize("multihead", [False, True])
def test_block_softmax(setup, by, multihead):
    g, bg, rng = setup
    shape = (g.n_edges, 3) if multihead else (g.n_edges,)
    s = _rand(rng, shape)
    ref = edge_softmax(g, s, by=by)
    out = bg.gather_edges(block_softmax(bg, bg.scatter_edges(s), by=by))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("multihead", [False, True])
def test_block_spmm_fwd_bwd(setup, multihead):
    g, bg, rng = setup
    if multihead:
        ed = _rand(rng, (g.n_edges, 2))
        x = _rand(rng, (g.n_nodes, 2, 6))
    else:
        ed = _rand(rng, (g.n_edges,))
        x = _rand(rng, (g.n_nodes, 6))

    def f_ref(ed, x):
        return (vector_spmm(g, ed, x) ** 2).sum()

    def f_blk(ed, x):
        y = block_spmm(bg, bg.scatter_edges(ed), bg.scatter_nodes(x))
        return (bg.gather_nodes(y) ** 2).sum()

    np.testing.assert_allclose(float(f_blk(ed, x)), float(f_ref(ed, x)),
                               rtol=RTOL)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(ed, x)
    g_blk = jax.grad(f_blk, argnums=(0, 1))(ed, x)
    for a, b in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("normalize", ["src", "dst"])
def test_block_attention_vs_composed(setup, normalize):
    g, bg, rng = setup
    q = _rand(rng, (g.n_nodes, 8))
    k = _rand(rng, (g.n_nodes, 8))
    v = _rand(rng, (g.n_nodes, 8))

    out = bg.gather_nodes(block_attention(
        bg, bg.scatter_nodes(q), bg.scatter_nodes(k), bg.scatter_nodes(v),
        normalize=normalize,
    ))
    if normalize == "src":
        s = sddmm(g, q, k) / jnp.sqrt(8.0)
        a = edge_softmax(g, s, by="src")
        ref = vector_spmm(g, a, v)
    else:
        # out[v] = Σ_{e=(u,v)} softmax_v(<k[u],q[v]>)·v[u]
        s = sddmm(g, k, q) / jnp.sqrt(8.0)
        a = edge_softmax(g, s, by="dst")
        ref = vector_spmm(g.reverse(), a[g.csc_perm], v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
