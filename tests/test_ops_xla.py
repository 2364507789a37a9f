"""Differential tests of the op family vs dense masked oracles.

Same discipline as the reference harness (wrapper.py:148-485): each op is
computed 2 independent ways — our segment implementation vs a dense masked
einsum on the adjacency matrix — and compared on forward outputs *and every
gradient* (the reference's allclose gates, e.g. wrapper.py:174, 204-209).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import assert_allclose, assert_array_equal

from custom_op_benchmark_tpu.graph import from_coo, clique_batch
from custom_op_benchmark_tpu.ops import (
    sddmm,
    node_mul_edge,
    edge_softmax,
    vector_spmm,
    gspmm,
    gsddmm,
)

ATOL = 1e-5
RTOL = 1e-4


def make_graph(n=13, p=0.4, seed=0, pad_multiple=None, self_loops=True):
    """Random simple digraph (unique edges; every node gets a self-loop)."""
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    if self_loops:
        np.fill_diagonal(mask, True)
    src, dst = np.nonzero(mask)
    g = from_coo(src, dst, n, pad_multiple=pad_multiple)
    adj = mask.astype(np.float32)
    return g, adj


def dense_lookup(g, adj):
    """Canonical eid -> (src, dst) as numpy for oracle indexing."""
    return np.asarray(g.src), np.asarray(g.dst)


def check_grads(f, g_oracle, args, atol=ATOL, rtol=RTOL):
    """Compare f and oracle on outputs and on grads of a random scalar."""
    out = f(*args)
    out_o = g_oracle(*args)
    assert_allclose(out, out_o, atol=atol, rtol=rtol)
    key = jax.random.PRNGKey(7)
    cot = jax.random.normal(key, out.shape, out.dtype)

    def loss(fn):
        return lambda *a: (fn(*a) * cot).sum()

    grads = jax.grad(loss(f), argnums=tuple(range(len(args))))(*args)
    grads_o = jax.grad(loss(g_oracle), argnums=tuple(range(len(args))))(*args)
    for ga, go in zip(grads, grads_o):
        assert_allclose(ga, go, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# SDDMM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("heads", [None, 4])
@pytest.mark.parametrize("pad", [None, 64])
def test_sddmm_vs_dense(heads, pad):
    g, adj = make_graph(pad_multiple=pad, seed=1)
    n = g.n_nodes
    d = 8
    key = jax.random.PRNGKey(0)
    shape = (n, d) if heads is None else (n, heads, d)
    A = jax.random.normal(key, shape)
    B = jax.random.normal(jax.random.PRNGKey(1), shape)
    src, dst = dense_lookup(g, adj)
    e = g.n_edges

    def ours(A, B):
        y = sddmm(g, A, B)
        return y[:e]

    def oracle(A, B):
        A3 = A if heads else A[:, None, :]
        B3 = B if heads else B[:, None, :]
        scores = jnp.einsum("uhd,vhd->uvh", A3, B3)  # (n, n, h)
        y = scores[src[:e], dst[:e]]                  # (e, h)
        return y if heads else y[:, 0]

    check_grads(jax.jit(ours), jax.jit(oracle), (A, B))


def test_sddmm_clique_matches_bmm():
    """On the clique workload, SDDMM == dense bmm (reference wrapper.py:185)."""
    b, l, d = 4, 6, 16
    g = clique_batch(b, l)
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (b * l, d))
    B = jax.random.normal(jax.random.PRNGKey(4), (b * l, d))
    y = sddmm(g, A, B)
    y_bmm = jnp.einsum(
        "bxd,byd->bxy", A.reshape(b, l, d), B.reshape(b, l, d)
    ).reshape(-1)
    assert_allclose(y, y_bmm, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# NodeMulEdge
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("heads", [None, 3])
def test_node_mul_edge_vs_dense(heads):
    g, adj = make_graph(seed=2, pad_multiple=32)
    n, e, d = g.n_nodes, g.n_edges, 8
    E = g.num_edges_padded
    shape = (n, d) if heads is None else (n, heads, d)
    A = jax.random.normal(jax.random.PRNGKey(0), shape)
    B = jax.random.normal(jax.random.PRNGKey(1), (E, d))
    src = np.asarray(g.src)

    def ours(A, B):
        return node_mul_edge(g, A, B)[:e]

    def oracle(A, B):
        A3 = A if heads else A[:, None, :]
        Ae = A3[src[:e]]                     # (e, h, d)
        y = jnp.einsum("ehd,ed->eh", Ae, B[:e])
        return y if heads else y[:, 0]

    check_grads(jax.jit(ours), jax.jit(oracle), (A, B))


# ---------------------------------------------------------------------------
# Edge softmax
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("by", ["src", "dst"])
@pytest.mark.parametrize("heads", [None, 2])
def test_edge_softmax_vs_dense(by, heads):
    g, adj = make_graph(seed=3, pad_multiple=32)
    n, e = g.n_nodes, g.n_edges
    E = g.num_edges_padded
    shape = (E,) if heads is None else (E, heads)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    src, dst = dense_lookup(g, adj)

    def ours(x):
        return edge_softmax(g, x, by=by)[:e]

    def oracle(x):
        x2 = x if heads else x[:, None]
        h = x2.shape[1]
        big = jnp.full((n, n, h), -jnp.inf)
        big = big.at[src[:e], dst[:e]].set(x2[:e])
        axis = 1 if by == "src" else 0
        sm = jax.nn.softmax(big, axis=axis)
        y = sm[src[:e], dst[:e]]
        return y if heads else y[:, 0]

    # Softmax grads get the reference's looser gate (wrapper.py:239).
    check_grads(jax.jit(ours), jax.jit(oracle), (x,), atol=1e-5, rtol=1e-3)


def test_edge_softmax_clique_matches_reference_protocol():
    """Scatter/gather directions == th.softmax over -1/-2 axes of the
    (batch, l, l) view (reference wrapper.py:218, 245)."""
    b, l = 3, 7
    g = clique_batch(b, l)
    x = jax.random.normal(jax.random.PRNGKey(0), (g.n_edges,))
    y_scatter = edge_softmax(g, x, by="src")
    y_ref = jax.nn.softmax(x.reshape(b, l, l), axis=-1).reshape(-1)
    assert_allclose(y_scatter, y_ref, atol=1e-6, rtol=1e-5)
    y_gather = edge_softmax(g, x, by="dst")
    y_ref2 = jax.nn.softmax(x.reshape(b, l, l), axis=-2).reshape(-1)
    assert_allclose(y_gather, y_ref2, atol=1e-6, rtol=1e-5)


def test_edge_softmax_sums_to_one():
    g, _ = make_graph(seed=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.n_edges, 2)) * 10.0
    y = edge_softmax(g, x, by="dst")
    sums = jnp.zeros((g.n_nodes, 2)).at[g.dst].add(y)
    assert_allclose(sums, 1.0, atol=1e-5)


def test_edge_softmax_stability():
    """Large logits must not overflow (stable max-subtraction)."""
    g, _ = make_graph(seed=5)
    x = jnp.full((g.n_edges,), 1e4)
    y = edge_softmax(g, x, by="dst")
    assert bool(jnp.all(jnp.isfinite(y)))


# ---------------------------------------------------------------------------
# Vector SpMM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("heads", [None, 4])
@pytest.mark.parametrize("pad", [None, 128])
def test_vector_spmm_vs_dense(heads, pad):
    g, adj = make_graph(seed=6, pad_multiple=pad)
    n, e, d = g.n_nodes, g.n_edges, 8
    E = g.num_edges_padded
    eshape = (E,) if heads is None else (E, heads)
    xshape = (n, d) if heads is None else (n, heads, d)
    edata = jax.random.normal(jax.random.PRNGKey(0), eshape)
    x = jax.random.normal(jax.random.PRNGKey(1), xshape)
    src, dst = dense_lookup(g, adj)

    def ours(edata, x):
        return vector_spmm(g, edata, x)

    def oracle(edata, x):
        e2 = (edata if heads else edata[:, None])[:e]
        x3 = x if heads else x[:, None, :]
        W = jnp.zeros((n, n, e2.shape[1]))
        W = W.at[src[:e], dst[:e]].add(e2)
        y = jnp.einsum("uvh,vhd->uhd", W, x3)
        return y if heads else y[:, 0, :]

    check_grads(jax.jit(ours), jax.jit(oracle), (edata, x))


def test_vector_spmm_matches_sparse_mm_semantics():
    """vector_spmm(g, vals, x) == adj @ x (reference wrapper.py:274/294)."""
    g, adj = make_graph(seed=7)
    n = g.n_nodes
    vals = jax.random.uniform(jax.random.PRNGKey(2), (g.n_edges,))
    x = jax.random.normal(jax.random.PRNGKey(3), (n, 8))
    dense = jnp.zeros((n, n)).at[g.src, g.dst].set(vals)
    assert_allclose(
        vector_spmm(g, vals, x), dense @ x, atol=1e-4, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# Composition: one full graph-attention layer (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def test_attention_layer_composition():
    g, adj = make_graph(seed=8, pad_multiple=64)
    n, h, d = g.n_nodes, 2, 8
    e = g.n_edges
    q = jax.random.normal(jax.random.PRNGKey(0), (n, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (n, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (n, h, d))
    src, dst = np.asarray(g.src), np.asarray(g.dst)

    def layer(q, k, v):
        scores = sddmm(g, q, k)
        alpha = edge_softmax(g, scores, by="src")
        # Mask padding before aggregation.
        alpha = jnp.where(g.edge_mask[:, None], alpha, 0.0)
        return vector_spmm(g, alpha, v)

    def oracle(q, k, v):
        scores = jnp.einsum("uhd,vhd->uvh", q, k)
        mask = jnp.zeros((n, n), bool).at[src[:e], dst[:e]].set(True)
        scores = jnp.where(mask[:, :, None], scores, -jnp.inf)
        alpha = jax.nn.softmax(scores, axis=1)
        alpha = jnp.where(mask[:, :, None], alpha, 0.0)
        return jnp.einsum("uvh,vhd->uhd", alpha, v)

    check_grads(jax.jit(layer), jax.jit(oracle), (q, k, v),
                atol=1e-5, rtol=1e-3)


# ---------------------------------------------------------------------------
# Generalized message passing
# ---------------------------------------------------------------------------

def test_gspmm_copy_sum_is_degree_weighted():
    g, adj = make_graph(seed=9)
    n = g.n_nodes
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 8))
    # sum_v adj[u,v] * x[v] == copy_rhs/sum over out-edges
    out = gspmm(g, "copy_rhs", "sum", rhs=x, rhs_target="v", to="src")
    assert_allclose(out, jnp.asarray(adj) @ x, atol=1e-4,
                               rtol=1e-4)


def test_gspmm_mean_max():
    g, adj = make_graph(seed=10)
    n = g.n_nodes
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 4))
    mean = gspmm(g, "copy_rhs", "mean", rhs=x, rhs_target="v", to="src")
    deg = jnp.asarray(adj).sum(1, keepdims=True)
    assert_allclose(
        mean, (jnp.asarray(adj) @ x) / jnp.maximum(deg, 1.0),
        atol=1e-4, rtol=1e-4,
    )
    mx = gspmm(g, "copy_rhs", "max", rhs=x, rhs_target="v", to="src")
    adj_b = np.asarray(adj) > 0
    want = np.full((n, 4), -1e9, np.float32)
    xn = np.asarray(x)
    for u in range(n):
        if adj_b[u].any():
            want[u] = xn[adj_b[u]].max(0)
    assert_allclose(mx, want, atol=1e-4, rtol=1e-4)


def test_gsddmm_dot_equals_sddmm():
    g, _ = make_graph(seed=11)
    n, d = g.n_nodes, 8
    A = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    B = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    y = gsddmm(g, "dot", A, B)[:, 0]
    assert_allclose(y, sddmm(g, A, B), atol=1e-4, rtol=1e-4)


def test_public_api_validation_errors():
    """CHECK_INPUT parity (graphop.cpp:4-6): bad shapes/args fail loudly
    at trace time, not with garbage results."""
    import pytest
    from custom_op_benchmark_tpu.graph import clique_batch
    from custom_op_benchmark_tpu.ops import (
        edge_softmax, gspmm, sddmm, vector_spmm,
    )

    g = clique_batch(2, 4)
    n, e = g.n_nodes, g.num_edges_padded
    A = jnp.ones((n, 8))

    with pytest.raises(ValueError):
        edge_softmax(g, jnp.ones((e,)), by="nope")
    with pytest.raises((ValueError, TypeError)):
        sddmm(g, A, jnp.ones((n + 3, 8)))      # mismatched node counts
    with pytest.raises((ValueError, TypeError)):
        vector_spmm(g, jnp.ones((e + 5,)), A)  # wrong edge count
    with pytest.raises(ValueError):
        gspmm(g, "copy_lhs", "prod", lhs=A, lhs_target="u", to="dst")
    with pytest.raises(ValueError):
        gspmm(g, "copy_lhs", "sum", lhs=A, lhs_target="u", to="sideways")
