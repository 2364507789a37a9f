"""Bitwise reproducibility (SURVEY.md §5).

The reference's correctness story tolerates nondeterministic accumulation
(atomics ⇒ loose softmax-grad tolerances, wrapper.py:239). This design has
no atomics anywhere: sorted segment reductions, row-owned tiles, and
gather-assembled outputs are deterministic by construction — so we can
assert the stronger property the reference can't: bit-identical results
across runs, for forwards and gradients, on every execution strategy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import (
    block_graph,
    clique_batch,
    random_graph,
)
from custom_op_benchmark_tpu.ops import (
    block_attention,
    edge_softmax,
    ell_attention,
    ell_dual,
    sddmm,
    vector_spmm,
)


def _bitwise(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def data():
    g = random_graph(200, 2000, seed=0, power_law=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 16)).astype(np.float32))
    ed = jnp.asarray(
        rng.uniform(size=g.num_edges_padded).astype(np.float32))
    return g, x, ed


def test_segment_ops_bitwise_reproducible(data):
    g, x, ed = data

    def pipeline(ed, x):
        s = sddmm(g, x, x)
        a = edge_softmax(g, s, by="dst")
        return vector_spmm(g, a * ed, x)

    f = jax.jit(pipeline)
    _bitwise(f(ed, x), f(ed, x))
    gr = jax.jit(jax.grad(lambda ed, x: (pipeline(ed, x) ** 2).sum(),
                          argnums=(0, 1)))
    g1, g2 = gr(ed, x), gr(ed, x)
    _bitwise(g1[0], g2[0])
    _bitwise(g1[1], g2[1])


def test_ell_attention_bitwise_reproducible(data):
    g, x, _ = data
    se, de = ell_dual(g)
    f = jax.jit(lambda q: ell_attention(de, se, q, q, q))
    _bitwise(f(x), f(x))
    gr = jax.jit(jax.grad(lambda q: (ell_attention(de, se, q, q, q) ** 2)
                          .sum()))
    _bitwise(gr(x), gr(x))


def test_block_attention_bitwise_reproducible():
    g = clique_batch(4, 8)
    bg = block_graph(g)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 8)).astype(np.float32))
    xb = bg.scatter_nodes(x)
    f = jax.jit(lambda xb: block_attention(bg, xb, xb, xb))
    _bitwise(f(xb), f(xb))


def test_training_bitwise_reproducible():
    """Two identical training runs produce bit-identical parameters —
    the end-to-end consequence of the no-atomics design."""
    from custom_op_benchmark_tpu.data import planted_partition
    from custom_op_benchmark_tpu.models import GAT
    from custom_op_benchmark_tpu.train import fit_full_graph

    ds = planted_partition(num_classes=3, nodes_per_class=20, feat_dim=8,
                           seed=0)
    model = GAT(hidden_dim=8, out_dim=3, num_heads=2)
    s1, m1 = fit_full_graph(model, ds, epochs=10, seed=7)
    s2, m2 = fit_full_graph(model, ds, epochs=10, seed=7)
    assert m1["val_loss"] == m2["val_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        _bitwise(a, b)
