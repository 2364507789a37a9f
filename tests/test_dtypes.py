"""Mixed-precision behavior: the op family must accept bf16 inputs.

TPU idiom: bf16 storage/matmul inputs with f32 accumulation
(preferred_element_type) — the reference is fp32/fp64-only
(AT_DISPATCH_FLOATING_TYPES, graphop_kernel.cu:254).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import block_graph, clique_batch
from custom_op_benchmark_tpu.ops import (
    block_attention,
    block_spmm,
    edge_softmax,
    sddmm,
    vector_spmm,
)


@pytest.fixture(scope="module")
def setup():
    g = clique_batch(4, 10)
    rng = np.random.default_rng(0)
    return g, rng


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_op_family_dtypes(setup, dtype):
    g, rng = setup
    n, e, d = g.n_nodes, g.n_edges, 16
    A = jnp.asarray(rng.normal(size=(n, d)), dtype)
    B = jnp.asarray(rng.normal(size=(n, d)), dtype)
    s = sddmm(g, A, B)
    assert s.dtype == dtype
    a = edge_softmax(g, s, by="src")
    assert a.dtype == dtype
    y = vector_spmm(g, a, B)
    assert y.dtype == dtype and y.shape == (n, d)
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_bf16_matches_f32_loosely(setup):
    g, rng = setup
    n, d = g.n_nodes, 16
    A32 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    B32 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y32 = vector_spmm(g, jnp.ones((g.n_edges,), jnp.float32), A32)
    y16 = vector_spmm(
        g, jnp.ones((g.n_edges,), jnp.bfloat16), A32.astype(jnp.bfloat16)
    )
    np.testing.assert_allclose(
        np.asarray(y16.astype(jnp.float32)), np.asarray(y32),
        rtol=2e-2, atol=2e-2,
    )
    del B32


def test_block_ops_bf16(setup):
    g, rng = setup
    bg = block_graph(g)
    n, d = g.n_nodes, 16
    q = jnp.asarray(rng.normal(size=(n, d)), jnp.bfloat16)
    ed = jnp.asarray(rng.uniform(size=(g.n_edges,)), jnp.bfloat16)
    y = block_spmm(bg, bg.scatter_edges(ed), bg.scatter_nodes(q))
    assert y.dtype == jnp.bfloat16
    out = block_attention(bg, *(bg.scatter_nodes(q),) * 3)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
