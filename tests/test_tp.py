"""Head-axis tensor parallelism (round-1 coverage gap: head-TP = no)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import (
    ell_attention,
    ell_dual,
    ell_gat_attention,
)
from custom_op_benchmark_tpu.parallel import make_mesh
from custom_op_benchmark_tpu.parallel.tp import (
    shard_heads,
    tp_attention,
    tp_gat_attention,
    tp_transformer_block,
)


@pytest.fixture(scope="module")
def setup():
    g = random_graph(200, 1500, seed=0, power_law=True)
    return ell_dual(g), make_mesh((4,), ("head",)), \
        np.random.default_rng(0)


def _np(x):
    return np.asarray(x)


def test_tp_attention_matches_single_device(setup):
    (se, de), mesh, rng = setup
    n, h, d = 200, 4, 8
    q, k, v = (shard_heads(
        mesh, rng.normal(size=(n, h, d)).astype(np.float32))
        for _ in range(3))
    y_tp = tp_attention(de, se, mesh, q, k, v)
    y_ref = ell_attention(de, se, jnp.asarray(_np(q)),
                          jnp.asarray(_np(k)), jnp.asarray(_np(v)))
    np.testing.assert_allclose(_np(y_tp), _np(y_ref),
                               rtol=2e-5, atol=2e-5)
    # Gradients flow through the shard_map (head-sharded cotangents).
    gq = jax.grad(lambda q: (tp_attention(de, se, mesh, q, k, v) ** 2
                             ).sum())(q)
    gq_ref = jax.grad(lambda q: (ell_attention(de, se, q, jnp.asarray(
        _np(k)), jnp.asarray(_np(v))) ** 2).sum())(jnp.asarray(_np(q)))
    np.testing.assert_allclose(_np(gq), _np(gq_ref), rtol=1e-4, atol=1e-4)


def test_tp_gat_matches_single_device(setup):
    (se, de), mesh, rng = setup
    n, h, d = 200, 4, 8
    a_l = jnp.asarray(rng.normal(size=(h, d)).astype(np.float32))
    a_r = jnp.asarray(rng.normal(size=(h, d)).astype(np.float32))
    z = shard_heads(mesh, rng.normal(size=(n, h, d)).astype(np.float32))
    y_tp = tp_gat_attention(de, se, mesh, a_l, a_r, z)
    y_ref = ell_gat_attention(de, se, a_l, a_r, jnp.asarray(_np(z)))
    np.testing.assert_allclose(_np(y_tp), _np(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_transformer_block(setup):
    (se, de), mesh, rng = setup
    n, h, d, f = 200, 4, 8, 16
    params = {
        k: jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
        for k, s in [("wq", (f, h, d)), ("wk", (f, h, d)),
                     ("wv", (f, h, d)), ("wo", (h, d, f))]
    }
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)
    y = tp_transformer_block(de, se, mesh, params, x)
    q = jnp.einsum("nf,fhd->nhd", x, params["wq"])
    k = jnp.einsum("nf,fhd->nhd", x, params["wk"])
    v = jnp.einsum("nf,fhd->nhd", x, params["wv"])
    y_ref = jnp.einsum("nhd,hdf->nf",
                       ell_attention(de, se, q, k, v), params["wo"])
    np.testing.assert_allclose(_np(y), _np(y_ref), rtol=2e-4, atol=2e-4)


def test_tp_rejects_indivisible_heads(setup):
    (se, de), mesh, rng = setup
    q = jnp.zeros((10, 3, 8))
    with pytest.raises(ValueError):
        tp_attention(de, se, mesh, q, q, q)
