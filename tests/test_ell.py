"""Differential tests: ELL (degree-bucketed) ops vs the segment oracle.

Power-law graphs are the target regime (SURVEY.md §7 hard part #2 —
load balancing without the reference's 32-edge chunks + atomics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import clique_batch, random_graph
from custom_op_benchmark_tpu.graph.ell import ell_pack
from custom_op_benchmark_tpu.ops import (
    edge_softmax,
    ell_dual,
    ell_sddmm,
    ell_softmax,
    ell_spmm,
    sddmm,
    vector_spmm,
)

RTOL, ATOL = 1e-4, 1e-4


@pytest.fixture(scope="module", params=["power_law", "clique"])
def setup(request):
    if request.param == "power_law":
        g = random_graph(300, 3000, seed=1, power_law=True)
    else:
        g = clique_batch(6, 9)
    rng = np.random.default_rng(0)
    return g, ell_dual(g, widths=(4, 16, 64, 256)), rng


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_pack_covers_all_edges(setup):
    g, (se, de), _ = setup
    for eg in (se, de):
        eids = np.concatenate([
            np.asarray(b.eid).ravel() for b in eg.buckets
        ])
        real = np.sort(eids[eids < g.num_edges_padded])
        expected = (np.arange(g.n_edges) if eg.direction == "src"
                    else np.sort(np.asarray(g.csc_perm)[: g.n_edges]))
        np.testing.assert_array_equal(real, np.sort(expected))
        assert eg.padding_waste < 4.5


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_spmm_fwd_bwd(setup, multihead):
    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    if multihead:
        ed = _rand(rng, (g.num_edges_padded, 2))
        x = _rand(rng, (n, 2, 8))
    else:
        ed = _rand(rng, (g.num_edges_padded,))
        x = _rand(rng, (n, 8))
    mask = np.zeros(g.num_edges_padded, np.float32)
    mask[:e] = 1
    ed = ed * jnp.asarray(mask.reshape((-1,) + (1,) * (ed.ndim - 1)))

    def f_ell(ed, x):
        return (ell_spmm(se, de, ed, x) ** 2).sum()

    def f_ref(ed, x):
        return (vector_spmm(g, ed, x) ** 2).sum()

    np.testing.assert_allclose(float(f_ell(ed, x)), float(f_ref(ed, x)),
                               rtol=1e-3)
    g_ell = jax.grad(f_ell, argnums=(0, 1))(ed, x)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(ed, x)
    np.testing.assert_allclose(
        np.asarray(g_ell[0])[:e], np.asarray(g_ref[0])[:e],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(g_ell[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_sddmm_fwd_bwd(setup, multihead):
    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    shape = (n, 2, 8) if multihead else (n, 8)
    A, B = _rand(rng, shape), _rand(rng, shape)
    dy = _rand(rng, (g.num_edges_padded, 2) if multihead
               else (g.num_edges_padded,))

    s_ell = ell_sddmm(se, de, A, B)
    s_ref = sddmm(g, A, B)
    np.testing.assert_allclose(np.asarray(s_ell)[:e], np.asarray(s_ref)[:e],
                               rtol=RTOL, atol=ATOL)

    def f_ell(A, B):
        return (ell_sddmm(se, de, A, B) * dy).sum()

    def f_ref(A, B):
        return (sddmm(g, A, B) * dy[: s_ref.shape[0]]).sum()

    g_ell = jax.grad(f_ell, argnums=(0, 1))(A, B)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(A, B)
    for a, b in zip(g_ell, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("direction", ["src", "dst"])
def test_ell_softmax_fwd_bwd(setup, direction):
    g, (se, de), rng = setup
    ell = se if direction == "src" else de
    e = g.n_edges
    x = _rand(rng, (g.num_edges_padded,))
    dy = _rand(rng, (g.num_edges_padded,))

    y_ell = ell_softmax(ell, x)
    y_ref = edge_softmax(g, x, by=direction)
    np.testing.assert_allclose(np.asarray(y_ell)[:e],
                               np.asarray(y_ref)[:e],
                               rtol=RTOL, atol=ATOL)

    def f_ell(x):
        return (ell_softmax(ell, x) * dy).sum()

    def f_ref(x):
        return (edge_softmax(g, x, by=direction) * dy[: y_ref.shape[0]]
                * jnp.asarray(
                    np.arange(y_ref.shape[0]) < e, jnp.float32)).sum()

    # Only compare over real edges (padding handling differs).
    gx_ell = np.asarray(jax.grad(f_ell)(x))[:e]
    gx_ref = np.asarray(jax.grad(f_ref)(x))[:e]
    np.testing.assert_allclose(gx_ell, gx_ref, rtol=1e-3, atol=1e-4)


def test_ell_attention_composition(setup):
    """SDDMM → softmax → SpMM composed on ELL == segment composition."""
    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    q, k, v = (_rand(rng, (n, 8)) for _ in range(3))

    s = ell_sddmm(se, de, q, k) / jnp.sqrt(8.0)
    a = ell_softmax(se, s)
    y = ell_spmm(se, de, a, v)

    s2 = sddmm(g, q, k) / jnp.sqrt(8.0)
    a2 = edge_softmax(g, s2, by="src")
    y2 = vector_spmm(g, a2, v)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-3, atol=1e-4)


def test_ell_fused_attention_fwd_bwd(setup):
    """Fused ELL attention == composed segment attention, incl. grads."""
    from custom_op_benchmark_tpu.ops import ell_attention

    g, (se, de), rng = setup
    n = g.n_nodes
    q, k, v = (_rand(rng, (n, 8)) for _ in range(3))

    def f_ell(q, k, v):
        return (ell_attention(de, se, q, k, v) ** 2).sum()

    def f_ref(q, k, v):
        s = sddmm(g, k, q) / jnp.sqrt(8.0)     # <k[src], q[dst]>
        a = edge_softmax(g, s, by="dst")
        y = vector_spmm(g.reverse(), a[g.csc_perm], v)
        return (y ** 2).sum()

    np.testing.assert_allclose(float(f_ell(q, k, v)),
                               float(f_ref(q, k, v)), rtol=1e-3)
    g_ell = jax.grad(f_ell, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ell, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_ell_fused_attention_multihead(setup):
    from custom_op_benchmark_tpu.ops import ell_attention

    g, (se, de), rng = setup
    n, h, d = g.n_nodes, 2, 8
    q, k, v = (_rand(rng, (n, h, d)) for _ in range(3))
    y = ell_attention(de, se, q, k, v)
    s = sddmm(g, k, q) / jnp.sqrt(float(d))
    a = edge_softmax(g, s, by="dst")
    y2 = vector_spmm(g.reverse(), a[g.csc_perm], v)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-3, atol=1e-3)


def test_ell_gat_attention_fwd_bwd(setup):
    """Fused ELL GAT core == the segment-op composition, incl. grads
    w.r.t. the attention vectors AND the features."""
    from custom_op_benchmark_tpu.ops import ell_gat_attention
    from custom_op_benchmark_tpu.models.gat import aggregate_to_dst

    g, (se, de), rng = setup
    n, h, d = g.n_nodes, 2, 8
    a_l = _rand(rng, (h, d))
    a_r = _rand(rng, (h, d))
    z = _rand(rng, (n, h, d))

    def f_ell(a_l, a_r, z):
        return (ell_gat_attention(de, se, a_l, a_r, z) ** 2).sum()

    def f_ref(a_l, a_r, z):
        el = jnp.einsum("nhd,hd->nh", z, a_l)
        er = jnp.einsum("nhd,hd->nh", z, a_r)
        nclamp = jnp.minimum(g.src, n - 1), jnp.minimum(g.dst, n - 1)
        s = el[nclamp[0]] + er[nclamp[1]]
        s = jnp.where(s > 0, s, 0.2 * s)
        a = edge_softmax(g, s, by="dst")
        a = jnp.where(g.edge_mask[:, None], a, 0.0)
        return (aggregate_to_dst(g, a, z) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(float(f_ell(a_l, a_r, z)),
                                   float(f_ref(a_l, a_r, z)), rtol=1e-3)
        g_ell = jax.grad(f_ell, argnums=(0, 1, 2))(a_l, a_r, z)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(a_l, a_r, z)
    for a, b in zip(g_ell, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_gat_model_ell_path_matches(setup):
    from custom_op_benchmark_tpu.models import GAT

    g, ell, rng = setup
    x = _rand(rng, (g.n_nodes, 12))
    model = GAT(hidden_dim=8, out_dim=3, num_layers=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0), g, x)["params"]
    with jax.default_matmul_precision("highest"):
        y_seg = model.apply({"params": params}, g, x)
        y_ell = model.apply({"params": params}, g, x, ell=ell)
    np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_seg),
                               rtol=2e-3, atol=2e-3)


def test_fit_full_graph_ell_strategy():
    from custom_op_benchmark_tpu.data import planted_partition
    from custom_op_benchmark_tpu.models import GAT
    from custom_op_benchmark_tpu.train import fit_full_graph

    ds = planted_partition(num_classes=3, nodes_per_class=30, feat_dim=16,
                           seed=1)
    model = GAT(hidden_dim=16, out_dim=3, num_heads=2)
    _, metrics = fit_full_graph(model, ds, epochs=40, learning_rate=1e-2,
                                strategy="ell")
    assert metrics["val_acc"] > 0.8, metrics


def test_ell_copy_spmm_and_node_mul_edge(setup):
    from custom_op_benchmark_tpu.ops import (
        ell_copy_spmm, ell_node_mul_edge, gspmm, node_mul_edge,
    )

    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    x = _rand(rng, (n, 8))

    for reduce in ("sum", "mean"):
        y = ell_copy_spmm(de, se, x, reduce=reduce)
        y_ref = gspmm(g, "copy_lhs", reduce, lhs=x, lhs_target="u",
                      to="dst")
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    # VJP of copy-sum == transpose copy-sum.
    gx = jax.grad(lambda x: (ell_copy_spmm(de, se, x) ** 2).sum())(x)
    gx_ref = jax.grad(lambda x: (gspmm(
        g, "copy_lhs", "sum", lhs=x, lhs_target="u", to="dst") ** 2
    ).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)

    A = _rand(rng, (n, 2, 8))
    Be = _rand(rng, (g.num_edges_padded, 8))
    s_ell = ell_node_mul_edge(se, de, A, Be)
    s_ref = node_mul_edge(g, A, Be[: (node_mul_edge(g, A, Be)).shape[0]])
    np.testing.assert_allclose(np.asarray(s_ell)[:e],
                               np.asarray(s_ref)[:e],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_node_mul_edge_grads_gather_only(setup, multihead):
    """Round-2 verdict #5: the standalone ELL NodeMulEdge must have a
    gather-only VJP — grads allclose vs the segment path AND no scatter
    in the backward jaxpr (the old autodiff Be cotangent scattered)."""
    from custom_op_benchmark_tpu.ops import ell_node_mul_edge, node_mul_edge

    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    A = _rand(rng, (n, 2, 8) if multihead else (n, 8))
    Be = _rand(rng, (e, 8))
    w = _rand(rng, (e,) + ((2,) if multihead else ()))

    def loss_ell(A, Be):
        s = ell_node_mul_edge(se, de, A, Be)[:e]
        return (s * w).sum() + (s ** 2).sum()

    def loss_ref(A, Be):
        s = node_mul_edge(g, A, Be, impl="xla")[:e]
        return (s * w).sum() + (s ** 2).sum()

    grads = jax.grad(loss_ell, argnums=(0, 1))(A, Be)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1))(A, Be)
    for got, ref in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss_ell, argnums=(0, 1)))(A, Be))
    assert "scatter" not in jaxpr, "ELL NodeMulEdge VJP must not scatter"


def test_gcn_sage_ell_paths_match(setup):
    from custom_op_benchmark_tpu.models import GCN, GraphSAGE

    g, ell, rng = setup
    x = _rand(rng, (g.n_nodes, 12))
    for cls in (GCN, GraphSAGE):
        model = cls(hidden_dim=8, out_dim=3)
        params = model.init(jax.random.PRNGKey(0), g, x)["params"]
        with jax.default_matmul_precision("highest"):
            y_seg = model.apply({"params": params}, g, x)
            y_ell = model.apply({"params": params}, g, x, ell=ell)
        np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_seg),
                                   rtol=2e-3, atol=2e-3)


def test_ell_ops_on_edgeless_graph():
    """Zero-edge graphs must return zeros like the segment oracle, not
    crash on empty bucket lists."""
    from custom_op_benchmark_tpu.graph import from_coo
    from custom_op_benchmark_tpu.ops import (
        ell_attention, ell_copy_spmm, ell_gat_attention,
        ell_node_mul_edge,
    )

    g = from_coo(np.array([], np.int64), np.array([], np.int64), n_nodes=6)
    se, de = ell_dual(g)
    x = jnp.ones((6, 4), jnp.float32)
    xh = jnp.ones((6, 2, 4), jnp.float32)
    ed = jnp.ones((max(g.num_edges_padded, 1),), jnp.float32)

    assert float(jnp.abs(ell_spmm(se, de, ed, x)).sum()) == 0.0
    assert float(jnp.abs(ell_sddmm(se, de, x, x)).sum()) == 0.0
    assert float(jnp.abs(ell_attention(de, se, x, x, x)).sum()) == 0.0
    assert float(jnp.abs(ell_copy_spmm(de, se, x)).sum()) == 0.0
    a = jnp.ones((2, 4), jnp.float32)
    assert float(jnp.abs(ell_gat_attention(de, se, a, a, xh)).sum()) == 0.0
    be = jnp.ones((max(g.num_edges_padded, 1), 4), jnp.float32)
    assert float(jnp.abs(ell_node_mul_edge(se, de, xh, be)).sum()) == 0.0
    # Grads flow (zeros) too.
    gz = jax.grad(lambda z: (ell_gat_attention(de, se, a, a, z) ** 2).sum())(
        xh
    )
    assert float(jnp.abs(gz).sum()) == 0.0


def test_ell_multigraph_semantics():
    """Duplicate edges are kept (reference raw-edge-list semantics,
    wrapper.py:84-116): each duplicate contributes its own term."""
    from custom_op_benchmark_tpu.graph import from_coo

    src = np.array([0, 0, 0, 1])   # edge (0,1) twice
    dst = np.array([1, 1, 2, 2])
    g = from_coo(src, dst, n_nodes=3)
    se, de = ell_dual(g)
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(3, 2) + 1)
    ed = jnp.ones((g.num_edges_padded,), jnp.float32)
    y = ell_spmm(se, de, ed, x)
    y_ref = vector_spmm(g, ed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)
    # Node 0 aggregates x[1] twice + x[2] once.
    np.testing.assert_allclose(
        np.asarray(y)[0], 2 * np.asarray(x)[1] + np.asarray(x)[2]
    )


def test_ell_cross_packed_roundtrip(setup):
    from custom_op_benchmark_tpu.ops import (
        ell_cross_packed, ell_gather_edges, ell_scatter_edges,
    )

    g, (se, de), rng = setup
    ed = _rand(rng, (g.num_edges_padded,))
    packed_src = ell_scatter_edges(se, ed)
    packed_dst = ell_cross_packed(se, de, packed_src)
    back = ell_gather_edges(de, packed_dst)
    np.testing.assert_array_equal(
        np.asarray(back)[: g.n_edges], np.asarray(ed)[: g.n_edges]
    )


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_spmm_packed_weights(setup, multihead):
    """Packed-weight SpMM: fwd/grads match the canonical-weight path,
    and weight cotangents come back packed in BOTH layouts consistently."""
    from custom_op_benchmark_tpu.ops import (
        ell_gather_edges,
        ell_pack_weights,
        ell_spmm,
        ell_unpack_weights,
    )

    g, (se, de), rng = setup
    n, e = g.n_nodes, g.n_edges
    if multihead:
        ed = _rand(rng, (g.num_edges_padded, 2))
        x = _rand(rng, (n, 2, 8))
    else:
        ed = _rand(rng, (g.num_edges_padded,))
        x = _rand(rng, (n, 8))
    mask = np.zeros(g.num_edges_padded, np.float32)
    mask[:e] = 1
    ed = ed * jnp.asarray(mask.reshape((-1,) + (1,) * (ed.ndim - 1)))
    w = ell_pack_weights(se, de, ed)

    y_packed = ell_spmm(se, de, w, x)
    y_canon = ell_spmm(se, de, ed, x)[: n]
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_canon),
                               rtol=1e-4, atol=1e-4)

    def f_packed(w, x):
        return (ell_spmm(se, de, w, x) ** 2).sum()

    def f_ref(ed, x):
        return (vector_spmm(g, ed, x) ** 2).sum()

    gw, gx = jax.grad(f_packed, argnums=(0, 1))(w, x)
    ge_ref, gx_ref = jax.grad(f_ref, argnums=(0, 1))(ed, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-3)
    # Both packed cotangent copies agree with the canonical cotangent.
    ge_src = ell_unpack_weights(se, gw)
    ge_dst = ell_gather_edges(de, gw.dst)
    np.testing.assert_allclose(np.asarray(ge_src)[:e],
                               np.asarray(ge_ref)[:e],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ge_dst)[:e],
                               np.asarray(ge_ref)[:e],
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_edge_bias_attention(setup, multihead):
    """Fused edge-bias attention == the composed segment pipeline
    (sddmm + node_mul_edge -> softmax -> aggregate), incl. all grads."""
    from custom_op_benchmark_tpu.ops import node_mul_edge
    from custom_op_benchmark_tpu.ops.ell import ell_edge_bias_attention

    g, (se, de), rng = setup
    n = g.n_nodes
    h, d = (2, 8) if multihead else (1, 8)
    shape = (n, h, d) if multihead else (n, d)
    q, k, v = (_rand(rng, shape) for _ in range(3))
    be = _rand(rng, (g.num_edges_padded, d))
    sc = 1.0 / np.sqrt(d)

    def f_fused(q, k, v, be):
        return (ell_edge_bias_attention(de, se, q, k, v, be) ** 2).sum()

    def f_ref(q, k, v, be):
        s = (sddmm(g, k, q) + node_mul_edge(g, q, be)) * sc
        a = edge_softmax(g, s, by="dst")
        am = jnp.where(g.edge_mask if a.ndim == 1 else g.edge_mask[:, None],
                       a, 0.0)
        y = vector_spmm(g.reverse(), am[g.csc_perm], v)
        return (y ** 2).sum()

    np.testing.assert_allclose(float(f_fused(q, k, v, be)),
                               float(f_ref(q, k, v, be)), rtol=1e-3)
    gf = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, be)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, be)
    for a, b, name in zip(gf, gr, "qkvb"):
        lim = g.n_edges if name == "b" else None
        np.testing.assert_allclose(
            np.asarray(a)[:lim], np.asarray(b)[:lim],
            rtol=2e-3, atol=2e-3, err_msg=f"grad {name}",
        )


def test_transformer_edge_feat_ell_path(setup):
    """GraphTransformer with edge features on the ELL path matches the
    segment path."""
    from custom_op_benchmark_tpu.models import GraphTransformer

    g, (se, de), rng = setup
    n = g.n_nodes
    model = GraphTransformer(dim=16, num_heads=2, num_layers=1)
    x = _rand(rng, (n, 16))
    be = _rand(rng, (g.num_edges_padded, 8))   # head_dim = 8
    params = model.init(jax.random.PRNGKey(0), g, x, be)["params"]
    y_seg = model.apply({"params": params}, g, x, be)
    y_ell = model.apply({"params": params}, g, x, be, ell=(se, de))
    np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_seg),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("multihead", [False, True])
def test_ell_edge_bias_attention_packed(setup, multihead):
    """Packed edge features give identical results + packed cotangents
    matching the canonical path (single- and multi-head: the multihead
    sweep is heads-batched, round-3 verdict #1)."""
    from custom_op_benchmark_tpu.ops import (
        ell_gather_edges as _gather,
        ell_pack_weights,
    )
    from custom_op_benchmark_tpu.ops.ell import ell_edge_bias_attention

    g, (se, de), rng = setup
    n, d, e = g.n_nodes, 8, g.n_edges
    shape = (n, 2, d) if multihead else (n, d)
    q, k, v = (_rand(rng, shape) for _ in range(3))
    be = _rand(rng, (g.num_edges_padded, d))
    w = ell_pack_weights(se, de, be)

    y_pk = ell_edge_bias_attention(de, se, q, k, v, w)
    y_cn = ell_edge_bias_attention(de, se, q, k, v, be)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_cn),
                               rtol=1e-4, atol=1e-4)

    def f_pk(q, w):
        return (ell_edge_bias_attention(de, se, q, k, v, w) ** 2).sum()

    def f_cn(q, be):
        return (ell_edge_bias_attention(de, se, q, k, v, be) ** 2).sum()

    (gq, gw) = jax.grad(f_pk, argnums=(0, 1))(q, w)
    (gq_r, gbe_r) = jax.grad(f_cn, argnums=(0, 1))(q, be)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_r),
                               rtol=1e-3, atol=1e-3)
    # src-packed cotangent unpacks to the canonical one.
    gbe_src = _gather(se, gw.src)
    gbe_dst = _gather(de, gw.dst)
    np.testing.assert_allclose(np.asarray(gbe_src)[:e],
                               np.asarray(gbe_r)[:e],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gbe_dst)[:e],
                               np.asarray(gbe_r)[:e],
                               rtol=1e-3, atol=1e-3)
