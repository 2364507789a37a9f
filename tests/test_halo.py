"""Halo-exchange distributed ops vs single-device oracles (8-dev CPU mesh).

The owner-computes plan makes softmax segments fully local; these tests
check numerical equivalence with the segment oracle for SpMM and fused
attention, forwards and gradients, on irregular graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import clique_batch, random_graph
from custom_op_benchmark_tpu.ops import edge_softmax, sddmm, vector_spmm
from custom_op_benchmark_tpu.parallel import (
    halo_edge_data,
    halo_gat_attention,
    halo_graph,
    halo_spmm,
    make_mesh,
    shard_halo_nodes,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device mesh"
)


@pytest.fixture(scope="module", params=["power_law", "clique"])
def setup(request):
    if request.param == "power_law":
        g = random_graph(96, 800, seed=2, power_law=True)
    else:
        g = clique_batch(8, 11)
    mesh = make_mesh((4,), ("edge",))
    hg = halo_graph(g, mesh)
    rng = np.random.default_rng(0)
    return g, mesh, hg, rng


def test_halo_spmm_matches_oracle(setup):
    g, mesh, hg, rng = setup
    d = 8
    x = rng.normal(size=(g.n_nodes, d)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)

    # Oracle: aggregate over in-edges of dst.
    y_ref = vector_spmm(
        g.reverse(), jnp.asarray(ed)[g.csc_perm], jnp.asarray(x)
    )

    ed_h = halo_edge_data(hg, mesh, ed)
    xs = shard_halo_nodes(hg, mesh, x)
    y = halo_spmm(hg, mesh, ed_h, xs)
    np.testing.assert_allclose(
        np.asarray(y)[: g.n_nodes], np.asarray(y_ref),
        rtol=1e-4, atol=1e-4,
    )


def test_halo_attention_matches_oracle(setup):
    g, mesh, hg, rng = setup
    n, h, d = g.n_nodes, 2, 8
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)

    s = sddmm(g, jnp.asarray(k), jnp.asarray(q)) / jnp.sqrt(float(d))
    a = edge_softmax(g, s, by="dst")
    y_ref = vector_spmm(g.reverse(), a[g.csc_perm], jnp.asarray(v))

    qs = shard_halo_nodes(hg, mesh, q)
    ks = shard_halo_nodes(hg, mesh, k)
    vs = shard_halo_nodes(hg, mesh, v)
    y = halo_gat_attention(hg, mesh, qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(y)[:n], np.asarray(y_ref), rtol=1e-3, atol=1e-4
    )


def test_halo_attention_grads(setup):
    g, mesh, hg, rng = setup
    n, h, d = g.n_nodes, 2, 4
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    qs = shard_halo_nodes(hg, mesh, q)
    ks = shard_halo_nodes(hg, mesh, k)
    vs = shard_halo_nodes(hg, mesh, v)

    def f_halo(q, k, v):
        return (halo_gat_attention(hg, mesh, q, k, v) ** 2).sum()

    def f_ref(q, k, v):
        s = sddmm(g, k, q) / jnp.sqrt(float(d))
        a = edge_softmax(g, s, by="dst")
        return (vector_spmm(g.reverse(), a[g.csc_perm], v) ** 2).sum()

    g_halo = jax.jit(jax.grad(f_halo, argnums=(0, 1, 2)))(qs, ks, vs)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b in zip(g_halo, g_ref):
        np.testing.assert_allclose(
            np.asarray(a)[:n], np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_halo_fraction_reasonable(setup):
    g, mesh, hg, rng = setup
    assert hg.halo_fraction >= 0
    # Every real edge appears exactly once across shards.
    eids = np.asarray(hg.eid).reshape(-1)
    real = eids[eids < g.num_edges_padded]
    assert len(real) == g.n_edges
    assert len(np.unique(real)) == g.n_edges


def test_cluster_order_reduces_halo():
    """BFS cluster renumbering must cut the halo exchange on a graph
    with community structure (planted partition communities)."""
    from custom_op_benchmark_tpu.data import planted_partition
    from custom_op_benchmark_tpu.graph import cluster_order, reorder_graph

    ds = planted_partition(num_classes=8, nodes_per_class=32, seed=0,
                           homophily=0.95, avg_degree=8)
    g = ds.graph
    mesh = make_mesh((4,), ("edge",))
    hg0 = halo_graph(g, mesh)

    ro = cluster_order(g, 4)
    g2, _ = reorder_graph(g, ro)
    hg1 = halo_graph(g2, mesh)
    assert hg1.halo_fraction < hg0.halo_fraction * 0.8, (
        hg0.halo_fraction, hg1.halo_fraction,
    )
    # Permutation sanity.
    assert len(np.unique(np.asarray(ro.perm))) == g.n_nodes

    # Ops still match the oracle on the reordered graph.
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.n_nodes, 4)).astype(np.float32)
    ed = rng.uniform(size=g2.num_edges_padded).astype(np.float32)
    y_ref = vector_spmm(
        g2.reverse(), jnp.asarray(ed)[g2.csc_perm],
        ro.scatter_nodes(jnp.asarray(x)),
    )
    y = halo_spmm(hg1, mesh, halo_edge_data(hg1, mesh, ed),
                  shard_halo_nodes(hg1, mesh, ro.scatter_nodes(
                      jnp.asarray(x))))
    np.testing.assert_allclose(
        np.asarray(y)[: g2.n_nodes], np.asarray(y_ref),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("multihead", [False, True])
def test_halo_attention_ell_matches(setup, multihead):
    """Scatter-free per-shard ELL attention == the (n,h,d) sorted-segment
    halo attention, forwards and grads. The single-head variant compares
    through the same oracle via an (n,1,d) reshape (round-2 verdict #10 —
    this case used to be skipped)."""
    from custom_op_benchmark_tpu.parallel import halo_attention_ell, halo_ell

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    n = g.n_nodes
    shape = (n, 2, 8) if multihead else (n, 8)
    q = rng.normal(size=shape).astype(np.float32)
    k = rng.normal(size=shape).astype(np.float32)
    v = rng.normal(size=shape).astype(np.float32)
    qs = shard_halo_nodes(hg, mesh, q)
    ks = shard_halo_nodes(hg, mesh, k)
    vs = shard_halo_nodes(hg, mesh, v)

    def as_oracle(x):
        """(P·n_per, d) → (P·n_per, 1, d) for the (n,h,d)-only oracle."""
        return x if multihead else x[:, None, :]

    def from_oracle(y):
        return y if multihead else y[:, 0, :]

    y_ref = from_oracle(halo_gat_attention(
        hg, mesh, as_oracle(qs), as_oracle(ks), as_oracle(vs)))
    y = halo_attention_ell(hg, he, mesh, qs, ks, vs)
    np.testing.assert_allclose(np.asarray(y)[:n], np.asarray(y_ref)[:n],
                               rtol=1e-3, atol=1e-4)

    g_ref = jax.jit(jax.grad(lambda q, k, v: (
        halo_gat_attention(hg, mesh, as_oracle(q), as_oracle(k),
                           as_oracle(v)) ** 2).sum(),
        argnums=(0, 1, 2)))(qs, ks, vs)
    g_ell = jax.jit(jax.grad(lambda q, k, v: (
        halo_attention_ell(hg, he, mesh, q, k, v) ** 2).sum(),
        argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b in zip(g_ell, g_ref):
        np.testing.assert_allclose(np.asarray(a)[:n], np.asarray(b)[:n],
                                   rtol=2e-3, atol=2e-3)


def test_halo_ell_overlap_sections(setup):
    """Structural invariants of the overlap split (round-2 verdict #2):
    every dst-bucket INTERIOR row touches only local columns (≤ n_per),
    every halo row of the transpose packing lives in its bucket's HEAD
    section, and halo_pos_t lands each halo row at its head-section
    output position."""
    from custom_op_benchmark_tpu.parallel import halo_ell

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    p, n_per = hg.num_parts, hg.n_per

    for cols, n_bnd in zip(he.cols_b, he.n_bnd):
        c = np.asarray(jax.device_get(cols))
        cut = c.shape[1] - n_bnd
        assert (c[:, :cut] <= n_per).all(), "interior rows touch halo cols"

    n_ext = n_per + 1 + p * hg.halo
    base = 0
    halo_pos = np.asarray(jax.device_get(he.halo_pos_t))
    for rows_t, n_halo in zip(he.rows_t_b, he.n_halo_t):
        rt = np.asarray(jax.device_get(rows_t))
        # No halo row outside the head section.
        tail = rt[:, n_halo:]
        assert not ((tail >= n_per + 1) & (tail < n_ext)).any()
        # Head-section halo rows map back through halo_pos_t.
        head = rt[:, :n_halo]
        ss, jj = np.nonzero((head >= n_per + 1) & (head < n_ext))
        assert (halo_pos[ss, head[ss, jj] - (n_per + 1)]
                == base + jj).all()
        base += n_halo
    # Rows absent from the packing point at the zero entry.
    assert (halo_pos <= he.halo_rows_t).all()


def test_halo_ell_interior_fraction_with_clustering():
    """After cluster_order renumbering, most bucket rows must be
    interior — the overlap split only buys latency hiding if the
    interior sections dominate."""
    from custom_op_benchmark_tpu.data import planted_partition
    from custom_op_benchmark_tpu.graph import cluster_order, reorder_graph
    from custom_op_benchmark_tpu.parallel import halo_ell

    ds = planted_partition(num_classes=8, nodes_per_class=64, seed=1,
                           homophily=0.95, avg_degree=8)
    g, _ = reorder_graph(ds.graph, cluster_order(ds.graph, 4))
    mesh = make_mesh((4,), ("edge",))
    hg = halo_graph(g, mesh)
    he = halo_ell(hg, mesh)
    total = sum(np.asarray(jax.device_get(r)).shape[1]
                for r in he.rows_b)
    bnd = sum(he.n_bnd)
    assert bnd < 0.5 * total, (bnd, total)


def test_halo_attention_ell_single_head(setup):
    from custom_op_benchmark_tpu.parallel import halo_attention_ell, halo_ell

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    n = g.n_nodes
    q = rng.normal(size=(n, 8)).astype(np.float32)
    kf = rng.normal(size=(n, 8)).astype(np.float32)
    vf = rng.normal(size=(n, 8)).astype(np.float32)

    s = sddmm(g, jnp.asarray(kf), jnp.asarray(q)) / jnp.sqrt(8.0)
    a = edge_softmax(g, s, by="dst")
    y_ref = vector_spmm(g.reverse(), a[g.csc_perm], jnp.asarray(vf))

    y = halo_attention_ell(
        hg, he, mesh,
        shard_halo_nodes(hg, mesh, q),
        shard_halo_nodes(hg, mesh, kf),
        shard_halo_nodes(hg, mesh, vf),
    )
    np.testing.assert_allclose(np.asarray(y)[:n], np.asarray(y_ref),
                               rtol=1e-3, atol=1e-4)


def test_halo_spmm_ell_matches(setup):
    from custom_op_benchmark_tpu.parallel import halo_ell, halo_spmm_ell

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    d = 8
    x = rng.normal(size=(g.n_nodes, d)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)
    ed_h = halo_edge_data(hg, mesh, ed)
    xs = shard_halo_nodes(hg, mesh, x)
    y_ref = halo_spmm(hg, mesh, ed_h, xs)
    y = halo_spmm_ell(hg, he, mesh, ed_h, xs)
    np.testing.assert_allclose(np.asarray(y)[: g.n_nodes],
                               np.asarray(y_ref)[: g.n_nodes],
                               rtol=1e-4, atol=1e-4)
    # Grads flow.
    gx = jax.jit(jax.grad(lambda x: (halo_spmm_ell(hg, he, mesh, ed_h, x)
                                     ** 2).sum()))(xs)
    gx_ref = jax.jit(jax.grad(lambda x: (halo_spmm(hg, mesh, ed_h, x)
                                         ** 2).sum()))(xs)
    np.testing.assert_allclose(np.asarray(gx)[: g.n_nodes],
                               np.asarray(gx_ref)[: g.n_nodes],
                               rtol=1e-3, atol=1e-3)


def test_halo_spmm_ell_dedata_grad(setup):
    """The dedata cotangent (slot_pos gather path of the hand VJP)
    matches the sorted-segment plan's autodiff."""
    from custom_op_benchmark_tpu.parallel import halo_ell, halo_spmm_ell

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    x = rng.normal(size=(g.n_nodes, 8)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)
    ed_h = halo_edge_data(hg, mesh, ed)
    xs = shard_halo_nodes(hg, mesh, x)
    ge = jax.jit(jax.grad(lambda e: (halo_spmm_ell(hg, he, mesh, e, xs)
                                     ** 2).sum()))(ed_h)
    ge_ref = jax.jit(jax.grad(lambda e: (halo_spmm(hg, mesh, e, xs)
                                         ** 2).sum()))(ed_h)
    # Compare on real edge slots only (pad slots differ harmlessly).
    eid = np.asarray(jax.device_get(hg.eid)).reshape(-1)
    mask = eid < g.num_edges_padded
    np.testing.assert_allclose(np.asarray(ge).reshape(-1)[mask],
                               np.asarray(ge_ref).reshape(-1)[mask],
                               rtol=1e-3, atol=1e-3)


def test_halo_packed_weights_spmm(setup):
    """Per-shard dual-packed static weights: same forward as the
    slot-order path, dx grad matches, and both packed cotangent copies
    agree with the canonical edata cotangent."""
    from custom_op_benchmark_tpu.parallel import halo_ell, halo_spmm_ell
    from custom_op_benchmark_tpu.parallel.halo import halo_pack_weights

    g, mesh, hg, rng = setup
    he = halo_ell(hg, mesh)
    x = rng.normal(size=(g.n_nodes, 8)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)
    ed_h = halo_edge_data(hg, mesh, ed)
    xs = shard_halo_nodes(hg, mesh, x)
    w = halo_pack_weights(hg, he, mesh, ed)

    y_pk = halo_spmm_ell(hg, he, mesh, w, xs)
    y_sl = halo_spmm_ell(hg, he, mesh, ed_h, xs)
    np.testing.assert_allclose(np.asarray(y_pk)[: g.n_nodes],
                               np.asarray(y_sl)[: g.n_nodes],
                               rtol=1e-5, atol=1e-5)

    gx = jax.jit(jax.grad(lambda x: (halo_spmm_ell(hg, he, mesh, w, x)
                                     ** 2).sum()))(xs)
    gx_ref = jax.jit(jax.grad(lambda x: (halo_spmm_ell(
        hg, he, mesh, ed_h, x) ** 2).sum()))(xs)
    np.testing.assert_allclose(np.asarray(gx)[: g.n_nodes],
                               np.asarray(gx_ref)[: g.n_nodes],
                               rtol=1e-3, atol=1e-3)

    # Packed weight cotangents: both copies match the slot-order grad.
    gw = jax.jit(jax.grad(lambda w: (halo_spmm_ell(hg, he, mesh, w, xs)
                                     ** 2).sum()))(w)
    ge = jax.jit(jax.grad(lambda e: (halo_spmm_ell(hg, he, mesh, e, xs)
                                     ** 2).sum()))(ed_h)
    ge_np = np.asarray(ge)
    for dwl, epos in zip(gw.local, he.epos_b):
        ep = np.asarray(jax.device_get(epos))
        dwl_np = np.asarray(dwl)
        for s in range(hg.num_parts):
            valid = ep[s] < hg.edges_per_part
            np.testing.assert_allclose(
                dwl_np[s][valid],
                ge_np.reshape(hg.num_parts, -1)[s][ep[s][valid]],
                rtol=1e-3, atol=1e-3)


def test_halo_hub_replication(setup):
    """Vertex-cut hybrid (round-3 verdict #3): a hub plan
    (``hub_threshold=2``) must give identical forwards + grads to the
    plain all_to_all plan for both halo_spmm and the fused ELL
    attention, while shrinking the per-pair all_to_all payload M."""
    from custom_op_benchmark_tpu.parallel import (
        halo_attention_ell, halo_ell,
    )

    g, mesh, hg, rng = setup
    hgh = halo_graph(g, mesh, hub_threshold=2)
    n = g.n_nodes

    # Every real edge appears exactly once, like the plain plan.
    eids = np.asarray(jax.device_get(hgh.eid)).reshape(-1)
    real = eids[eids < g.num_edges_padded]
    assert len(real) == g.n_edges and len(np.unique(real)) == g.n_edges
    # The per-pair payload never grows; on the power-law fixture hubs
    # exist and it strictly shrinks.
    assert hgh.halo <= hg.halo
    if hgh.n_hub:
        send = np.asarray(jax.device_get(hgh.send_idx))
        send0 = np.asarray(jax.device_get(hg.send_idx))
        assert (send < hgh.n_per).sum() < (send0 < hg.n_per).sum()

    # halo_spmm equivalence.
    d = 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    ed = rng.uniform(size=g.num_edges_padded).astype(np.float32)
    y0 = halo_spmm(hg, mesh, halo_edge_data(hg, mesh, ed),
                   shard_halo_nodes(hg, mesh, x))
    y1 = halo_spmm(hgh, mesh, halo_edge_data(hgh, mesh, ed),
                   shard_halo_nodes(hgh, mesh, x))
    np.testing.assert_allclose(np.asarray(y1)[:n], np.asarray(y0)[:n],
                               rtol=1e-4, atol=1e-4)

    # Fused ELL attention + grads equivalence (incl. the hub psum_scatter
    # gradient return).
    heh = halo_ell(hgh, mesh)
    he0 = halo_ell(hg, mesh)
    q = rng.normal(size=(n, 2, 8)).astype(np.float32)
    q0 = shard_halo_nodes(hg, mesh, q)
    q1 = shard_halo_nodes(hgh, mesh, q)
    ya = halo_attention_ell(hg, he0, mesh, q0, q0, q0)
    yb = halo_attention_ell(hgh, heh, mesh, q1, q1, q1)
    np.testing.assert_allclose(np.asarray(yb)[:n], np.asarray(ya)[:n],
                               rtol=1e-3, atol=1e-4)
    ga = jax.jit(jax.grad(lambda q: (halo_attention_ell(
        hg, he0, mesh, q, q, q) ** 2).sum()))(q0)
    gb = jax.jit(jax.grad(lambda q: (halo_attention_ell(
        hgh, heh, mesh, q, q, q) ** 2).sum()))(q1)
    np.testing.assert_allclose(np.asarray(gb)[:n], np.asarray(ga)[:n],
                               rtol=2e-3, atol=2e-3)


def test_halo_attention_2d_edge_head_mesh():
    """Full 2-D edge × head parallelism in ONE op: q/k/v sharded
    P('edge', 'head', None); results + grads match the 1-D edge mesh."""
    from custom_op_benchmark_tpu.parallel import (
        halo_attention_ell, halo_ell, halo_graph, make_mesh,
    )
    from custom_op_benchmark_tpu.parallel.halo import shard_halo_nodes
    from jax.sharding import NamedSharding, PartitionSpec as P2

    rng = np.random.default_rng(3)
    g = random_graph(120, 900, seed=4, power_law=True)
    mesh2 = make_mesh((4, 2), ("edge", "head"))
    hg = halo_graph(g, mesh2)
    he = halo_ell(hg, mesh2)
    n, h, d = g.n_nodes, 4, 8
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)

    def put2(x):
        x = np.pad(x, [(0, hg.n_pad - x.shape[0]), (0, 0), (0, 0)])
        return jax.device_put(
            x, NamedSharding(mesh2, P2("edge", "head", None)))

    q2, k2, v2 = put2(q), put2(k), put2(v)
    y2 = halo_attention_ell(hg, he, mesh2, q2, k2, v2,
                            head_axis="head")

    mesh1 = make_mesh((4,), ("edge",))
    hg1 = halo_graph(g, mesh1)
    he1 = halo_ell(hg1, mesh1)
    y1 = halo_attention_ell(
        hg1, he1, mesh1,
        shard_halo_nodes(hg1, mesh1, q),
        shard_halo_nodes(hg1, mesh1, k),
        shard_halo_nodes(hg1, mesh1, v))
    np.testing.assert_allclose(np.asarray(y2)[:n], np.asarray(y1)[:n],
                               rtol=1e-4, atol=1e-4)

    g2 = jax.jit(jax.grad(lambda q, k, v: (halo_attention_ell(
        hg, he, mesh2, q, k, v, head_axis="head") ** 2).sum(),
        argnums=(0, 1, 2)))(q2, k2, v2)
    g1 = jax.jit(jax.grad(lambda q, k, v: (halo_attention_ell(
        hg1, he1, mesh1, q, k, v) ** 2).sum(), argnums=(0, 1, 2)))(
        shard_halo_nodes(hg1, mesh1, q),
        shard_halo_nodes(hg1, mesh1, k),
        shard_halo_nodes(hg1, mesh1, v))
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a)[:n], np.asarray(b)[:n],
                                   rtol=1e-3, atol=1e-3)
