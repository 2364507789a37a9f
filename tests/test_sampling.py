"""Neighbor sampling + minibatch pipeline tests (BASELINE.md config 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from custom_op_benchmark_tpu.data import (
    NeighborSampler,
    planted_partition,
    prefetch,
)
from custom_op_benchmark_tpu.models import GraphSAGE
from custom_op_benchmark_tpu.train import fit_sampled


@pytest.fixture(scope="module")
def ds():
    return planted_partition(
        num_classes=3, nodes_per_class=60, feat_dim=8, avg_degree=6, seed=1
    )


def test_sampler_static_shapes(ds):
    sampler = NeighborSampler(ds.graph, [5, 3], seed=0)
    seeds = np.arange(8)
    b1 = sampler.sample(seeds)
    b2 = sampler.sample(seeds + 8)
    assert b1.graph.num_edges_padded == b2.graph.num_edges_padded
    assert b1.graph.n_nodes == b2.graph.n_nodes
    assert b1.node_ids.shape == b2.node_ids.shape


def test_sampler_edges_are_real_in_edges(ds):
    import jax

    g = ds.graph
    sampler = NeighborSampler(g, [4], seed=0)
    seeds = np.array([0, 5, 9])
    b = sampler.sample(seeds, add_self_loops=False)
    # Every sampled edge (u -> v) must exist in the original graph with v a
    # seed, u a real node.
    src_g = np.asarray(jax.device_get(g.src))[: g.n_edges]
    dst_g = np.asarray(jax.device_get(g.dst))[: g.n_edges]
    real = set(zip(src_g.tolist(), dst_g.tolist()))
    bsrc = np.asarray(b.graph.src)
    bdst = np.asarray(b.graph.dst)
    mask = np.asarray(b.graph.edge_mask)
    ids = b.node_ids
    for s, d in zip(bsrc[mask], bdst[mask]):
        gs, gd = int(ids[s]), int(ids[d])
        assert (gs, gd) in real
        assert gd in set(seeds.tolist())


def test_sampler_respects_fanout(ds):
    g = ds.graph
    sampler = NeighborSampler(g, [2], seed=0)
    b = sampler.sample(np.arange(16), add_self_loops=False)
    dst = np.asarray(b.graph.dst)[np.asarray(b.graph.edge_mask)]
    _, counts = np.unique(dst, return_counts=True)
    assert counts.max() <= 2


def test_prefetch_preserves_order():
    items = list(range(20))
    out = list(prefetch(iter(items), size=3, device_put=False))
    assert out == items


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), size=2, device_put=False)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_fit_sampled_decreases_loss(ds):
    model = GraphSAGE(hidden_dim=16, out_dim=ds.num_classes)
    state, metrics = fit_sampled(
        model, ds, fanouts=(4, 3), batch_size=32, epochs=3,
        learning_rate=1e-2,
    )
    losses = metrics["losses"]
    assert len(losses) > 3
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert np.isfinite(metrics["val_acc"])


def test_in_cols_matches_graph(ds):
    """The static one-bucket in-neighbor matrix holds exactly the batch
    graph's edges (same multiset per dst)."""
    s = NeighborSampler(ds.graph, [5, 3], seed=0)
    b = s.sample(np.arange(16))
    n = b.graph.n_nodes
    src = np.asarray(b.graph.src)[: b.graph.n_edges]
    dst = np.asarray(b.graph.dst)[: b.graph.n_edges]
    from collections import Counter

    want = Counter(zip(dst.tolist(), src.tolist()))
    got = Counter()
    for v in range(n):
        for u in np.asarray(b.in_cols)[v]:
            if u < n:
                got[(v, int(u))] += 1
    assert got == want


def test_sampled_copy_spmm_matches_oracle(ds):
    from custom_op_benchmark_tpu.ops import gspmm
    from custom_op_benchmark_tpu.ops.sampled import sampled_copy_spmm

    s = NeighborSampler(ds.graph, [5, 3], seed=0)
    b = s.sample(np.arange(16))
    n = b.graph.n_nodes
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32))
    cols = jnp.asarray(b.in_cols)

    def f_fast(x):
        return (sampled_copy_spmm(cols, b.graph, x, reduce="mean") ** 2
                ).sum()

    def f_ref(x):
        return (gspmm(b.graph, "copy_lhs", "mean", lhs=x, lhs_target="u",
                      to="dst") ** 2).sum()

    np.testing.assert_allclose(float(f_fast(x)), float(f_ref(x)),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fast)(x)), np.asarray(jax.grad(f_ref)(x)),
        rtol=1e-3, atol=1e-4,
    )


def test_sampler_trims_instead_of_raising():
    """A batch exceeding the static node bound trims the deepest hop
    instead of killing the epoch (round-1 weak #9)."""
    ds2 = planted_partition(num_classes=2, nodes_per_class=30, feat_dim=4,
                            avg_degree=20, seed=3)
    s = NeighborSampler(ds2.graph, [20, 20], seed=0)
    # bound = min(worst-case, 2n) clamps here; sample must not raise
    b = s.sample(np.arange(30))
    assert b.graph.n_nodes == s.max_shapes(30)[0]
    assert np.asarray(b.node_ids)[:30].tolist() == list(range(30))


def test_fit_sampled_fast_path_converges(ds):
    model = GraphSAGE(hidden_dim=16, out_dim=3, num_layers=2)
    _, metrics = fit_sampled(model, ds, fanouts=(5, 3), batch_size=32,
                             epochs=12, learning_rate=1e-2)
    assert metrics["val_acc"] > 0.8, metrics


def test_fit_sampled_dp(ds):
    """Minibatch data parallelism: P sampled subgraphs per step sharded
    over a mesh axis, psum-averaged grads (SURVEY §2.4 DP plan)."""
    from custom_op_benchmark_tpu.parallel import make_mesh
    from custom_op_benchmark_tpu.train import fit_sampled_dp

    mesh = make_mesh((4,), ("batch",))
    model = GraphSAGE(hidden_dim=16, out_dim=3, num_layers=2)
    _, metrics = fit_sampled_dp(model, ds, mesh, fanouts=(5, 3),
                                batch_size=16, epochs=10,
                                learning_rate=1e-2)
    assert metrics["num_devices"] == 4
    assert metrics["val_acc"] > 0.8, metrics
