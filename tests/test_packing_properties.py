"""Property-style randomized tests for the packing invariants.

No hypothesis in this image; seeded random sweeps over many graph
shapes (power-law, uniform, stars, chains, self-loops, multigraphs,
empty) play the same role — every invariant the layouts rely on is
checked structurally, not through op outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import from_coo, random_graph
from custom_op_benchmark_tpu.graph.ell import ell_pack
from custom_op_benchmark_tpu.ops import (
    ell_cross_packed,
    ell_dual,
    ell_gather_edges,
    ell_scatter_edges,
)


def _graph_zoo():
    rng = np.random.default_rng(7)
    zoo = []
    for seed, (n, e, pl) in enumerate([
        (50, 200, False), (200, 1500, True), (64, 64, False),
        (300, 4000, True), (17, 40, False),
    ]):
        zoo.append(random_graph(n, e, seed=seed, power_law=pl))
    # Star: hub receives from everyone (max in-degree = n-1).
    n = 40
    zoo.append(from_coo(np.arange(1, n), np.zeros(n - 1, int), n))
    # Chain + self-loops.
    zoo.append(from_coo(
        np.r_[np.arange(n - 1), np.arange(n)],
        np.r_[np.arange(1, n), np.arange(n)], n))
    # Multigraph: repeated edges.
    zoo.append(from_coo([0, 0, 0, 1, 1], [1, 1, 2, 2, 2], 4))
    # Edges padded to a tile multiple.
    zoo.append(from_coo(rng.integers(0, 30, 97),
                        rng.integers(0, 30, 97), 30, pad_multiple=128))
    return zoo


@pytest.mark.parametrize("gi", range(9))
@pytest.mark.parametrize("direction", ["src", "dst"])
def test_ell_pack_invariants(gi, direction):
    g = _graph_zoo()[gi]
    eg = ell_pack(g, direction=direction)
    n, e, e_pad = g.n_nodes, g.n_edges, g.num_edges_padded

    # 1. Every real edge appears exactly once across buckets.
    eids = np.concatenate(
        [np.asarray(b.eid).ravel() for b in eg.buckets]
    ) if eg.buckets else np.empty(0, np.int64)
    real = eids[eids < e_pad]
    if direction == "src":
        expected = np.arange(e)
    else:
        expected = np.sort(np.asarray(g.csc_perm)[:e])
    np.testing.assert_array_equal(np.sort(real), expected)

    # 2. Bucket rows: each row's eid count equals the node's degree, and
    # the row's owner appears in rows[].
    import jax as _jax

    indptr = np.asarray(_jax.device_get(
        g.indptr_r if direction == "src" else g.indptr_c))[: n + 1]
    deg = np.diff(indptr)
    row_pos = np.asarray(eg.row_pos)
    rows_cat = np.concatenate(
        [np.asarray(b.rows) for b in eg.buckets]
    ) if eg.buckets else np.empty(0, np.int32)
    for v in range(n):
        if deg[v] == 0:
            assert row_pos[v] == eg.total_rows
        else:
            assert rows_cat[row_pos[v]] == v

    # 3. edge_pos inverts the packing: scatter→gather is the identity on
    # real edges (and bounded on padding).
    x = jnp.asarray(np.random.default_rng(gi).normal(
        size=(e_pad,)).astype(np.float32))
    if eg.buckets:
        back = ell_gather_edges(eg, ell_scatter_edges(eg, x))
        np.testing.assert_allclose(np.asarray(back)[:e],
                                   np.asarray(x)[:e], rtol=0)
    assert int(np.asarray(eg.edge_pos).max()) <= eg.total_slots

    # 4. Padding slots point at the dummy node / scratch eid.
    for b in eg.buckets:
        cols = np.asarray(b.cols)
        eid = np.asarray(b.eid)
        assert ((cols == n) == (eid == e_pad)).all()


@pytest.mark.parametrize("gi", [0, 1, 3, 7])
def test_twin_slot_roundtrip_matches_canonical(gi):
    g = _graph_zoo()[gi]
    se, de = ell_dual(g)
    if not se.buckets or not de.buckets:
        pytest.skip("empty packing")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(g.num_edges_padded,)).astype(np.float32))
    packed_src = ell_scatter_edges(se, x)
    # twin hop == canonical round trip, slot for slot.
    via_twin = ell_cross_packed(se, de, packed_src)
    via_canon = ell_scatter_edges(de, ell_gather_edges(se, packed_src))
    for a, b, bucket in zip(via_twin, via_canon, de.buckets):
        mask = np.asarray(bucket.eid) < g.num_edges_padded
        np.testing.assert_allclose(np.asarray(a)[mask],
                                   np.asarray(b)[mask], rtol=0)


@pytest.mark.parametrize("gi", [1, 3, 5])
def test_halo_plan_invariants(gi):
    from custom_op_benchmark_tpu.parallel import (
        halo_ell, halo_graph, make_mesh,
    )

    g = _graph_zoo()[gi]
    mesh = make_mesh((4,), ("edge",))
    hg = halo_graph(g, mesh)
    he = halo_ell(hg, mesh)
    p, n_per, m = hg.num_parts, hg.n_per, hg.halo

    # Every real edge lands on exactly one shard, owned by its dst.
    eid = np.asarray(jax.device_get(hg.eid))
    dst_loc = np.asarray(jax.device_get(hg.dst_loc))
    seen = []
    for s in range(p):
        sel = eid[s] < g.num_edges_padded
        seen.append(eid[s][sel])
        dsts = np.asarray(jax.device_get(g.dst))[eid[s][sel]]
        assert (dsts // n_per == s).all()
        assert (dst_loc[s][sel] == dsts - s * n_per).all()
    np.testing.assert_array_equal(
        np.sort(np.concatenate(seen)), np.arange(g.n_edges))

    # recv_pos is the inverse of send_idx: recv_pos[r, v, s] = s·M + m
    # exactly when send_idx[r, s, m] == v.
    send_idx = np.asarray(jax.device_get(hg.send_idx))
    recv_pos = np.asarray(jax.device_get(he.recv_pos))
    for r in range(p):
        for s in range(p):
            for mm in range(m):
                v = send_idx[r, s, mm]
                if v < n_per:
                    assert recv_pos[r, v, s] == s * m + mm
    # Unreferenced (v, s) pairs point at the zero slot.
    assert (recv_pos <= p * m).all()
