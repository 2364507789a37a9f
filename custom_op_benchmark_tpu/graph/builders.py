"""Synthetic graph builders (host-side fixtures and benchmark workloads)."""

from __future__ import annotations


import numpy as np

from custom_op_benchmark_tpu.graph.graph import Graph, from_coo


def clique_batch(batch_size: int = 512, length: int = 30,
                 **kw) -> Graph:
    """A batch of disjoint cliques — the reference benchmark workload.

    ``batch_size`` disjoint ``length``-node cliques with self-loops, i.e.
    the block-diagonal mask of batched dense self-attention
    (reference: wrapper.py:79-101 builds exactly this; 512×30 gives
    n=15,360 nodes and e=460,800 edges). The canonical (row-sorted) edge
    order here coincides with the reference's insertion order.
    """
    l, b = length, batch_size
    base = np.arange(b, dtype=np.int64)[:, None, None] * l
    x = np.arange(l, dtype=np.int64)[None, :, None]
    y = np.arange(l, dtype=np.int64)[None, None, :]
    src = (base + x + 0 * y).reshape(-1)
    dst = (base + 0 * x + y).reshape(-1)
    return from_coo(src, dst, n_nodes=b * l, **kw)


def random_graph(n_nodes: int, n_edges: int, *, seed: int = 0,
                 power_law: bool = False, self_loops: bool = True,
                 **kw) -> Graph:
    """A random directed multigraph (uniform or power-law degrees).

    Power-law mode skews destination popularity ~ Zipf, the degree profile
    that stresses load balancing (reference: part_csr.py exists exactly to
    handle skewed row lengths).
    """
    rng = np.random.default_rng(seed)
    if power_law:
        w = 1.0 / np.arange(1, n_nodes + 1) ** 0.75
        w /= w.sum()
        src = rng.choice(n_nodes, size=n_edges, p=w)
        dst = rng.integers(0, n_nodes, size=n_edges)
    else:
        src = rng.integers(0, n_nodes, size=n_edges)
        dst = rng.integers(0, n_nodes, size=n_edges)
    if self_loops:
        # Guarantee every node has at least one in/out edge (keeps segment
        # softmax well-defined on every real segment in tests).
        loops = np.arange(n_nodes, dtype=np.int64)
        src = np.concatenate([src, loops])
        dst = np.concatenate([dst, loops])
    return from_coo(src, dst, n_nodes=n_nodes, **kw)


def grid_graph(rows: int, cols: int, **kw) -> Graph:
    """A 4-neighbour 2-D grid with self-loops (deterministic fixture)."""
    idx = np.arange(rows * cols).reshape(rows, cols)
    edges = [(idx.ravel(), idx.ravel())]
    edges.append((idx[:-1, :].ravel(), idx[1:, :].ravel()))
    edges.append((idx[1:, :].ravel(), idx[:-1, :].ravel()))
    edges.append((idx[:, :-1].ravel(), idx[:, 1:].ravel()))
    edges.append((idx[:, 1:].ravel(), idx[:, :-1].ravel()))
    src = np.concatenate([a for a, _ in edges])
    dst = np.concatenate([b for _, b in edges])
    return from_coo(src, dst, n_nodes=rows * cols, **kw)


def add_self_loops(g: Graph, **kw) -> Graph:
    """Return ``g`` with one self-loop per node (dedup'd).

    GCN-style models want Â = A + I; synthetic builders add loops
    already, `from_numpy_files` datasets may not.
    """
    import jax

    src = np.asarray(jax.device_get(g.src))[: g.n_edges].astype(np.int64)
    dst = np.asarray(jax.device_get(g.dst))[: g.n_edges].astype(np.int64)
    have = set(zip(src[src == dst].tolist(), dst[src == dst].tolist()))
    need = np.asarray(
        [v for v in range(g.n_nodes) if (v, v) not in have], np.int64
    )
    return from_coo(
        np.concatenate([src, need]), np.concatenate([dst, need]),
        n_nodes=g.n_nodes, **kw,
    )


def remove_duplicate_edges(g: Graph, **kw) -> Graph:
    """Collapse multi-edges to simple-graph semantics (needed by the
    dense-block view; ELL/segment paths keep multigraph semantics like
    the reference's raw edge lists)."""
    import jax

    src = np.asarray(jax.device_get(g.src))[: g.n_edges].astype(np.int64)
    dst = np.asarray(jax.device_get(g.dst))[: g.n_edges].astype(np.int64)
    uniq = np.unique(src * g.n_nodes + dst)
    return from_coo(uniq // g.n_nodes, uniq % g.n_nodes,
                    n_nodes=g.n_nodes, **kw)
