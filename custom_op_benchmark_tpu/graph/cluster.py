"""Locality clustering: BFS-grown balanced partitions (host-side).

The halo-exchange distributed plan's communication volume is the
partition's edge-cut (parallel/halo.py). Contiguous node ownership
(``id // n_per``) cuts almost every edge on an arbitrarily-numbered
graph; renumbering nodes so that graph neighborhoods are contiguous
makes most edges shard-internal — the METIS role, filled here with a
cheap multi-seed BFS growth that needs no external dependencies.

Composes with the rest of the layout machinery: the result is a
:class:`graph.reorder.Reordering`, applied with ``reorder_graph`` before
building the halo plan (or BSR tiling — community locality helps both).
"""

from __future__ import annotations

import numpy as np

from custom_op_benchmark_tpu.graph.reorder import Reordering


def _refine(part, src, dst, n, num_parts, n_per, iters=10, seed=0):
    """Balanced label-propagation refinement (Kernighan-Lin-lite).

    Each sweep moves nodes toward the part holding most of their
    neighbors, greedily by gain, under the strict per-part capacity
    ``n_per``. Vectorized numpy; each sweep is O(e + n·P)."""
    rng = np.random.default_rng(seed)
    for _ in range(iters):
        counts = np.zeros((n, num_parts), np.int32)
        np.add.at(counts, (src, part[dst]), 1)
        np.add.at(counts, (dst, part[src]), 1)
        cur_cnt = counts[np.arange(n), part]
        best = np.argmax(counts, axis=1)
        gain = counts[np.arange(n), best] - cur_cnt
        movers = np.nonzero((gain > 0) & (best != part))[0]
        if len(movers) == 0:
            break
        # Greedy by gain (random tie-break), capacity-constrained.
        movers = movers[np.argsort(-(gain[movers] * n +
                                     rng.integers(0, n, len(movers))))]
        size = np.bincount(part, minlength=num_parts)
        moved = 0
        for v in movers:
            b = best[v]
            if size[b] < n_per and size[part[v]] > 1:
                size[part[v]] -= 1
                size[b] += 1
                part[v] = b
                moved += 1
        if moved == 0:
            break
    return part


def cluster_order(g, num_parts: int, *, seed: int = 0,
                  refine_iters: int = 10) -> Reordering:
    """Renumber nodes by BFS-grown, label-propagation-refined balanced
    clusters.

    Phase 1 grows ``num_parts`` equal-size parts by BFS from high-degree
    seeds; phase 2 refines with capacity-constrained label propagation
    (moves nodes to their neighbor-majority part). New ids are sorted by
    (part, old id), so part ``p`` owns the contiguous id range
    ``[p·n_per, (p+1)·n_per)`` — exactly the ownership rule
    `parallel.halo.halo_graph` uses.
    """
    import jax

    n, e = g.n_nodes, g.n_edges
    src = np.asarray(jax.device_get(g.src))[:e].astype(np.int64)
    dst = np.asarray(jax.device_get(g.dst))[:e].astype(np.int64)

    # Undirected CSR adjacency.
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(u, minlength=n), out=indptr[1:])
    deg = np.diff(indptr)

    from collections import deque

    n_per = -(-n // num_parts)
    perm = np.full(n, -1, dtype=np.int32)
    queued = np.zeros(n, dtype=bool)
    by_degree = np.argsort(-deg, kind="stable")
    next_seed = 0
    assigned = 0
    frontier: deque = deque()
    part_room = n_per

    while assigned < n:
        if not frontier:
            while next_seed < n and perm[by_degree[next_seed]] >= 0:
                next_seed += 1
            if next_seed >= n:
                break
            frontier.append(int(by_degree[next_seed]))
        node = frontier.popleft()            # breadth-first growth
        if perm[node] >= 0:
            continue
        perm[node] = assigned
        assigned += 1
        part_room -= 1
        if part_room == 0:
            # Start the next part fresh from a new high-degree seed.
            frontier.clear()
            queued[:] = False
            part_room = n_per
            continue
        for p in range(indptr[node], indptr[node + 1]):
            nb = int(v[p])
            if perm[nb] < 0 and not queued[nb]:
                queued[nb] = True
                frontier.append(nb)

    part = (perm // n_per).astype(np.int32)
    # Refinement capacity gets ~12% slack: with exactly-full parts no
    # single move is legal (classic KL needs swaps); slack restores
    # mobility at the cost of slightly wider ownership ranges (the gap
    # ids are isolated padding nodes).
    cap = n_per + max(1, (12 * n_per) // 100)
    if refine_iters > 0 and e > 0:
        part = _refine(part, src, dst, n, num_parts, cap,
                       iters=refine_iters, seed=seed)
    # New ids sorted by (part, old id); part p owns [p·cap, (p+1)·cap).
    order = np.lexsort((np.arange(n), part))
    perm = np.empty(n, dtype=np.int32)
    for p in range(num_parts):
        members = order[part[order] == p]
        perm[members] = p * cap + np.arange(len(members), dtype=np.int32)
    return Reordering(perm=perm, n_new=int(num_parts * cap), n_old=n)
