"""Halo-exchange distributed execution: owner-computes with all_to_all.

The second-generation distributed design (BASELINE.json north star:
"boundary node features exchanged with all-to-all collectives over ICI,
overlapped with local SpMM aggregation"). Compared to the plain
edge-partitioning of shard_ops.py (all_gather everything + psum_scatter
everything), the halo plan:

- assigns every edge to the shard that OWNS its aggregation target
  (dst), so segment reductions — including softmax — are fully local:
  no cross-chip pmax/psum at all;
- exchanges only the boundary (halo) source rows each shard actually
  needs, through ONE static-shape ``all_to_all`` per layer, which XLA's
  latency-hiding scheduler overlaps with the local compute;
- communication volume scales with the partition's edge-cut (improved by
  graph/reorder.py locality orderings), not with n_nodes.

All plan construction is host-side numpy (cold path — cache it with
graph/cache.py). The ops are differentiable end to end: all_to_all
transposes to all_to_all, local gathers to local scatters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custom_op_benchmark_tpu.graph.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """Static halo-exchange plan over a 1-D mesh axis.

    Leaves (global arrays, sharded over the first dim):
      send_idx: (P, P, M) int32 — shard r sends its local rows
                ``send_idx[r, s, :]`` to shard s (pad = n_per, a zero row).
      src_ext:  (P, E_p) int32 — per-edge source in EXTENDED local
                numbering: [0, n_per) owned rows, n_per the zero row,
                n_per+1+r·M+m the m-th row received from shard r.
      dst_loc:  (P, E_p) int32 — per-edge LOCAL dst row (pad = n_per);
                sorted ascending within each shard (sorted segments).
      eid:      (P, E_p) int32 — canonical edge id per slot (pad = E_pad).

    Static: n_nodes, n_edges, num_parts, n_per, halo (M), edges_per_part,
    axis.
    """

    send_idx: jax.Array
    src_ext: jax.Array
    dst_loc: jax.Array
    eid: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    num_parts: int = dataclasses.field(metadata=dict(static=True))
    n_per: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    edges_per_part: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_pad(self) -> int:
        return self.num_parts * self.n_per

    @property
    def halo_fraction(self) -> float:
        """Exchanged rows / owned rows (communication metric)."""
        return (self.num_parts * self.halo) / max(self.n_per, 1)


def halo_graph(g: Graph, mesh: Mesh, axis: str = "edge",
               pad_multiple: int = 8) -> HaloGraph:
    """Build the halo plan: owner-of-dst edge placement + send lists."""
    p = mesh.shape[axis]
    n, e = g.n_nodes, g.n_edges
    n_per = -(-n // p)
    src = np.asarray(jax.device_get(g.src))[:e].astype(np.int64)
    dst = np.asarray(jax.device_get(g.dst))[:e].astype(np.int64)
    owner = dst // n_per

    # Per-shard edges, sorted by local dst (sorted segment reductions).
    shard_edges = []
    for s in range(p):
        sel = np.nonzero(owner == s)[0]
        order = np.argsort(dst[sel], kind="stable")
        shard_edges.append(sel[order])
    e_p = max((len(x) for x in shard_edges), default=1)
    e_p = -(-max(e_p, 1) // pad_multiple) * pad_multiple

    # Halo needs: for (r → s), owned-by-r src rows used by s.
    needs = [[None] * p for _ in range(p)]
    m_max = 0
    for s in range(p):
        es = shard_edges[s]
        remote = src[es]
        for r in range(p):
            if r == s:
                needs[r][s] = np.empty(0, np.int64)
                continue
            mask = (remote // n_per) == r
            uniq = np.unique(remote[mask])
            needs[r][s] = uniq
            m_max = max(m_max, len(uniq))
    m_max = -(-max(m_max, 1) // pad_multiple) * pad_multiple

    send_idx = np.full((p, p, m_max), n_per, dtype=np.int32)
    for r in range(p):
        for s in range(p):
            u = needs[r][s]
            send_idx[r, s, : len(u)] = u - r * n_per

    src_ext = np.full((p, e_p), n_per, dtype=np.int32)
    dst_loc = np.full((p, e_p), n_per, dtype=np.int32)
    eid = np.full((p, e_p), g.num_edges_padded, dtype=np.int32)
    for s in range(p):
        es = shard_edges[s]
        cnt = len(es)
        dst_loc[s, :cnt] = dst[es] - s * n_per
        eid[s, :cnt] = es
        # Map src → extended local index.
        sv = src[es]
        ext = np.empty(cnt, dtype=np.int32)
        local = (sv // n_per) == s
        ext[local] = (sv[local] - s * n_per).astype(np.int32)
        for r in range(p):
            if r == s:
                continue
            mask = (sv // n_per) == r
            if not mask.any():
                continue
            pos = np.searchsorted(needs[r][s], sv[mask])
            ext[mask] = (n_per + 1 + r * m_max + pos).astype(np.int32)
        src_ext[s, :cnt] = ext

    sh2 = NamedSharding(mesh, P(axis))
    return HaloGraph(
        send_idx=jax.device_put(jnp.asarray(send_idx), sh2),
        src_ext=jax.device_put(jnp.asarray(src_ext), sh2),
        dst_loc=jax.device_put(jnp.asarray(dst_loc), sh2),
        eid=jax.device_put(jnp.asarray(eid), sh2),
        n_nodes=n,
        n_edges=e,
        num_parts=p,
        n_per=int(n_per),
        halo=int(m_max),
        edges_per_part=int(e_p),
        axis=axis,
    )


def halo_node_sharding(hg: HaloGraph, mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(hg.axis))


def shard_halo_nodes(hg: HaloGraph, mesh: Mesh, x) -> jax.Array:
    """Pad a node array to (P·n_per, ...) and shard it row-wise."""
    x = jnp.asarray(x)
    if x.shape[0] < hg.n_pad:
        pad = [(0, hg.n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    return jax.device_put(x, halo_node_sharding(hg, mesh))


def _exchange(hg, send_idx, x_local):
    """Local rows → extended rows: pad, halo all_to_all, concat."""
    xp = jnp.pad(
        x_local, [(0, 1)] + [(0, 0)] * (x_local.ndim - 1)
    )                                           # (n_per+1, ...)
    sbuf = xp[send_idx[0]]                      # (P, M, ...)
    rbuf = jax.lax.all_to_all(
        sbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                           # (P, M, ...)
    return jnp.concatenate(
        [xp, rbuf.reshape((-1,) + x_local.shape[1:])], axis=0
    )                                           # (n_per+1+P·M, ...)


def _seg_sum_sorted(vals, ids, n):
    from custom_op_benchmark_tpu.ops import xla as _xla

    return _xla.segment_sum(vals, ids, n, sorted_ids=True)


def _seg_max_sorted(vals, ids, n):
    from custom_op_benchmark_tpu.ops import xla as _xla

    return _xla.segment_max(vals, ids, n, sorted_ids=True)


def halo_spmm(hg: HaloGraph, mesh: Mesh, edata, x):
    """y[u] = Σ_{e=(u,·)... aggregation over in-edges of each OWNED dst
    row: out[v] = Σ_{e=(u,v)} edata[e]·x[u], node-sharded in and out.

    edata: (P·E_p, ...) edge-sharded in the halo plan's slot order
    (use ``halo_edge_data`` to convert canonical edge tensors);
    x: (P·n_per, ...) node-sharded.
    """
    ax = hg.axis

    def f(send_idx, src_ext, dst_loc, ed, x):
        # Block shapes: send_idx (1,P,M), src_ext/dst_loc (1,E_p),
        # ed (E_p, ...) — its first dim IS the sharded dim.
        x_ext = _exchange(hg, send_idx, x)
        msg = ed.reshape(ed.shape + (1,) * (x.ndim - ed.ndim)) \
            * x_ext[src_ext[0]]
        return _seg_sum_sorted(msg, dst_loc[0], hg.n_per + 1)[: hg.n_per]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, hg.src_ext, hg.dst_loc, edata, x)


def halo_edge_data(hg: HaloGraph, mesh: Mesh, edata_canonical) -> jax.Array:
    """Canonical (E_pad, ...) edge tensor → halo slot order (P·E_p, ...)."""
    ed = jnp.asarray(edata_canonical)
    ed = jnp.pad(ed, [(0, 1)] + [(0, 0)] * (ed.ndim - 1))
    eid = np.asarray(jax.device_get(hg.eid)).reshape(-1)
    out = ed[jnp.asarray(np.minimum(eid, ed.shape[0] - 1))]
    return jax.device_put(out, NamedSharding(mesh, P(hg.axis)))


def halo_gat_attention(hg: HaloGraph, mesh: Mesh, q, k, v):
    """Fused distributed attention with purely-LOCAL softmax segments.

    Every in-edge of an owned dst row lives on its owner, so the
    softmax max/sum are plain sorted-segment reductions — no pmax/psum
    (contrast parallel/shard_ops.dist_gat_attention). One all_to_all per
    operand (k and v exchange; q stays local).

    q, k, v: (P·n_per, h, d) node-sharded. Returns the same.
    """
    ax = hg.axis
    d = q.shape[-1]

    def f(send_idx, src_ext, dst_loc, q, k, v):
        k_ext = _exchange(hg, send_idx, k)
        v_ext = _exchange(hg, send_idx, v)
        se = src_ext[0]
        dl = dst_loc[0]
        scores = jnp.einsum(
            "ehd,ehd->eh", k_ext[se], q[jnp.minimum(dl, hg.n_per - 1)]
        ) / jnp.sqrt(jnp.asarray(d, q.dtype))
        valid = (dl < hg.n_per)[:, None]
        scores = jnp.where(valid, scores, -1e30)
        m = _seg_max_sorted(
            jax.lax.stop_gradient(scores), dl, hg.n_per + 1
        )
        z = jnp.where(valid, jnp.exp(scores - m[dl]), 0)
        ssum = _seg_sum_sorted(z, dl, hg.n_per + 1)
        alpha = z / jnp.maximum(ssum[dl], 1e-30)
        contrib = alpha[:, :, None] * v_ext[se]
        return _seg_sum_sorted(contrib, dl, hg.n_per + 1)[: hg.n_per]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax),) * 6,
        out_specs=P(ax),
    )(hg.send_idx, hg.src_ext, hg.dst_loc, q, k, v)
