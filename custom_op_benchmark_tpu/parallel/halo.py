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
from functools import partial

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


# ---------------------------------------------------------------------------
# Per-shard ELL local aggregation: scatter-free compute behind the halo
# exchange (the TPU-fast pairing — segment scatter-adds run at ~1.5 GB/s
# on this hardware, ELL bucket sweeps are pure gathers; see graph/ell.py)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloEll:
    """Stacked per-shard ELL packing of a HaloGraph's local edges.

    Bucket shapes are shared across shards (rows padded to the max shard)
    so one shard_map program covers all devices. ``cols`` index the
    EXTENDED local array produced by the halo exchange (pad = n_per, the
    zero row); ``rows`` are local dst ids (pad = n_per).

    Leaves (sharded over dim 0 = device):
      rows_b:   list of (P, R_b) int32 per bucket
      cols_b:   list of (P, R_b, D_b) int32 per bucket
      epos_b:   list of (P, R_b, D_b) int32 per bucket — position of each
                slot's edge in the shard's halo slot order (pad = E_p,
                indexing a zero pad entry of the edge array)
      row_pos:  (P, n_per) int32 — packed-row position of each owned node
                in the bucket concatenation (total_rows if edgeless).

    Transpose packing (the per-shard dual that makes the distributed
    backward gather-only — round-1 weak #3): local edges re-bucketed by
    their EXTENDED source id, so dk/dv/dx cotangents per extended row are
    plain bucket sweeps + a row_pos_t gather, and the halo contributions
    ride the reverse all_to_all:
      rows_t_b: list of (P, Rt_b) int32 — extended src id per packed row
                (pad = n_ext, a zero row)
      cols_t_b: list of (P, Rt_b, Dt_b) int32 — LOCAL dst per slot
                (pad = n_per)
      epos_t_b: list of (P, Rt_b, Dt_b) int32 — halo-slot-order position
                of each slot's edge (pad = E_p)
      row_pos_t: (P, n_ext) int32 with n_ext = n_per + 1 + P·halo
      recv_pos: (P, n_per, P) int32 — flat position s·halo + m of the
                returned-gradient row each peer s holds for local row v
                (P·halo = zero row when v was not sent to s).
      slot_pos: (P, E_p) int32 — position of each halo-order edge slot in
                the local buckets' flat concatenation (inverse of epos_b;
                total bucket slots = zero entry for pad slots). Makes the
                dedata cotangent of halo_spmm_ell a pure gather.
    """

    rows_b: list
    cols_b: list
    epos_b: list
    row_pos: jax.Array
    rows_t_b: list
    cols_t_b: list
    epos_t_b: list
    row_pos_t: jax.Array
    recv_pos: jax.Array
    slot_pos: jax.Array
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    total_rows: int = dataclasses.field(metadata=dict(static=True))
    total_rows_t: int = dataclasses.field(metadata=dict(static=True))
    n_per: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))


def halo_ell(hg: HaloGraph, mesh: Mesh,
             widths=(4, 8, 16, 32, 64, 128, 256, 512, 1024)) -> HaloEll:
    """Pack each shard's local (src_ext, dst_loc) edges into shared-shape
    degree buckets (host-side cold path)."""
    p, n_per = hg.num_parts, hg.n_per
    src_ext = np.asarray(jax.device_get(hg.src_ext))
    dst_loc = np.asarray(jax.device_get(hg.dst_loc))
    widths = sorted(set(int(w) for w in widths))

    # Per-shard per-node degree (pad rows dst=n_per excluded).
    per_shard = []
    max_deg = 0
    for s in range(p):
        dl = dst_loc[s]
        sel = dl < n_per
        deg = np.bincount(dl[sel], minlength=n_per)
        per_shard.append((dl, sel, deg))
        if deg.size:
            max_deg = max(max_deg, int(deg.max()))
    while widths[-1] < max_deg:
        widths.append(widths[-1] * 2)

    # Shared bucket row counts: max across shards per width.
    counts = np.zeros((p, len(widths)), np.int64)
    for s in range(p):
        deg = per_shard[s][2]
        w_lo = 0
        for i, w in enumerate(widths):
            counts[s, i] = int(((deg > w_lo) & (deg <= w)).sum())
            w_lo = w
    r_max = counts.max(axis=0)
    keep = np.nonzero(r_max > 0)[0]

    e_p = hg.edges_per_part
    rows_b, cols_b, epos_b = [], [], []
    row_pos = np.full((p, n_per), -1, np.int64)
    row_base = 0
    for i in keep:
        w = widths[i]
        r_pad = int(-(-r_max[i] // 8) * 8)
        rows = np.full((p, r_pad), n_per, np.int32)
        cols = np.full((p, r_pad, w), n_per, np.int32)
        epos = np.full((p, r_pad, w), e_p, np.int32)
        w_lo = widths[i - 1] if i > 0 else 0
        for s in range(p):
            dl, sel, deg = per_shard[s]
            nodes = np.nonzero((deg > w_lo) & (deg <= w))[0]
            rows[s, : len(nodes)] = nodes
            # Edges are sorted by dst_loc: each node's edges contiguous,
            # and the pad edges (dst = n_per) sort last, so positions in
            # the sel-compacted view == positions in slot order.
            starts = np.zeros(n_per + 1, np.int64)
            np.cumsum(np.bincount(dl[sel], minlength=n_per),
                      out=starts[1:])
            edge_src = src_ext[s][sel]
            k = np.arange(w)
            mask = k[None, :] < deg[nodes][:, None]
            jj, kk = np.nonzero(mask)
            flatpos = (starts[nodes][:, None] + k[None, :])[mask]
            cols[s, jj, kk] = edge_src[flatpos]
            epos[s, jj, kk] = flatpos
            row_pos[s, nodes] = row_base + np.arange(len(nodes))
        rows_b.append(rows)
        cols_b.append(cols)
        epos_b.append(epos)
        row_base += r_pad

    row_pos[row_pos < 0] = row_base

    # ---- transpose packing: bucket local edges by EXTENDED src id ----
    n_ext = n_per + 1 + p * hg.halo
    widths_t = sorted(set(int(w) for w in widths))
    per_shard_t = []
    max_deg_t = 0
    for s in range(p):
        dl = dst_loc[s]
        sel = dl < n_per
        deg_t = np.bincount(src_ext[s][sel], minlength=n_ext)
        deg_t[n_per] = 0                       # never pack the zero row
        per_shard_t.append((sel, deg_t))
        if deg_t.size:
            max_deg_t = max(max_deg_t, int(deg_t.max()))
    while widths_t[-1] < max(max_deg_t, 1):
        widths_t.append(widths_t[-1] * 2)
    counts_t = np.zeros((p, len(widths_t)), np.int64)
    for s in range(p):
        deg_t = per_shard_t[s][1]
        w_lo = 0
        for i, w in enumerate(widths_t):
            counts_t[s, i] = int(((deg_t > w_lo) & (deg_t <= w)).sum())
            w_lo = w
    rt_max = counts_t.max(axis=0)
    keep_t = np.nonzero(rt_max > 0)[0]

    rows_t_b, cols_t_b, epos_t_b = [], [], []
    row_pos_t = np.full((p, n_ext), -1, np.int64)
    row_base_t = 0
    for i in keep_t:
        w = widths_t[i]
        r_pad = int(-(-rt_max[i] // 8) * 8)
        rows = np.full((p, r_pad), n_ext, np.int32)
        cols = np.full((p, r_pad, w), n_per, np.int32)
        epos = np.full((p, r_pad, w), e_p, np.int32)
        w_lo = widths_t[i - 1] if i > 0 else 0
        for s in range(p):
            sel, deg_t = per_shard_t[s]
            nodes = np.nonzero((deg_t > w_lo) & (deg_t <= w))[0]
            rows[s, : len(nodes)] = nodes
            # Slot order is sorted by dst_loc, NOT by src_ext: group edge
            # positions per src via argsort over the compacted view.
            se_c = src_ext[s][sel]
            dl_c = dst_loc[s][sel]
            pos_c = np.flatnonzero(sel)        # positions in slot order
            order = np.argsort(se_c, kind="stable")
            starts = np.zeros(n_ext + 1, np.int64)
            np.cumsum(np.bincount(se_c, minlength=n_ext), out=starts[1:])
            k = np.arange(w)
            mask = k[None, :] < deg_t[nodes][:, None]
            jj, kk = np.nonzero(mask)
            flat = order[(starts[nodes][:, None] + k[None, :])[mask]]
            cols[s, jj, kk] = dl_c[flat]
            epos[s, jj, kk] = pos_c[flat]
            row_pos_t[s, nodes] = row_base_t + np.arange(len(nodes))
        rows_t_b.append(rows)
        cols_t_b.append(cols)
        epos_t_b.append(epos)
        row_base_t += r_pad
    row_pos_t[row_pos_t < 0] = row_base_t

    # ---- slot → bucket-flat position (inverse of epos_b) ----
    total_flat = sum(
        int(np.prod(e.shape[1:])) for e in epos_b
    )
    slot_pos = np.full((p, e_p), total_flat, np.int64)
    base = 0
    for epos in epos_b:
        for s in range(p):
            ee = epos[s].reshape(-1)
            valid = ee < e_p
            slot_pos[s, ee[valid]] = base + np.flatnonzero(valid)
        base += int(np.prod(epos.shape[1:]))

    # ---- reverse-exchange landing map ----
    send_idx = np.asarray(jax.device_get(hg.send_idx))
    m_max = hg.halo
    recv_pos = np.full((p, n_per, p), p * m_max, np.int32)
    for r in range(p):
        for s in range(p):
            row = send_idx[r, s]
            valid = row < n_per
            recv_pos[r, row[valid], s] = s * m_max + np.flatnonzero(valid)

    sh = NamedSharding(mesh, P(hg.axis))

    def put(a):
        return jax.device_put(jnp.asarray(a), sh)

    return HaloEll(
        rows_b=[put(r) for r in rows_b],
        cols_b=[put(c) for c in cols_b],
        epos_b=[put(x) for x in epos_b],
        row_pos=put(row_pos.astype(np.int32)),
        rows_t_b=[put(r) for r in rows_t_b],
        cols_t_b=[put(c) for c in cols_t_b],
        epos_t_b=[put(x) for x in epos_t_b],
        row_pos_t=put(row_pos_t.astype(np.int32)),
        recv_pos=put(recv_pos),
        slot_pos=put(slot_pos.astype(np.int32)),
        widths=tuple(int(widths[i]) for i in keep),
        total_rows=int(row_base),
        total_rows_t=int(row_base_t),
        n_per=n_per,
        axis=hg.axis,
    )


def _halo_return(hg, he, recv_pos, d_ext, width):
    """Gradient of an _exchange'd array, scatter-free: local slice plus
    the reverse all_to_all of the halo region, landed through the
    precomputed ``recv_pos`` gather (the inverse of send_idx)."""
    n_per = hg.n_per
    d_local = d_ext[:n_per]
    d_rbuf = d_ext[n_per + 1:].reshape(hg.num_parts, hg.halo, width)
    d_sbuf = jax.lax.all_to_all(
        d_rbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                             # (P, M, width)
    flat = jnp.concatenate(
        [d_sbuf.reshape(-1, width), jnp.zeros((1, width), d_ext.dtype)],
        axis=0,
    )
    return d_local + jnp.sum(flat[recv_pos], axis=1)   # (n_per, P, w)→sum


def halo_attention_ell(hg: HaloGraph, he: HaloEll, mesh: Mesh, q, k, v,
                       *, head_axis: str = None):
    """Distributed fused attention: halo all_to_all exchange + per-shard
    ELL bucket sweeps — NO scatters anywhere, forward OR backward (the
    sorted-segment variant halo_gat_attention pays TPU scatter-add on
    every reduction; round 1's version here autodiffed the local gather
    into a within-shard scatter-add).

    The hand VJP is the distributed form of ops/ell._ell_attention_bwd:
      pass 1 (local dst buckets): recompute α, accumulate dq and the
        per-owned-node stats (m, denom, Σ α·dα);
      pass 2 (transpose buckets over extended src ids): rebuild α_t/dS_t
        from per-slot lookups of the LOCAL stats (cols are local dst
        ids), reduce dk/dv per extended row via ``row_pos_t``;
      halo return: reverse all_to_all of the halo region of dk/dv,
        landed with the ``recv_pos`` gather — the transpose of the
        forward exchange, with zero scatters.

    q, k, v: (P·n_per, h, d) or (P·n_per, d) node-sharded.

    ``head_axis``: a second mesh axis to shard the HEAD dimension over —
    full 2-D edge × head parallelism on one mesh (q/k/v live
    P(edge_axis, head_axis, None); the per-shard compute sees its local
    head slice and no extra collectives appear — heads are independent
    through the whole op, so the halo exchange volume also drops by the
    TP factor).
    """
    return _halo_attn_ell(mesh, head_axis, hg, he, q, k, v)


def _attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis=None):
    ax = hg.axis
    multi = q.ndim == 3
    d = q.shape[-1]
    n_per = hg.n_per
    scale = 1.0 / np.sqrt(d)
    qkv_spec = P(ax, head_axis) if multi else P(ax)

    def f(send_idx, row_pos, rows_b, cols_b, q, k, v):
        # Local head count from the BLOCK shape (head_axis may shard it).
        h = q.shape[1] if q.ndim == 3 else 1
        q2 = q.reshape(n_per, h * d)
        k2 = k.reshape(n_per, h * d)
        v2 = v.reshape(n_per, h * d)
        k_ext = _exchange(hg, send_idx, k2)       # (n_ext, h·d)
        v_ext = _exchange(hg, send_idx, v2)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))        # zero row for pad rows
        outs = []
        for rows, cols in zip(rows_b, cols_b):
            r, c = rows[0], cols[0]               # (R,), (R, D)
            kg2 = k_ext[c]                        # (R, D, h·d)
            vg2 = v_ext[c]
            qr2 = qp[r]
            mask = c != n_per                     # pad cols -> zero row
            houts = []
            for i in range(h):
                kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d, axis=2)
                vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d, axis=2)
                qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d, axis=1)
                s = jnp.einsum("rd,rkd->rk", qr, kg,
                               preferred_element_type=jnp.float32) * scale
                sm = jnp.where(mask, s, -1e30)
                m = jnp.max(sm, axis=1, keepdims=True)
                z = jnp.where(mask, jnp.exp(sm - m), 0)
                alpha = z / jnp.maximum(
                    jnp.sum(z, axis=1, keepdims=True), 1e-30)
                houts.append(jnp.einsum(
                    "rk,rkd->rd", alpha.astype(q.dtype), vg,
                    preferred_element_type=jnp.float32).astype(q.dtype))
            outs.append(jnp.concatenate(houts, axis=-1) if h > 1
                        else houts[0])
        cat = jnp.concatenate(
            outs + [jnp.zeros((1, h * d), q.dtype)], axis=0
        )
        out = cat[row_pos[0]]                     # (n_per, h·d) — gather!
        return out.reshape((n_per, h, d) if multi else (n_per, d))

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec,
    )(hg.send_idx, he.row_pos, he.rows_b, he.cols_b, q, k, v)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _halo_attn_ell(mesh, head_axis, hg, he, q, k, v):
    return _attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis)


def _halo_attn_ell_fwd(mesh, head_axis, hg, he, q, k, v):
    return (_attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis),
            (hg, he, q, k, v))


def _halo_attn_ell_bwd(mesh, head_axis, res, dy):
    hg, he, q, k, v = res
    ax = hg.axis
    multi = q.ndim == 3
    d = q.shape[-1]
    n_per = hg.n_per
    scale = 1.0 / np.sqrt(d)
    f32 = jnp.float32
    qkv_spec = P(ax, head_axis) if multi else P(ax)

    def f(send_idx, row_pos, rows_b, cols_b, rows_t_b, cols_t_b,
          row_pos_t, recv_pos, q, k, v, dy):
        h = q.shape[1] if q.ndim == 3 else 1
        hd = h * d
        q2 = q.reshape(n_per, hd).astype(f32)
        k2 = k.reshape(n_per, hd)
        v2 = v.reshape(n_per, hd)
        dy2 = dy.reshape(n_per, hd).astype(f32)
        k_ext = _exchange(hg, send_idx, k2)
        v_ext = _exchange(hg, send_idx, v2)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))
        dyp = jnp.pad(dy2, ((0, 1), (0, 0)))

        # pass 1: local dst buckets — dq + per-node (m, den, agg) stats
        dq_parts, st_parts = [], []
        for rows, cols in zip(rows_b, cols_b):
            r, c = rows[0], cols[0]
            kg2 = k_ext[c]
            vg2 = v_ext[c]
            qr2 = qp[r]
            dyr2 = dyp[r]
            mask = c != n_per
            hparts, hstats = [], []
            for i in range(h):
                kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d, axis=2)
                vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d, axis=2)
                qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d, axis=1)
                dyr = jax.lax.slice_in_dim(dyr2, i * d, (i + 1) * d,
                                           axis=1)
                s = jnp.einsum("rd,rkd->rk", qr, kg,
                               preferred_element_type=f32) * scale
                sm = jnp.where(mask, s, -1e30)
                m = jnp.max(sm, axis=1, keepdims=True)
                z = jnp.where(mask, jnp.exp(sm - m), 0)
                den = jnp.sum(z, axis=1, keepdims=True)
                alpha = z / jnp.maximum(den, 1e-30)
                dalpha = jnp.einsum("rd,rkd->rk", dyr, vg,
                                    preferred_element_type=f32)
                agg = jnp.sum(alpha * dalpha, axis=1)
                dS = alpha * (dalpha - agg[:, None]) * scale
                hparts.append(jnp.einsum("rk,rkd->rd", dS, kg,
                                         preferred_element_type=f32))
                hstats.extend([m[:, 0], den[:, 0], agg])
            dq_parts.append(jnp.concatenate(hparts, axis=-1) if h > 1
                            else hparts[0])
            st_parts.append(jnp.stack(hstats, axis=-1))    # (R, 3h)
        zero_dq = jnp.zeros((1, hd), f32)
        dq = jnp.concatenate(dq_parts + [zero_dq], axis=0)[row_pos[0]]
        stats = jnp.concatenate(
            st_parts + [jnp.zeros((1, 3 * h), f32)], axis=0
        )[row_pos[0]]                                      # (n_per, 3h)
        statsp = jnp.pad(stats, ((0, 1), (0, 0)))

        # pass 2: transpose buckets — dk/dv per extended row
        dk_parts, dv_parts = [], []
        for rows_t, cols_t in zip(rows_t_b, cols_t_b):
            rt, ct = rows_t[0], cols_t[0]
            q_c2 = qp[ct]                          # (Rt, Dt, hd)
            dy_c2 = dyp[ct]
            st_c = statsp[ct]                      # (Rt, Dt, 3h)
            kr2 = k_ext[jnp.minimum(rt, k_ext.shape[0] - 1)]
            vr2 = v_ext[jnp.minimum(rt, v_ext.shape[0] - 1)]
            mask = ct != n_per
            dks, dvs = [], []
            for i in range(h):
                q_c = jax.lax.slice_in_dim(q_c2, i * d, (i + 1) * d,
                                           axis=2)
                dy_c = jax.lax.slice_in_dim(dy_c2, i * d, (i + 1) * d,
                                            axis=2)
                m_c = st_c[:, :, 3 * i]
                den_c = jnp.maximum(st_c[:, :, 3 * i + 1], 1e-30)
                agg_c = st_c[:, :, 3 * i + 2]
                kr = jax.lax.slice_in_dim(kr2, i * d, (i + 1) * d, axis=1)
                vr = jax.lax.slice_in_dim(vr2, i * d, (i + 1) * d, axis=1)
                s_t = jnp.einsum("rd,rkd->rk", kr, q_c,
                                 preferred_element_type=f32) * scale
                alpha_t = jnp.where(mask, jnp.exp(s_t - m_c), 0) / den_c
                dalpha_t = jnp.einsum("rd,rkd->rk", vr, dy_c,
                                      preferred_element_type=f32)
                dS_t = alpha_t * (dalpha_t - agg_c) * scale
                dks.append(jnp.einsum("rk,rkd->rd", dS_t, q_c,
                                      preferred_element_type=f32))
                dvs.append(jnp.einsum("rk,rkd->rd", alpha_t, dy_c,
                                      preferred_element_type=f32))
            dk_parts.append(jnp.concatenate(dks, axis=-1) if h > 1
                            else dks[0])
            dv_parts.append(jnp.concatenate(dvs, axis=-1) if h > 1
                            else dvs[0])
        zero = jnp.zeros((1, hd), f32)
        dk_ext = jnp.concatenate(dk_parts + [zero], axis=0)[row_pos_t[0]]
        dv_ext = jnp.concatenate(dv_parts + [zero], axis=0)[row_pos_t[0]]

        dk = _halo_return(hg, he, recv_pos[0], dk_ext, hd)
        dv = _halo_return(hg, he, recv_pos[0], dv_ext, hd)
        shp = (n_per, h, d) if multi else (n_per, d)
        return (dq.reshape(shp).astype(q.dtype),
                dk.reshape(shp).astype(k.dtype),
                dv.reshape(shp).astype(v.dtype))

    dq, dk, dv = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b), P(ax), P(ax),
                  qkv_spec, qkv_spec, qkv_spec, qkv_spec),
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
    )(hg.send_idx, he.row_pos, he.rows_b, he.cols_b, he.rows_t_b,
      he.cols_t_b, he.row_pos_t, he.recv_pos, q, k, v, dy)
    return None, None, dq, dk, dv


_halo_attn_ell.defvjp(_halo_attn_ell_fwd, _halo_attn_ell_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPackedWeights:
    """Edge weights resident in BOTH per-shard ELL layouts (the
    distributed analog of ops.ell.PackedEdgeWeights): ``local[i]`` has
    bucket i's (P, R, D) shape in the dst-local packing, ``t[i]`` in the
    transpose packing. Skips the per-step per-slot weight gathers in
    halo_spmm_ell's forward (epos) AND backward (epos_t)."""

    local: list
    t: list


def halo_pack_weights(hg: HaloGraph, he: HaloEll, mesh: Mesh,
                      edata_canonical) -> HaloPackedWeights:
    """Cold path: canonical (E_pad, ...) weights → per-shard dual packed."""
    ed = halo_edge_data(hg, mesh, edata_canonical)
    ax = hg.axis
    k = len(he.epos_b)

    def f(ed, *epos_all):
        edp = jnp.pad(ed, (0, 1))
        return tuple(edp[e[0]][None] for e in epos_all)

    outs = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax),) + tuple([P(ax)] * (2 * k)),
        out_specs=tuple([P(ax)] * (2 * k)),
    )(ed, *he.epos_b, *he.epos_t_b)
    return HaloPackedWeights(local=list(outs[:k]), t=list(outs[k:]))


def halo_spmm_ell(hg: HaloGraph, he: HaloEll, mesh: Mesh, edata, x):
    """Weighted SpMM with halo exchange + scatter-free per-shard ELL
    sweeps (the fast counterpart of :func:`halo_spmm`).

    edata: (P·E_p,) in halo slot order (``halo_edge_data``) — or a
    :class:`HaloPackedWeights` from :func:`halo_pack_weights`, which
    skips every per-step per-slot weight gather (the hand VJP then
    returns packed cotangents for both copies).
    x: (P·n_per, d) node-sharded. Hand VJP, scatter-free: dedata comes
    back through the ``slot_pos`` gather (or packed), dx through the
    transpose buckets + reverse all_to_all (see
    :func:`halo_attention_ell`).
    """
    if isinstance(edata, HaloPackedWeights):
        return _halo_spmm_ell_packed(mesh, hg, he, edata, x)
    return _halo_spmm_ell(mesh, hg, he, edata, x)


def _spmm_ell_packed_fwd_impl(hg, he, mesh, w, x):
    ax = hg.axis
    n_per = hg.n_per

    def f(send_idx, row_pos, cols_b, w_b, x):
        x_ext = _exchange(hg, send_idx, x)
        outs = []
        for cols, wl in zip(cols_b, w_b):
            outs.append(jnp.einsum(
                "rk,rkd->rd", wl[0], x_ext[cols[0]],
                preferred_element_type=jnp.float32).astype(x.dtype))
        cat = jnp.concatenate(
            outs + [jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0
        )
        return cat[row_pos[0]]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), [P(ax)] * len(he.cols_b),
                  [P(ax)] * len(w.local), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, he.row_pos, he.cols_b, w.local, x)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _halo_spmm_ell_packed(mesh, hg, he, w, x):
    return _spmm_ell_packed_fwd_impl(hg, he, mesh, w, x)


def _halo_spmm_ell_packed_fwd(mesh, hg, he, w, x):
    return _spmm_ell_packed_fwd_impl(hg, he, mesh, w, x), (hg, he, w, x)


def _halo_spmm_ell_packed_bwd(mesh, res, dy):
    hg, he, w, x = res
    ax = hg.axis
    n_per = hg.n_per
    d = x.shape[-1]
    f32 = jnp.float32

    def f(send_idx, rows_b, cols_b, rows_t_b, cols_t_b, row_pos_t,
          recv_pos, w_t_b, x, dy):
        x_ext = _exchange(hg, send_idx, x)
        dyp = jnp.pad(dy.astype(f32), ((0, 1), (0, 0)))

        # dW in the LOCAL layout: <dy[rows], x_ext[cols]> per slot.
        dwl = []
        for rows, cols in zip(rows_b, cols_b):
            dwl.append(jnp.einsum(
                "rd,rkd->rk", dyp[jnp.minimum(rows[0], n_per)],
                x_ext[cols[0]], preferred_element_type=f32)[None])

        # dx via the transpose buckets with PACKED transpose weights
        # (no epos_t gather), plus dW in the transpose layout from the
        # same dy gather.
        dx_parts, dwt = [], []
        for rows_t, cols_t, wt in zip(rows_t_b, cols_t_b, w_t_b):
            ct = cols_t[0]
            dy_c = dyp[ct]
            dx_parts.append(jnp.einsum(
                "rk,rkd->rd", wt[0], dy_c,
                preferred_element_type=f32))
            xr = x_ext[jnp.minimum(rows_t[0], x_ext.shape[0] - 1)]
            dwt.append(jnp.einsum(
                "rd,rkd->rk", xr, dy_c,
                preferred_element_type=f32)[None])
        zero = jnp.zeros((1, d), f32)
        dx_ext = jnp.concatenate(dx_parts + [zero], axis=0)[row_pos_t[0]]
        dx = _halo_return(hg, he, recv_pos[0], dx_ext, d)
        return tuple(dwl) + tuple(dwt) + (dx.astype(x.dtype),)

    k = len(he.rows_b)
    outs = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), [P(ax)] * k, [P(ax)] * k,
                  [P(ax)] * len(he.rows_t_b), [P(ax)] * len(he.cols_t_b),
                  P(ax), P(ax), [P(ax)] * len(w.t), P(ax), P(ax)),
        out_specs=tuple([P(ax)] * (k + len(w.t))) + (P(ax),),
    )(hg.send_idx, he.rows_b, he.cols_b, he.rows_t_b, he.cols_t_b,
      he.row_pos_t, he.recv_pos, w.t, x, dy)
    dwl = [o.astype(wl.dtype) for o, wl in zip(outs[:k], w.local)]
    dwt = [o.astype(wt.dtype) for o, wt in zip(outs[k:-1], w.t)]
    dw = HaloPackedWeights(local=dwl, t=dwt)
    return None, None, dw, outs[-1]


_halo_spmm_ell_packed.defvjp(
    _halo_spmm_ell_packed_fwd, _halo_spmm_ell_packed_bwd
)


def _spmm_ell_fwd_impl(hg, he, mesh, edata, x):
    ax = hg.axis
    n_per = hg.n_per

    def f(send_idx, row_pos, rows_b, cols_b, epos_b, ed, x):
        x_ext = _exchange(hg, send_idx, x)
        edp = jnp.pad(ed, [(0, 1)] + [(0, 0)] * (ed.ndim - 1))
        outs = []
        for rows, cols, epos in zip(rows_b, cols_b, epos_b):
            c, ep = cols[0], epos[0]
            w = edp[ep]                              # (R, D)
            xg = x_ext[c]                            # (R, D, d)
            outs.append(jnp.einsum(
                "rk,rkd->rd", w, xg,
                preferred_element_type=jnp.float32).astype(x.dtype))
        cat = jnp.concatenate(
            outs + [jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0
        )
        return cat[row_pos[0]]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.epos_b),
                  P(ax), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, he.row_pos, he.rows_b, he.cols_b, he.epos_b, edata, x)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _halo_spmm_ell(mesh, hg, he, edata, x):
    return _spmm_ell_fwd_impl(hg, he, mesh, edata, x)


def _halo_spmm_ell_fwd(mesh, hg, he, edata, x):
    return _spmm_ell_fwd_impl(hg, he, mesh, edata, x), (hg, he, edata, x)


def _halo_spmm_ell_bwd(mesh, res, dy):
    hg, he, edata, x = res
    ax = hg.axis
    n_per = hg.n_per
    d = x.shape[-1]
    f32 = jnp.float32

    # dedata: per local bucket slot <dy[rows], x_ext[cols]>, landed in
    # halo slot order via the slot_pos gather. dx: transpose buckets —
    # dx_ext[src] = Σ w·dy[dst], then the reverse exchange. Weights reach
    # the transpose layout through the epos_t gather (per-slot scalar
    # gather; weights are per-edge data, not node data — for static
    # weights keep them packed instead).
    def f2(send_idx, rows_b, cols_b, rows_t_b, cols_t_b, epos_t_b,
           row_pos_t, slot_pos, recv_pos, ed, x, dy):
        x_ext = _exchange(hg, send_idx, x)
        dyp = jnp.pad(dy.astype(f32), ((0, 1), (0, 0)))
        edp = jnp.pad(ed, (0, 1))

        dd_parts = []
        for rows, cols in zip(rows_b, cols_b):
            r, c = rows[0], cols[0]
            dd_parts.append(jnp.einsum(
                "rd,rkd->rk", dyp[jnp.minimum(r, n_per)], x_ext[c],
                preferred_element_type=f32).reshape(-1))
        dd_flat = jnp.concatenate(
            dd_parts + [jnp.zeros((1,), f32)], axis=0
        )
        dedata = dd_flat[slot_pos[0]].astype(ed.dtype)

        dx_parts = []
        for rows_t, cols_t, epos_t in zip(rows_t_b, cols_t_b, epos_t_b):
            ct, ep = cols_t[0], epos_t[0]
            w_t = edp[ep]
            dy_c = dyp[ct]
            dx_parts.append(jnp.einsum(
                "rk,rkd->rd", w_t, dy_c,
                preferred_element_type=f32))
        zero = jnp.zeros((1, d), f32)
        dx_ext = jnp.concatenate(dx_parts + [zero], axis=0)[row_pos_t[0]]
        dx = _halo_return(hg, he, recv_pos[0], dx_ext, d)
        return dedata, dx.astype(x.dtype)

    dedata, dx = jax.shard_map(
        f2, mesh=mesh,
        in_specs=(P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b), [P(ax)] * len(he.epos_t_b),
                  P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=(P(ax), P(ax)),
    )(hg.send_idx, he.rows_b, he.cols_b, he.rows_t_b, he.cols_t_b,
      he.epos_t_b, he.row_pos_t, he.slot_pos, he.recv_pos, edata, x, dy)
    return None, None, dedata, dx


_halo_spmm_ell.defvjp(_halo_spmm_ell_fwd, _halo_spmm_ell_bwd)
