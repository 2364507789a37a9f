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
    """

    rows_b: list
    cols_b: list
    epos_b: list
    row_pos: jax.Array
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    total_rows: int = dataclasses.field(metadata=dict(static=True))
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
    sh = NamedSharding(mesh, P(hg.axis))
    return HaloEll(
        rows_b=[jax.device_put(jnp.asarray(r), sh) for r in rows_b],
        cols_b=[jax.device_put(jnp.asarray(c), sh) for c in cols_b],
        epos_b=[jax.device_put(jnp.asarray(x), sh) for x in epos_b],
        row_pos=jax.device_put(
            jnp.asarray(row_pos.astype(np.int32)), sh
        ),
        widths=tuple(int(widths[i]) for i in keep),
        total_rows=int(row_base),
        n_per=n_per,
        axis=hg.axis,
    )


def halo_attention_ell(hg: HaloGraph, he: HaloEll, mesh: Mesh, q, k, v):
    """Distributed fused attention: halo all_to_all exchange + per-shard
    ELL bucket sweeps — NO scatters anywhere (the sorted-segment variant
    halo_gat_attention pays TPU scatter-add on every reduction).

    q, k, v: (P·n_per, h, d) or (P·n_per, d) node-sharded. Differentiable
    via jnp autodiff (all_to_all and gathers transpose cleanly; the local
    gather transposes to a within-shard scatter — acceptable backward,
    gather-only forward).
    """
    ax = hg.axis
    multi = q.ndim == 3
    h = q.shape[1] if multi else 1
    d = q.shape[-1]
    n_per = hg.n_per
    scale = 1.0 / np.sqrt(d)

    def f(send_idx, row_pos, rows_b, cols_b, q, k, v):
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
                  [P(ax)] * len(he.cols_b), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, he.row_pos, he.rows_b, he.cols_b, q, k, v)


def halo_spmm_ell(hg: HaloGraph, he: HaloEll, mesh: Mesh, edata, x):
    """Weighted SpMM with halo exchange + scatter-free per-shard ELL
    sweeps (the fast counterpart of :func:`halo_spmm`).

    edata: (P·E_p, ...) in halo slot order (``halo_edge_data``);
    x: (P·n_per, d) node-sharded. Differentiable via jnp autodiff.
    """
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
