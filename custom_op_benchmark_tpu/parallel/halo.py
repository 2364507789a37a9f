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
  needs, through ONE static-shape ``all_to_all`` per layer;
- OVERLAPS that exchange with local compute (round-2 verdict #2 /
  SURVEY §5 "double-buffered" contract): every per-shard ELL bucket is
  split at a static point into an INTERIOR section (rows none of whose
  in-edges touch a halo column — they read only the local node table)
  and a BOUNDARY section (rows needing received rows). The interior
  sweeps carry no data dependency on the collective, so XLA's
  latency-hiding scheduler runs the all_to_all concurrently with them;
  only the boundary sweeps wait. The backward mirrors this: the reverse
  (gradient) all_to_all is issued from the HALO-row sections of the
  transpose buckets and overlaps the local-row sections + dq assembly,
  and dk‖dv share ONE exchange (stacked channels);
- communication volume scales with the partition's edge-cut (improved by
  graph/reorder.py locality orderings), not with n_nodes.

All plan construction is host-side numpy (cold path — cache it with
graph/cache.py), vectorized end-to-end: O(E log E) argsorts, no
per-shard or per-shard-pair Python loops (round-2 verdict #8 — the
round-2 builder looped shards per bucket and pairs for ``recv_pos``,
hours of numpy at P=64 x 1B edges). The ops are differentiable end to
end: all_to_all transposes to all_to_all, local gathers to local
gathers through precomputed inverse permutations (never scatters).

Reference seed: the skewed-CSR partitioner ``part_csr.py:13-27``; the
halo plan generalizes it to owner-computes placement + boundary
exchange.
"""

from __future__ import annotations

import dataclasses
import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custom_op_benchmark_tpu.graph.graph import Graph
from custom_op_benchmark_tpu.parallel.mesh import put_sharded


def _round_up(x: int, m: int) -> int:
    return -(-max(int(x), 1) // m) * m


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

    @property
    def comm_bytes_per_exchange(self) -> int:
        """Halo rows moved per all_to_all per unit feature byte: multiply
        by (feature row bytes) for the exchange volume of one operand."""
        return self.num_parts * self.num_parts * self.halo


def halo_graph(g: Graph, mesh: Mesh, axis: str = "edge",
               pad_multiple: int = 8) -> HaloGraph:
    """Build the halo plan: owner-of-dst edge placement + send lists.

    Fully vectorized (one argsort over edges + one np.unique over remote
    (owner-pair, src) triples); no per-shard or O(P²) loops.
    """
    p = mesh.shape[axis]
    n, e = g.n_nodes, g.n_edges
    n_per = -(-n // p)
    src_h = np.asarray(jax.device_get(g.src))[:e]
    dst_h = np.asarray(jax.device_get(g.dst))[:e]

    # Native fast path (csrc/graphcore.cpp graphcore_halo_plan):
    # counting sorts instead of radix argsort + np.unique over e-scale
    # int64 keys — bitwise-identical output, ~10× at papers100M scale.
    nat = None
    try:
        from custom_op_benchmark_tpu.graph import native as _native

        nat = _native.halo_plan_native(src_h, dst_h, n, p, n_per,
                                       pad_multiple, g.num_edges_padded)
    except KeyboardInterrupt:
        raise
    except Exception:
        nat = None
    if nat is not None:
        send_idx, src_ext, dst_loc, eid, e_p, m_max = nat
    else:
        src = src_h.astype(np.int64)
        dst = dst_h.astype(np.int64)

        # Sort edges by dst: groups shards (owner = dst // n_per) AND
        # sorts local dst within each shard (sorted segment reductions).
        order = np.argsort(dst, kind="stable")
        src_s = src[order]
        dst_s = dst[order]
        own_s = dst_s // n_per
        cnt = np.bincount(own_s, minlength=p)
        e_p = _round_up(cnt.max() if e else 1, pad_multiple)
        shard_start = np.concatenate([[0], np.cumsum(cnt)])[:p]
        pos_within = np.arange(e, dtype=np.int64) - shard_start[own_s]

        # Halo needs: unique (src_owner r, shard s, src) triples,
        # remote only.
        src_own = src_s // n_per
        rem = src_own != own_s
        r_rem = src_own[rem]
        s_rem = own_s[rem]
        v_rem = src_s[rem]
        vspace = np.int64(p) * n_per + 1
        key = (r_rem * p + s_rem) * vspace + v_rem
        uk = np.unique(key)
        pair = uk // vspace
        vsrc = uk % vspace
        pcnt = np.bincount(pair, minlength=p * p)
        m_max = _round_up(pcnt.max() if len(uk) else 1, pad_multiple)
        pair_start = np.concatenate([[0], np.cumsum(pcnt)])
        rank = np.arange(len(uk), dtype=np.int64) - pair_start[pair]

        send_idx = np.full((p * p, m_max), n_per, dtype=np.int32)
        send_idx[pair, rank] = (vsrc - (pair // p) * n_per).astype(
            np.int32)
        send_idx = send_idx.reshape(p, p, m_max)

        # Extended local src index per edge.
        ext = (src_s - own_s * n_per).astype(np.int64)
        if rem.any():
            idx = np.searchsorted(uk, key)
            ext[rem] = n_per + 1 + r_rem * m_max + rank[idx]

        src_ext = np.full((p, e_p), n_per, dtype=np.int32)
        dst_loc = np.full((p, e_p), n_per, dtype=np.int32)
        eid = np.full((p, e_p), g.num_edges_padded, dtype=np.int32)
        src_ext[own_s, pos_within] = ext.astype(np.int32)
        dst_loc[own_s, pos_within] = (dst_s - own_s * n_per).astype(
            np.int32)
        eid[own_s, pos_within] = order.astype(np.int32)

    sh2 = NamedSharding(mesh, P(axis))
    hg = HaloGraph(
        send_idx=put_sharded(send_idx, sh2),
        src_ext=put_sharded(src_ext, sh2),
        dst_loc=put_sharded(dst_loc, sh2),
        eid=put_sharded(eid, sh2),
        n_nodes=n,
        n_edges=e,
        num_parts=p,
        n_per=int(n_per),
        halo=int(m_max),
        edges_per_part=int(e_p),
        axis=axis,
    )
    # Host copies for downstream cold-path builders (halo_ell): in a
    # REAL multi-process run the sharded leaves span non-addressable
    # devices and cannot be fetched back, so the builder that just
    # computed them keeps them host-side (weakref-guarded, evicted with
    # the plan).
    _HOST_PLAN[id(hg)] = (weakref.ref(hg), dict(
        send_idx=send_idx, src_ext=src_ext, dst_loc=dst_loc, eid=eid))
    return hg


_HOST_PLAN: dict = {}


def _host_plan_arrays(hg):
    ent = _HOST_PLAN.get(id(hg))
    if ent is not None and ent[0]() is hg:
        return ent[1]
    if jax.process_count() > 1:
        raise ValueError(
            "halo_ell in a multi-process run needs the host-side plan "
            "copies that halo_graph caches; build the HaloGraph with "
            "halo_graph() in this process (sharded plan leaves span "
            "non-addressable devices and cannot be fetched back)"
        )
    return dict(
        send_idx=np.asarray(jax.device_get(hg.send_idx)),
        src_ext=np.asarray(jax.device_get(hg.src_ext)),
        dst_loc=np.asarray(jax.device_get(hg.dst_loc)),
    )


def halo_node_sharding(hg: HaloGraph, mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(hg.axis))


def shard_halo_nodes(hg: HaloGraph, mesh: Mesh, x) -> jax.Array:
    """Pad a node array to (P·n_per, ...) and shard it row-wise."""
    x = np.asarray(x)
    if x.shape[0] < hg.n_pad:
        pad = [(0, hg.n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad)
    return put_sharded(x, halo_node_sharding(hg, mesh))


def _exchange_parts(hg, send_idx, x_local):
    """Returns (xp, x_ext): the padded LOCAL table (n_per+1, ...) that
    interior sweeps read (no collective dependency), and the extended
    table [xp; received rows] that boundary sweeps read. Keeping the two
    apart is what lets XLA overlap the all_to_all with interior compute."""
    xp = jnp.pad(
        x_local, [(0, 1)] + [(0, 0)] * (x_local.ndim - 1)
    )                                           # (n_per+1, ...)
    sbuf = xp[send_idx[0]]                      # (P, M, ...)
    rbuf = jax.lax.all_to_all(
        sbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                           # (P, M, ...)
    x_ext = jnp.concatenate(
        [xp, rbuf.reshape((-1,) + x_local.shape[1:])], axis=0
    )                                           # (n_per+1+P·M, ...)
    return xp, x_ext


def _exchange(hg, send_idx, x_local):
    """Local rows → extended rows: pad, halo all_to_all, concat."""
    return _exchange_parts(hg, send_idx, x_local)[1]


def _seg_sum_sorted(vals, ids, n):
    from custom_op_benchmark_tpu.ops import xla as _xla

    return _xla.segment_sum(vals, ids, n, sorted_ids=True)


def _seg_max_sorted(vals, ids, n):
    from custom_op_benchmark_tpu.ops import xla as _xla

    return _xla.segment_max(vals, ids, n, sorted_ids=True)


def halo_spmm(hg: HaloGraph, mesh: Mesh, edata, x):
    """Aggregation over in-edges of each OWNED dst row:
    out[v] = Σ_{e=(u,v)} edata[e]·x[u], node-sharded in and out.

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
    ed = np.asarray(jax.device_get(edata_canonical))
    ed = np.pad(ed, [(0, 1)] + [(0, 0)] * (ed.ndim - 1))
    ent = _HOST_PLAN.get(id(hg))
    if ent is not None and ent[0]() is hg:
        eid = ent[1]["eid"].reshape(-1)
    else:
        eid = np.asarray(jax.device_get(hg.eid)).reshape(-1)
    out = ed[np.minimum(eid, ed.shape[0] - 1)]
    return put_sharded(out, NamedSharding(mesh, P(hg.axis)))


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

    OVERLAP SECTIONS (round-2 verdict #2): each dst bucket keeps its
    INTERIOR rows (all cols ≤ n_per — readable from the local table
    alone) in the head and its BOUNDARY rows in a statically-sized tail
    of ``n_bnd[i]`` rows; each transpose bucket keeps its HALO rows
    (extended src ≥ n_per+1 — their cotangents ride the reverse
    all_to_all) in a statically-sized HEAD of ``n_halo_t[i]`` rows. The
    sweeps slice at these static points so the exchange collectives
    carry no dependency edge to the interior/local compute.

    Leaves (sharded over dim 0 = device):
      rows_b:   list of (P, R_b) int32 per bucket
      cols_b:   list of (P, R_b, D_b) int32 per bucket
      epos_b:   list of (P, R_b, D_b) int32 per bucket — position of each
                slot's edge in the shard's halo slot order (pad = E_p,
                indexing a zero pad entry of the edge array)
      row_pos:  (P, n_per) int32 — packed-row position of each owned node
                in the bucket concatenation (total_rows if edgeless).

    Transpose packing (the per-shard dual that makes the distributed
    backward gather-only): local edges re-bucketed by their EXTENDED
    source id, so dk/dv/dx cotangents per extended row are plain bucket
    sweeps + a row_pos_t gather, and the halo contributions ride the
    reverse all_to_all:
      rows_t_b: list of (P, Rt_b) int32 — extended src id per packed row
                (pad = n_ext, a zero row)
      cols_t_b: list of (P, Rt_b, Dt_b) int32 — LOCAL dst per slot
                (pad = n_per)
      epos_t_b: list of (P, Rt_b, Dt_b) int32 — halo-slot-order position
                of each slot's edge (pad = E_p)
      row_pos_t: (P, n_ext) int32 with n_ext = n_per + 1 + P·halo
      halo_pos_t: (P, P·halo) int32 — position of extended halo row
                n_per+1+j in the concatenation of the transpose buckets'
                HALO head sections (halo_rows_t if absent) — lets the
                reverse all_to_all launch from the head sections alone.
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
    halo_pos_t: jax.Array
    recv_pos: jax.Array
    slot_pos: jax.Array
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    n_bnd: tuple = dataclasses.field(metadata=dict(static=True))
    n_halo_t: tuple = dataclasses.field(metadata=dict(static=True))
    total_rows: int = dataclasses.field(metadata=dict(static=True))
    total_rows_t: int = dataclasses.field(metadata=dict(static=True))
    halo_rows_t: int = dataclasses.field(metadata=dict(static=True))
    n_per: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))


def _rank_within(key, order_extra=None):
    """Per-element rank inside its ``key`` group (0-based), grouping by
    equal key; ties broken by ``order_extra`` then position (stable)."""
    if order_extra is None:
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((order_extra, key))
    ks = key[order]
    new_grp = np.concatenate([[True], ks[1:] != ks[:-1]])
    grp_id = np.cumsum(new_grp) - 1
    starts = np.flatnonzero(new_grp)
    rank_sorted = np.arange(len(key), dtype=np.int64) - starts[grp_id]
    rank = np.empty(len(key), np.int64)
    rank[order] = rank_sorted
    return rank


def _pack_shared(p, n_rows, s_arr, r_arr, c_arr, pos_arr, widths,
                 spec_of, special_side, pad_row, pad_col, e_p):
    """Vectorized shared-shape degree-bucket packer over P shards.

    Edges given flat: shard ``s_arr``, row id ``r_arr`` (∈ [0, n_rows)),
    col ``c_arr``, slot-order position ``pos_arr``. ``spec_of(row_keys)``
    returns a bool per active row key (key = s·n_rows + r); special rows
    are placed in a statically-sized tail (``special_side='tail'``) or
    head (``'head'``) section of their bucket, sized max-over-shards —
    the overlap split.

    Returns (rows_b, cols_b, epos_b, row_pos, splits, bucket_widths,
    total_rows, section_pos, total_spec) — section_pos maps each row key
    to its position in the concatenation of the SPECIAL sections only
    (or -1), used to build ``halo_pos_t``.
    """
    widths = sorted(set(int(w) for w in widths))
    key = s_arr * np.int64(n_rows) + r_arr
    row_keys, deg_row = np.unique(key, return_counts=True)
    max_deg = int(deg_row.max()) if len(deg_row) else 1
    while widths[-1] < max_deg:
        widths.append(widths[-1] * 2)
    wa = np.asarray(widths, np.int64)
    bi_row = np.searchsorted(wa, deg_row, side="left")   # bucket index
    s_row = row_keys // n_rows
    spec_row = spec_of(row_keys)

    # Per (bucket, shard): total and special row counts.
    bs = bi_row * p + s_row
    cnt_bs = np.bincount(bs, minlength=len(widths) * p).reshape(-1, p)
    spec_bs = np.bincount(bs[spec_row],
                          minlength=len(widths) * p).reshape(-1, p)
    nonspec_bs = cnt_bs - spec_bs
    keep = np.flatnonzero(cnt_bs.sum(axis=1) > 0)
    n_spec_b = spec_bs.max(axis=1)
    r_pad_b = np.zeros(len(widths), np.int64)
    r_pad_b[keep] = [
        _round_up(int(nonspec_bs[i].max() + n_spec_b[i]), 8) for i in keep
    ]

    # Row slot within its bucket: special rows pinned to the section.
    rank_spec = _rank_within(np.where(spec_row, bs, -1), row_keys)
    rank_non = _rank_within(np.where(~spec_row, bs, -1), row_keys)
    slot = np.empty(len(row_keys), np.int64)
    if special_side == "tail":
        # non-special fill [0, nonspec_cnt); special fill the tail
        # [r_pad − spec_cnt_s, r_pad) — always inside the static
        # [r_pad − n_spec, r_pad) tail since spec_cnt_s ≤ n_spec.
        slot[~spec_row] = rank_non[~spec_row]
        sp = spec_row
        slot[sp] = (r_pad_b[bi_row[sp]] - spec_bs[bi_row[sp], s_row[sp]]
                    + rank_spec[sp])
    else:
        # special head [0, spec_cnt_s) ⊆ [0, n_spec); non-special after
        # the static head.
        slot[spec_row] = rank_spec[spec_row]
        ns = ~spec_row
        slot[ns] = n_spec_b[bi_row[ns]] + rank_non[ns]

    bucket_base = np.zeros(len(widths) + 1, np.int64)
    np.cumsum(r_pad_b, out=bucket_base[1:])
    total_rows = int(bucket_base[-1])
    row_pos = np.full((p, n_rows), total_rows, np.int64)
    row_pos[s_row, row_keys % n_rows] = bucket_base[bi_row] + slot

    # Section position (special sections concatenated across buckets).
    spec_base = np.zeros(len(widths) + 1, np.int64)
    np.cumsum(n_spec_b, out=spec_base[1:])
    section_pos = np.full((p, n_rows), -1, np.int64)
    sp = spec_row
    section_pos[s_row[sp], row_keys[sp] % n_rows] = \
        spec_base[bi_row[sp]] + slot[sp] - (
            0 if special_side == "head"
            else (bucket_base[bi_row[sp] + 1] - bucket_base[bi_row[sp]]
                  - n_spec_b[bi_row[sp]]))
    total_spec = int(spec_base[-1])

    # Edge slot-in-row ranks (ordered by pos for determinism).
    k_arr = _rank_within(key, pos_arr)

    # Fill per kept bucket (vectorized across shards/rows/slots).
    bi_edge = bi_row[np.searchsorted(row_keys, key)]
    rows_b, cols_b, epos_b, bw, splits = [], [], [], [], []
    for i in keep:
        w = widths[i]
        r_pad = int(r_pad_b[i])
        rows = np.full((p, r_pad), pad_row, np.int32)
        cols = np.full((p, r_pad, w), pad_col, np.int32)
        epos = np.full((p, r_pad, w), e_p, np.int32)
        rsel = bi_row == i
        rows[s_row[rsel], slot[rsel]] = (row_keys[rsel] % n_rows
                                         ).astype(np.int32)
        esel = bi_edge == i
        ek = key[esel]
        ri = np.searchsorted(row_keys, ek)
        cols[s_arr[esel], slot[ri], k_arr[esel]] = c_arr[esel].astype(
            np.int32)
        epos[s_arr[esel], slot[ri], k_arr[esel]] = pos_arr[esel].astype(
            np.int32)
        rows_b.append(rows)
        cols_b.append(cols)
        epos_b.append(epos)
        bw.append(w)
        splits.append(int(n_spec_b[i]))
    return (rows_b, cols_b, epos_b, row_pos, splits, bw, total_rows,
            section_pos, total_spec)


def halo_ell(hg: HaloGraph, mesh: Mesh,
             widths=(4, 8, 16, 32, 64, 128, 256, 512, 1024)) -> HaloEll:
    """Pack each shard's local (src_ext, dst_loc) edges into shared-shape
    degree buckets (host-side cold path, fully vectorized), with the
    interior/boundary and halo/local overlap sections precomputed."""
    p, n_per = hg.num_parts, hg.n_per
    host = _host_plan_arrays(hg)
    src_ext = host["src_ext"]
    dst_loc = host["dst_loc"]
    e_p = hg.edges_per_part
    n_ext = n_per + 1 + p * hg.halo

    # Native fast path (csrc/graphcore.cpp graphcore_halo_pack): both
    # packings in two counting-pass C calls straight off the (P, e_p)
    # plan matrices (slot position = column index; pads skipped inside;
    # slot_pos emitted in the dst fill pass) — bitwise-identical to the
    # numpy packer below, with no e-scale flat lists built in Python.
    nat0 = nat1 = None
    try:
        from custom_op_benchmark_tpu.graph import native as _native

        nat0 = _native.halo_pack_native(
            dst_loc, src_ext, dst_loc, n_per, p, n_per, widths,
            spec_mode=0, spec_thresh=n_per, special_side="tail",
            pad_row=n_per, pad_col=n_per, want_slot_pos=True)
        if nat0 is not None:
            nat1 = _native.halo_pack_native(
                src_ext, dst_loc, dst_loc, n_per, p, n_ext, widths,
                spec_mode=1, spec_thresh=n_per + 1, special_side="head",
                pad_row=n_ext, pad_col=n_per,
                want_section_pos=True)
    except KeyboardInterrupt:
        raise
    except Exception:
        nat0 = nat1 = None
    if nat0 is not None and nat1 is not None:
        (rows_b, cols_b, epos_b, row_pos, n_bnd, bw, total_rows, _, _,
         slot_pos) = nat0
        (rows_t_b, cols_t_b, epos_t_b, row_pos_t, n_halo_t, _,
         total_rows_t, section_pos_t, halo_rows_t, _) = nat1
    else:
        # Flat real-edge lists (numpy fallback only).
        s_all = np.repeat(np.arange(p, dtype=np.int64), e_p)
        pos_all = np.tile(np.arange(e_p, dtype=np.int64), p)
        dl = dst_loc.reshape(-1).astype(np.int64)
        se = src_ext.reshape(-1).astype(np.int64)
        real = dl < n_per
        s_arr, pos_arr = s_all[real], pos_all[real]
        dl_r, se_r = dl[real], se[real]

        # ---- dst packing: rows = local dst, cols = extended src ----
        # Boundary rows: any in-edge whose src is a halo col (> n_per).
        bnd_keys = np.unique(
            (s_arr * np.int64(n_per) + dl_r)[se_r > n_per])
        (rows_b, cols_b, epos_b, row_pos, n_bnd, bw, total_rows, _,
         _) = _pack_shared(
            p, n_per, s_arr, dl_r, se_r, pos_arr, widths,
            lambda rk: np.isin(rk, bnd_keys, assume_unique=True),
            "tail", n_per, n_per, e_p)

        # ---- transpose packing: rows = ext src, cols = local dst ----
        (rows_t_b, cols_t_b, epos_t_b, row_pos_t, n_halo_t, _,
         total_rows_t, section_pos_t, halo_rows_t) = _pack_shared(
            p, n_ext, s_arr, se_r, dl_r, pos_arr, widths,
            lambda rk: (rk % n_ext) >= n_per + 1,
            "head", n_ext, n_per, e_p)

        # ---- slot → bucket-flat position (inverse of epos_b) ----
        total_flat = sum(int(np.prod(e_.shape[1:])) for e_ in epos_b)
        slot_pos = np.full((p, e_p), total_flat, np.int64)
        base = 0
        for epos in epos_b:
            r_pad, w = epos.shape[1:]
            ee = epos.reshape(p, -1)
            valid = ee < e_p
            srep = np.repeat(np.arange(p), r_pad * w).reshape(p, -1)
            flat = np.tile(np.arange(r_pad * w), (p, 1))
            slot_pos[srep[valid], ee[valid]] = base + flat[valid]
            base += r_pad * w

    # halo_pos_t: extended halo id n_per+1+j → halo-section position.
    halo_pos_t = section_pos_t[:, n_per + 1:].copy()
    halo_pos_t[halo_pos_t < 0] = halo_rows_t        # zero entry

    # ---- reverse-exchange landing map (vectorized, no O(P²) loop) ----
    send_idx = host["send_idx"]
    m_max = hg.halo
    recv_pos = np.full((p, n_per, p), p * m_max, np.int32)
    rr, ss, mm = np.nonzero(send_idx < n_per)
    recv_pos[rr, send_idx[rr, ss, mm], ss] = (ss * m_max + mm).astype(
        np.int32)

    sh = NamedSharding(mesh, P(hg.axis))

    def put(a):
        return put_sharded(np.asarray(a), sh)

    return HaloEll(
        rows_b=[put(r) for r in rows_b],
        cols_b=[put(c) for c in cols_b],
        epos_b=[put(x) for x in epos_b],
        row_pos=put(row_pos.astype(np.int32, copy=False)),
        rows_t_b=[put(r) for r in rows_t_b],
        cols_t_b=[put(c) for c in cols_t_b],
        epos_t_b=[put(x) for x in epos_t_b],
        row_pos_t=put(row_pos_t.astype(np.int32, copy=False)),
        halo_pos_t=put(halo_pos_t.astype(np.int32, copy=False)),
        recv_pos=put(recv_pos),
        slot_pos=put(slot_pos.astype(np.int32, copy=False)),
        widths=tuple(bw),
        n_bnd=tuple(n_bnd),
        n_halo_t=tuple(n_halo_t),
        total_rows=int(total_rows),
        total_rows_t=int(total_rows_t),
        halo_rows_t=int(halo_rows_t),
        n_per=n_per,
        axis=hg.axis,
    )


def _split_rows(rows, cols, n_special, side):
    """Static head/tail split of one bucket's (R,) rows / (R, D) cols."""
    r_pad = rows.shape[0]
    cut = n_special if side == "head" else r_pad - n_special
    return (rows[:cut], cols[:cut]), (rows[cut:], cols[cut:])


def _sweep_sections(he, bucket_lists, fn_interior, fn_boundary):
    """Run ``fn_interior(slices...)`` on every bucket's interior section
    and ``fn_boundary`` on every boundary tail, preserving the bucket
    concatenation order [b0_int, b0_bnd, b1_int, ...]. Zero-size
    sections are skipped (they contribute no rows)."""
    outs = []
    for bi, (parts, n_bnd) in enumerate(zip(zip(*bucket_lists), he.n_bnd)):
        r_pad = parts[0].shape[1]
        cut = r_pad - n_bnd
        if cut > 0:
            outs.append(fn_interior(*[x[0][:cut] for x in parts]))
        if n_bnd > 0:
            outs.append(fn_boundary(*[x[0][cut:] for x in parts]))
    return outs


def halo_attention_ell(hg: HaloGraph, he: HaloEll, mesh: Mesh, q, k, v,
                       *, head_axis: str = None):
    """Distributed fused attention: halo all_to_all exchange + per-shard
    ELL bucket sweeps — NO scatters anywhere, forward OR backward, and
    the exchange OVERLAPPED with interior compute (SURVEY §5 contract):
    interior bucket sections read only the local k/v tables, so the
    all_to_all has no dependency edge into them and XLA's latency-hiding
    scheduler runs it concurrently; only boundary sections consume the
    received rows. The backward additionally issues the reverse (dk‖dv,
    ONE stacked all_to_all) from the transpose buckets' halo-row head
    sections, overlapping it with the local-row sections + dq assembly.

    The hand VJP is the distributed form of ops/ell._ell_attention_bwd:
      pass 1 (local dst buckets): recompute α, accumulate dq and the
        per-owned-node stats (m, denom, Σ α·dα);
      pass 2 (transpose buckets over extended src ids): rebuild α_t/dS_t
        from per-slot lookups of the LOCAL stats (cols are local dst
        ids), reduce dk/dv per extended row via ``row_pos_t``;
      halo return: reverse all_to_all of the halo region of dk‖dv,
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
        kp, k_ext = _exchange_parts(hg, send_idx, k2)
        vp, v_ext = _exchange_parts(hg, send_idx, v2)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))        # zero row for pad rows

        def sweep(kt, vt):
            # kt/vt: the table this section reads (local or extended).
            def go(r, c):
                kg2 = kt[c]                       # (R, D, h·d)
                vg2 = vt[c]
                qr2 = qp[r]
                mask = c != n_per                 # pad cols -> zero row
                houts = []
                for i in range(h):
                    kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d,
                                              axis=2)
                    vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d,
                                              axis=2)
                    qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d,
                                              axis=1)
                    s = jnp.einsum(
                        "rd,rkd->rk", qr, kg,
                        preferred_element_type=jnp.float32) * scale
                    sm = jnp.where(mask, s, -1e30)
                    m = jnp.max(sm, axis=1, keepdims=True)
                    z = jnp.where(mask, jnp.exp(sm - m), 0)
                    alpha = z / jnp.maximum(
                        jnp.sum(z, axis=1, keepdims=True), 1e-30)
                    houts.append(jnp.einsum(
                        "rk,rkd->rd", alpha.astype(q.dtype), vg,
                        preferred_element_type=jnp.float32
                    ).astype(q.dtype))
                return (jnp.concatenate(houts, axis=-1) if h > 1
                        else houts[0])
            return go

        outs = _sweep_sections(he, (rows_b, cols_b),
                               sweep(kp, vp), sweep(k_ext, v_ext))
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


def _halo_return_packed(hg, recv_pos, d_local, d_halo, width):
    """Land a reverse-exchanged gradient: ``d_halo`` is the (P·M, width)
    halo region (gathered from the transpose buckets' HEAD sections, so
    the all_to_all here overlaps any compute that follows its issue),
    ``d_local`` the (n_per, width) owned region."""
    d_rbuf = d_halo.reshape(hg.num_parts, hg.halo, width)
    d_sbuf = jax.lax.all_to_all(
        d_rbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                             # (P, M, width)
    flat = jnp.concatenate(
        [d_sbuf.reshape(-1, width),
         jnp.zeros((1, width), d_local.dtype)],
        axis=0,
    )
    return d_local + jnp.sum(flat[recv_pos], axis=1)   # (n_per, P, w)→sum


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
          row_pos_t, halo_pos_t, recv_pos, q, k, v, dy):
        h = q.shape[1] if q.ndim == 3 else 1
        hd = h * d
        q2 = q.reshape(n_per, hd).astype(f32)
        k2 = k.reshape(n_per, hd)
        v2 = v.reshape(n_per, hd)
        dy2 = dy.reshape(n_per, hd).astype(f32)
        kp, k_ext = _exchange_parts(hg, send_idx, k2)
        vp, v_ext = _exchange_parts(hg, send_idx, v2)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))
        dyp = jnp.pad(dy2, ((0, 1), (0, 0)))

        # pass 1: local dst buckets — dq + per-node (m, den, agg) stats.
        # Interior sections read the LOCAL k/v tables only, so the
        # forward exchange overlaps them.
        def p1(kt, vt):
            def go(r, c):
                kg2 = kt[c]
                vg2 = vt[c]
                qr2 = qp[r]
                dyr2 = dyp[r]
                mask = c != n_per
                hparts, hstats = [], []
                for i in range(h):
                    kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d,
                                              axis=2)
                    vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d,
                                              axis=2)
                    qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d,
                                              axis=1)
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
                    hparts.append(jnp.einsum(
                        "rk,rkd->rd", dS, kg, preferred_element_type=f32))
                    hstats.extend([m[:, 0], den[:, 0], agg])
                dqp = (jnp.concatenate(hparts, axis=-1) if h > 1
                       else hparts[0])
                return dqp, jnp.stack(hstats, axis=-1)     # (R, 3h)
            return go

        both = _sweep_sections(he, (rows_b, cols_b), p1(kp, vp),
                               p1(k_ext, v_ext))
        dq_parts = [b[0] for b in both]
        st_parts = [b[1] for b in both]
        zero_dq = jnp.zeros((1, hd), f32)
        dq = jnp.concatenate(dq_parts + [zero_dq], axis=0)[row_pos[0]]
        stats = jnp.concatenate(
            st_parts + [jnp.zeros((1, 3 * h), f32)], axis=0
        )[row_pos[0]]                                      # (n_per, 3h)
        statsp = jnp.pad(stats, ((0, 1), (0, 0)))

        # pass 2: transpose buckets — dk/dv per extended row. HALO head
        # sections run first conceptually: their outputs feed the ONE
        # stacked reverse all_to_all, which then overlaps the local
        # sections (no dependency between them).
        def p2(rt, ct):
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
            dkp = jnp.concatenate(dks, axis=-1) if h > 1 else dks[0]
            dvp = jnp.concatenate(dvs, axis=-1) if h > 1 else dvs[0]
            return jnp.concatenate([dkp, dvp], axis=-1)    # (Rt, 2hd)

        halo_parts, all_parts = [], []
        for rows_t, cols_t, n_halo in zip(rows_t_b, cols_t_b,
                                          he.n_halo_t):
            rt, ct = rows_t[0], cols_t[0]
            if n_halo > 0:
                head = p2(rt[:n_halo], ct[:n_halo])
                halo_parts.append(head)
                all_parts.append(head)
            if rt.shape[0] - n_halo > 0:
                all_parts.append(p2(rt[n_halo:], ct[n_halo:]))
        zero2 = jnp.zeros((1, 2 * hd), f32)
        dkv_halo = jnp.concatenate(
            halo_parts + [zero2], axis=0)[halo_pos_t[0]]   # (P·M, 2hd)
        dkv_local = jnp.concatenate(
            all_parts + [zero2], axis=0)[row_pos_t[0][:n_per]]
        dkv = _halo_return_packed(hg, recv_pos[0], dkv_local, dkv_halo,
                                  2 * hd)
        dk = dkv[:, :hd]
        dv = dkv[:, hd:]
        shp = (n_per, h, d) if multi else (n_per, d)
        return (dq.reshape(shp).astype(q.dtype),
                dk.reshape(shp).astype(k.dtype),
                dv.reshape(shp).astype(v.dtype))

    dq, dk, dv = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b), P(ax), P(ax), P(ax),
                  qkv_spec, qkv_spec, qkv_spec, qkv_spec),
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
    )(hg.send_idx, he.row_pos, he.rows_b, he.cols_b, he.rows_t_b,
      he.cols_t_b, he.row_pos_t, he.halo_pos_t, he.recv_pos, q, k, v, dy)
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
    sweeps (the fast counterpart of :func:`halo_spmm`), the forward
    exchange overlapped with the interior bucket sections and the
    backward's reverse exchange with the transpose local sections
    (see :func:`halo_attention_ell`).

    edata: (P·E_p,) in halo slot order (``halo_edge_data``) — or a
    :class:`HaloPackedWeights` from :func:`halo_pack_weights`, which
    skips every per-step per-slot weight gather (the hand VJP then
    returns packed cotangents for both copies).
    x: (P·n_per, d) node-sharded. Hand VJP, scatter-free: dedata comes
    back through the ``slot_pos`` gather (or packed), dx through the
    transpose buckets + reverse all_to_all.
    """
    if isinstance(edata, HaloPackedWeights):
        return _halo_spmm_ell_packed(mesh, hg, he, edata, x)
    return _halo_spmm_ell(mesh, hg, he, edata, x)


def _spmm_sections(he, rows_b, cols_b, extra_b, fn_int, fn_bnd):
    """Section sweep with an extra per-bucket operand (weights/epos)."""
    outs = []
    for rows, cols, ex, n_bnd in zip(rows_b, cols_b, extra_b, he.n_bnd):
        r, c, x_ = rows[0], cols[0], ex[0]
        cut = r.shape[0] - n_bnd
        if cut > 0:
            outs.append(fn_int(r[:cut], c[:cut], x_[:cut]))
        if n_bnd > 0:
            outs.append(fn_bnd(r[cut:], c[cut:], x_[cut:]))
    return outs


def _spmm_ell_packed_fwd_impl(hg, he, mesh, w, x):
    ax = hg.axis

    def f(send_idx, row_pos, cols_b, w_b, x):
        xp, x_ext = _exchange_parts(hg, send_idx, x)

        def sweep(xt):
            def go(r, c, wl):
                return jnp.einsum(
                    "rk,rkd->rd", wl, xt[c],
                    preferred_element_type=jnp.float32).astype(x.dtype)
            return go

        outs = _spmm_sections(he, cols_b, cols_b, w_b,
                              lambda r, c, wl: sweep(xp)(r, c, wl),
                              lambda r, c, wl: sweep(x_ext)(r, c, wl))
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
          halo_pos_t, recv_pos, w_t_b, x, dy):
        xp, x_ext = _exchange_parts(hg, send_idx, x)
        dyp = jnp.pad(dy.astype(f32), ((0, 1), (0, 0)))

        # dW in the LOCAL layout: <dy[rows], x_ext[cols]> per slot —
        # interior sections read xp (overlap the forward exchange).
        dwl = []
        for rows, cols, n_bnd in zip(rows_b, cols_b, he.n_bnd):
            r, c = rows[0], cols[0]
            cut = r.shape[0] - n_bnd
            parts = []
            if cut > 0:
                parts.append(jnp.einsum(
                    "rd,rkd->rk", dyp[jnp.minimum(r[:cut], n_per)],
                    xp[c[:cut]], preferred_element_type=f32))
            if n_bnd > 0:
                parts.append(jnp.einsum(
                    "rd,rkd->rk", dyp[jnp.minimum(r[cut:], n_per)],
                    x_ext[c[cut:]], preferred_element_type=f32))
            dwl.append(jnp.concatenate(parts, axis=0)[None])

        # dx via the transpose buckets with PACKED transpose weights
        # (no epos_t gather), halo head sections first → reverse
        # all_to_all overlaps the local sections; dW in the transpose
        # layout from the same dy gathers.
        def p2(rt, ct, wt):
            dy_c = dyp[ct]
            dxp = jnp.einsum("rk,rkd->rd", wt, dy_c,
                             preferred_element_type=f32)
            xr = x_ext[jnp.minimum(rt, x_ext.shape[0] - 1)]
            dwt = jnp.einsum("rd,rkd->rk", xr, dy_c,
                             preferred_element_type=f32)
            return dxp, dwt

        halo_parts, all_parts, dwt_list = [], [], []
        for rows_t, cols_t, wt, n_halo in zip(rows_t_b, cols_t_b, w_t_b,
                                              he.n_halo_t):
            rt, ct, wtb = rows_t[0], cols_t[0], wt[0]
            secs = []
            if n_halo > 0:
                head = p2(rt[:n_halo], ct[:n_halo], wtb[:n_halo])
                halo_parts.append(head[0])
                all_parts.append(head[0])
                secs.append(head[1])
            if rt.shape[0] - n_halo > 0:
                tail = p2(rt[n_halo:], ct[n_halo:], wtb[n_halo:])
                all_parts.append(tail[0])
                secs.append(tail[1])
            dwt_list.append(jnp.concatenate(secs, axis=0)[None])
        zero = jnp.zeros((1, d), f32)
        dx_halo = jnp.concatenate(
            halo_parts + [zero], axis=0)[halo_pos_t[0]]
        dx_local = jnp.concatenate(
            all_parts + [zero], axis=0)[row_pos_t[0][:n_per]]
        dx = _halo_return_packed(hg, recv_pos[0], dx_local, dx_halo, d)
        return tuple(dwl) + tuple(dwt_list) + (dx.astype(x.dtype),)

    k = len(he.rows_b)
    outs = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), [P(ax)] * k, [P(ax)] * k,
                  [P(ax)] * len(he.rows_t_b), [P(ax)] * len(he.cols_t_b),
                  P(ax), P(ax), P(ax), [P(ax)] * len(w.t), P(ax), P(ax)),
        out_specs=tuple([P(ax)] * (k + len(w.t))) + (P(ax),),
    )(hg.send_idx, he.rows_b, he.cols_b, he.rows_t_b, he.cols_t_b,
      he.row_pos_t, he.halo_pos_t, he.recv_pos, w.t, x, dy)
    dwl = [o.astype(wl.dtype) for o, wl in zip(outs[:k], w.local)]
    dwt = [o.astype(wt.dtype) for o, wt in zip(outs[k:-1], w.t)]
    dw = HaloPackedWeights(local=dwl, t=dwt)
    return None, None, dw, outs[-1]


_halo_spmm_ell_packed.defvjp(
    _halo_spmm_ell_packed_fwd, _halo_spmm_ell_packed_bwd
)


def _spmm_ell_fwd_impl(hg, he, mesh, edata, x):
    ax = hg.axis

    def f(send_idx, row_pos, rows_b, cols_b, epos_b, ed, x):
        xp, x_ext = _exchange_parts(hg, send_idx, x)
        edp = jnp.pad(ed, [(0, 1)] + [(0, 0)] * (ed.ndim - 1))

        def sweep(xt):
            def go(r, c, ep):
                w = edp[ep]                              # (R, D)
                return jnp.einsum(
                    "rk,rkd->rd", w, xt[c],
                    preferred_element_type=jnp.float32).astype(x.dtype)
            return go

        outs = _spmm_sections(he, rows_b, cols_b, epos_b,
                              sweep(xp), sweep(x_ext))
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
    # dx_ext[src] = Σ w·dy[dst], then the reverse exchange (issued from
    # the halo head sections, overlapping the local sections). Weights
    # reach the transpose layout through the epos_t gather (per-slot
    # scalar gather; weights are per-edge data, not node data — for
    # static weights keep them packed instead).
    def f2(send_idx, rows_b, cols_b, rows_t_b, cols_t_b, epos_t_b,
           row_pos_t, halo_pos_t, slot_pos, recv_pos, ed, x, dy):
        xp, x_ext = _exchange_parts(hg, send_idx, x)
        dyp = jnp.pad(dy.astype(f32), ((0, 1), (0, 0)))
        edp = jnp.pad(ed, (0, 1))

        dd_parts = []
        for rows, cols, n_bnd in zip(rows_b, cols_b, he.n_bnd):
            r, c = rows[0], cols[0]
            cut = r.shape[0] - n_bnd
            if cut > 0:
                dd_parts.append(jnp.einsum(
                    "rd,rkd->rk", dyp[jnp.minimum(r[:cut], n_per)],
                    xp[c[:cut]], preferred_element_type=f32).reshape(-1))
            if n_bnd > 0:
                dd_parts.append(jnp.einsum(
                    "rd,rkd->rk", dyp[jnp.minimum(r[cut:], n_per)],
                    x_ext[c[cut:]],
                    preferred_element_type=f32).reshape(-1))
        dd_flat = jnp.concatenate(
            dd_parts + [jnp.zeros((1,), f32)], axis=0
        )
        dedata = dd_flat[slot_pos[0]].astype(ed.dtype)

        def p2(rt, ct, ep):
            w_t = edp[ep]
            dy_c = dyp[ct]
            return jnp.einsum("rk,rkd->rd", w_t, dy_c,
                              preferred_element_type=f32)

        halo_parts, all_parts = [], []
        for rows_t, cols_t, epos_t, n_halo in zip(
                rows_t_b, cols_t_b, epos_t_b, he.n_halo_t):
            rt, ct, ep = rows_t[0], cols_t[0], epos_t[0]
            if n_halo > 0:
                head = p2(rt[:n_halo], ct[:n_halo], ep[:n_halo])
                halo_parts.append(head)
                all_parts.append(head)
            if rt.shape[0] - n_halo > 0:
                all_parts.append(p2(rt[n_halo:], ct[n_halo:],
                                    ep[n_halo:]))
        zero = jnp.zeros((1, d), f32)
        dx_halo = jnp.concatenate(
            halo_parts + [zero], axis=0)[halo_pos_t[0]]
        dx_local = jnp.concatenate(
            all_parts + [zero], axis=0)[row_pos_t[0][:n_per]]
        dx = _halo_return_packed(hg, recv_pos[0], dx_local, dx_halo, d)
        return dedata, dx.astype(x.dtype)

    dedata, dx = jax.shard_map(
        f2, mesh=mesh,
        in_specs=(P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b), [P(ax)] * len(he.epos_t_b),
                  P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=(P(ax), P(ax)),
    )(hg.send_idx, he.rows_b, he.cols_b, he.rows_t_b, he.cols_t_b,
      he.epos_t_b, he.row_pos_t, he.halo_pos_t, he.slot_pos, he.recv_pos,
      edata, x, dy)
    return None, None, dedata, dx


_halo_spmm_ell.defvjp(_halo_spmm_ell_fwd, _halo_spmm_ell_bwd)
