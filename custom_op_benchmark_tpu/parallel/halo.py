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
      hub_idx:  (P, max(K, 1)) int32 — local row ids of this shard's
                HUB rows (pad = n_per). Hubs (round-3 verdict #3:
                vertex-cut hybrid for power-law skew) are src rows that
                ≥ ``hub_threshold`` shards request remotely; instead of
                riding the per-pair all_to_all they are replicated with
                ONE small all_gather (they appear in nearly every
                shard's halo anyway, so the gather moves no more data
                and the per-pair payload M shrinks for EVERY pair).
      hub_pos:  (P, n_per) int32 — owned local row → its hub slot
                j ∈ [0, K) (K = not a hub): lands the psum_scatter'd
                hub-gradient return without a scatter.

    Extended numbering: [0, n_per) owned, n_per zero row,
    n_per+1+r·M+m exchanged rows, n_per+1+P·M+r·K+j replicated hubs.

    Static: n_nodes, n_edges, num_parts, n_per, halo (M), n_hub (K),
    edges_per_part, axis.
    """

    send_idx: jax.Array
    src_ext: jax.Array
    dst_loc: jax.Array
    eid: jax.Array
    hub_idx: jax.Array
    hub_pos: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    num_parts: int = dataclasses.field(metadata=dict(static=True))
    n_per: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    n_hub: int = dataclasses.field(metadata=dict(static=True))
    edges_per_part: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_pad(self) -> int:
        return self.num_parts * self.n_per

    @property
    def halo_fraction(self) -> float:
        """Exchanged+replicated rows / owned rows (communication
        metric): P·M all_to_all landings + (P−1)·K hub-gather landings
        per shard."""
        p = self.num_parts
        return (p * self.halo + (p - 1) * self.n_hub) / max(self.n_per, 1)

    @property
    def comm_bytes_per_exchange(self) -> int:
        """Rows moved per halo exchange per unit feature byte: the
        padded all_to_all payload plus the hub all_gather payload."""
        p = self.num_parts
        return p * p * self.halo + p * (p - 1) * self.n_hub


def halo_graph(g: Graph, mesh: Mesh, axis: str = "edge",
               pad_multiple: int = 8,
               hub_threshold: int = None) -> HaloGraph:
    """Build the halo plan: owner-of-dst edge placement + send lists.

    Fully vectorized (one argsort over edges + one np.unique over remote
    (owner-pair, src) triples); no per-shard or O(P²) loops.

    ``hub_threshold`` (round-3 verdict #3): src rows requested remotely
    by ≥ this many shards become HUBS — replicated via one small
    all_gather instead of appearing in up to P−1 per-pair all_to_all
    send lists. On power-law graphs the few high-degree hubs dominate
    the halo (measured 6.2× owned rows at P=8 without this); the
    vertex-cut hybrid cuts the per-pair payload M for every pair while
    the gather moves each hub row once per peer. ``"auto"`` sweeps τ
    and keeps the split minimizing total padded wire volume (never
    worse than no hubs). NOTE the floor: the unpadded volume Σ_v req(v)
    cannot be beaten by ANY row-shipping scheme — the split attacks
    only the padding overhead above it (docs/RESULTS.md, hub section).
    Reference seed: the skew-handling of part_csr.py:13-27, one level
    up.
    """
    p = mesh.shape[axis]
    n, e = g.n_nodes, g.n_edges
    n_per = -(-n // p)
    src_h = np.asarray(jax.device_get(g.src))[:e]
    dst_h = np.asarray(jax.device_get(g.dst))[:e]

    # Native fast path (csrc/graphcore.cpp graphcore_halo_plan):
    # counting sorts instead of radix argsort + np.unique over e-scale
    # int64 keys — bitwise-identical output, ~10× at papers100M scale.
    # (Hub plans take the numpy path: the C planner is hub-unaware.)
    nat = None
    if hub_threshold is None:
        try:
            from custom_op_benchmark_tpu.graph import native as _native

            nat = _native.halo_plan_native(src_h, dst_h, n, p, n_per,
                                           pad_multiple,
                                           g.num_edges_padded)
        except KeyboardInterrupt:
            raise
        except Exception:
            nat = None
    k_max = 0
    hub_idx = np.full((p, 1), n_per, dtype=np.int32)
    hub_pos = np.zeros((p, n_per), dtype=np.int32)
    if nat is not None:
        send_idx, src_ext, dst_loc, eid, e_p, m_max = nat
    else:
        (send_idx, src_ext, dst_loc, eid, e_p, m_max, hub_idx,
         hub_pos, k_max) = _plan_host(
            src_h, dst_h, e, p, n_per, pad_multiple,
            g.num_edges_padded, hub_threshold)

    sh2 = NamedSharding(mesh, P(axis))
    hg = HaloGraph(
        send_idx=put_sharded(send_idx, sh2),
        src_ext=put_sharded(src_ext, sh2),
        dst_loc=put_sharded(dst_loc, sh2),
        eid=put_sharded(eid, sh2),
        hub_idx=put_sharded(hub_idx, sh2),
        hub_pos=put_sharded(hub_pos, sh2),
        n_nodes=n,
        n_edges=e,
        num_parts=p,
        n_per=int(n_per),
        halo=int(m_max),
        n_hub=int(k_max),
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


def _plan_host(src_h, dst_h, e, p, n_per, pad_multiple, e_pad,
               hub_threshold):
    """The numpy plan core (device-free): owner-of-dst placement, send
    lists, hub split. Shared by :func:`halo_graph` and the host-only
    :func:`plan_stats` used by the scaling projection."""
    src = src_h.astype(np.int64)
    dst = dst_h.astype(np.int64)
    k_max = 0
    hub_idx = np.full((p, 1), n_per, dtype=np.int32)
    hub_pos = np.zeros((p, n_per), dtype=np.int32)

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

    # Hub split: src rows with ≥ hub_threshold distinct requesting
    # shards leave the all_to_all sets and join the gather table.
    # ``"auto"`` sweeps every candidate τ and keeps the split minimizing
    # the TOTAL padded wire volume p²·M + p(p−1)·K — including "no
    # hubs", so auto never loses to the plain plan. (The unpadded
    # volume Σ_v req(v) is an information floor no row-shipping scheme
    # beats; the split only attacks the padding overhead above it.)
    hub_of = np.full(p * n_per, -1, dtype=np.int64)
    if hub_threshold is not None and len(uk):
        req = np.bincount(uk % vspace, minlength=p * n_per)
        if hub_threshold == "auto":
            vsrc_all = uk % vspace
            pair_all = uk // vspace
            best_tau, best_cost = None, None
            for tau in range(2, p + 1):
                keep = req[vsrc_all] < tau
                pc = np.bincount(pair_all[keep], minlength=p * p)
                m_t = _round_up(int(pc.max()) if keep.any() else 1,
                                pad_multiple)
                hn = np.flatnonzero(req[: p * n_per] >= tau)
                k_t = 0
                if len(hn):
                    k_t = _round_up(
                        int(np.bincount(hn // n_per,
                                        minlength=p).max()),
                        pad_multiple)
                cost = p * p * m_t + p * (p - 1) * k_t
                if best_cost is None or cost < best_cost:
                    best_tau, best_cost = tau, cost
            plain = p * p * _round_up(
                int(np.bincount(pair_all, minlength=p * p).max()),
                pad_multiple)
            hub_threshold = best_tau if best_cost < plain else p + 1
        hub_nodes = np.flatnonzero(req[: p * n_per]
                                   >= int(hub_threshold))
        if len(hub_nodes):
            owner = hub_nodes // n_per
            ocnt = np.bincount(owner, minlength=p)
            k_max = _round_up(int(ocnt.max()), pad_multiple)
            ostart = np.concatenate([[0], np.cumsum(ocnt)])[:p]
            hrank = (np.arange(len(hub_nodes), dtype=np.int64)
                     - ostart[owner])
            hub_idx = np.full((p, k_max), n_per, dtype=np.int32)
            hub_idx[owner, hrank] = (hub_nodes - owner * n_per
                                     ).astype(np.int32)
            hub_pos = np.full((p, n_per), k_max, dtype=np.int32)
            hub_pos[owner, hub_nodes - owner * n_per] = \
                hrank.astype(np.int32)
            hub_of[hub_nodes] = owner * k_max + hrank
            uk = uk[hub_of[uk % vspace] < 0]

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
        hub_slot = hub_of[v_rem]                 # (#rem,)
        tail = hub_slot < 0
        ext_rem = np.empty(len(key), np.int64)
        if tail.any():
            idx = np.searchsorted(uk, key[tail])
            ext_rem[tail] = n_per + 1 + r_rem[tail] * m_max \
                + rank[idx]
        ext_rem[~tail] = n_per + 1 + p * m_max + hub_slot[~tail]
        ext[rem] = ext_rem

    src_ext = np.full((p, e_p), n_per, dtype=np.int32)
    dst_loc = np.full((p, e_p), n_per, dtype=np.int32)
    eid = np.full((p, e_p), e_pad, dtype=np.int32)
    src_ext[own_s, pos_within] = ext.astype(np.int32)
    dst_loc[own_s, pos_within] = (dst_s - own_s * n_per).astype(
        np.int32)
    eid[own_s, pos_within] = order.astype(np.int32)
    return (send_idx, src_ext, dst_loc, eid, e_p, m_max, hub_idx,
            hub_pos, k_max)


@dataclasses.dataclass(frozen=True)
class PlanStats:
    """Device-free plan numbers for the scaling projection."""

    num_parts: int
    n_per: int
    halo: int
    n_hub: int
    edges_per_part: int
    pack_slots: int          # per-shard padded slots, BOTH packings
    interior_frac: float

    @property
    def halo_fraction(self) -> float:
        p = self.num_parts
        return (p * self.halo + (p - 1) * self.n_hub) / max(self.n_per,
                                                            1)


def plan_stats(src_h, dst_h, n, e, p, n_per, e_pad,
               hub_threshold=None,
               widths=(4, 8, 16, 32, 64, 128, 256, 512, 1024),
               pad_multiple=8) -> PlanStats:
    """Build the same numpy plan + both shared-shape packings a real
    P-mesh would get, host-only, and return the static numbers the
    analytic scaling projection needs (utils/bench_scaling
    run_projection) — no devices touched."""
    (send_idx, src_ext, dst_loc, eid, e_p, m_max, hub_idx, hub_pos,
     k_max) = _plan_host(src_h, dst_h, e, p, n_per, pad_multiple,
                         e_pad, hub_threshold)
    n_ext = n_per + 1 + p * m_max + p * k_max
    s_all = np.repeat(np.arange(p, dtype=np.int64), e_p)
    pos_all = np.tile(np.arange(e_p, dtype=np.int64), p)
    dl = dst_loc.reshape(-1).astype(np.int64)
    se = src_ext.reshape(-1).astype(np.int64)
    real = dl < n_per
    s_arr, pos_arr = s_all[real], pos_all[real]
    dl_r, se_r = dl[real], se[real]

    bnd_keys = np.unique((s_arr * np.int64(n_per) + dl_r)[se_r > n_per])
    (rows_b, cols_b, _, _, n_bnd, _, total_rows, _, _) = _pack_shared(
        p, n_per, s_arr, dl_r, se_r, pos_arr, widths,
        lambda rk: np.isin(rk, bnd_keys, assume_unique=True),
        "tail", n_per, n_per, e_p)
    slots = sum(int(np.prod(c.shape[1:])) for c in cols_b)
    (_, cols_t_b, _, _, _, _, _, _, _) = _pack_shared(
        p, n_ext, s_arr, se_r, dl_r, pos_arr, widths,
        lambda rk: (rk % n_ext) >= n_per + 1,
        "head", n_ext, n_per, e_p)
    slots += sum(int(np.prod(c.shape[1:])) for c in cols_t_b)
    return PlanStats(
        num_parts=p, n_per=n_per, halo=int(m_max), n_hub=int(k_max),
        edges_per_part=int(e_p), pack_slots=int(slots),
        interior_frac=round(1 - sum(n_bnd) / max(total_rows, 1), 4),
    )


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


def _exchange_parts(hg, send_idx, x_local, hub_idx=None):
    """Returns (xp, x_ext): the padded LOCAL table (n_per+1, ...) that
    interior sweeps read (no collective dependency), and the extended
    table [xp; received rows; replicated hubs] that boundary sweeps
    read. Keeping the two apart is what lets XLA overlap the all_to_all
    (and the hub all_gather) with interior compute."""
    xp = jnp.pad(
        x_local, [(0, 1)] + [(0, 0)] * (x_local.ndim - 1)
    )                                           # (n_per+1, ...)
    sbuf = xp[send_idx[0]]                      # (P, M, ...)
    rbuf = jax.lax.all_to_all(
        sbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                           # (P, M, ...)
    parts = [xp, rbuf.reshape((-1,) + x_local.shape[1:])]
    if hg.n_hub:
        hbuf = xp[hub_idx[0]]                   # (K, ...)
        gbuf = jax.lax.all_gather(hbuf, hg.axis, axis=0,
                                  tiled=False)  # (P, K, ...)
        parts.append(gbuf.reshape((-1,) + x_local.shape[1:]))
    x_ext = jnp.concatenate(parts, axis=0)      # (n_per+1+P·M+P·K, ...)
    return xp, x_ext


def _exchange(hg, send_idx, x_local, hub_idx=None):
    """Local rows → extended rows: pad, halo all_to_all (+ hub
    all_gather), concat."""
    return _exchange_parts(hg, send_idx, x_local, hub_idx)[1]


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

    def f(send_idx, hub_idx, src_ext, dst_loc, ed, x):
        # Block shapes: send_idx (1,P,M), src_ext/dst_loc (1,E_p),
        # ed (E_p, ...) — its first dim IS the sharded dim.
        x_ext = _exchange(hg, send_idx, x, hub_idx)
        msg = ed.reshape(ed.shape + (1,) * (x.ndim - ed.ndim)) \
            * x_ext[src_ext[0]]
        return _seg_sum_sorted(msg, dst_loc[0], hg.n_per + 1)[: hg.n_per]

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, hg.hub_idx, hg.src_ext, hg.dst_loc, edata, x)


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

    def f(send_idx, hub_idx, src_ext, dst_loc, q, k, v):
        k_ext = _exchange(hg, send_idx, k, hub_idx)
        v_ext = _exchange(hg, send_idx, v, hub_idx)
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
        in_specs=(P(ax),) * 7,
        out_specs=P(ax),
    )(hg.send_idx, hg.hub_idx, hg.src_ext, hg.dst_loc, q, k, v)


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
      twin_pos_t: list of (P, Rt_b, Dt_b) int32 — position of each
                transpose-bucket slot's edge in the LOCAL buckets' flat
                concatenation (slot_pos ∘ epos_t; pad = total local
                slots, a zero entry). The distributed twin-slot hop: the
                attention backward packs (α, dS) per local bucket in
                pass 1 and gathers them here in pass 2, so the q/dy slot
                gathers stay single-consumer (ops/ell layout law) and no
                score/stat recompute happens on the transpose sweep.
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
    twin_pos_t: list
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
    n_ext = n_per + 1 + p * hg.halo + p * hg.n_hub

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

    # twin_pos_t = slot_pos ∘ epos_t: transpose slot → local-bucket flat
    # position (pad slots, epos_t == e_p, land on the zero entry).
    total_flat = sum(int(np.prod(np.asarray(e_).shape[1:]))
                     for e_ in epos_b)
    sp_pad = np.concatenate(
        [np.asarray(slot_pos),
         np.full((p, 1), total_flat, np.asarray(slot_pos).dtype)], axis=1)
    twin_pos_t = []
    for ep in epos_t_b:
        ep = np.asarray(ep)
        tw = np.take_along_axis(
            sp_pad, ep.reshape(p, -1).astype(np.int64), axis=1
        ).reshape(ep.shape)
        twin_pos_t.append(tw.astype(np.int32, copy=False))

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
        twin_pos_t=[put(t) for t in twin_pos_t],
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


def _heads_matrix(h, d):
    """(h·d, h) block-indicator (ops/ell._head_matrix, rebuilt per local
    head count inside shard_map blocks)."""
    return jnp.repeat(jnp.eye(h, dtype=jnp.float32), d, axis=0)


def _attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis=None,
                       want_res=False):
    """Forward sweep. With ``want_res`` also returns per-bucket packed α
    ((P, R, D) / (P, R, D, h) sharded) — the flash-attention residual the
    hand backward reuses (no score recompute, same as the single-chip
    ops/ell._attn_fwd_impl). Multihead runs heads-in-the-sweep via the
    block-indicator matmul (the per-head ``slice_in_dim`` loop is the
    measured 2.3× pattern — round-3 verdict weak #1)."""
    ax = hg.axis
    multi = q.ndim == 3
    d = q.shape[-1]
    n_per = hg.n_per
    scale = 1.0 / np.sqrt(d)
    qkv_spec = P(ax, head_axis) if multi else P(ax)
    alpha_spec = P(ax, None, None, head_axis) if multi else P(ax)

    def f(send_idx, hub_idx, row_pos, rows_b, cols_b, q, k, v):
        # Local head count from the BLOCK shape (head_axis may shard it).
        h = q.shape[1] if q.ndim == 3 else 1
        f32 = jnp.float32
        q2 = q.reshape(n_per, h * d)
        k2 = k.reshape(n_per, h * d)
        v2 = v.reshape(n_per, h * d)
        kp, k_ext = _exchange_parts(hg, send_idx, k2, hub_idx)
        vp, v_ext = _exchange_parts(hg, send_idx, v2, hub_idx)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))        # zero row for pad rows
        heads_m = (_heads_matrix(h, d).astype(q.dtype)
                   if h > 1 else None)            # bf16 keeps qh narrow

        def go(r, c, kt, vt):
            kg2 = kt[c]                       # (R, D, h·d) — score only
            vg2 = vt[c]                       # output einsum only
            qr2 = qp[r]
            mask = c != n_per                 # pad cols -> zero row
            if h == 1:
                s = jnp.einsum("rd,rkd->rk", qr2, kg2,
                               preferred_element_type=f32) * scale
                sm = jnp.where(mask, s, -1e30)
                m = jnp.max(sm, axis=1, keepdims=True)
                z = jnp.where(mask, jnp.exp(sm - m), 0)
                alpha = z / jnp.maximum(
                    jnp.sum(z, axis=1, keepdims=True), 1e-30)
                out = jnp.einsum(
                    "rk,rkd->rd", alpha, vg2,
                    preferred_element_type=f32).astype(q.dtype)
                return out, alpha
            qh = qr2[:, :, None] * heads_m[None]       # (R, h·d, h)
            s = jnp.einsum("rkc,rch->rkh", kg2, qh,
                           preferred_element_type=f32) * scale
            sm = jnp.where(mask[:, :, None], s, -1e30)
            m = jnp.max(sm, axis=1, keepdims=True)
            z = jnp.where(mask[:, :, None], jnp.exp(sm - m), 0)
            alpha = z / jnp.maximum(
                jnp.sum(z, axis=1, keepdims=True), 1e-30)
            out_full = jnp.einsum("rkh,rkc->rhc", alpha, vg2,
                                  preferred_element_type=f32)
            out = jnp.einsum("rhc,ch->rc", out_full, heads_m,
                             preferred_element_type=f32).astype(q.dtype)
            return out, alpha                          # α: (R, D, h)

        outs, alphas = [], []
        for rows, cols, n_bnd in zip(rows_b, cols_b, he.n_bnd):
            r_all, c_all = rows[0], cols[0]
            cut = r_all.shape[0] - n_bnd
            a_secs = []
            if cut > 0:
                o, a = go(r_all[:cut], c_all[:cut], kp, vp)
                outs.append(o)
                a_secs.append(a)
            if n_bnd > 0:
                o, a = go(r_all[cut:], c_all[cut:], k_ext, v_ext)
                outs.append(o)
                a_secs.append(a)
            if want_res:
                ab = jnp.concatenate(a_secs, axis=0)
                if multi and ab.ndim == 2:
                    ab = ab[..., None]   # local h==1 under head_axis TP
                alphas.append(ab[None])
        cat = jnp.concatenate(
            outs + [jnp.zeros((1, h * d), q.dtype)], axis=0
        )
        out = cat[row_pos[0]]                     # (n_per, h·d) — gather!
        out = out.reshape((n_per, h, d) if multi else (n_per, d))
        if want_res:
            return out, tuple(alphas)
        return out

    out_specs = ((qkv_spec, tuple([alpha_spec] * len(he.rows_b)))
                 if want_res else qkv_spec)
    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), qkv_spec, qkv_spec, qkv_spec),
        out_specs=out_specs,
    )(hg.send_idx, hg.hub_idx, he.row_pos, he.rows_b, he.cols_b, q, k, v)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _halo_attn_ell(mesh, head_axis, hg, he, q, k, v):
    return _attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis)


def _halo_attn_ell_fwd(mesh, head_axis, hg, he, q, k, v):
    y, alphas = _attn_ell_fwd_impl(hg, he, mesh, q, k, v, head_axis,
                                   want_res=True)
    return y, (hg, he, q, k, v, alphas)


def _halo_return_packed(hg, recv_pos, hub_pos, d_local, d_halo, width):
    """Land a reverse-exchanged gradient: ``d_halo`` is the
    (P·M + P·K, width) halo region (gathered from the transpose
    buckets' HEAD sections, so the collectives here overlap any compute
    that follows their issue), ``d_local`` the (n_per, width) owned
    region. The a2a part transposes the forward all_to_all; the hub
    part transposes the forward all_gather as a psum_scatter, landed
    with the ``hub_pos`` gather — zero scatters.

    ``d_halo`` may arrive in a narrower WIRE dtype than ``d_local``
    (bf16 under the measured mixed-precision policy — halves the
    reverse-exchange bytes, docs/RESULTS.md): the collectives run at
    wire width, the landing accumulates at ``d_local.dtype`` (f32)."""
    p = hg.num_parts
    a2a = hg.num_parts * hg.halo
    d_rbuf = d_halo[:a2a].reshape(p, hg.halo, width)
    d_sbuf = jax.lax.all_to_all(
        d_rbuf, hg.axis, split_axis=0, concat_axis=0, tiled=False
    )                                             # (P, M, width)
    flat = jnp.concatenate(
        [d_sbuf.reshape(-1, width),
         jnp.zeros((1, width), d_sbuf.dtype)],
        axis=0,
    )
    out = d_local + jnp.sum(                      # (n_per, P, w)→sum
        flat[recv_pos].astype(d_local.dtype), axis=1)
    if hg.n_hub:
        d_hub = d_halo[a2a:].reshape(p, hg.n_hub, width)
        own = jax.lax.psum_scatter(d_hub, hg.axis, scatter_dimension=0,
                                   tiled=False)   # (K, width), wire dtype
        ownp = jnp.concatenate(
            [own, jnp.zeros((1, width), own.dtype)], axis=0)
        out = out + ownp[hub_pos[0]].astype(d_local.dtype)
    return out


def _halo_attn_ell_bwd(mesh, head_axis, res, dy):
    """Distributed twin-hop backward (round-3 verdict #2): the exact
    shape of the single-chip ops/ell._ell_attention_bwd, per shard.

      pass 1 (local dst buckets): α comes straight from the saved packed
        forward residual — no score/softmax recompute — so the k gather
        feeds only the dq einsum and the v gather only the dα einsum;
        (α, dS) are packed per bucket for the hop.
      twin hop: ONE fenced gather through ``twin_pos_t`` re-packs the
        (α, dS) channels into the transpose layout (optimization
        barriers on both sides — the narrow multi-consumer gather law,
        graph/ell.py).
      pass 2 (transpose buckets): dk/dv with the q and dy slot gathers
        SINGLE-consumer. The old design rebuilt α_t from per-node
        (m, den, agg) stats, which made q_c/dy_c double-consumers and
        added a narrow (Rt, Dt, 3h) stats gather — the measured
        1.8-2.5× pattern (scripts/exp_attn_variants.py).
      halo return: ONE stacked dk‖dv reverse all_to_all issued from the
        halo head sections, overlapping the local sections.
    """
    hg, he, q, k, v, alphas = res
    ax = hg.axis
    multi = q.ndim == 3
    d = q.shape[-1]
    n_per = hg.n_per
    scale = 1.0 / np.sqrt(d)
    f32 = jnp.float32
    qkv_spec = P(ax, head_axis) if multi else P(ax)
    alpha_spec = P(ax, None, None, head_axis) if multi else P(ax)

    def f(send_idx, hub_idx, hub_pos, row_pos, rows_b, cols_b, rows_t_b,
          cols_t_b, twin_pos_t, row_pos_t, halo_pos_t, recv_pos, alphas,
          q, k, v, dy):
        h = q.shape[1] if q.ndim == 3 else 1
        hd = h * d
        # Storage dtype is kept through the pads/gathers (bf16 tiles
        # halve the gathered bytes — the measured single-chip policy);
        # every einsum accumulates f32 via preferred_element_type.
        q2 = q.reshape(n_per, hd)
        k2 = k.reshape(n_per, hd)
        v2 = v.reshape(n_per, hd)
        dy2 = dy.reshape(n_per, hd)
        kp, k_ext = _exchange_parts(hg, send_idx, k2, hub_idx)
        vp, v_ext = _exchange_parts(hg, send_idx, v2, hub_idx)
        qp = jnp.pad(q2, ((0, 1), (0, 0)))
        dyp = jnp.pad(dy2, ((0, 1), (0, 0)))
        heads_m = (_heads_matrix(h, d).astype(q.dtype)
                   if h > 1 else None)
        nch = 2 * h                              # packed (α, dS) channels

        # pass 1: local dst buckets — dq + packed (α, dS). Interior
        # sections read the LOCAL k/v tables only, so the forward
        # exchange overlaps them.
        def p1(r, c, alpha, kt, vt):
            kg2 = kt[c]                          # dq einsum only
            vg2 = vt[c]                          # dα einsum only
            dyr2 = dyp[r]
            if h == 1:
                dalpha = jnp.einsum("rd,rkd->rk", dyr2, vg2,
                                    preferred_element_type=f32)
                agg = jnp.sum(alpha * dalpha, axis=1)
                dS = alpha * (dalpha - agg[:, None]) * scale
                dqp = jnp.einsum("rk,rkd->rd", dS, kg2,
                                 preferred_element_type=f32)
                return dqp, jnp.stack([alpha, dS], axis=-1)
            dyh = dyr2[:, :, None] * heads_m[None]       # (R, h·d, h)
            dalpha = jnp.einsum("rkc,rch->rkh", vg2, dyh,
                                preferred_element_type=f32)
            agg = jnp.sum(alpha * dalpha, axis=1, keepdims=True)
            dS = alpha * (dalpha - agg) * scale
            dq_full = jnp.einsum("rkh,rkc->rhc", dS, kg2,
                                 preferred_element_type=f32)
            dqp = jnp.einsum("rhc,ch->rc", dq_full, heads_m,
                             preferred_element_type=f32)
            return dqp, jnp.concatenate([alpha, dS], axis=-1)

        dq_parts, packed_parts = [], []
        for rows, cols, al, n_bnd in zip(rows_b, cols_b, alphas,
                                         he.n_bnd):
            r_all, c_all, a_all = rows[0], cols[0], al[0]
            if h == 1 and a_all.ndim == 3:
                a_all = a_all[..., 0]    # local h==1 under head_axis TP
            cut = r_all.shape[0] - n_bnd
            b_secs = []
            if cut > 0:
                dqp, pk = p1(r_all[:cut], c_all[:cut], a_all[:cut],
                             kp, vp)
                dq_parts.append(dqp)
                b_secs.append(pk)
            if n_bnd > 0:
                dqp, pk = p1(r_all[cut:], c_all[cut:], a_all[cut:],
                             k_ext, v_ext)
                dq_parts.append(dqp)
                b_secs.append(pk)
            packed_parts.append(
                jnp.concatenate(b_secs, axis=0).reshape(-1, nch))
        zero_dq = jnp.zeros((1, hd), f32)
        dq = jnp.concatenate(dq_parts + [zero_dq], axis=0)[row_pos[0]]

        # twin hop: local-bucket flat (α, dS) → transpose slots, fenced.
        packed_flat = jnp.concatenate(
            packed_parts + [jnp.zeros((1, nch), f32)], axis=0)
        packed_flat = jax.lax.optimization_barrier(packed_flat)
        both_t = [packed_flat[tp[0]] for tp in twin_pos_t]
        both_t = jax.lax.optimization_barrier(both_t)

        # pass 2: transpose buckets — dk/dv per extended row, q_c/dy_c
        # single-consumer. HALO head sections feed the ONE stacked
        # reverse all_to_all, which overlaps the local sections.
        def p2(ct, bt):
            q_c2 = qp[ct]                          # dk einsum only
            dy_c2 = dyp[ct]                        # dv einsum only
            if h == 1:
                alpha_t = bt[..., 0]
                dS_t = bt[..., 1]
                dkp = jnp.einsum("rk,rkd->rd", dS_t, q_c2,
                                 preferred_element_type=f32)
                dvp = jnp.einsum("rk,rkd->rd", alpha_t, dy_c2,
                                 preferred_element_type=f32)
            else:
                alpha_t = bt[..., :h]
                dS_t = bt[..., h:]
                dk_full = jnp.einsum("rkh,rkc->rhc", dS_t, q_c2,
                                     preferred_element_type=f32)
                dkp = jnp.einsum("rhc,ch->rc", dk_full, heads_m,
                                 preferred_element_type=f32)
                dv_full = jnp.einsum("rkh,rkc->rhc", alpha_t, dy_c2,
                                     preferred_element_type=f32)
                dvp = jnp.einsum("rhc,ch->rc", dv_full, heads_m,
                                 preferred_element_type=f32)
            return jnp.concatenate([dkp, dvp], axis=-1)    # (Rt, 2hd)

        halo_parts, all_parts = [], []
        for cols_t, bt_full, n_halo in zip(cols_t_b, both_t,
                                           he.n_halo_t):
            ct = cols_t[0]
            if n_halo > 0:
                head = p2(ct[:n_halo], bt_full[:n_halo])
                halo_parts.append(head)
                all_parts.append(head)
            if ct.shape[0] - n_halo > 0:
                all_parts.append(p2(ct[n_halo:], bt_full[n_halo:]))
        zero2 = jnp.zeros((1, 2 * hd), f32)
        # Wire dtype = the operands' storage dtype: under the bf16
        # policy the reverse dk‖dv all_to_all (and hub psum_scatter)
        # moves half the bytes; the landing accumulates f32
        # (_halo_return_packed). Local sections stay f32 end to end.
        dkv_halo = jnp.concatenate(
            halo_parts + [zero2], axis=0
        )[halo_pos_t[0]].astype(k.dtype)              # (P·M+P·K, 2hd)
        dkv_local = jnp.concatenate(
            all_parts + [zero2], axis=0)[row_pos_t[0][:n_per]]
        dkv = _halo_return_packed(hg, recv_pos[0], hub_pos, dkv_local,
                                  dkv_halo, 2 * hd)
        dk = dkv[:, :hd]
        dv = dkv[:, hd:]
        shp = (n_per, h, d) if multi else (n_per, d)
        return (dq.reshape(shp).astype(q.dtype),
                dk.reshape(shp).astype(k.dtype),
                dv.reshape(shp).astype(v.dtype))

    dq, dk, dv = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b),
                  [P(ax)] * len(he.twin_pos_t), P(ax), P(ax), P(ax),
                  [alpha_spec] * len(he.rows_b),
                  qkv_spec, qkv_spec, qkv_spec, qkv_spec),
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
    )(hg.send_idx, hg.hub_idx, hg.hub_pos, he.row_pos, he.rows_b,
      he.cols_b, he.rows_t_b, he.cols_t_b, he.twin_pos_t, he.row_pos_t,
      he.halo_pos_t, he.recv_pos, list(alphas), q, k, v, dy)
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

    def f(send_idx, hub_idx, row_pos, cols_b, w_b, x):
        xp, x_ext = _exchange_parts(hg, send_idx, x, hub_idx)

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
        in_specs=(P(ax), P(ax), P(ax), [P(ax)] * len(he.cols_b),
                  [P(ax)] * len(w.local), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, hg.hub_idx, he.row_pos, he.cols_b, w.local, x)


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

    def f(send_idx, hub_idx, hub_pos, rows_b, cols_b, rows_t_b,
          cols_t_b, row_pos_t, halo_pos_t, recv_pos, w_t_b, x, dy):
        xp, x_ext = _exchange_parts(hg, send_idx, x, hub_idx)
        dyp = jnp.pad(dy, ((0, 1), (0, 0)))   # storage dtype; f32 accum

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
            halo_parts + [zero], axis=0
        )[halo_pos_t[0]].astype(x.dtype)      # wire dtype (bf16 policy)
        dx_local = jnp.concatenate(
            all_parts + [zero], axis=0)[row_pos_t[0][:n_per]]
        dx = _halo_return_packed(hg, recv_pos[0], hub_pos, dx_local,
                                 dx_halo, d)
        return tuple(dwl) + tuple(dwt_list) + (dx.astype(x.dtype),)

    k = len(he.rows_b)
    outs = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), [P(ax)] * k, [P(ax)] * k,
                  [P(ax)] * len(he.rows_t_b), [P(ax)] * len(he.cols_t_b),
                  P(ax), P(ax), P(ax), [P(ax)] * len(w.t), P(ax), P(ax)),
        out_specs=tuple([P(ax)] * (k + len(w.t))) + (P(ax),),
    )(hg.send_idx, hg.hub_idx, hg.hub_pos, he.rows_b, he.cols_b,
      he.rows_t_b, he.cols_t_b, he.row_pos_t, he.halo_pos_t,
      he.recv_pos, w.t, x, dy)
    dwl = [o.astype(wl.dtype) for o, wl in zip(outs[:k], w.local)]
    dwt = [o.astype(wt.dtype) for o, wt in zip(outs[k:-1], w.t)]
    dw = HaloPackedWeights(local=dwl, t=dwt)
    return None, None, dw, outs[-1]


_halo_spmm_ell_packed.defvjp(
    _halo_spmm_ell_packed_fwd, _halo_spmm_ell_packed_bwd
)


def _spmm_ell_fwd_impl(hg, he, mesh, edata, x):
    ax = hg.axis

    def f(send_idx, hub_idx, row_pos, rows_b, cols_b, epos_b, ed, x):
        xp, x_ext = _exchange_parts(hg, send_idx, x, hub_idx)
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
        in_specs=(P(ax), P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.epos_b),
                  P(ax), P(ax)),
        out_specs=P(ax),
    )(hg.send_idx, hg.hub_idx, he.row_pos, he.rows_b, he.cols_b,
      he.epos_b, edata, x)


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
    def f2(send_idx, hub_idx, hub_pos, rows_b, cols_b, rows_t_b,
           cols_t_b, epos_t_b, row_pos_t, halo_pos_t, slot_pos,
           recv_pos, ed, x, dy):
        xp, x_ext = _exchange_parts(hg, send_idx, x, hub_idx)
        dyp = jnp.pad(dy, ((0, 1), (0, 0)))   # storage dtype; f32 accum
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
            halo_parts + [zero], axis=0
        )[halo_pos_t[0]].astype(x.dtype)      # wire dtype (bf16 policy)
        dx_local = jnp.concatenate(
            all_parts + [zero], axis=0)[row_pos_t[0][:n_per]]
        dx = _halo_return_packed(hg, recv_pos[0], hub_pos, dx_local,
                                 dx_halo, d)
        return dedata, dx.astype(x.dtype)

    dedata, dx = jax.shard_map(
        f2, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), [P(ax)] * len(he.rows_b),
                  [P(ax)] * len(he.cols_b), [P(ax)] * len(he.rows_t_b),
                  [P(ax)] * len(he.cols_t_b), [P(ax)] * len(he.epos_t_b),
                  P(ax), P(ax), P(ax), P(ax), P(ax), P(ax), P(ax)),
        out_specs=(P(ax), P(ax)),
    )(hg.send_idx, hg.hub_idx, hg.hub_pos, he.rows_b, he.cols_b,
      he.rows_t_b, he.cols_t_b, he.epos_t_b, he.row_pos_t,
      he.halo_pos_t, he.slot_pos, he.recv_pos, edata, x, dy)
    return None, None, dedata, dx


_halo_spmm_ell.defvjp(_halo_spmm_ell_fwd, _halo_spmm_ell_bwd)
