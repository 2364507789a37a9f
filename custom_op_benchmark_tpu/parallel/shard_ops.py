"""Edge-partitioned distributed ops via ``shard_map`` (SURVEY.md §7.6).

Layout contract (the multi-chip generalization of the reference's
``partition_csr`` row chunking, part_csr.py:13-27):

- the canonical (row-sorted) edge list is split into ``P`` contiguous,
  equally-padded shards → edge arrays have shape ``(P·E_p,)`` sharded on
  the ``edge`` mesh axis;
- node arrays (features, outputs) are sharded contiguously over the same
  axis: ``n_pad = P · n_p`` rows, device ``p`` owning rows
  ``[p·n_p, (p+1)·n_p)``;
- because edges are row-sorted, each shard's scatter targets span a
  contiguous row range; cross-shard healing of boundary rows uses
  ``psum_scatter`` (dense, simple, correct — the all-to-all halo-exchange
  optimization comes after profiling);
- gathers of remote endpoint features use ``all_gather`` over ICI,
  overlapped with local compute by XLA's latency-hiding scheduler.

Everything here is differentiable by JAX AD (collectives transpose to
collectives: all_gather ↔ psum_scatter), so the distributed path needs no
hand-written VJPs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custom_op_benchmark_tpu.graph.graph import Graph, _round_up
from custom_op_benchmark_tpu.graph.partition import edge_partition


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistGraph:
    """Edge-partitioned graph resident on a 1-D device mesh.

    Leaves are *global* jax.Arrays sharded over the ``axis`` mesh axis:
      src, dst: (P·E_p,) int32, global node ids (padded slots = n_nodes).
    """

    src: jax.Array
    dst: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    num_parts: int = dataclasses.field(metadata=dict(static=True))
    edges_per_part: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def nodes_per_part(self) -> int:
        return self.n_pad // self.num_parts


def dist_graph(g: Graph, mesh: Mesh, axis: str = "edge") -> DistGraph:
    """Shard ``g``'s canonical edge list over ``mesh[axis]``."""
    p = mesh.shape[axis]
    plan = edge_partition(g, p, pad_multiple=8)
    n_pad = _round_up(g.n_nodes, p)
    sharding = NamedSharding(mesh, P(axis))
    src = jax.device_put(plan.src.reshape(-1), sharding)
    dst = jax.device_put(plan.dst.reshape(-1), sharding)
    return DistGraph(
        src=src,
        dst=dst,
        n_nodes=g.n_nodes,
        n_pad=n_pad,
        n_edges=g.n_edges,
        num_parts=p,
        edges_per_part=plan.edges_per_part,
        axis=axis,
    )


def node_sharding(dg: DistGraph, mesh: Mesh) -> NamedSharding:
    """Sharding for node arrays: rows split over the edge axis."""
    return NamedSharding(mesh, P(dg.axis))


def shard_nodes(dg: DistGraph, mesh: Mesh, x) -> jax.Array:
    """Pad node array to n_pad rows and shard it over the mesh."""
    x = jnp.asarray(x)
    if x.shape[0] < dg.n_pad:
        pad = [(0, dg.n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    return jax.device_put(x, node_sharding(dg, mesh))


def _seg_sum(vals, ids, n):
    return jnp.zeros((n,) + vals.shape[1:], vals.dtype).at[ids].add(
        vals, mode="drop"
    )


def _seg_max(vals, ids, n):
    return jnp.full((n,) + vals.shape[1:], -1e9, vals.dtype).at[ids].max(
        vals, mode="drop"
    )


def _clamp(ids, n):
    return jnp.minimum(ids, n - 1)


def dist_sddmm(dg: DistGraph, mesh: Mesh, A, B):
    """Edge-sharded scores: y[e,h] = <A[src], B[dst]> over the mesh.

    A, B: (n_pad, h, d) node-sharded. Returns (P·E_p, h) edge-sharded.
    """
    ax = dg.axis

    def f(src, dst, a, b):
        a_full = jax.lax.all_gather(a, ax, tiled=True)      # (n_pad, h, d)
        b_full = jax.lax.all_gather(b, ax, tiled=True)
        ae = a_full[_clamp(src, dg.n_pad)]
        be = b_full[_clamp(dst, dg.n_pad)]
        y = jnp.einsum("ehd,ehd->eh", ae, be)
        return jnp.where((src < dg.n_nodes)[:, None], y, 0)

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )(dg.src, dg.dst, A, B)


def dist_edge_softmax(dg: DistGraph, mesh: Mesh, x, *, by: str = "dst"):
    """Segment softmax over split segments (the ring-attention analog).

    Each shard reduces its local edges into a full-length (n_pad, h)
    max/sum, healed across shards with ``pmax``/``psum`` — the two-pass
    online-softmax reduction over partitioned segments (SURVEY.md §5).
    """
    ax = dg.axis
    ids_arr = dg.src if by == "src" else dg.dst

    def f(ids, x):
        # Stability shift only — not a differentiation path (pmax has no
        # JVP rule, and softmax is shift-invariant anyway), so cut the
        # tangent before the collective ever sees it.
        m = _seg_max(jax.lax.stop_gradient(x), ids, dg.n_pad)
        m = jax.lax.pmax(m, ax)
        z = jnp.exp(x - m[_clamp(ids, dg.n_pad)])
        s = _seg_sum(z, ids, dg.n_pad)
        s = jax.lax.psum(s, ax)
        y = z / jnp.maximum(s[_clamp(ids, dg.n_pad)], 1e-30)
        return jnp.where((ids < dg.n_nodes)[:, None], y, 0)

    return jax.shard_map(
        f, mesh=mesh, in_specs=(P(ax), P(ax)), out_specs=P(ax)
    )(ids_arr, x)


def dist_vector_spmm(dg: DistGraph, mesh: Mesh, edata, x, *,
                     to: str = "src"):
    """out[u,h,:] = Σ_{e=(u,v)} edata[e,h]·x[v,h,:], node-sharded output.

    Local partial segment sums per shard, combined with ``psum_scatter``
    so each device keeps exactly its owned node rows.
    """
    ax = dg.axis
    agg_arr, gat_arr = (dg.src, dg.dst) if to == "src" else (dg.dst, dg.src)

    def f(agg_ids, gat_ids, edata, x):
        x_full = jax.lax.all_gather(x, ax, tiled=True)       # (n_pad, h, d)
        contrib = edata[:, :, None] * x_full[_clamp(gat_ids, dg.n_pad)]
        contrib = jnp.where(
            (agg_ids < dg.n_nodes)[:, None, None], contrib, 0
        )
        partial = _seg_sum(contrib, agg_ids, dg.n_pad)       # (n_pad, h, d)
        return jax.lax.psum_scatter(
            partial, ax, scatter_dimension=0, tiled=True
        )

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax), P(ax), P(ax), P(ax)),
        out_specs=P(ax),
    )(agg_arr, gat_arr, edata, x)


def dist_gat_attention(dg: DistGraph, mesh: Mesh, q, k, v):
    """Fused distributed attention: SDDMM → softmax(dst) → SpMM(to dst).

    One shard_map region ⇒ one all_gather of k/q/v feeds all three phases
    (the composition the reference benchmarks piecewise, wrapper.py:201-291).
    q, k, v: (n_pad, h, d) node-sharded. Returns (n_pad, h, d) node-sharded.
    """
    ax = dg.axis
    d = q.shape[-1]

    def f(src, dst, q, k, v):
        q_full = jax.lax.all_gather(q, ax, tiled=True)
        k_full = jax.lax.all_gather(k, ax, tiled=True)
        v_full = jax.lax.all_gather(v, ax, tiled=True)
        sc = _clamp(src, dg.n_pad)
        dc = _clamp(dst, dg.n_pad)
        scores = jnp.einsum(
            "ehd,ehd->eh", k_full[sc], q_full[dc]
        ) / jnp.sqrt(jnp.asarray(d, q.dtype))
        valid = (src < dg.n_nodes)[:, None]
        scores = jnp.where(valid, scores, -1e9)
        # softmax over in-edges of dst, segments split across shards.
        # Max is a stability shift only — tangent cut before the pmax
        # (no JVP rule for pmax; softmax is shift-invariant).
        m = jax.lax.pmax(
            _seg_max(jax.lax.stop_gradient(scores), dst, dg.n_pad), ax
        )
        z = jnp.where(valid, jnp.exp(scores - m[dc]), 0)
        s = jax.lax.psum(_seg_sum(z, dst, dg.n_pad), ax)
        alpha = z / jnp.maximum(s[dc], 1e-30)
        # aggregate α·v[src] into dst
        contrib = alpha[:, :, None] * v_full[sc]
        partial = _seg_sum(contrib, dst, dg.n_pad)
        return jax.lax.psum_scatter(
            partial, ax, scatter_dimension=0, tiled=True
        )

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(ax),) * 5,
        out_specs=P(ax),
    )(dg.src, dg.dst, q, k, v)
