"""Pure-XLA segment implementations of the op family (the oracle).

Every function here works on *normalized* shapes — node features
``(n, h, d)``, edge features/scores ``(e, h)`` or ``(e, d)`` — in the
graph's canonical (row-sorted) edge order, and is written so XLA's gather /
scatter-add lowering is as good as it gets:

- reductions over ``src`` use ``indices_are_sorted=True`` (canonical order
  is src-sorted by construction, graph/graph.py);
- reductions over ``dst`` are routed through the precomputed CSC
  permutation so they are sorted too (the reference instead launches its
  backward kernels over the column CSR — graphop_kernel.cu:398, 586 — same
  idea, but it needs atomics and we do not);
- padded edges carry endpoint id ``n`` (one past the last node): gathers
  are clamped explicitly, scatters use ``mode="drop"`` so padding
  contributes nothing.

These are the differential-testing baselines for the Pallas kernels, in the
same role as the reference's incidence-matrix / dense-bmm / th.sparse
baselines (wrapper.py:148-485).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_nodes(feat: jax.Array, idx: jax.Array) -> jax.Array:
    """feat[(n, ...)][idx] with padded ids (== n) clamped to row n-1."""
    n = feat.shape[0]
    return feat[jnp.minimum(idx, n - 1)]


def segment_sum(
    vals: jax.Array,
    ids: jax.Array,
    num_segments: int,
    *,
    sorted_ids: bool = False,
) -> jax.Array:
    """Scatter-add ``vals`` into ``num_segments`` rows; OOB ids dropped."""
    out = jnp.zeros((num_segments,) + vals.shape[1:], vals.dtype)
    return out.at[ids].add(
        vals, mode="drop", indices_are_sorted=sorted_ids
    )


def segment_max(
    vals: jax.Array,
    ids: jax.Array,
    num_segments: int,
    *,
    sorted_ids: bool = False,
) -> jax.Array:
    """Segment max with empty segments = -inf-ish (finite, like the
    reference's -1e9 init — graphop_kernel.cu:428)."""
    out = jnp.full(
        (num_segments,) + vals.shape[1:],
        jnp.asarray(-1e9, vals.dtype),
        vals.dtype,
    )
    return out.at[ids].max(
        vals, mode="drop", indices_are_sorted=sorted_ids
    )


# ---------------------------------------------------------------------------
# SDDMM  —  score[e, h] = <A[src(e), h, :], B[dst(e), h, :]>
# (reference fwd: graphop_kernel.cu:41-55; bwd: 100-112 over both CSRs)
# ---------------------------------------------------------------------------

def _edge_valid(ids, n):
    """(e, 1) float-compatible mask: 0 on padded edges (id == n)."""
    return (ids < n)[:, None]


def sddmm_fwd(src, dst, A, B):
    Ae = _gather_nodes(A, src)                  # (e, h, d)
    Be = _gather_nodes(B, dst)
    y = jnp.einsum("ehd,ehd->eh", Ae, Be)
    return jnp.where(_edge_valid(src, A.shape[0]), y, 0)


def sddmm_bwd(src, dst, csc_perm, dst_csc, A, B, dy):
    n = A.shape[0]
    # dA[u] = sum_{e=(u,v)} dy[e] * B[v]   — sorted over src.
    dA = segment_sum(
        dy[:, :, None] * _gather_nodes(B, dst), src, n, sorted_ids=True
    )
    # dB[v] = sum_{e=(u,v)} dy[e] * A[u]   — permute to CSC, sorted over dst.
    contrib = dy[:, :, None] * _gather_nodes(A, src)
    dB = segment_sum(contrib[csc_perm], dst_csc, n, sorted_ids=True)
    return dA.astype(A.dtype), dB.astype(B.dtype)


# ---------------------------------------------------------------------------
# NodeMulEdge  —  score[e, h] = <A[src(e), h, :], B[e, :]>
# (B is edge-carried, shared across heads; reference: graphop_kernel.cu:19-34,
#  62-94; designed for relative positional encodings per its comment)
# ---------------------------------------------------------------------------

def node_mul_edge_fwd(src, A, B):
    Ae = _gather_nodes(A, src)                  # (e, h, d)
    y = jnp.einsum("ehd,ed->eh", Ae, B)
    return jnp.where(_edge_valid(src, A.shape[0]), y, 0)


def node_mul_edge_bwd(src, A, B, dy):
    n = A.shape[0]
    dA = segment_sum(
        dy[:, :, None] * B[:, None, :], src, n, sorted_ids=True
    )
    dB = jnp.einsum("eh,ehd->ed", dy, _gather_nodes(A, src))
    dB = jnp.where(_edge_valid(src, n), dB, 0)
    return dA.astype(A.dtype), dB.astype(B.dtype)


# ---------------------------------------------------------------------------
# Edge softmax  —  y[e] = softmax over the segment of edges sharing an
# endpoint (src = "scatter" direction, dst = "gather"; the reference picks
# direction by which CSR it passes — wrapper.py:231 vs 258).
# (reference fwd: graphop_kernel.cu:171-202 in 3 kernels; here one fused
#  XLA graph; bwd: 209-230.)
# ---------------------------------------------------------------------------

def edge_softmax_fwd(ids, x, num_segments, *, sorted_ids):
    m = segment_max(x, ids, num_segments, sorted_ids=sorted_ids)
    z = jnp.exp(x - m[jnp.minimum(ids, num_segments - 1)])
    s = segment_sum(z, ids, num_segments, sorted_ids=sorted_ids)
    y = z / jnp.maximum(s[jnp.minimum(ids, num_segments - 1)], 1e-30)
    return jnp.where(_edge_valid(ids, num_segments), y, 0)


def edge_softmax_bwd(ids, y, dy, num_segments, *, sorted_ids):
    # dx = y * dy - y * segsum(y * dy)[segment]
    agg = segment_sum(y * dy, ids, num_segments, sorted_ids=sorted_ids)
    dx = y * dy - y * agg[jnp.minimum(ids, num_segments - 1)]
    return jnp.where(_edge_valid(ids, num_segments), dx, 0)


# ---------------------------------------------------------------------------
# Vector-SpMM  —  out[u, h, :] = sum_{e=(u,v)} edata[e, h] * x[v, h, :]
# (aggregation over the CSR rows, i.e. out-edges of src, matching the
#  reference's th.sparse.mm(adj, x) semantics — wrapper.py:274, 291;
#  fwd kernel: graphop_kernel.cu:119-130; bwd: 136-163.)
# ---------------------------------------------------------------------------

def vector_spmm_fwd(src, dst, edata, x):
    n = x.shape[0]
    contrib = edata[:, :, None] * _gather_nodes(x, dst)   # (e, h, d)
    return segment_sum(contrib, src, n, sorted_ids=True)


def vector_spmm_bwd(src, dst, csc_perm, dst_csc, edata, x, dy):
    n = x.shape[0]
    # dedata = SDDMM(dy, x): per-edge <dy[src], x[dst]>
    # (reference: graphop_kernel.cu:136-149)
    dedata = jnp.einsum(
        "ehd,ehd->eh", _gather_nodes(dy, src), _gather_nodes(x, dst)
    )
    dedata = jnp.where(_edge_valid(src, n), dedata, 0)
    # dx[v] = sum_{e=(u,v)} edata[e] * dy[u]  — SpMM over transpose graph
    # (reference: graphop_kernel.cu:152-163), sorted via CSC.
    contrib = edata[:, :, None] * _gather_nodes(dy, src)
    dx = segment_sum(contrib[csc_perm], dst_csc, n, sorted_ids=True)
    return dedata.astype(edata.dtype), dx.astype(x.dtype)
