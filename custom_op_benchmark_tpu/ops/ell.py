"""The op family on the ELL (degree-bucketed) layout — general graphs.

Same semantic contracts as ops/primitives.py (SURVEY.md §2.3), tuned for
graphs with no block structure. Design rules (measured on v5e through the
remote tunnel — see graph/ell.py):

- **never scatter**: node outputs are assembled by gathering bucket
  contributions through the precomputed ``row_pos`` inverse permutation;
  canonical edge outputs through ``edge_pos``;
- segment reductions (softmax max/sum) are dense masked reductions over
  each bucket's width axis;
- backward passes run the forward sweeps over the transpose packing —
  the reference's dual-CSR trick (graphop_kernel.cu:355-409, 544-600);
- :func:`ell_attention` fuses SDDMM → edge-softmax → SpMM without ever
  materializing a canonical-edge-order tensor in the forward pass.

All ops take the dual packing ``(src_ell, dst_ell)`` from
:func:`ell_dual` where a transpose traversal is needed.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph.ell import EllGraph, ell_pack
from custom_op_benchmark_tpu.graph.graph import Graph


def ell_dual(g: Graph, **kw) -> Tuple[EllGraph, EllGraph]:
    """(out-edge packing, in-edge packing) sharing canonical edge ids.

    Each packing carries ``twin_slot`` — the direct slot→slot map into
    the other packing — so backward passes convert packed edge tensors
    with one gather (no canonical intermediate).
    """
    import dataclasses as _dc

    se = ell_pack(g, direction="src", **kw)
    de = ell_pack(g, direction="dst", **kw)

    def _twin(me: EllGraph, other: EllGraph):
        other_pos = np.asarray(jax.device_get(other.edge_pos))
        e_pad = me.num_edges_padded
        maps = []
        for b in me.buckets:
            eid = np.asarray(jax.device_get(b.eid))
            t = np.where(
                eid < e_pad,
                other_pos[np.minimum(eid, e_pad - 1)],
                other.total_slots,
            ).astype(np.int32)
            maps.append(jnp.asarray(t))
        return _dc.replace(me, twin_slot=maps)

    return _twin(se, de), _twin(de, se)


def _pad_nodes(x, n):
    """(n, ...) → (n+1, ...): dummy row for padded cols."""
    return jnp.pad(x, [(0, n + 1 - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


def _pad_edges(w, e_slot):
    return jnp.pad(w, [(0, e_slot + 1 - w.shape[0])] + [(0, 0)] * (w.ndim - 1))


# ---------------------------------------------------------------------------
# Packed-layout plumbing (all gathers)
# ---------------------------------------------------------------------------

def ell_scatter_edges(ell: EllGraph, x) -> List[jax.Array]:
    """Canonical (E_pad, ...) → per-bucket packed (R, D, ...) list."""
    xp = _pad_edges(x, ell.num_edges_padded)
    return [xp[b.eid] for b in ell.buckets]


def ell_gather_edges(ell: EllGraph, packed: List[jax.Array]) -> jax.Array:
    """Per-bucket packed list → canonical (E_pad, ...) via edge_pos."""
    trail = packed[0].shape[2:]
    flat = jnp.concatenate(
        [p.reshape((-1,) + trail) for p in packed]
        + [jnp.zeros((1,) + trail, packed[0].dtype)],
        axis=0,
    )
    return flat[ell.edge_pos]


def ell_cross_packed(src_packing: EllGraph, dst_packing: EllGraph,
                     packed: List[jax.Array]) -> List[jax.Array]:
    """Re-pack per-slot edge values from ``src_packing``'s layout into
    ``dst_packing``'s, via the precomputed twin_slot map (one gather) or
    a canonical round trip if the packings weren't built by ell_dual."""
    if dst_packing.twin_slot is not None:
        trail = packed[0].shape[2:] if packed else ()
        flat = jnp.concatenate(
            [p.reshape((-1,) + trail) for p in packed]
            + [jnp.zeros((1,) + trail, packed[0].dtype)],
            axis=0,
        )
        return [flat[t] for t in dst_packing.twin_slot]
    return ell_scatter_edges(
        dst_packing, ell_gather_edges(src_packing, packed)
    )


def ell_combine_rows(ell: EllGraph, contribs: List[jax.Array]) -> jax.Array:
    """Per-bucket (R, ...) row contributions → (n_nodes, ...) via row_pos."""
    trail = contribs[0].shape[1:]
    cat = jnp.concatenate(
        contribs + [jnp.zeros((1,) + trail, contribs[0].dtype)], axis=0
    )
    return cat[ell.row_pos]


def _row_mask(b, n, ndim_extra):
    m = b.cols < n                                # (R, D)
    return m.reshape(m.shape + (1,) * ndim_extra)


# ---------------------------------------------------------------------------
# Raw bucket sweeps (shared by forwards and backwards)
# ---------------------------------------------------------------------------

def _spmm_packed(eg: EllGraph, w_packed: List[jax.Array], x):
    """contrib[r] = Σ_k w[r,k] · x[cols[r,k]] per bucket; returns list.

    Multihead: one flat (R, D, h·d) gather per bucket, heads looped over
    lane slices (wide-minor layout discipline — see _gat_head). Per-slot
    weights (R, D, h) are accepted as given (the caller controls their
    layout); outputs come back (R, h, d).
    """
    if x.ndim == 2:
        xp = _pad_nodes(x, eg.n_nodes)
        outs = []
        for b, w in zip(eg.buckets, w_packed):
            outs.append(jnp.einsum(
                "rk,rkd->rd", w, xp[b.cols],
                preferred_element_type=jnp.float32).astype(x.dtype))
        return outs
    n, h, d = x.shape
    xp2 = _pad_nodes(x.reshape(n, h * d), eg.n_nodes)
    outs = []
    for b, w in zip(eg.buckets, w_packed):
        xg2 = xp2[b.cols]                 # (R, D, h·d)
        houts = []
        for i in range(h):
            xg = jax.lax.slice_in_dim(xg2, i * d, (i + 1) * d, axis=2)
            houts.append(jnp.einsum(
                "rk,rkd->rd", w[..., i], xg,
                preferred_element_type=jnp.float32).astype(x.dtype))
        outs.append(jnp.stack(houts, axis=1))   # (R, h, d)
    return outs


def _sddmm_packed(eg: EllGraph, A, B):
    """s[r,k] = <A[rows[r]], B[cols[r,k]]> per bucket; returns list."""
    if A.ndim == 2:
        Ap, Bp = _pad_nodes(A, eg.n_nodes), _pad_nodes(B, eg.n_nodes)
        outs = []
        for b in eg.buckets:
            outs.append(jnp.einsum(
                "rd,rkd->rk", Ap[b.rows], Bp[b.cols],
                preferred_element_type=jnp.float32).astype(A.dtype))
        return outs
    n, h, d = A.shape
    Ap2 = _pad_nodes(A.reshape(n, h * d), eg.n_nodes)
    Bp2 = _pad_nodes(B.reshape(B.shape[0], h * d), eg.n_nodes)
    outs = []
    for b in eg.buckets:
        ar2 = Ap2[b.rows]                  # (R, h·d)
        bg2 = Bp2[b.cols]                  # (R, D, h·d)
        hscores = []
        for i in range(h):
            ar = jax.lax.slice_in_dim(ar2, i * d, (i + 1) * d, axis=1)
            bg = jax.lax.slice_in_dim(bg2, i * d, (i + 1) * d, axis=2)
            hscores.append(jnp.einsum(
                "rd,rkd->rk", ar, bg,
                preferred_element_type=jnp.float32).astype(A.dtype))
        outs.append(jnp.stack(hscores, axis=-1))    # (R, D, h)
    return outs


def _softmax_packed(eg: EllGraph, s_packed: List[jax.Array]):
    """Dense masked softmax over each packed row (whole segments)."""
    outs = []
    for b, s in zip(eg.buckets, s_packed):
        mask = _row_mask(b, eg.n_nodes, s.ndim - 2)
        sm = jnp.where(mask, s, -1e30)
        m = jax.lax.stop_gradient(jnp.max(sm, axis=1, keepdims=True))
        z = jnp.where(mask, jnp.exp(sm - m), 0)
        denom = jnp.sum(z, axis=1, keepdims=True)
        outs.append((z / jnp.maximum(denom, 1e-30)).astype(s.dtype))
    return outs


def _spmm_raw(eg, edata, x):
    if not eg.buckets:   # zero-edge graph: match the oracle's zeros
        return jnp.zeros((eg.n_nodes,) + x.shape[1:], x.dtype)
    return ell_combine_rows(eg, _spmm_packed(
        eg, ell_scatter_edges(eg, edata), x
    ))


def _sddmm_raw(eg, A, B):
    if not eg.buckets:
        return jnp.zeros(
            (eg.num_edges_padded,) + A.shape[1:-1], A.dtype
        )
    return ell_gather_edges(eg, _sddmm_packed(eg, A, B))


# ---------------------------------------------------------------------------
# ell_spmm
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _ell_spmm(src_ell, dst_ell, edata, x):
    return _spmm_raw(src_ell, edata, x)


def _ell_spmm_fwd(src_ell, dst_ell, edata, x):
    return _spmm_raw(src_ell, edata, x), (src_ell, dst_ell, edata, x)


def _ell_spmm_bwd(res, dy):
    src_ell, dst_ell, edata, x = res
    dedata = _sddmm_raw(src_ell, dy, x)[: edata.shape[0]]
    dx = _spmm_raw(dst_ell, edata, dy)[: x.shape[0]]
    return None, None, dedata.astype(edata.dtype), dx.astype(x.dtype)


_ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


def ell_spmm(src_ell: EllGraph, dst_ell: EllGraph, edata, x):
    """y[u] = Σ_{e=(u,v)} edata[e]·x[v] — reference vector_spmm
    (graphop_kernel.cu:119-130) on the ELL layout.

    edata: (E,) or (E, h) canonical order; x: (n, d) or (n, h, d).
    """
    e_slot = src_ell.num_edges_padded
    if edata.shape[0] < e_slot:
        edata = _pad_edges(edata, e_slot - 1)
    return _ell_spmm(src_ell, dst_ell, edata, x)


# ---------------------------------------------------------------------------
# ell_sddmm
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _ell_sddmm(src_ell, dst_ell, A, B):
    return _sddmm_raw(src_ell, A, B)


def _ell_sddmm_fwd(src_ell, dst_ell, A, B):
    return _sddmm_raw(src_ell, A, B), (src_ell, dst_ell, A, B)


def _ell_sddmm_bwd(res, dy):
    src_ell, dst_ell, A, B = res
    dA = _spmm_raw(src_ell, dy, B)[: A.shape[0]]
    dB = _spmm_raw(dst_ell, dy, A)[: B.shape[0]]
    return None, None, dA.astype(A.dtype), dB.astype(B.dtype)


_ell_sddmm.defvjp(_ell_sddmm_fwd, _ell_sddmm_bwd)


def ell_sddmm(src_ell: EllGraph, dst_ell: EllGraph, A, B):
    """score[e] = <A[src(e)], B[dst(e)]> — reference maskedmm_csr
    (graphop_kernel.cu:41-55) on the ELL layout. Returns (E_pad, ...)."""
    return _ell_sddmm(src_ell, dst_ell, A, B)


# ---------------------------------------------------------------------------
# ell_softmax
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _ell_softmax(ell, x):
    if not ell.buckets:
        return jnp.zeros_like(x)
    return ell_gather_edges(
        ell, _softmax_packed(ell, ell_scatter_edges(ell, x))
    )


def _ell_softmax_fwd(ell, x):
    y = _ell_softmax(ell, x)
    return y, (ell, y)


def _ell_softmax_bwd(res, dy):
    ell, y = res
    if not ell.buckets:
        return None, jnp.zeros_like(y)
    outs = []
    for b, yb, dyb in zip(
        ell.buckets, ell_scatter_edges(ell, y), ell_scatter_edges(ell, dy)
    ):
        agg = jnp.sum(yb * dyb, axis=1, keepdims=True)
        outs.append((yb * (dyb - agg)).astype(y.dtype))
    return None, ell_gather_edges(ell, outs)[: y.shape[0]]


_ell_softmax.defvjp(_ell_softmax_fwd, _ell_softmax_bwd)


def ell_softmax(ell: EllGraph, x):
    """Numerically-stable segment softmax over ``ell.direction`` segments
    (reference sparse_softmax, graphop_kernel.cu:171-202): a dense masked
    softmax per packed row; the VJP ``dx = y⊙(dy − Σ_seg y·dy)`` is dense
    per bucket row too.

    x: (E,) or (E, h) canonical edge order.
    """
    e_slot = ell.num_edges_padded
    if x.shape[0] < e_slot:
        x = _pad_edges(x, e_slot - 1)
    return _ell_softmax(ell, x)


# ---------------------------------------------------------------------------
# Fused attention — no canonical edge tensors in the forward pass
# ---------------------------------------------------------------------------

def _heads(x):
    """(n, d) → flat view + (h=1, d); (n, h, d) → (n, h·d) + (h, d)."""
    if x.ndim == 2:
        return x, 1, x.shape[1]
    return x.reshape(x.shape[0], -1), x.shape[1], x.shape[2]


@jax.custom_vjp
def _ell_attention(ell, ell_t, q, k, v, scale):
    """Head-looped forward: per (bucket, head), scores/softmax/aggregate
    run on lane slices of each bucket's single flat k/v tile gathers —
    every per-slot tensor keeps a wide minor dim (see _gat_head)."""
    if not ell.buckets:
        return jnp.zeros_like(q)
    q2, h, d = _heads(q)
    k2, _, _ = _heads(k)
    v2, _, _ = _heads(v)
    qp = _pad_nodes(q2, ell.n_nodes)
    kp = _pad_nodes(k2, ell.n_nodes)
    vp = _pad_nodes(v2, ell.n_nodes)
    outs = []
    for b in ell.buckets:
        kg2 = kp[b.cols]
        vg2 = vp[b.cols]
        qr2 = qp[b.rows]
        mask = b.cols < ell.n_nodes
        houts = []
        for i in range(h):
            kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d, axis=2)
            vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d, axis=2)
            qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d, axis=1)
            s = jnp.einsum("rd,rkd->rk", qr, kg,
                           preferred_element_type=jnp.float32) * scale
            sm = jnp.where(mask, s, -1e30)
            m = jnp.max(sm, axis=1, keepdims=True)
            zexp = jnp.where(mask, jnp.exp(sm - m), 0)
            alpha = zexp / jnp.maximum(
                jnp.sum(zexp, axis=1, keepdims=True), 1e-30)
            houts.append(jnp.einsum(
                "rk,rkd->rd", alpha.astype(q.dtype), vg,
                preferred_element_type=jnp.float32).astype(q.dtype))
        outs.append(jnp.concatenate(houts, axis=-1) if h > 1
                    else houts[0])
    y = ell_combine_rows(ell, outs)[: q.shape[0]]
    return y.reshape(q.shape)


def _ell_attention_fwd(ell, ell_t, q, k, v, scale):
    return _ell_attention(ell, ell_t, q, k, v, scale), (
        ell, ell_t, q, k, v, scale
    )


def _ell_attention_bwd(res, dy):
    """Flash-style recompute backward.

    One pass per (bucket, head) recomputes α and dS while the gathered
    flat k/v tiles are hot (sharing their gathers with dq's
    accumulation); α and dS then cross to the transpose packing through
    a SINGLE stacked conversion (edge_pos gather → eid gather), since
    per-element gathers are the dominant cost at ~150 M elements/s here.
    """
    ell, ell_t, q, k, v, scale = res
    if not ell.buckets:
        return (None, None, jnp.zeros_like(q), jnp.zeros_like(k),
                jnp.zeros_like(v), None)
    q2, h, d = _heads(q)
    qp = _pad_nodes(q2, ell.n_nodes)
    kp = _pad_nodes(_heads(k)[0], ell.n_nodes)
    vp = _pad_nodes(_heads(v)[0], ell.n_nodes)
    dyp = _pad_nodes(_heads(dy)[0], ell.n_nodes)

    dq_contribs, packed_both = [], []
    for b in ell.buckets:
        kg2 = kp[b.cols]
        vg2 = vp[b.cols]
        qr2 = qp[b.rows]
        dyr2 = dyp[b.rows]
        mask = b.cols < ell.n_nodes
        hparts, chans = [], []
        for i in range(h):
            kg = jax.lax.slice_in_dim(kg2, i * d, (i + 1) * d, axis=2)
            vg = jax.lax.slice_in_dim(vg2, i * d, (i + 1) * d, axis=2)
            qr = jax.lax.slice_in_dim(qr2, i * d, (i + 1) * d, axis=1)
            dyr = jax.lax.slice_in_dim(dyr2, i * d, (i + 1) * d, axis=1)
            s = jnp.einsum("rd,rkd->rk", qr, kg,
                           preferred_element_type=jnp.float32) * scale
            sm = jnp.where(mask, s, -1e30)
            m = jnp.max(sm, axis=1, keepdims=True)
            zexp = jnp.where(mask, jnp.exp(sm - m), 0)
            alpha = zexp / jnp.maximum(
                jnp.sum(zexp, axis=1, keepdims=True), 1e-30)
            dalpha = jnp.einsum("rd,rkd->rk", dyr, vg,
                                preferred_element_type=jnp.float32)
            agg = jnp.sum(alpha * dalpha, axis=1, keepdims=True)
            dS = alpha * (dalpha - agg) * scale
            hparts.append(jnp.einsum(
                "rk,rkd->rd", dS, kg,
                preferred_element_type=jnp.float32).astype(q.dtype))
            chans.extend([alpha, dS])
        dq_contribs.append(jnp.concatenate(hparts, axis=-1) if h > 1
                           else hparts[0])
        packed_both.append(
            jnp.stack(chans, axis=-1).astype(q.dtype))  # (R, D, 2h)

    dq = ell_combine_rows(ell, dq_contribs)[: q.shape[0]].reshape(q.shape)

    # One stacked hop to the transpose packing (twin_slot gather).
    both_t = ell_cross_packed(ell, ell_t, packed_both)
    dk_contribs, dv_contribs = [], []
    for b, bt in zip(ell_t.buckets, both_t):
        qg2 = qp[b.cols]
        dyg2 = dyp[b.cols]
        dks, dvs = [], []
        for i in range(h):
            alpha_t = bt[..., 2 * i]
            dS_t = bt[..., 2 * i + 1]
            qg = jax.lax.slice_in_dim(qg2, i * d, (i + 1) * d, axis=2)
            dyg = jax.lax.slice_in_dim(dyg2, i * d, (i + 1) * d, axis=2)
            dks.append(jnp.einsum(
                "rk,rkd->rd", dS_t, qg,
                preferred_element_type=jnp.float32).astype(k.dtype))
            dvs.append(jnp.einsum(
                "rk,rkd->rd", alpha_t, dyg,
                preferred_element_type=jnp.float32).astype(v.dtype))
        dk_contribs.append(jnp.concatenate(dks, axis=-1) if h > 1
                           else dks[0])
        dv_contribs.append(jnp.concatenate(dvs, axis=-1) if h > 1
                           else dvs[0])
    dk = ell_combine_rows(ell_t, dk_contribs)[: k.shape[0]].reshape(k.shape)
    dv = ell_combine_rows(ell_t, dv_contribs)[: v.shape[0]].reshape(v.shape)
    return (None, None, dq.astype(q.dtype), dk.astype(k.dtype),
            dv.astype(v.dtype), None)


_ell_attention.defvjp(_ell_attention_fwd, _ell_attention_bwd)


# ---------------------------------------------------------------------------
# Unweighted neighbor aggregation (GCN / GraphSAGE's gspmm copy_lhs)
# ---------------------------------------------------------------------------

def _copy_agg_raw(eg: EllGraph, x):
    """Unweighted copy-SUM per packed row (mean = sum/deg in the public
    op, keeping this VJP a pure transpose copy-sum)."""
    if not eg.buckets:
        return jnp.zeros((eg.n_nodes,) + x.shape[1:], x.dtype)
    xp = _pad_nodes(x, eg.n_nodes)
    outs = []
    for b in eg.buckets:
        xg = xp[b.cols]
        mask = _row_mask(b, eg.n_nodes, xg.ndim - 2)
        outs.append(jnp.sum(jnp.where(mask, xg, 0), axis=1))
    return ell_combine_rows(eg, outs)


@jax.custom_vjp
def _ell_copy_sum(ell, ell_t, x):
    return _copy_agg_raw(ell, x)


def _ell_copy_sum_fwd(ell, ell_t, x):
    return _copy_agg_raw(ell, x), (ell, ell_t, x)


def _ell_copy_sum_bwd(res, dy):
    ell, ell_t, x = res
    return None, None, _copy_agg_raw(ell_t, dy)[: x.shape[0]]


_ell_copy_sum.defvjp(_ell_copy_sum_fwd, _ell_copy_sum_bwd)


def ell_copy_spmm(ell: EllGraph, ell_t: EllGraph, x, *,
                  reduce: str = "sum"):
    """out[rows] = reduce over neighbors of x[cols] — the unweighted
    aggregation of GCN/GraphSAGE (gspmm copy_lhs). ``mean`` is ``sum``
    scaled by degree (so the VJP stays a pure transpose copy-sum)."""
    if reduce == "sum":
        return _ell_copy_sum(ell, ell_t, x)
    if reduce == "mean":
        y = _ell_copy_sum(ell, ell_t, x)
        deg = _copy_agg_raw(ell, jnp.ones((ell.n_nodes, 1), x.dtype))
        deg = deg.reshape((-1,) + (1,) * (y.ndim - 1))
        return y / jnp.maximum(deg, 1)
    raise ValueError(f"reduce must be sum/mean, got {reduce!r}")


# ---------------------------------------------------------------------------
# NodeMulEdge (edge-carried features — relative positional scores)
# ---------------------------------------------------------------------------

def ell_node_mul_edge(ell: EllGraph, ell_t: EllGraph, A, Be):
    """score[e,h] = <A[rows-side node, h, :], Be[e, :]> — the reference's
    node_mul_edge (graphop_kernel.cu:19-34; Be shared across heads).

    ``ell`` must be the src packing (reference semantics: A indexed by
    src). Differentiable through plain jnp autodiff (the Be cotangent
    transposes to an XLA scatter — fine for this niche op; the hot
    attention paths above use hand-written gather-only VJPs).
    """
    if not ell.buckets:
        return jnp.zeros(
            (ell.num_edges_padded,) + A.shape[1:-1], A.dtype
        )
    Ap = _pad_nodes(A, ell.n_nodes)
    be_packed = ell_scatter_edges(ell, Be)
    outs = []
    for b, beb in zip(ell.buckets, be_packed):
        ar = Ap[b.rows]
        if A.ndim == 2:
            outs.append(jnp.einsum("rd,rkd->rk", ar, beb,
                                   preferred_element_type=jnp.float32
                                   ).astype(A.dtype))
        else:
            outs.append(jnp.einsum("rhd,rkd->rkh", ar, beb,
                                   preferred_element_type=jnp.float32
                                   ).astype(A.dtype))
    return ell_gather_edges(ell, outs)


def _gat_head(b, zg2, er_col, a_l_h, slope, n_nodes, i, d):
    """One (bucket, head) α from the shared flat z tile.

    Layout discipline (from a device trace of the first implementation):
    every per-slot tensor keeps a WIDE minor dim — the flat z tile is
    (R, D, h·d) and each head works on a lane slice of it, so scores are
    (R, D) with lanes = D. Anything shaped (..., h) with small h pays a
    32× lane-padding tax on TPU, and reshaping (R, D, h·d) → (R, D, h, d)
    physically relayouts the whole 2 GB tile.
    """
    zg_h = jax.lax.slice_in_dim(zg2, i * d, (i + 1) * d, axis=2)
    el_h = jnp.einsum("rkd,d->rk", zg_h, a_l_h,
                      preferred_element_type=jnp.float32)
    pre = el_h + er_col[:, None]
    s = jnp.where(pre > 0, pre, slope * pre)
    mask = b.cols < n_nodes
    sm = jnp.where(mask, s, -1e30)
    m = jnp.max(sm, axis=1, keepdims=True)
    zexp = jnp.where(mask, jnp.exp(sm - m), 0)
    alpha = zexp / jnp.maximum(jnp.sum(zexp, axis=1, keepdims=True), 1e-30)
    return zg_h, pre, alpha


@jax.custom_vjp
def _ell_gat(ell, ell_t, a_l, a_r, z, slope):
    if not ell.buckets:
        return jnp.zeros_like(z)
    n, h, d = z.shape
    zp2 = _pad_nodes(z.reshape(n, h * d), ell.n_nodes)
    er = jnp.einsum("nhd,hd->nh", _pad_nodes(z, ell.n_nodes), a_r,
                    preferred_element_type=jnp.float32)
    outs = []
    for b in ell.buckets:
        zg2 = zp2[b.cols]                              # (R, D, h·d)
        err = er[b.rows]
        houts = []
        for i in range(h):
            zg_h, _, alpha = _gat_head(b, zg2, err[:, i], a_l[i], slope,
                                       ell.n_nodes, i, d)
            houts.append(jnp.einsum(
                "rk,rkd->rd", alpha.astype(z.dtype), zg_h,
                preferred_element_type=jnp.float32).astype(z.dtype))
        outs.append(jnp.concatenate(houts, axis=-1))   # (R, h·d)
    return ell_combine_rows(ell, outs).reshape(-1, h, d)[: n]


def _ell_gat_fwd(ell, ell_t, a_l, a_r, z, slope):
    return _ell_gat(ell, ell_t, a_l, a_r, z, slope), (
        ell, ell_t, a_l, a_r, z, slope
    )


def _ell_gat_bwd(res, dy):
    """Recompute backward: per (bucket, head), α/dα/dS/d_a_l share the
    bucket's single flat z and dy tile gathers; α and dpre cross to the
    transpose packing in one stacked conversion (channels go to the
    minor axis in pairs per head)."""
    ell, ell_t, a_l, a_r, z, slope = res
    if not ell.buckets:
        return (None, None, jnp.zeros_like(a_l), jnp.zeros_like(a_r),
                jnp.zeros_like(z), None)
    n, h, d = z.shape
    zp2 = _pad_nodes(z.reshape(n, h * d), ell.n_nodes)
    dyp2 = _pad_nodes(dy.reshape(n, h * d), ell.n_nodes)
    er = jnp.einsum("nhd,hd->nh", _pad_nodes(z, ell.n_nodes), a_r,
                    preferred_element_type=jnp.float32)

    der_cols, packed_both = [], []
    d_a_l = jnp.zeros_like(a_l)
    for b in ell.buckets:
        zg2 = zp2[b.cols]
        dyr2 = dyp2[b.rows]                            # (R, h·d)
        err = er[b.rows]
        ders, chans = [], []
        for i in range(h):
            zg_h, pre, alpha = _gat_head(b, zg2, err[:, i], a_l[i], slope,
                                         ell.n_nodes, i, d)
            dy_h = jax.lax.slice_in_dim(dyr2, i * d, (i + 1) * d, axis=1)
            dalpha = jnp.einsum("rd,rkd->rk", dy_h, zg_h,
                                preferred_element_type=jnp.float32)
            agg = jnp.sum(alpha * dalpha, axis=1, keepdims=True)
            dS = alpha * (dalpha - agg)
            dpre = jnp.where(pre > 0, dS, slope * dS)
            ders.append(jnp.sum(dpre, axis=1))          # (R,)
            d_a_l = d_a_l.at[i].add(jnp.einsum(
                "rk,rkd->d", dpre, zg_h,
                preferred_element_type=jnp.float32).astype(a_l.dtype))
            chans.extend([alpha, dpre])
        der_cols.append(jnp.stack(ders, axis=-1))       # (R, h)
        packed_both.append(
            jnp.stack(chans, axis=-1).astype(z.dtype))  # (R, D, 2h)

    # d_er per node, then its chains: d_a_r and dz's er-contribution.
    der = ell_combine_rows(ell, der_cols)[: n]
    d_a_r = jnp.einsum("nh,nhd->hd", der, z,
                       preferred_element_type=jnp.float32).astype(a_r.dtype)
    dz = jnp.einsum("nh,hd->nhd", der, a_r,
                    preferred_element_type=jnp.float32).astype(z.dtype)

    # Transpose side: dz[src] += α·dy[dst] + dpre·a_l per slot.
    both_t = ell_cross_packed(ell, ell_t, packed_both)
    dz_contribs = []
    for b, bt in zip(ell_t.buckets, both_t):
        dyg2 = dyp2[b.cols]                             # (R, D, h·d)
        hparts = []
        for i in range(h):
            alpha_t = bt[..., 2 * i]
            dpre_t = bt[..., 2 * i + 1]
            dy_h = jax.lax.slice_in_dim(dyg2, i * d, (i + 1) * d, axis=2)
            agg_v = jnp.einsum("rk,rkd->rd", alpha_t, dy_h,
                               preferred_element_type=jnp.float32)
            el_chain = jnp.einsum(
                "r,d->rd", jnp.sum(dpre_t, axis=1), a_l[i],
                preferred_element_type=jnp.float32)
            hparts.append((agg_v + el_chain).astype(z.dtype))
        dz_contribs.append(jnp.concatenate(hparts, axis=-1))
    dz = dz + ell_combine_rows(ell_t, dz_contribs).reshape(-1, h, d)[: n]
    return (None, None, d_a_l.astype(a_l.dtype), d_a_r.astype(a_r.dtype),
            dz.astype(z.dtype), None)


_ell_gat.defvjp(_ell_gat_fwd, _ell_gat_bwd)


def ell_gat_attention(ell: EllGraph, ell_t: EllGraph, a_l, a_r, z, *,
                      negative_slope: float = 0.2):
    """Fused GAT layer core on the ELL layout.

    score[e] = LeakyReLU(a_l·z[src(e)] + a_r·z[dst(e)]), α = softmax over
    in-edges of dst, out[dst] = Σ α·z[src] — the additive-attention GAT
    decomposition (reference models it with NodeMulEdge + sparse_softmax
    + vector_spmm; models/gat.py composes the segment ops the same way).

    ``ell`` must be the dst packing, ``ell_t`` the src packing.
    a_l, a_r: (h, d) attention vectors; z: (n, h, d). Returns (n, h, d).
    The src-side scores are computed from the aggregation's own z-tile
    gathers, so the layer costs one z gather + one dy gather per
    direction, not per score term.
    """
    return _ell_gat(ell, ell_t, a_l, a_r, z, float(negative_slope))


def ell_attention(ell: EllGraph, ell_t: EllGraph, q, k, v, *,
                  scale: float = None):
    """Fused masked attention on the ELL layout (general graphs).

    ``ell`` is the packing of the normalization direction (``"dst"`` for
    the GNN convention: out[dst] = Σ softmax over in-edges of
    <q[dst],k[src]>·v[src]); ``ell_t`` its transpose (for the backward
    aggregations). q, k, v: (n, d) or (n, h, d).

    Reference analog: the 6-kernel SDDMM → sparse_softmax → vector_spmm
    pipeline (wrapper.py:201-291), fused with zero canonical-edge-order
    traffic in the forward pass.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    return _ell_attention(ell, ell_t, q, k, v, float(scale))
