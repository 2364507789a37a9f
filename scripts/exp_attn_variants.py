"""Experiment: attention fwd/bwd gather layouts on the 2M power-law graph.

Variants (h=1, d=128, f32):
  fwd_sep   — round-1 forward: separate k/v gathers (single consumer each)
  fwd_stk   — stacked k‖v gather (round-2 first attempt; regressed)
  p1_sep    — backward pass 1 with separate k/v gathers
  p1_stk    — backward pass 1 with stacked kv gather
  p2_sep    — backward pass 2: separate q/dy gathers + (n,3) stats gather
  p2_stk    — backward pass 2: one stacked (n, 2d+3) gather
"""

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import ell_dual
from custom_op_benchmark_tpu.ops.ell import _pad_nodes, ell_combine_rows
from custom_op_benchmark_tpu.utils.benchlib import bench_fn

f32 = jnp.float32


def fwd_sep(ell, q, k, v, scale):
    qp, kp, vp = (_pad_nodes(t, ell.n_nodes) for t in (q, k, v))
    outs, stats = [], []
    for b in ell.buckets:
        kg = kp[b.cols]
        vg = vp[b.cols]
        qr = qp[b.rows]
        mask = b.cols < ell.n_nodes
        s = jnp.einsum("rd,rkd->rk", qr, kg,
                       preferred_element_type=f32) * scale
        sm = jnp.where(mask, s, -1e30)
        m = jnp.max(sm, axis=1, keepdims=True)
        z = jnp.where(mask, jnp.exp(sm - m), 0)
        den = jnp.sum(z, axis=1, keepdims=True)
        alpha = z / jnp.maximum(den, 1e-30)
        outs.append(jnp.einsum("rk,rkd->rd", alpha, vg,
                               preferred_element_type=f32))
        stats.append(jnp.stack([m[:, 0], den[:, 0]], axis=-1))
    y = ell_combine_rows(ell, outs)[: q.shape[0]]
    st = ell_combine_rows(ell, stats)
    return y, st


def fwd_stk(ell, q, k, v, scale):
    kvp = _pad_nodes(jnp.concatenate([k, v], axis=1), ell.n_nodes)
    qp = _pad_nodes(q, ell.n_nodes)
    d = q.shape[1]
    outs = []
    for b in ell.buckets:
        kvg = kvp[b.cols]
        kg = jax.lax.slice_in_dim(kvg, 0, d, axis=2)
        vg = jax.lax.slice_in_dim(kvg, d, 2 * d, axis=2)
        qr = qp[b.rows]
        mask = b.cols < ell.n_nodes
        s = jnp.einsum("rd,rkd->rk", qr, kg,
                       preferred_element_type=f32) * scale
        sm = jnp.where(mask, s, -1e30)
        m = jnp.max(sm, axis=1, keepdims=True)
        z = jnp.where(mask, jnp.exp(sm - m), 0)
        alpha = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
        outs.append(jnp.einsum("rk,rkd->rd", alpha, vg,
                               preferred_element_type=f32))
    return ell_combine_rows(ell, outs)[: q.shape[0]]


def p1_sep(ell, q, k, v, dy, st, scale):
    """dq + agg_nd from the dst packing, separate k/v gathers."""
    qp, kp, vp, dyp = (_pad_nodes(t, ell.n_nodes) for t in (q, k, v, dy))
    stp = _pad_nodes(st, ell.n_nodes)
    dqs, aggs = [], []
    for b in ell.buckets:
        kg = kp[b.cols]
        vg = vp[b.cols]
        qr = qp[b.rows]
        dyr = dyp[b.rows]
        mask = b.cols < ell.n_nodes
        s = jnp.einsum("rd,rkd->rk", qr, kg,
                       preferred_element_type=f32) * scale
        m = stp[b.rows][:, 0][:, None]
        den = jnp.maximum(stp[b.rows][:, 1][:, None], 1e-30)
        alpha = jnp.where(mask, jnp.exp(s - m), 0) / den
        dalpha = jnp.einsum("rd,rkd->rk", dyr, vg,
                            preferred_element_type=f32)
        agg = jnp.sum(alpha * dalpha, axis=1)
        dS = alpha * (dalpha - agg[:, None]) * scale
        dqs.append(jnp.einsum("rk,rkd->rd", dS, kg,
                              preferred_element_type=f32))
        aggs.append(agg[:, None])
    dq = ell_combine_rows(ell, dqs)[: q.shape[0]]
    agg_nd = ell_combine_rows(ell, aggs)
    return dq, agg_nd


def p1_stk(ell, q, k, v, dy, st, scale):
    kvp = _pad_nodes(jnp.concatenate([k, v], axis=1), ell.n_nodes)
    qp, dyp = _pad_nodes(q, ell.n_nodes), _pad_nodes(dy, ell.n_nodes)
    stp = _pad_nodes(st, ell.n_nodes)
    d = q.shape[1]
    dqs, aggs = [], []
    for b in ell.buckets:
        kvg = kvp[b.cols]
        kg = jax.lax.slice_in_dim(kvg, 0, d, axis=2)
        vg = jax.lax.slice_in_dim(kvg, d, 2 * d, axis=2)
        qr = qp[b.rows]
        dyr = dyp[b.rows]
        mask = b.cols < ell.n_nodes
        s = jnp.einsum("rd,rkd->rk", qr, kg,
                       preferred_element_type=f32) * scale
        m = stp[b.rows][:, 0][:, None]
        den = jnp.maximum(stp[b.rows][:, 1][:, None], 1e-30)
        alpha = jnp.where(mask, jnp.exp(s - m), 0) / den
        dalpha = jnp.einsum("rd,rkd->rk", dyr, vg,
                            preferred_element_type=f32)
        agg = jnp.sum(alpha * dalpha, axis=1)
        dS = alpha * (dalpha - agg[:, None]) * scale
        dqs.append(jnp.einsum("rk,rkd->rd", dS, kg,
                              preferred_element_type=f32))
        aggs.append(agg[:, None])
    dq = ell_combine_rows(ell, dqs)[: q.shape[0]]
    agg_nd = ell_combine_rows(ell, aggs)
    return dq, agg_nd


def p2_sep(ell_t, q, k, v, dy, st3, scale):
    """dk/dv on the src packing: separate q/dy gathers + (n,3) stats."""
    qp, kp, vp, dyp = (_pad_nodes(t, ell_t.n_nodes)
                       for t in (q, k, v, dy))
    stp = _pad_nodes(st3, ell_t.n_nodes)       # (n+1, 3): m, den, agg
    dks, dvs = [], []
    for b in ell_t.buckets:
        q_c = qp[b.cols]
        dy_c = dyp[b.cols]
        st_c = stp[b.cols]                     # (R, D, 3)
        kr = kp[b.rows]
        vr = vp[b.rows]
        mask = b.cols < ell_t.n_nodes
        s_t = jnp.einsum("rd,rkd->rk", kr, q_c,
                         preferred_element_type=f32) * scale
        alpha_t = jnp.where(mask, jnp.exp(s_t - st_c[:, :, 0]), 0) \
            / jnp.maximum(st_c[:, :, 1], 1e-30)
        dalpha_t = jnp.einsum("rd,rkd->rk", vr, dy_c,
                              preferred_element_type=f32)
        dS_t = alpha_t * (dalpha_t - st_c[:, :, 2]) * scale
        dks.append(jnp.einsum("rk,rkd->rd", dS_t, q_c,
                              preferred_element_type=f32))
        dvs.append(jnp.einsum("rk,rkd->rd", alpha_t, dy_c,
                              preferred_element_type=f32))
    dk = ell_combine_rows(ell_t, dks)[: k.shape[0]]
    dv = ell_combine_rows(ell_t, dvs)[: v.shape[0]]
    return dk, dv


def p2_stk(ell_t, q, k, v, dy, st3, scale):
    d = q.shape[1]
    zp = _pad_nodes(jnp.concatenate([q, dy, st3], axis=1), ell_t.n_nodes)
    kvp = _pad_nodes(jnp.concatenate([k, v], axis=1), ell_t.n_nodes)
    dks, dvs = [], []
    for b in ell_t.buckets:
        zg = zp[b.cols]
        q_c = jax.lax.slice_in_dim(zg, 0, d, axis=2)
        dy_c = jax.lax.slice_in_dim(zg, d, 2 * d, axis=2)
        m_c = zg[:, :, 2 * d]
        den_c = jnp.maximum(zg[:, :, 2 * d + 1], 1e-30)
        agg_c = zg[:, :, 2 * d + 2]
        kvr = kvp[b.rows]
        kr = jax.lax.slice_in_dim(kvr, 0, d, axis=1)
        vr = jax.lax.slice_in_dim(kvr, d, 2 * d, axis=1)
        mask = b.cols < ell_t.n_nodes
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
    dk = ell_combine_rows(ell_t, dks)[: k.shape[0]]
    dv = ell_combine_rows(ell_t, dvs)[: v.shape[0]]
    return dk, dv


def main():
    n, e, d = 131072, 2_000_000, 128
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q, k, v, dy = (jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
                   for _ in range(4))
    st = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 2)).astype(np.float32))
    st3 = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, 3)).astype(np.float32))
    sc = 1.0 / np.sqrt(d)

    def bench(name, fn, *args):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name, edges=e)
        print(f"{name:12s} {rec.time_s * 1e3:9.2f} ms", flush=True)

    bench("fwd_sep", lambda q, k, v: fwd_sep(de, q, k, v, sc)[0], q, k, v)
    bench("fwd_stk", lambda q, k, v: fwd_stk(de, q, k, v, sc), q, k, v)
    bench("p1_sep", lambda q, k, v, dy: p1_sep(de, q, k, v, dy, st, sc),
          q, k, v, dy)
    bench("p1_stk", lambda q, k, v, dy: p1_stk(de, q, k, v, dy, st, sc),
          q, k, v, dy)
    bench("p2_sep", lambda q, k, v, dy: p2_sep(se, q, k, v, dy, st3, sc),
          q, k, v, dy)
    bench("p2_stk", lambda q, k, v, dy: p2_stk(se, q, k, v, dy, st3, sc),
          q, k, v, dy)


if __name__ == "__main__":
    main()
