"""Bisect the attention-backward composition slack (round-3 follow-up to
exp_bwd_accounting.py, which found: pass1 14.6 + hop 1.0 + pass2 17.6 =
33 ms in isolation, but the composed pass1+hop+pass2 is 75 ms — the
2M-edge backward's missing ~42 ms is a cross-pass XLA fusion effect, not
gather cost).

Variants:
  pass1_full   — pass1 returning dq AND packed_both (no DCE of the stack)
  p1_hop       — pass1 + hop (returns dq + both_t)
  hop_p2       — hop + pass2 (packed_both as input)
  comb         — pass1+hop+pass2 (the composed baseline)
  comb_bar_pb  — composed, optimization_barrier on packed_both
  comb_bar_all — composed, barriers on packed_both AND both_t
  grad_prod    — jax.grad through the production op (reference point)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import ell_attention, ell_dual
from custom_op_benchmark_tpu.ops.ell import (
    _attn_fwd_impl,
    _pad_nodes,
    ell_combine_rows,
    ell_cross_packed,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn

f32 = jnp.float32


def pass1(ell, k, v, dy, alphas, scale):
    n = ell.n_nodes
    kp = _pad_nodes(k, n)
    vp = _pad_nodes(v, n)
    dyp = _pad_nodes(dy.astype(f32), n)
    dq_contribs, packed_both = [], []
    for b, alpha in zip(ell.buckets, alphas):
        kg2 = kp[b.cols]
        vg2 = vp[b.cols]
        dyr2 = dyp[b.rows]
        dalpha = jnp.einsum("rd,rkd->rk", dyr2, vg2,
                            preferred_element_type=f32)
        agg = jnp.sum(alpha * dalpha, axis=1)
        dS = alpha * (dalpha - agg[:, None]) * scale
        dq_contribs.append(jnp.einsum(
            "rk,rkd->rd", dS, kg2, preferred_element_type=f32))
        packed_both.append(jnp.stack([alpha, dS], axis=-1))
    dq = ell_combine_rows(ell, dq_contribs)[: k.shape[0]]
    return dq, packed_both


def pass2(ell, ell_t, q, dy, both_t):
    n = ell.n_nodes
    qp = _pad_nodes(q.astype(f32), n)
    dyp = _pad_nodes(dy.astype(f32), n)
    dk_contribs, dv_contribs = [], []
    for b, bt in zip(ell_t.buckets, both_t):
        q_c2 = qp[b.cols]
        dy_c2 = dyp[b.cols]
        alpha_t = bt[..., 0]
        dS_t = bt[..., 1]
        dk_contribs.append(jnp.einsum(
            "rk,rkd->rd", dS_t, q_c2, preferred_element_type=f32))
        dv_contribs.append(jnp.einsum(
            "rk,rkd->rd", alpha_t, dy_c2, preferred_element_type=f32))
    dk = ell_combine_rows(ell_t, dk_contribs)[: q.shape[0]]
    dv = ell_combine_rows(ell_t, dv_contribs)[: q.shape[0]]
    return dk, dv


def main():
    n = int(os.environ.get("ACC_N", 131072))
    e = int(os.environ.get("ACC_E", 2_000_000))
    d = 128
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q, k, v, dy = (jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
                   for _ in range(4))
    sc = 1.0 / np.sqrt(d)

    def bench(name, fn, *args, **kw):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=e, **kw)
        print(f"{name:16s} {rec.time_s * 1e3:9.2f} ms", flush=True)
        return rec.time_s

    alphas = jax.jit(
        lambda q, k, v: _attn_fwd_impl(de, q, k, v, sc, True)[1]
    )(q, k, v)
    packed_both = jax.jit(
        lambda k, v, dy, al: pass1(de, k, v, dy, al, sc)[1]
    )(k, v, dy, alphas)

    def hop(pb):
        return ell_cross_packed(de, se, pb)

    bench("pass1_full", lambda k, v, dy, al: pass1(de, k, v, dy, al, sc),
          k, v, dy, alphas)
    bench("p1_hop", lambda k, v, dy, al: (
        pass1(de, k, v, dy, al, sc)[0],
        hop(pass1(de, k, v, dy, al, sc)[1])), k, v, dy, alphas)
    bench("hop_p2", lambda q, dy, pb: pass2(de, se, q, dy, hop(pb)),
          q, dy, packed_both)
    bench("comb", lambda q, k, v, dy, al: (
        pass1(de, k, v, dy, al, sc)[0],
        pass2(de, se, q, dy, hop(pass1(de, k, v, dy, al, sc)[1]))),
        q, k, v, dy, alphas)

    def comb_bar(q, k, v, dy, al, bar_both_t):
        dq, pb = pass1(de, k, v, dy, al, sc)
        pb = jax.lax.optimization_barrier(pb)
        bt = hop(pb)
        if bar_both_t:
            bt = jax.lax.optimization_barrier(bt)
        return dq, pass2(de, se, q, dy, bt)

    bench("comb_bar_pb", lambda q, k, v, dy, al: comb_bar(
        q, k, v, dy, al, False), q, k, v, dy, alphas)
    bench("comb_bar_all", lambda q, k, v, dy, al: comb_bar(
        q, k, v, dy, al, True), q, k, v, dy, alphas)

    # Split-channel hop: alpha and dS cross as SEPARATE (S,) gathers so
    # each is SINGLE-consumer and can fuse into its pass-2 einsum (the
    # (S,2) stack has two slice consumers → materializes → standalone
    # row-bound gather at ~150M rows/s ≈ 20 ms).
    def pass1_split(ell, k, v, dy, alphas, scale):
        n_ = ell.n_nodes
        kp = _pad_nodes(k, n_)
        vp = _pad_nodes(v, n_)
        dyp = _pad_nodes(dy.astype(f32), n_)
        dq_contribs, dS_list = [], []
        for b, alpha in zip(ell.buckets, alphas):
            kg2 = kp[b.cols]
            vg2 = vp[b.cols]
            dyr2 = dyp[b.rows]
            dalpha = jnp.einsum("rd,rkd->rk", dyr2, vg2,
                                preferred_element_type=f32)
            agg = jnp.sum(alpha * dalpha, axis=1)
            dS = alpha * (dalpha - agg[:, None]) * scale
            dq_contribs.append(jnp.einsum(
                "rk,rkd->rd", dS, kg2, preferred_element_type=f32))
            dS_list.append(dS)
        dq = ell_combine_rows(ell, dq_contribs)[: k.shape[0]]
        return dq, dS_list

    def pass2_split(ell, ell_t, q, dy, alpha_t_list, dS_t_list):
        n_ = ell.n_nodes
        qp = _pad_nodes(q.astype(f32), n_)
        dyp = _pad_nodes(dy.astype(f32), n_)
        dk_contribs, dv_contribs = [], []
        for b, at, st in zip(ell_t.buckets, alpha_t_list, dS_t_list):
            dk_contribs.append(jnp.einsum(
                "rk,rkd->rd", st, qp[b.cols],
                preferred_element_type=f32))
            dv_contribs.append(jnp.einsum(
                "rk,rkd->rd", at, dyp[b.cols],
                preferred_element_type=f32))
        dk = ell_combine_rows(ell_t, dk_contribs)[: q.shape[0]]
        dv = ell_combine_rows(ell_t, dv_contribs)[: q.shape[0]]
        return dk, dv

    def comb_split(q, k, v, dy, al):
        dq, dS_list = pass1_split(de, k, v, dy, al, sc)
        alpha_t = ell_cross_packed(de, se, list(al))
        dS_t = ell_cross_packed(de, se, dS_list)
        return dq, pass2_split(de, se, q, dy, alpha_t, dS_t)

    bench("comb_split", comb_split, q, k, v, dy, alphas)
    bench("grad_prod", jax.grad(
        lambda q, k, v: (ell_attention(de, se, q, k, v) ** 2).sum(),
        argnums=(0, 1, 2)), q, k, v)


if __name__ == "__main__":
    main()
