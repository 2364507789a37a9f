"""Pass-by-pass accounting of the fused ELL attention backward (round-2
verdict #1: the stated 4-gather-pass wall explains ~40 of the measured
89 ms grad total at 2M edges — find where the rest goes).

Components timed separately (production code paths, h=1 d=128 f32):

  fwd_plain     — ell_attention forward (no residual)
  fwd_res       — _attn_fwd_impl(want_res=True): forward + packed alpha
  pass1         — production pass 1 from saved alpha: dq + (alpha, dS)
  hop           — ell_cross_packed of an (S, 2) channel stack alone
  pass2         — production pass 2 from hopped channels: dk + dv
  grad_total    — jax.grad through ell_attention (fwd+bwd, the suite row)

Gather microbenches (the hop is a per-slot random gather of tiny rows —
per-row issue cost, not bytes, is the suspected wall):

  gather_w{c}   — (S, c) f32 random-permutation gather, S = total slots

plus candidate fixes (bf16 hop channels; fully fused pass1+hop+pass2).
"""

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
    """Production pass 1 (dst packing): dq + packed (alpha, dS)."""
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
    """Production pass 2 (src packing): dk + dv from hopped channels."""
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
    import os
    n = int(os.environ.get("ACC_N", 131072))
    e = int(os.environ.get("ACC_E", 2_000_000))
    d = 128
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q, k, v, dy = (jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
                   for _ in range(4))
    sc = 1.0 / np.sqrt(d)
    slots = sum(int(np.prod(b.cols.shape)) for b in de.buckets)
    print(f"slots={slots} ({slots / e:.2f}x pad)", flush=True)

    def bench(name, fn, *args, **kw):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=e, **kw)
        print(f"{name:16s} {rec.time_s * 1e3:9.2f} ms", flush=True)
        return rec.time_s

    # ---- the headline decomposition ----
    bench("fwd_plain", lambda q, k, v: ell_attention(de, se, q, k, v),
          q, k, v)
    bench("fwd_res",
          lambda q, k, v: _attn_fwd_impl(de, q, k, v, sc, True)[0],
          q, k, v)
    alphas = jax.jit(
        lambda q, k, v: _attn_fwd_impl(de, q, k, v, sc, True)[1]
    )(q, k, v)
    bench("pass1", lambda k, v, dy, al: pass1(de, k, v, dy, al, sc)[0],
          k, v, dy, alphas)
    packed_both = jax.jit(
        lambda k, v, dy, al: pass1(de, k, v, dy, al, sc)[1]
    )(k, v, dy, alphas)

    def hop(pb):
        return ell_cross_packed(de, se, pb)

    bench("hop", lambda pb: hop(pb)[0], packed_both)
    both_t = jax.jit(hop)(packed_both)
    bench("pass2", lambda q, dy, bt: pass2(de, se, q, dy, bt),
          q, dy, both_t)
    bench("pass1+hop+pass2", lambda q, k, v, dy, al: pass2(
        de, se, q, dy, hop(pass1(de, k, v, dy, al, sc)[1])),
        q, k, v, dy, alphas)
    bench("grad_total", jax.grad(
        lambda q, k, v: (ell_attention(de, se, q, k, v) ** 2).sum(),
        argnums=(0, 1, 2)), q, k, v)

    # ---- gather-width microbench: what does an (S, c) random gather
    # cost? (the hop is width 2; per-row issue cost suspected) ----
    S = slots
    perm = jnp.asarray(rng.permutation(S).astype(np.int32))
    for c in (1, 2, 4, 16, 128):
        src = jnp.asarray(rng.normal(size=(S, c)).astype(np.float32))
        bench(f"gather_w{c}", lambda s: s[perm], src,
              bytes_moved=S * c * 4 * 2)

    # ---- candidate: bf16 hop channels ----
    def hop_bf16(pb):
        return ell_cross_packed(de, se, [p.astype(jnp.bfloat16)
                                         for p in pb])

    bench("hop_bf16", lambda pb: hop_bf16(pb)[0], packed_both)

    # ---- candidate: wide-product hop (no (S,2) hop, no pass-2 q/dy
    # gathers: form per-slot dS*q[t] / alpha*dy[t] on the dst packing,
    # hop the WIDE (S, d) values, row-sum on the src packing) ----
    def wide_hop_bwd(k, v, dy, q, alphas):
        n_ = de.n_nodes
        kp = _pad_nodes(k, n_)
        vp = _pad_nodes(v, n_)
        dyp = _pad_nodes(dy.astype(f32), n_)
        qp = _pad_nodes(q.astype(f32), n_)
        dq_contribs, prods_dk, prods_dv = [], [], []
        for b, alpha in zip(de.buckets, alphas):
            kg2 = kp[b.cols]
            vg2 = vp[b.cols]
            dyr2 = dyp[b.rows]
            qr2 = qp[b.rows]
            dalpha = jnp.einsum("rd,rkd->rk", dyr2, vg2,
                                preferred_element_type=f32)
            agg = jnp.sum(alpha * dalpha, axis=1)
            dS = alpha * (dalpha - agg[:, None]) * sc
            dq_contribs.append(jnp.einsum(
                "rk,rkd->rd", dS, kg2, preferred_element_type=f32))
            prods_dk.append(dS[:, :, None] * qr2[:, None, :])
            prods_dv.append(alpha[:, :, None] * dyr2[:, None, :])
        dq = ell_combine_rows(de, dq_contribs)[: q.shape[0]]
        dk_t = ell_cross_packed(de, se, prods_dk)
        dv_t = ell_cross_packed(de, se, prods_dv)
        dk_contribs, dv_contribs = [], []
        for b, dkb, dvb in zip(se.buckets, dk_t, dv_t):
            mask = (b.cols < n_)[:, :, None]
            dk_contribs.append(jnp.sum(jnp.where(mask, dkb, 0), axis=1))
            dv_contribs.append(jnp.sum(jnp.where(mask, dvb, 0), axis=1))
        dk = ell_combine_rows(se, dk_contribs)[: q.shape[0]]
        dv = ell_combine_rows(se, dv_contribs)[: q.shape[0]]
        return dq, dk, dv

    if os.environ.get("ACC_CHECK"):
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(
                lambda q, k, v: ell_attention(de, se, q, k, v), q, k, v)
            dq_r, dk_r, dv_r = vjp(dy)
            dq_w, dk_w, dv_w = jax.jit(wide_hop_bwd)(k, v, dy, q, alphas)
        for a, b, nm in ((dq_w, dq_r, "dq"), (dk_w, dk_r, "dk"),
                         (dv_w, dv_r, "dv")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)
        print("wide_hop_bwd allclose vs vjp: ok", flush=True)

    bench("wide_hop_bwd", wide_hop_bwd, k, v, dy, q, alphas)


if __name__ == "__main__":
    main()
