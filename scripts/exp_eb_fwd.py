"""Bisect the edge-bias attention FORWARD slack (2M-edge power-law,
h=1 d=128, packed be).

Bytes model: 3 per-slot node-row gathers (k, v, q-by-src) + 1 streamed
(R, D, d) be tile = 4 fused passes ≈ 4 × 7.1 ms ≈ 28.5 ms at the
measured 219 GB/s fused-gather ceiling — but the op measures 42.8 ms
(attention alone, 2 passes, measures 14.5 — exactly at its floor).

MEASURED (2026-08-17, v5e): every variant below came back ~40–43 ms —
stacked-qk single gather (40.2, and it degrades numerics ~5e-3),
optimization_barrier on the scores (42.9) and on the nme term (42.8).
The isolated parts (attn 14.5 + nme-term 17.1 = 31.6) do NOT sum to
the composed time, and the gap is NOT softmax-pass recompute or
multi-consumer gather duplication (barriers would have fixed both).
Conclusion: a 4-operand gather fusion on this chip runs at ~75% of the
2-operand fusions' effective bandwidth; the composed op is at its
practical floor. Kept as the negative-result record for the op's
RESULTS.md row.
"""

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import (
    ell_attention,
    ell_dual,
    ell_edge_bias_attention,
    ell_pack_weights,
)
from custom_op_benchmark_tpu.ops.ell import (
    _heads,
    _pad_nodes,
    ell_combine_rows,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn


def main():
    n, e, d = 131072, 2_000_000, 128
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    be = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    w = ell_pack_weights(se, de, be)
    scale = 1.0 / d ** 0.5

    def bench(name, fn, *args):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=e)
        print(f"{name:34s} {rec.time_s * 1e3:9.2f} ms", flush=True)

    bench("attn_fwd (2-pass floor 14.2)",
          lambda q, k, v: ell_attention(de, se, q, k, v), q, k, v)
    bench("eb_packed_fwd (4-pass floor 28.5)",
          lambda q, k, v, w: ell_edge_bias_attention(de, se, q, k, v, w),
          q, k, v, w)

    # nme score term alone: per bucket <q[src], be> — 2 passes
    # (q gather + be stream).
    def nme_scores(q, w):
        q2, h, dd = _heads(q)
        qp = _pad_nodes(q2, de.n_nodes)
        outs = []
        for b, beb in zip(de.buckets, w.dst):
            qg = qp[b.cols]
            outs.append(jnp.einsum("rkd,rkd->r", qg, beb,
                                   preferred_element_type=jnp.float32))
        return sum(o.sum() for o in outs)

    bench("nme score term alone (2-pass ~14)", nme_scores, q, w)

    # variant: qk stacked table — ONE (R, D, 2d) gather feeding ONE
    # einsum against [qr_broadcast | be] (keeps single-consumer law;
    # same bytes, half the gather passes).
    qk = jnp.concatenate([k, q], axis=-1)           # (n, 2d)

    def eb_stacked(qk, q, v, w, scale=scale):
        qp = _pad_nodes(qk, de.n_nodes)
        q2 = _pad_nodes(q, de.n_nodes)
        vp = _pad_nodes(v, de.n_nodes)
        f32 = jnp.float32
        outs = []
        for b, beb in zip(de.buckets, w.dst):
            kqg = qp[b.cols]                        # (R, D, 2d)
            vg = vp[b.cols]
            qr = q2[b.rows]                         # (R, d)
            mask = b.cols < de.n_nodes
            rhs = jnp.concatenate(
                [jnp.broadcast_to(qr[:, None, :], beb.shape), beb],
                axis=-1)
            s = jnp.einsum("rkd,rkd->rk", kqg, rhs,
                           preferred_element_type=f32) * scale
            sm = jnp.where(mask, s, -1e30)
            m = jnp.max(sm, axis=1, keepdims=True)
            zexp = jnp.where(mask, jnp.exp(sm - m), 0)
            alpha = zexp / jnp.maximum(
                jnp.sum(zexp, axis=1, keepdims=True), 1e-30)
            outs.append(jnp.einsum("rk,rkd->rd", alpha, vg,
                                   preferred_element_type=f32
                                   ).astype(q.dtype))
        return ell_combine_rows(de, outs)[: q.shape[0]]

    y_ref = ell_edge_bias_attention(de, se, q, k, v, w)
    y_st = eb_stacked(qk, q, v, w)
    err = float(jnp.max(jnp.abs(y_ref - y_st)))
    print(f"stacked-qk allclose err: {err:.2e}", flush=True)
    bench("eb stacked-qk (3-pass ~21)", eb_stacked, qk, q, v, w)

    # Barrier variants: if the composition slack is XLA recomputing the
    # score fusion (3 gathers + be stream) for each softmax pass,
    # materializing s / the nme term should recover it.
    def eb_barrier(q, k, v, w, where, scale=scale):
        q2 = _pad_nodes(q, de.n_nodes)
        kp = _pad_nodes(k, de.n_nodes)
        vp = _pad_nodes(v, de.n_nodes)
        f32 = jnp.float32
        outs = []
        for b, beb in zip(de.buckets, w.dst):
            kg = kp[b.cols]
            vg = vp[b.cols]
            qg = q2[b.cols]
            qr = q2[b.rows]
            mask = b.cols < de.n_nodes
            nme = jnp.einsum("rkd,rkd->rk", qg, beb,
                             preferred_element_type=f32)
            if where == "nme":
                nme = jax.lax.optimization_barrier(nme)
            s = (jnp.einsum("rd,rkd->rk", qr, kg,
                            preferred_element_type=f32) + nme) * scale
            if where == "s":
                s = jax.lax.optimization_barrier(s)
            sm = jnp.where(mask, s, -1e30)
            m = jnp.max(sm, axis=1, keepdims=True)
            zexp = jnp.where(mask, jnp.exp(sm - m), 0)
            alpha = zexp / jnp.maximum(
                jnp.sum(zexp, axis=1, keepdims=True), 1e-30)
            outs.append(jnp.einsum("rk,rkd->rd", alpha, vg,
                                   preferred_element_type=f32
                                   ).astype(q.dtype))
        return ell_combine_rows(de, outs)[: q.shape[0]]

    for where in ("s", "nme"):
        yb = eb_barrier(q, k, v, w, where)
        err = float(jnp.max(jnp.abs(y_ref - yb)))
        print(f"barrier[{where}] err: {err:.2e}", flush=True)
        bench(f"eb barrier[{where}]",
              lambda q, k, v, w, wh=where: eb_barrier(q, k, v, w, wh),
              q, k, v, w)


if __name__ == "__main__":
    main()
