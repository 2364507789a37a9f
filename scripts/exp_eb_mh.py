"""Bisect the multihead edge-bias forward's overhead (round 4).

After heads-batching, the packed mh eb forward measured 81.3 ms vs 42.8
for h=1 at equal e·d — ~40 ms unexplained. Variants of the NodeMulEdge
score term (score_nme[r,k,h] = <q_src[r,k,head h], be[r,k,:]>) on the
2M-edge power-law graph, h=4 d=32, packed be tiles:

  nonme   — drop the nme term entirely (≈ plain mh attention, sanity)
  bcast   — broadcast_to+reshape be to (R,D,h·d), mul, (h·d,h) matmul
            (the shipped form)
  rkhd    — einsum("rkhd,rkd->rkh", qg2.reshape(R,D,h,d), beb)
  mulsum  — explicit (R,D,h,d) product then .sum(-1)
  concat  — lane-tile via concatenate([beb]*h, -1), mul, matmul
  fence   — like bcast but optimization_barrier around beb
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import ell_dual
from custom_op_benchmark_tpu.ops.ell import (
    _head_matrix, _heads, _pad_nodes, ell_combine_rows,
    ell_scatter_edges,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn


def fwd(ell, q, k, v, be_packed, scale, nme_kind):
    q2, h, d = _heads(q)
    f32 = jnp.float32
    qp = _pad_nodes(q2, ell.n_nodes)
    kp = _pad_nodes(_heads(k)[0], ell.n_nodes)
    vp = _pad_nodes(_heads(v)[0], ell.n_nodes)
    heads_m = _head_matrix(h, d)
    outs = []
    for b, beb in zip(ell.buckets, be_packed):
        kg2 = kp[b.cols]
        vg2 = vp[b.cols]
        qr2 = qp[b.rows]
        mask = b.cols < ell.n_nodes
        R, D = beb.shape[0], beb.shape[1]
        qh = qr2[:, :, None] * heads_m[None]
        s = jnp.einsum("rkc,rch->rkh", kg2, qh,
                       preferred_element_type=f32)
        if nme_kind != "nonme":
            qg2 = qp[b.cols]
            if nme_kind in ("bcast", "fence"):
                bl = beb
                if nme_kind == "fence":
                    bl = jax.lax.optimization_barrier(bl)
                be_l = jnp.broadcast_to(
                    bl[:, :, None, :], (R, D, h, d)).reshape(R, D, h * d)
                s_n = jnp.einsum("rkc,ch->rkh", qg2 * be_l, heads_m,
                                 preferred_element_type=f32)
            elif nme_kind == "rkhd":
                s_n = jnp.einsum("rkhd,rkd->rkh",
                                 qg2.reshape(R, D, h, d), beb,
                                 preferred_element_type=f32)
            elif nme_kind == "mulsum":
                s_n = (qg2.reshape(R, D, h, d).astype(f32)
                       * beb[:, :, None, :]).sum(-1)
            elif nme_kind == "concat":
                be_l = jnp.concatenate([beb] * h, axis=-1)
                s_n = jnp.einsum("rkc,ch->rkh", qg2 * be_l, heads_m,
                                 preferred_element_type=f32)
            else:
                raise ValueError(nme_kind)
            s = s + s_n
        s = s * scale
        sm = jnp.where(mask[:, :, None], s, -1e30)
        m = jnp.max(sm, axis=1, keepdims=True)
        z = jnp.where(mask[:, :, None], jnp.exp(sm - m), 0)
        alpha = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
        of = jnp.einsum("rkh,rkc->rhc", alpha, vg2,
                        preferred_element_type=f32)
        outs.append(jnp.einsum("rhc,ch->rc", of, heads_m,
                               preferred_element_type=f32
                               ).astype(q.dtype))
    return ell_combine_rows(ell, outs)[: q.shape[0]].reshape(q.shape)


def main():
    n, e, h, d = 131072, 2_000_000, 4, 32
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    be = jnp.asarray(
        rng.normal(size=(g.num_edges_padded, d)).astype(np.float32))
    bep = ell_scatter_edges(de, be)
    bep = [jnp.asarray(np.asarray(x)) for x in bep]   # materialized
    sc = 1.0 / np.sqrt(d)

    ref = None
    for kind in ("nonme", "bcast", "rkhd", "mulsum", "concat", "fence"):
        # The be tiles must ride as ARGUMENTS everywhere (incl. inside
        # bench_fn's loop jit): closure arrays lower to embedded HLO
        # constants and blow the tunnel's remote_compile payload limit
        # (HTTP 413) at this scale.
        def f(q, *bp, _k=kind):
            return fwd(de, q, q, q, list(bp), sc, _k)

        y = jax.jit(f)(q, *bep)
        if kind == "bcast":
            ref = np.asarray(y)
        elif kind != "nonme" and ref is not None:
            # Sanity only: timed-mode matmuls run at bf16 precision, so
            # variants differ by ~1e-2 legitimately.
            np.testing.assert_allclose(np.asarray(y), ref, rtol=0.1,
                                       atol=0.1)
        rec = bench_fn(f, (q,) + tuple(bep), warmup=1, iters="auto",
                       name=kind, perturb=(0,), edges=e)
        print(f"{kind:8s} {rec.time_s * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
