"""The full benchmark/validation suite — reference-harness parity.

Reproduces the shape of the reference's ``python wrapper.py`` run
(wrapper.py:148-485): for every op in the family, run 2-3 independent
implementations — the XLA segment oracle, the Pallas block-sparse path,
and (on the clique workload) the dense-bmm formulation — check
``allclose`` on forward outputs **and all gradients**, and time each
(upgraded per SURVEY.md §5: warmup, median-of-repeats, JSON records).

Run:  python -m custom_op_benchmark_tpu.utils.bench_suite [--small]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph import clique_batch
from custom_op_benchmark_tpu.graph.tiled import tile_graph
from custom_op_benchmark_tpu.ops import (
    edge_softmax,
    node_mul_edge,
    sddmm,
    vector_spmm,
)
from custom_op_benchmark_tpu.ops.tiled import (
    tiled_attention,
    tiled_sddmm,
    tiled_softmax,
    tiled_spmm,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn

# Tolerances: reference uses default allclose except softmax grads at
# rtol=1e-3 (wrapper.py:239). TPU MXU f32 matmuls add ~1e-3 relative noise
# on d=1024 dot products, so the dense-vs-segment comparisons get the same
# loosened gate.
RTOL, ATOL = 2e-3, 2e-3


def _check(name, a, b, records):
    a, b = np.asarray(a), np.asarray(b)
    ok = np.allclose(a, b, rtol=RTOL, atol=ATOL)
    if not ok:
        diff = float(np.max(np.abs(a - b)))
        print(f"  ALLCLOSE FAIL: {name} (max abs diff {diff:.3e})",
              file=sys.stderr)
        records.append({"check": name, "ok": False, "max_diff": diff})
    else:
        records.append({"check": name, "ok": True})
    return ok


def run_suite(batch_size=512, length=30, d_single=1024, heads=8,
              d_multi=64, iters=(4, 20), warmup=1):
    """Returns (records, all_ok). Mirrors wrapper.py's two suites."""
    records = []
    ok = True
    g = clique_batch(batch_size, length)
    n, e = g.n_nodes, g.n_edges
    b, l = batch_size, length
    tg = tile_graph(g, 128, 128)
    key = iter(jax.random.split(jax.random.PRNGKey(0), 64))

    def bench(name, fn, *args, **extra):
        rec = bench_fn(fn, args, warmup=warmup, iters=iters,
                       name=name, edges=e, **extra)
        records.append({"bench": name, "time_s": rec.time_s,
                        "edges_per_s": rec.edges_per_s, **extra})
        print(f"  {name:40s} {rec.time_s * 1e3:9.3f} ms   "
              f"{rec.edges_per_s / 1e6:9.1f} Medges/s")
        return jax.jit(fn)

    # ---------------- single head (reference wrapper.py:148-301) --------
    print(f"Single head (batch={b}, length={l}, dim={d_single})")
    A = jax.random.normal(next(key), (n, d_single))
    B = jax.random.normal(next(key), (n, d_single))
    dy_e = jax.random.normal(next(key), (e,))

    # SDDMM: dense bmm baseline (exact on cliques, wrapper.py:185) vs
    # segment vs tiled.
    f_bmm = bench("maskedmm/dense_bmm", lambda A, B: jnp.einsum(
        "bxd,byd->bxy", A.reshape(b, l, -1), B.reshape(b, l, -1)
    ).reshape(-1), A, B)
    f_seg = bench("maskedmm/xla_segment", lambda A, B: sddmm(g, A, B), A, B)
    f_til = bench("maskedmm/pallas_tiled",
                  lambda A, B: tg.gather_edges(tiled_sddmm(tg, A, B)), A, B)
    y0, y1, y2 = f_bmm(A, B), f_seg(A, B), f_til(A, B)
    ok &= _check("maskedmm fwd xla vs bmm", y1, y0, records)
    ok &= _check("maskedmm fwd tiled vs bmm", y2, y0, records)

    # Gradients (reference checks A.grad/B.grad each impl).
    def loss_seg(A, B):
        return (sddmm(g, A, B) * dy_e).sum()

    def loss_til(A, B):
        return (tg.gather_edges(tiled_sddmm(tg, A, B)) * dy_e).sum()

    def loss_bmm(A, B):
        y = jnp.einsum("bxd,byd->bxy", A.reshape(b, l, -1),
                       B.reshape(b, l, -1)).reshape(-1)
        return (y * dy_e).sum()

    g_seg = jax.jit(jax.grad(loss_seg, argnums=(0, 1)))
    g_til = jax.jit(jax.grad(loss_til, argnums=(0, 1)))
    g_bmm = jax.jit(jax.grad(loss_bmm, argnums=(0, 1)))
    bench("maskedmm_bwd/dense_bmm", jax.grad(loss_bmm, argnums=(0, 1)),
          A, B)
    bench("maskedmm_bwd/xla_segment", jax.grad(loss_seg, argnums=(0, 1)),
          A, B)
    bench("maskedmm_bwd/pallas_tiled", jax.grad(loss_til, argnums=(0, 1)),
          A, B)
    for (ga, gb), tag in [(g_seg(A, B), "xla"), (g_til(A, B), "tiled")]:
        g0a, g0b = g_bmm(A, B)
        ok &= _check(f"maskedmm dA {tag} vs bmm", ga, g0a, records)
        ok &= _check(f"maskedmm dB {tag} vs bmm", gb, g0b, records)

    # Edge softmax, both directions (wrapper.py:211-267).
    x_e = jax.random.normal(next(key), (e,))
    f_soft_ref = bench(
        "softmax_scatter/dense_view",
        lambda x: jax.nn.softmax(x.reshape(b, l, l), -1).reshape(-1), x_e)
    f_soft_seg = bench("softmax_scatter/xla_segment",
                       lambda x: edge_softmax(g, x, by="src"), x_e)
    f_soft_til = bench(
        "softmax_scatter/pallas_tiled",
        lambda x: tg.gather_edges(
            tiled_softmax(tg, tg.scatter_edges(x)[: tg.num_tiles],
                          by="src")), x_e)
    ok &= _check("softmax scatter xla", f_soft_seg(x_e), f_soft_ref(x_e),
                 records)
    ok &= _check("softmax scatter tiled", f_soft_til(x_e), f_soft_ref(x_e),
                 records)
    f_gather_ref = jax.jit(
        lambda x: jax.nn.softmax(x.reshape(b, l, l), -2).reshape(-1))
    f_gather_seg = bench("softmax_gather/xla_segment",
                         lambda x: edge_softmax(g, x, by="dst"), x_e)
    ok &= _check("softmax gather xla", f_gather_seg(x_e),
                 f_gather_ref(x_e), records)

    # Vector SpMM (wrapper.py:269-301).
    edata = jax.random.uniform(next(key), (e,))
    xn = jax.random.normal(next(key), (n, d_single))
    f_spmm_bmm = bench(
        "spmm/dense_bmm",
        lambda ed, x: jnp.einsum(
            "bxy,byd->bxd", ed.reshape(b, l, l), x.reshape(b, l, -1)
        ).reshape(n, -1), edata, xn)
    f_spmm_seg = bench("spmm/xla_segment",
                       lambda ed, x: vector_spmm(g, ed, x), edata, xn)
    vals = jax.jit(lambda ed: tg.scatter_edges(ed)[: tg.num_tiles])(edata)
    f_spmm_til = bench("spmm/pallas_tiled",
                       lambda v, x: tiled_spmm(tg, v, x), vals, xn)
    y0 = f_spmm_bmm(edata, xn)
    ok &= _check("spmm fwd xla vs bmm", f_spmm_seg(edata, xn), y0, records)
    ok &= _check("spmm fwd tiled vs bmm", f_spmm_til(vals, xn), y0, records)

    # Fused attention (no reference analog — it launches 6 kernels for
    # this; ours is 1).
    q = jax.random.normal(next(key), (n, 128))
    kk = jax.random.normal(next(key), (n, 128))
    vv = jax.random.normal(next(key), (n, 128))
    f_fused = bench("attention_fused/pallas",
                    lambda q, k, v: tiled_attention(tg, q, k, v,
                                                    normalize="src"),
                    q, kk, vv)

    def attn_ref(q, k, v):
        s = sddmm(g, q, k) / jnp.sqrt(128.0)
        a = edge_softmax(g, s, by="src")
        return vector_spmm(g, a, v)

    f_attn_ref = bench("attention_composed/xla", attn_ref, q, kk, vv)
    ok &= _check("fused attention vs composed", f_fused(q, kk, vv),
                 f_attn_ref(q, kk, vv), records)

    # ---------------- multi head (reference wrapper.py:303-485) ---------
    print(f"Multi head (batch={b}, length={l}, heads={heads}, "
          f"dim={d_multi})")
    Ah = jax.random.normal(next(key), (n, heads, d_multi))
    Bh = jax.random.normal(next(key), (n, heads, d_multi))
    Be = jax.random.normal(next(key), (e, d_multi))
    f_nme = bench("node_mul_edge/xla_segment",
                  lambda A, B: node_mul_edge(g, A, B), Ah, Be)
    # Oracle: explicit gather.
    src = g.src
    f_nme_ref = jax.jit(lambda A, B: jnp.einsum(
        "ehd,ed->eh", A[jnp.minimum(src, n - 1)], B))
    ok &= _check("node_mul_edge fwd", f_nme(Ah, Be), f_nme_ref(Ah, Be),
                 records)

    f_mm_h = bench("maskedmm_multihead/xla_segment",
                   lambda A, B: sddmm(g, A, B), Ah, Bh)
    f_mm_h_ref = jax.jit(lambda A, B: jnp.einsum(
        "bxhd,byhd->bxyh", A.reshape(b, l, heads, d_multi),
        B.reshape(b, l, heads, d_multi)).reshape(e, heads))
    ok &= _check("maskedmm multihead fwd", f_mm_h(Ah, Bh),
                 f_mm_h_ref(Ah, Bh), records)

    xh = jax.random.normal(next(key), (e, heads))
    f_sm_h = bench("softmax_multihead/xla_segment",
                   lambda x: edge_softmax(g, x, by="src"), xh)
    f_sm_h_ref = jax.jit(lambda x: jax.nn.softmax(
        x.reshape(b, l, l, heads), -2).reshape(e, heads))
    ok &= _check("softmax multihead", f_sm_h(xh), f_sm_h_ref(xh), records)

    edh = jax.random.uniform(next(key), (e, heads))
    f_spmm_h = bench("spmm_multihead/xla_segment",
                     lambda ed, x: vector_spmm(g, ed, x), edh, Ah)
    f_spmm_h_ref = jax.jit(lambda ed, x: jnp.einsum(
        "bxyh,byhd->bxhd", ed.reshape(b, l, l, heads),
        x.reshape(b, l, heads, d_multi)).reshape(n, heads, d_multi))
    ok &= _check("spmm multihead fwd", f_spmm_h(edh, Ah),
                 f_spmm_h_ref(edh, Ah), records)

    f_att_h = bench("attention_fused_multihead/pallas",
                    lambda q, k, v: tiled_attention(tg, q, k, v,
                                                    normalize="src"),
                    Ah, Bh, Ah)

    return records, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CPU-sized smoke run")
    ap.add_argument("--json", type=str, default=None,
                    help="write records to this file")
    args = ap.parse_args()
    if args.small:
        records, ok = run_suite(batch_size=8, length=16, d_single=128,
                                heads=2, d_multi=64, iters=(2, 4), warmup=1)
    else:
        records, ok = run_suite()
    if args.json:
        with open(args.json, "w") as f:
            json.dump(records, f, indent=1)
    print(json.dumps({"suite_ok": ok,
                      "checks": sum(1 for r in records if "check" in r),
                      "benches": sum(1 for r in records if "bench" in r)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
