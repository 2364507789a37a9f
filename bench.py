#!/usr/bin/env python
"""Headline benchmark: SpMM on the reference workload, vs HBM roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (reference parity, upgraded per SURVEY.md §5/§6):
- workload: 512 disjoint 30-node cliques — n=15,360, e=460,800
  (reference wrapper.py:79-101), single-head d=1024 fp32 like the
  reference's single-head SpMM suite (wrapper.py:269-301);
- op: vector_spmm forward (the SpMM the BASELINE.json north star names);
- timing: warmup + median of repeats with block_until_ready (the
  reference's single-shot time.time() protocol under-reports — SURVEY §5);
- metric: achieved fraction of the chip's HBM roofline, where ideal
  traffic = read x (n·d·4B) + read edata/indices (2·e·4B) + write y
  (n·d·4B) — i.e. every operand touched exactly once;
- vs_baseline: the reference publishes no numbers (BASELINE.md), so the
  comparison point is the BASELINE.json north-star target of 70% of
  roofline: vs_baseline = value / 0.70.
"""

import json
import sys

import jax
import jax.numpy as jnp


def main():
    from custom_op_benchmark_tpu.graph import clique_batch
    from custom_op_benchmark_tpu.ops import vector_spmm
    from custom_op_benchmark_tpu.utils.benchlib import (
        bench_fn,
        hbm_bandwidth_bytes,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        batch, length, d = 512, 30, 1024
    else:  # CPU smoke mode (driver debugging)
        batch, length, d = 32, 30, 128

    g = clique_batch(batch, length)
    n, e = g.n_nodes, g.n_edges
    key = jax.random.PRNGKey(0)
    edata = jax.random.uniform(key, (e,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.float32)

    # Execution-strategy ladder (picked by graph structure, cold path —
    # the reference's cached-index preprocessing analog, wrapper.py:114-116):
    # 1. dense_block — component-batched dense bmm, exactly-ideal bytes
    #    (the workload is block-diagonal: 512 disjoint cliques);
    # 2. pallas_tiled — 128×128 block-sparse MXU tiles on the
    #    tile-aligned node order (general local graphs);
    # 3. xla — segment-sum oracle (any graph; CPU smoke mode).
    from custom_op_benchmark_tpu.graph import block_graph

    bg = block_graph(g, max_block=128) if on_tpu else None
    if bg is not None:
        from custom_op_benchmark_tpu.ops import block_spmm

        impl = "dense_block"
        vals = jax.jit(bg.scatter_edges)(edata)      # (B, L, L)
        xb = jax.jit(bg.scatter_nodes)(x)            # (B, L, d)
        fn = lambda vals, x: block_spmm(bg, vals, x)  # noqa: E731
        args = (vals, xb)
        # Traffic the dense layout actually incurs: x read + y write at
        # the padded block shape, plus the full (B, L, L) vals tile; no
        # edge-index reads exist in this layout (ADVICE r1).
        strategy_bytes = (2 * xb.size + vals.size) * 4
    elif on_tpu:
        from custom_op_benchmark_tpu.graph.reorder import (
            reorder_graph,
            tile_aligned_order,
        )
        from custom_op_benchmark_tpu.graph.tiled import tile_graph
        from custom_op_benchmark_tpu.ops.tiled import tiled_spmm

        impl = "pallas_tiled"
        ro = tile_aligned_order(g, block=128)
        g2, eperm = reorder_graph(g, ro)
        tg = tile_graph(g2, 128, 128)
        vals = jax.jit(
            lambda ed: tg.scatter_edges(ed[jnp.asarray(eperm)])[
                : tg.num_tiles
            ]
        )(edata)
        xr = ro.scatter_nodes(x)
        fn = lambda vals, x: tiled_spmm(tg, vals, x)  # noqa: E731
        args = (vals, xr)
        # BSR layout reads the materialized tile values, not (edata, idx).
        strategy_bytes = 2 * n * d * 4 + vals.size * 4
    else:
        impl = "xla"
        fn = lambda edata, x: vector_spmm(g, edata, x, impl=impl)  # noqa: E731
        args = (edata, x)
        strategy_bytes = 2 * n * d * 4 + 2 * e * 4

    # Public-API dispatch check (round-1 verdict #3): impl="auto" must
    # resolve to the dense_block strategy on this workload and agree with
    # the timed hot-loop form numerically.
    from custom_op_benchmark_tpu.ops import dispatch as _dispatch

    auto_impl = _dispatch.resolve(g, "auto")
    if bg is not None:
        assert auto_impl == "dense_block", auto_impl
        y_auto = jax.jit(
            lambda ed, xx: vector_spmm(g, ed, xx, impl="auto")
        )(edata, x)
        y_hot = bg.gather_nodes(jax.jit(fn)(*args))
        import numpy as _np

        _np.testing.assert_allclose(
            _np.asarray(y_auto), _np.asarray(y_hot), rtol=2e-2, atol=2e-2
        )

    # Compiled-Pallas verification (round-1 weak #5): run one Pallas
    # kernel COMPILED on the real chip and gate against an independent
    # dense oracle, so a Mosaic lowering regression can't hide behind
    # interpret-mode pytest. (Not interpret-vs-compiled: interpret-mode
    # Pallas execution wedges this remote tunnel — see bench_suite.)
    pallas_parity_ok = None
    if on_tpu:
        import numpy as _np2

        from custom_op_benchmark_tpu.graph.tiled import tile_graph
        from custom_op_benchmark_tpu.ops.tiled import tiled_sddmm

        gs = clique_batch(8, 30)
        tgs = tile_graph(gs, 128, 128)
        As = jax.random.normal(jax.random.PRNGKey(3), (gs.n_nodes, 128))
        Bs = jax.random.normal(jax.random.PRNGKey(4), (gs.n_nodes, 128))
        src = _np2.asarray(gs.src)[: gs.n_edges]
        dst = _np2.asarray(gs.dst)[: gs.n_edges]
        with jax.default_matmul_precision("highest"):
            y_comp = jax.jit(
                lambda a, b: tgs.gather_edges(tiled_sddmm(tgs, a, b))
            )(As, Bs)
            y_oracle = jnp.einsum(
                "ed,ed->e", jnp.asarray(As)[src], jnp.asarray(Bs)[dst]
            )
        pallas_parity_ok = bool(_np2.allclose(
            _np2.asarray(y_comp)[: gs.n_edges], _np2.asarray(y_oracle),
            rtol=5e-3, atol=5e-3))
        assert pallas_parity_ok, "compiled Pallas != dense oracle"

    ideal_bytes = strategy_bytes
    rec = bench_fn(
        fn,
        args,
        warmup=1,
        iters=(16, 272),
        rotate=4 if on_tpu else 1,
        # Steady-state throughput: serialize on the edge values (the SpMM
        # output depends on them), let the x stream pipeline.
        perturb=(0,),
        name=f"vector_spmm_{impl}",
        bytes_moved=ideal_bytes,
        edges=e,
        impl=impl,
        n=n,
        d=d,
    )
    peak = hbm_bandwidth_bytes()
    frac = rec.roofline_fraction(peak)

    # Secondary metric: the general-graph (power-law) fused attention —
    # the regime where the reference's atomics design pays most. Measured
    # 10.4× the composed segment pipeline (docs/RESULTS.md); only the
    # fast path is timed here to keep the driver run short.
    extra = {}
    if on_tpu:
        try:
            from custom_op_benchmark_tpu.graph import random_graph
            from custom_op_benchmark_tpu.ops import ell_attention, ell_dual

            n2, e2, d2 = 131072, 2_000_000, 128
            g2 = random_graph(n2, e2, seed=0, power_law=True)
            se, de = ell_dual(g2)
            q = jax.random.normal(jax.random.PRNGKey(2), (n2, d2),
                                  jnp.float32)
            rec2 = bench_fn(
                lambda q: ell_attention(de, se, q, q, q), (q,),
                iters=(4, 20), repeats=3, name="pl_attn", edges=e2,
            )
            # Gather-roofline fractions for the hard regime, BOUNDED
            # (round-3 verdict #7 — the old single metric counted
            # repeated hot-row fetches at full cost and measured 1.09,
            # which a bounded model cannot do; a metric that exceeds 1
            # can't bound headroom). Two bytes models over the chip's
            # MEASURED fused-gather ceiling (~219 GB/s,
            # scripts/exp_pallas_gather — not nominal HBM: per-slot row
            # gathers can't stream):
            #   unique  — every node row of k/v/q/y touched exactly
            #             once (perfect on-chip reuse of hot rows):
            #             the LOWER bound on real traffic, so its
            #             fraction ≤ 1 and (1 − frac) is the honest
            #             remaining-headroom signal;
            #   refetch — one k-row + one v-row fetch per padded ELL
            #             slot (zero reuse): the UPPER bound, the
            #             regression guard (falls ⇒ the op got slower).
            import numpy as _np3

            slots = sum(int(_np3.prod(b.cols.shape)) for b in de.buckets)
            refetch_bytes = (2 * slots * d2 + 2 * n2 * d2) * 4
            unique_bytes = 4 * n2 * d2 * 4          # k+v+q reads, y write
            gather_ceiling = 219e9
            frac_refetch = (refetch_bytes / rec2.time_s) / gather_ceiling
            frac_unique = (unique_bytes / rec2.time_s) / gather_ceiling
            extra = {
                "powerlaw_fused_attention_medges_s": round(
                    rec2.edges_per_s / 1e6, 1),
                "powerlaw_fused_attention_ms": round(rec2.time_s * 1e3, 2),
                "powerlaw_attention_roofline_frac_unique": round(
                    frac_unique, 4),
                "powerlaw_attention_roofline_frac_refetch": round(
                    frac_refetch, 4),
                "powerlaw_bytes_model_gb": round(refetch_bytes / 1e9, 3),
                "powerlaw_gather_ceiling_gb_s": 219.0,
            }
        except Exception as ex:  # secondary metric must never kill the run
            extra = {"powerlaw_bench_error": str(ex)[:120]}

        # Model-level metric (round 3): full 3-layer fused-GAT train
        # step on THE reference workload, dense-block whole-stack
        # layout (fwd+bwd+adamw; 2.93 ms measured — 115× the segment
        # composition, scripts/bench_models.py).
        try:
            import numpy as _np4
            import optax

            from custom_op_benchmark_tpu.models import GAT
            from custom_op_benchmark_tpu.train.loop import (
                create_train_state,
                masked_cross_entropy,
            )

            _rng4 = _np4.random.default_rng(0)
            xg = jnp.asarray(
                _rng4.normal(size=(n, 128)).astype(_np4.float32))
            yg = jnp.asarray(
                _rng4.integers(0, 10, size=n).astype(_np4.int32))
            mg = jnp.ones((n,), bool)
            gat = GAT(hidden_dim=64, out_dim=10, num_layers=3,
                      num_heads=8)
            st = create_train_state(gat, g, xg, jax.random.PRNGKey(0),
                                    block=bg)

            def gat_step(params, xg):
                def loss_fn(p):
                    logits = gat.apply({"params": p}, g, xg, block=bg)
                    return masked_cross_entropy(logits, yg, mg)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                upd, _ = st.tx.update(grads, st.opt_state, params)
                return optax.apply_updates(params, upd)

            rec3 = bench_fn(gat_step, (st.params, xg), warmup=1,
                            iters=(2, 10), name="clique_gat_step")
            extra["clique_gat_step_ms"] = round(rec3.time_s * 1e3, 3)
        except Exception as ex:
            extra["gat_step_bench_error"] = str(ex)[:120]

    print(json.dumps({
        "metric": "spmm_hbm_roofline_frac",
        "value": round(float(frac), 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(float(frac) / 0.70, 4),
        "edges_per_s": round(rec.edges_per_s, 1),
        "time_s": rec.time_s,
        "impl": impl,
        "auto_impl": auto_impl,
        "pallas_parity_ok": pallas_parity_ok,
        "device": str(jax.devices()[0].device_kind),
        "peak_gb_s": peak / 1e9,
        **extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
