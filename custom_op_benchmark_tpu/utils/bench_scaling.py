"""Multi-device scaling-efficiency harness (BASELINE north star:
"measure edges/s scaling efficiency at 1 chip, 1 host, and N≥2 hosts;
≥80% edges/s scaling efficiency from 1 to 2 hosts").

Runs the halo-plan fused attention over meshes of 1, 2, 4, ... devices on
the same graph and reports edges/s plus efficiency relative to perfect
linear scaling from the 1-device run.

On this machine only one real TPU chip is reachable, so the harness is
exercised on a fake CPU mesh (``JAX_PLATFORMS=cpu XLA_FLAGS=
--xla_force_host_platform_device_count=8``) — that validates the
partitioning, collectives and timing protocol end-to-end; absolute
CPU numbers are NOT hardware claims. On a real slice the same command
measures the real thing.

Run: python -m custom_op_benchmark_tpu.utils.bench_scaling [--n ...]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run_scaling(n=65536, e=1_000_000, d=64, heads=2, widths=None,
                device_counts=None, iters="auto", cluster=True):
    """Scale the PRODUCTION distributed plan (round-2 verdict #6 — the
    round-2 harness timed the sorted-segment ``halo_gat_attention``,
    which RESULTS.md itself measures 19.3× slower than the scatter-free
    ``halo_attention_ell`` that ``fit_edge_partitioned`` actually runs).

    Per P: fwd and fwd+bwd time of ``halo_attention_ell``, plus the comm
    volume accounting that makes efficiency attributable — real halo
    rows (Σ send-list entries), the padded all_to_all payload P·P·M, and
    bytes per exchange at this (heads, d, f32)."""
    import jax

    from custom_op_benchmark_tpu.graph import (
        cluster_order, random_graph, reorder_graph,
    )
    from custom_op_benchmark_tpu.parallel import (
        halo_attention_ell, halo_ell, halo_graph, make_mesh,
        shard_halo_nodes,
    )
    from custom_op_benchmark_tpu.utils.benchlib import bench_fn

    del widths
    devs = jax.devices()
    if device_counts is None:
        device_counts = [p for p in (1, 2, 4, 8, 16) if p <= len(devs)]
    g = random_graph(n, e, seed=0, power_law=True)
    if cluster:
        # The production path (fit_edge_partitioned) renumbers for
        # locality before building the halo plan; mirror it.
        g, _ = reorder_graph(g, cluster_order(g, max(device_counts)))
    rng = np.random.default_rng(0)
    q0 = rng.normal(size=(n, heads, d)).astype(np.float32)
    row_bytes = heads * d * 4

    records = []
    base = None
    for p in device_counts:
        mesh = make_mesh((p,), ("edge",), devices=devs[:p])
        hg = halo_graph(g, mesh)
        he = halo_ell(hg, mesh)
        q = shard_halo_nodes(hg, mesh, q0)
        rec = bench_fn(
            lambda q: halo_attention_ell(hg, he, mesh, q, q, q),
            (q,), iters=iters, name=f"halo_attn_ell_p{p}", edges=e,
        )
        rec_bwd = bench_fn(
            jax.grad(lambda q: (halo_attention_ell(
                hg, he, mesh, q, q, q) ** 2).sum()),
            (q,), iters=iters, name=f"halo_attn_ell_grad_p{p}", edges=e,
        )
        send_idx = np.asarray(jax.device_get(hg.send_idx))
        real_rows = int((send_idx < hg.n_per).sum())
        pad_rows = hg.num_parts * hg.num_parts * hg.halo
        total_bucket_rows = sum(
            int(np.asarray(jax.device_get(r)).shape[1])
            for r in he.rows_b)
        eps = e / rec.time_s
        if base is None:
            base = eps
        eff = eps / (base * p)
        records.append(dict(
            devices=p, time_s=rec.time_s, grad_time_s=rec_bwd.time_s,
            edges_per_s=round(eps, 1),
            scaling_efficiency=round(eff, 4),
            halo_fraction=round(hg.halo_fraction, 4),
            comm_rows_real=real_rows, comm_rows_padded=pad_rows,
            comm_bytes_fwd=2 * pad_rows * row_bytes,   # k and v exchange
            interior_row_frac=round(
                1 - sum(he.n_bnd) / max(total_bucket_rows, 1), 4),
        ))
        print(f"  P={p}: fwd {rec.time_s*1e3:9.3f} ms  grad "
              f"{rec_bwd.time_s*1e3:9.3f} ms  {eps/1e6:9.1f} Medges/s  "
              f"eff={eff:.2%}  halo={hg.halo_fraction:.2f}  "
              f"comm={real_rows}/{pad_rows} rows")
    return records


def run_tp_scaling(n=65536, e=1_000_000, d=32, heads=8,
                   device_counts=None, iters="auto"):
    """Head-axis tensor-parallel scaling of the fused ELL attention
    (parallel/tp.py): same graph, heads split over 1, 2, 4, ... chips.
    No collectives inside the op, so efficiency measures per-shard
    compute shrinkage (smaller head slice per chip) + dispatch."""
    import jax

    from custom_op_benchmark_tpu.graph import random_graph
    from custom_op_benchmark_tpu.ops import ell_dual
    from custom_op_benchmark_tpu.parallel import make_mesh
    from custom_op_benchmark_tpu.parallel.tp import (
        shard_heads, tp_attention,
    )
    from custom_op_benchmark_tpu.utils.benchlib import bench_fn

    devs = jax.devices()
    if device_counts is None:
        device_counts = [p for p in (1, 2, 4, 8)
                         if p <= min(len(devs), heads)]
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    rng = np.random.default_rng(0)
    q0 = rng.normal(size=(n, heads, d)).astype(np.float32)

    records = []
    base = None
    for p in device_counts:
        mesh = make_mesh((p,), ("head",), devices=devs[:p])
        q = shard_heads(mesh, q0)
        rec = bench_fn(
            lambda q: tp_attention(de, se, mesh, q, q, q),
            (q,), iters=iters, name=f"tp_attn_p{p}", edges=e * heads,
        )
        eps = e * heads / rec.time_s
        if base is None:
            base = eps
        eff = eps / (base * p)
        records.append(dict(
            devices=p, time_s=rec.time_s,
            head_edges_per_s=round(eps, 1),
            scaling_efficiency=round(eff, 4),
        ))
        print(f"  TP={p}: {rec.time_s*1e3:9.3f} ms  "
              f"{eps/1e6:9.1f} M(head·edges)/s  eff={eff:.2%}")
    return records


def run_dp_scaling(nodes_per_class=2048, feat_dim=64, fanouts=(10, 5),
                   batch_size=256, device_counts=None, iters="auto"):
    """Minibatch-DP scaling of the sampled GraphSAGE train step
    (SURVEY.md §2.4 DP plan; the step ``fit_sampled_dp`` runs): P
    pre-sampled static-shape subgraph batches stacked on a mesh axis,
    one shard_map step with psum-averaged grads. Host sampling is
    excluded (it pipelines behind the device step via data.pipeline).

    Efficiency is seeds/s relative to perfect scaling from P=1 — the
    step is collective-light (one grads pmean), so the number mostly
    measures per-device step-time stability as P grows."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from custom_op_benchmark_tpu.data.sampling import NeighborSampler
    from custom_op_benchmark_tpu.data.synthetic import planted_partition
    from custom_op_benchmark_tpu.models import GraphSAGE
    from custom_op_benchmark_tpu.parallel import make_mesh
    from custom_op_benchmark_tpu.train.loop import (
        create_train_state, masked_cross_entropy,
    )
    from custom_op_benchmark_tpu.utils.benchlib import bench_fn

    devs = jax.devices()
    if device_counts is None:
        device_counts = [p for p in (1, 2, 4, 8) if p <= len(devs)]
    ds = planted_partition(nodes_per_class=nodes_per_class,
                           feat_dim=feat_dim, avg_degree=10, seed=0)
    sampler = NeighborSampler(ds.graph, fanouts, seed=0)
    train_ids = np.nonzero(ds.train_mask)[0]
    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    model = GraphSAGE(hidden_dim=64, out_dim=ds.num_classes,
                      num_layers=2)

    b0 = sampler.sample(train_ids[:batch_size])
    state = create_train_state(
        model, b0.graph, jnp.asarray(ds.features[b0.node_ids]),
        jax.random.PRNGKey(0), learning_rate=1e-3,
        in_cols=jnp.asarray(b0.in_cols),
    )

    records = []
    base = None
    for p in device_counts:
        mesh = make_mesh((p,), ("batch",), devices=devs[:p])
        spec = P("batch")
        batches = [
            dataclasses.replace(
                b, graph=dataclasses.replace(
                    b.graph, n_edges=b.graph.num_edges_padded))
            for b in (sampler.sample(
                train_ids[i * batch_size:(i + 1) * batch_size])
                for i in range(p))
        ]
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)
        stacked = jax.device_put(
            stacked, jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, spec), stacked))

        def step_fn(params, opt_state, graphs, node_ids, seed_ids,
                    seed_mask, in_cols, feats, labels):
            g = jax.tree_util.tree_map(lambda l: l[0], graphs)
            x = feats[node_ids[0]]
            y = labels[seed_ids[0]]

            def loss_fn(prm):
                logits = model.apply({"params": prm}, g, x,
                                     in_cols=in_cols[0])
                k = seed_mask.shape[-1]
                return masked_cross_entropy(logits[:k], y, seed_mask[0])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, "batch")
            loss = jax.lax.pmean(loss, "batch")
            upd, opt_state = state.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        sharded_step = jax.jit(jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), P(), spec, spec, spec, spec, spec, P(), P()),
            out_specs=(P(), P(), P()),
        ))

        def run(params, opt_state):
            params, opt_state, loss = sharded_step(
                params, opt_state, stacked.graph, stacked.node_ids,
                stacked.seed_ids, stacked.seed_mask, stacked.in_cols,
                feats, labels)
            return loss

        rec = bench_fn(run, (state.params, state.opt_state),
                       iters=iters, name=f"dp_step_p{p}")
        sps = p * batch_size / rec.time_s
        if base is None:
            base = sps
        eff = sps / (base * p)
        records.append(dict(
            devices=p, time_s=rec.time_s, seeds_per_s=round(sps, 1),
            scaling_efficiency=round(eff, 4),
        ))
        print(f"  DP={p}: {rec.time_s*1e3:9.3f} ms/step  "
              f"{sps:9.1f} seeds/s  eff={eff:.2%}")
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--e", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    from custom_op_benchmark_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    if args.small:
        records = run_scaling(n=2048, e=16000, d=16, iters=(2, 4))
        tp_records = run_tp_scaling(n=2048, e=16000, d=8, heads=4,
                                    iters=(2, 4))
        dp_records = run_dp_scaling(nodes_per_class=256, batch_size=64,
                                    iters=(2, 4))
    else:
        records = run_scaling(n=args.n, e=args.e, d=args.d)
        tp_records = run_tp_scaling(n=args.n, e=args.e)
        dp_records = run_dp_scaling()
    print(json.dumps({"scaling": records, "tp_scaling": tp_records,
                      "dp_scaling": dp_records}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
