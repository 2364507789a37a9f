"""Bisect the DP scaling section's 8x step blowup (round-3 verdict,
weak #3: SCALING_r3_cpu_mesh.json dp_scaling went 4.8 -> 39.4 ms from
1 -> 2 devices on the 1-core CPU mesh; serialized execution predicts
~2x, not 8x).

Hypotheses, each isolated on the same stacked-batch step
(utils/bench_scaling.run_dp_scaling):
  H1 replicated-operand resharding: `feats`/`labels` enter the jitted
     shard_map step as single-device arrays but with P() (replicated)
     specs, so every loop call re-broadcasts the full feature table to
     all P cpu devices;
  H2 the grads pmean collective on the cpu backend;
  H3 plain serialization + threading overhead of P cpu devices on one
     core (the floor the section's docstring already claims).

Method: time the P=1 and P=2 steps with (a) the section as-is,
(b) feats/labels pre-placed replicated via device_put, (c) pmean
removed (mathematically wrong, timing probe only), (d) model compute
only (no optimizer). Run on the CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 1200 python scripts/exp_dp_anomaly.py
"""

import dataclasses
import json

from custom_op_benchmark_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402
import optax                                            # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from custom_op_benchmark_tpu.data.sampling import NeighborSampler  # noqa: E402
from custom_op_benchmark_tpu.data.synthetic import planted_partition  # noqa: E402
from custom_op_benchmark_tpu.models import GraphSAGE    # noqa: E402
from custom_op_benchmark_tpu.parallel import make_mesh  # noqa: E402
from custom_op_benchmark_tpu.train.loop import (        # noqa: E402
    create_train_state, masked_cross_entropy,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn  # noqa: E402


def main():
    devs = jax.devices()
    ds = planted_partition(nodes_per_class=2048, feat_dim=64,
                           avg_degree=10, seed=0)
    sampler = NeighborSampler(ds.graph, (10, 5), seed=0)
    train_ids = np.nonzero(ds.train_mask)[0]
    batch_size = 256
    feats = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    model = GraphSAGE(hidden_dim=64, out_dim=ds.num_classes,
                      num_layers=2)
    b0 = sampler.sample(train_ids[:batch_size])
    state = create_train_state(
        model, b0.graph, jnp.asarray(ds.features[b0.node_ids]),
        jax.random.PRNGKey(0), learning_rate=1e-3,
        in_cols=jnp.asarray(b0.in_cols))
    tx = state.tx
    rows = {}

    for p in (1, 2, 4):
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

        def make_step(with_pmean=True, with_opt=True):
            # Without the grads pmean, params/loss are NOT replicated
            # across shards, so the probe variants return a per-shard
            # scalar (spec) and leave params untouched.
            per_shard = not (with_pmean and with_opt)

            def step_fn(params, opt_state, graphs, node_ids, seed_ids,
                        seed_mask, in_cols, feats, labels):
                g = jax.tree_util.tree_map(lambda l: l[0], graphs)
                x = feats[node_ids[0]]
                y = labels[seed_ids[0]]

                def loss_fn(prm):
                    logits = model.apply({"params": prm}, g, x,
                                         in_cols=in_cols[0])
                    k = seed_mask.shape[-1]
                    return masked_cross_entropy(logits[:k], y,
                                                seed_mask[0])

                loss, grads = jax.value_and_grad(loss_fn)(params)
                if with_pmean:
                    grads = jax.lax.pmean(grads, "batch")
                    loss = jax.lax.pmean(loss, "batch")
                if not with_opt:
                    leaves = jax.tree_util.tree_leaves(grads)
                    acc = sum(l.ravel()[0] for l in leaves)
                    return params, opt_state, (loss + acc).reshape(1)
                upd, opt_state2 = tx.update(grads, opt_state, params)
                if per_shard:
                    # opt_state2/params2 are per-shard without the
                    # pmean; fold them into the scalar and pass the
                    # replicated originals through.
                    leaves = jax.tree_util.tree_leaves(
                        (optax.apply_updates(params, upd), opt_state2))
                    acc = sum(l.ravel()[0] for l in leaves
                              if hasattr(l, "ravel") and l.size)
                    return params, opt_state, (loss + acc).reshape(1)
                return optax.apply_updates(params, upd), opt_state2, loss

            return jax.jit(jax.shard_map(
                step_fn, mesh=mesh,
                in_specs=(P(), P(), spec, spec, spec, spec, spec,
                          P(), P()),
                out_specs=(P(), P(), spec if per_shard else P()),
            ))

        feats_rep = jax.device_put(feats, NamedSharding(mesh, P()))
        labels_rep = jax.device_put(labels, NamedSharding(mesh, P()))

        variants = {
            "asis": (make_step(), feats, labels),
            "replicated_operands": (make_step(), feats_rep, labels_rep),
            "no_pmean": (make_step(with_pmean=False), feats_rep,
                         labels_rep),
            "no_opt": (make_step(with_opt=False), feats_rep,
                       labels_rep),
        }
        for name, (sstep, f_, l_) in variants.items():
            def run(params, opt_state, f=f_, l=l_, ss=sstep):
                params, opt_state, loss = ss(
                    params, opt_state, stacked.graph, stacked.node_ids,
                    stacked.seed_ids, stacked.seed_mask,
                    stacked.in_cols, f, l)
                return loss

            rec = bench_fn(run, (state.params, state.opt_state),
                           iters=(2, 8), name=f"dp_{name}_p{p}")
            rows[f"{name}_p{p}"] = round(rec.time_s * 1e3, 2)
            print(f"P={p} {name:22s} {rec.time_s*1e3:8.2f} ms",
                  flush=True)

    print(json.dumps({"dp_anomaly": rows}))


if __name__ == "__main__":
    main()
