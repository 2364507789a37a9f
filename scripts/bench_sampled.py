"""Measure the sampled-minibatch pipeline AFTER the device-resident
feature fix (round-2 verdict #7 — ROUND2 claimed the 36 MB/step host
transfer fell to KBs of indices, but no post-fix TPU step time was ever
recorded; RESULTS.md still carried the round-1 1.11 s/step).

Reddit-shape config: the run_reddit_sage synthetic stand-in (233k nodes,
~11.7M edges, 300-d features), GraphSAGE fanout 25/10, batch 256 seeds.

Breakdown protocol (tunnel-safe):
  - host sampling: wall time of N sampler.sample calls (pure numpy/C++);
  - index transfer: bytes of node_ids/seed arrays per batch (the ONLY
    per-step host→device traffic on the fast path — asserted);
  - device step: presample N batches, submit all jitted steps
    back-to-back, block once at the end; wall/N amortizes the RPC
    round trip over the whole run (single-step naive timing would be
    swamped by it — utils/benchlib docs).
"""

import dataclasses
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.data.sampling import NeighborSampler
from custom_op_benchmark_tpu.data.synthetic import planted_partition
from custom_op_benchmark_tpu.models import GraphSAGE
from custom_op_benchmark_tpu.train.loop import (
    create_train_state,
    masked_cross_entropy,
)


def main():
    import os

    npc = int(os.environ.get("BS_NPC", 5700))
    ds = planted_partition(num_classes=41, nodes_per_class=npc,
                           feat_dim=300, avg_degree=50,
                           name="reddit-like")
    n_steps = int(os.environ.get("BS_STEPS", 30))
    batch_size = 256
    sampler = NeighborSampler(ds.graph, (25, 10), seed=0)
    train_ids = np.nonzero(ds.train_mask)[0]

    feats_dev = jnp.asarray(ds.features)
    labels_dev = jnp.asarray(ds.labels)
    # Fence ALL outstanding device uploads (the full-graph arrays from
    # dataset construction + the feature table) before timing the host
    # sampler: the tunnel uploads lazily, and an in-flight 500 MB graph
    # transfer steals the single host core + link from the sampling
    # phase (measured 242 ms/batch polluted vs ~25 ms clean).
    g_full = ds.graph
    float(feats_dev[0, 0] + labels_dev[0]
          + sum(a[0] for a in (g_full.src, g_full.dst, g_full.csc_perm,
                               g_full.csc_perm_inv, g_full.indptr_r,
                               g_full.indptr_c)))

    # --- host sampling cost ---
    t0 = time.time()
    batches = [
        sampler.sample(train_ids[i * batch_size:(i + 1) * batch_size])
        for i in range(n_steps)
    ]
    t_sample = (time.time() - t0) / n_steps
    model = GraphSAGE(hidden_dim=128, out_dim=ds.num_classes,
                      num_layers=2)
    b0 = batches[0]
    state = create_train_state(
        model, b0.graph, feats_dev[jnp.asarray(b0.node_ids)],
        jax.random.PRNGKey(0), learning_rate=1e-3,
    )

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, g, node_ids, y, seed_mask, feats_arg):
        x = feats_arg[node_ids]

        def loss_fn(params):
            logits = state.apply_fn({"params": params}, g, x)
            k = seed_mask.shape[0]
            return masked_cross_entropy(logits[:k], y, seed_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    # Index-transfer accounting: the ONLY per-step host→device arrays.
    per_step_bytes = (batches[0].node_ids.nbytes
                      + batches[0].seed_ids.nbytes
                      + batches[0].seed_mask.nbytes)

    def dev_args(b):
        g = dataclasses.replace(
            b.graph, n_edges=b.graph.num_edges_padded)
        return (g, jnp.asarray(b.node_ids),
                labels_dev[jnp.asarray(b.seed_ids)],
                jnp.asarray(b.seed_mask))

    # warmup/compile
    state, loss = step(state, *dev_args(batches[0]), feats_dev)
    float(loss)

    t0 = time.time()
    last = None
    for b in batches:
        state, last = step(state, *dev_args(b), feats_dev)
    final = float(last)           # one fence for the whole run
    t_step = (time.time() - t0) / n_steps

    # --- END-TO-END pipelined steps/s (round-3 verdict #6a: the
    # overlap was inferred from components, never measured). Sampling
    # runs on the prefetch thread while device steps execute; device
    # submission is async and the single final fence waits for all
    # outstanding work, so wall/N measures max(sampling, device+xfer)
    # IF the overlap machinery works, and their SUM if it doesn't.
    # Prediction on this 1-core host: ≈ host_sampling_s. ---
    from custom_op_benchmark_tpu.data.pipeline import prefetch

    def batch_gen():
        for i in range(n_steps):
            yield sampler.sample(
                train_ids[i * batch_size:(i + 1) * batch_size])

    t0 = time.time()
    for b in prefetch(batch_gen(), size=2, device_put=False):
        state, last = step(state, *dev_args(b), feats_dev)
    float(last)
    t_pipe = (time.time() - t0) / n_steps

    print(json.dumps(dict(
        config="reddit_sage_synthetic",
        n=ds.graph.n_nodes, e=ds.graph.n_edges,
        batch=batch_size, fanouts=[25, 10],
        subgraph_nodes=int(batches[0].node_ids.shape[0]),
        host_sampling_s=round(t_sample, 4),
        device_step_s=round(t_step, 4),
        pipelined_step_s=round(t_pipe, 4),
        index_transfer_kb=round(per_step_bytes / 1024, 1),
        old_feature_transfer_mb=round(
            batches[0].node_ids.shape[0] * ds.features.shape[1] * 4
            / 1e6, 1),
        loss=round(final, 4),
    )), flush=True)


if __name__ == "__main__":
    main()
